"""Chunked-accel tests: scenes past the single-accel VMEM budget split into
Morton-compact sub-BVHs traced sequentially with t/occlusion carry
(tpurt/bvh/chunked.py). Parity against the single wide accel is exact for
occlusion and exact-up-to-duplicate-hits for closest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.chunked import (build_chunked, chunks_needed,
                               trace_any_chunked, trace_closest_chunked)
from tpurt.bvh.lbvh import build_lbvh
from tpurt.bvh.wide import build_wide
from tpurt.camera import generate_rays
from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
from tpurt.scenes import default_camera_for, teapot_scene

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


@pytest.fixture(scope="module")
def scene():
    mesh = teapot_scene(1500)
    cam = default_camera_for(mesh)
    v = jnp.asarray(mesh.vertices)
    i = jnp.asarray(mesh.indices)
    wide = build_wide(build_lbvh(v, i, leaf_size=4))
    chunked = build_chunked(v, i, num_chunks=3, leaf_size=4)
    o, d = generate_rays(cam, 64, 48)
    return mesh, wide, chunked, o, d


def test_chunked_closest_matches_single(scene):
    mesh, wide, chunked, o, d = scene
    t1, id1 = trace_closest_pallas(wide, o, d)
    t2, id2 = trace_closest_chunked(chunked, o, d)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-5, atol=1e-6)
    # Triangle ids may differ only where duplicated/coplanar tris tie in t.
    same = np.asarray(id1) == np.asarray(id2)
    assert same.mean() > 0.999


def test_chunked_any_matches_single(scene):
    mesh, wide, chunked, o, d = scene
    # Shadow-style rays from hit points toward a light.
    t1, id1 = trace_closest_pallas(wide, o, d)
    valid = np.asarray(id1) >= 0
    L = jnp.asarray([0.45, 0.8, 0.3]) / jnp.linalg.norm(
        jnp.asarray([0.45, 0.8, 0.3]))
    pos = o + d * jnp.where(jnp.asarray(valid), t1, 0.0)[..., None]
    so = pos + 1e-3 * jnp.broadcast_to(L, pos.shape)
    tm = jnp.where(jnp.asarray(valid), 3.4e38, 0.0)
    occ1 = trace_any_pallas(wide, so, jnp.broadcast_to(L, so.shape), tm)
    occ2 = trace_any_chunked(chunked, so, jnp.broadcast_to(L, so.shape), tm)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


def test_chunked_tri_ids_are_global(scene):
    mesh, wide, chunked, o, d = scene
    _, id2 = trace_closest_chunked(chunked, o, d)
    ids = np.asarray(id2)
    assert ids.max() < mesh.num_triangles
    assert (ids >= -1).all()


def test_chunks_needed_monotone():
    assert chunks_needed(100_000, 14, 15_800_000, 1_000_000) == 1
    big = chunks_needed(1_000_000, 14, 15_800_000, 1_000_000)
    assert big >= 3
    assert chunks_needed(2_000_000, 14, 15_800_000, 1_000_000) >= big


def test_renderer_chunked_image_matches(scene):
    """Force the Renderer down the chunked path (tiny budget) and compare
    the full frame against the unchunked render."""
    from tpurt.app import Renderer
    from tpurt.types import Light, RenderConfig
    mesh, *_ = scene
    cam = default_camera_for(mesh)
    light = Light.directional((0.45, 0.8, 0.3))
    cfg = RenderConfig(width=48, height=32, use_pallas=True, leaf_size=4,
                       gbuffer="ray")
    want = np.asarray(Renderer(mesh, cam, light, cfg)
                      .render_frame()["image"])

    class TinyBudget(Renderer):
        _VMEM_BUDGET = 150_000
        _VMEM_OVERHEAD = 0

    r = TinyBudget(mesh, cam, light, cfg)
    from tpurt.bvh.chunked import ChunkedAccel
    assert isinstance(r.accel, ChunkedAccel)
    assert r.accel.num_chunks >= 2
    got = np.asarray(r.render_frame()["image"])
    diff = np.abs(got - want).max(axis=-1)
    assert (diff > 2e-2).mean() < 0.005


def test_widen_guard_blocks_device_crashing_sizes():
    """The 1M-tri single wide accel crashed the TPU device (NOTES_ROUND3
    §G); widen_lbvh must refuse such sizes at trace time with a pointer
    to the chunked path (VERDICT r3 missing #4)."""
    import jax.numpy as jnp
    import pytest

    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import SAFE_WIDEN_BYTES, widen_lbvh
    from tpurt.scenes import random_soup

    mesh = random_soup(64, seed=3)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=4)
    too_big = SAFE_WIDEN_BYTES // 512 + 1024
    with pytest.raises(ValueError, match="chunked"):
        widen_lbvh(bvh, nw_pad=too_big)
    # The escape hatch stays available for isolation probes (tiny tree,
    # huge pad: wasteful but harmless here).
    w = widen_lbvh(bvh, nw_pad=1024, mode="fixed")
    assert w.num_wide == 1024


def test_split_sampled_covers_all_triangles():
    """The sampled-pivot split (split_sampled — the scale path that skips
    the global argsort program, probe r5f) must place every triangle in
    exactly one chunk's VALID slots, with filler slots repeating
    in-bucket ids only."""
    import jax.numpy as jnp

    from tpurt.bvh.chunked import split_morton, split_sampled
    from tpurt.scenes import teapot_scene

    mesh = teapot_scene(1500)
    v = jnp.asarray(mesh.vertices)
    i = jnp.asarray(mesh.indices)
    t = int(i.shape[0])
    nc = 3
    cap = int(-(-t // nc) * 1.12)
    ct, co, counts = split_sampled(v, i, nc, cap)
    counts = np.asarray(counts)
    assert counts.sum() == t
    assert counts.max() <= cap          # no overflow on a sane sample
    co = np.asarray(co)
    seen = []
    for b in range(nc):
        valid = co[b][: counts[b]]
        # compacted ids are sorted (nonzero order), so uniqueness is easy
        assert (np.diff(valid) > 0).all()
        # fillers repeat in-bucket triangles
        assert np.isin(co[b][counts[b]:], valid).all()
        seen.append(valid)
    seen = np.concatenate(seen)
    assert np.array_equal(np.sort(seen), np.arange(t))
    # Chunk AABB compactness parity vs the exact split: bucketing at the
    # sampled quantiles must not blow the per-chunk extents up.
    ct_ref, _ = split_morton(v, i, nc)

    def extent(ctris):
        pts = np.asarray(v)[np.asarray(ctris).reshape(-1, 3)]
        return np.ptp(pts.reshape(len(ctris), -1, 3), axis=1).max()

    for b in range(nc):
        assert extent(ct[b]) <= 2.0 * extent(ct_ref[b]) + 1e-5
