"""Native SAH static-accel path (bvh/sah.py): conversion invariants and
end-to-end parity with the pure-JAX reference pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.app import Renderer
from tpurt.bvh import traverse as jt
from tpurt.bvh.lbvh import refit_lbvh, sah_cost
from tpurt.bvh.sah import build_sah_lbvh
from tpurt.camera import generate_rays
from tpurt.scenes import (compute_smooth_normals, default_camera_for,
                          deform, teapot_scene)
from tpurt.types import Light, RenderConfig

pytestmark = pytest.mark.skipif(
    build_sah_lbvh(teapot_scene(200), leaf_size=8) is None,
    reason="native library unavailable")


@pytest.fixture(scope="module")
def scene():
    mesh = teapot_scene(1500)
    return mesh, default_camera_for(mesh)


def test_sah_tree_invariants(scene):
    mesh, _ = scene
    bvh = build_sah_lbvh(mesh, leaf_size=8)
    child = np.asarray(bvh.nodes_child)
    ni = child.shape[0]
    nl = bvh.tri_v0.shape[0] // 8
    # Every internal/leaf referenced exactly once; ranges nest.
    refs = child.ravel()
    ints = refs[refs >= 0]
    leaves = -refs[refs < 0] - 1
    assert sorted(ints) == list(range(1, ni))      # root unreferenced
    assert sorted(leaves) == list(range(nl))
    first = np.asarray(bvh.nodes_first)
    last = np.asarray(bvh.nodes_last)
    assert first[0] == 0 and last[0] == nl - 1
    assert (first <= last).all()


@pytest.mark.slow
def test_sah_traversal_matches_oracle(scene):
    mesh, cam = scene
    bvh = build_sah_lbvh(mesh, leaf_size=8)
    o, d = generate_rays(cam, 96, 64)
    t_sah, id_sah = jt.traverse(bvh, o, d, any_hit=False)
    # Brute-force oracle comparison via distances (tri ids differ: SAH
    # reorders + pads, so compare hit t and the mapped original id).
    from tpurt.bvh.reference import brute_force_closest
    t_ref, id_ref = brute_force_closest(
        mesh, np.asarray(o).reshape(-1, 3), np.asarray(d).reshape(-1, 3))
    t_sah_f = np.asarray(t_sah).ravel()
    ok = np.isclose(t_sah_f, t_ref, rtol=1e-4, atol=1e-6) \
        | (np.isinf(t_sah_f) & np.isinf(t_ref))
    assert ok.mean() > 0.999
    # traverse() returns ORIGINAL triangle ids; agree where hits agree
    # (rare ties at shared edges may differ)
    tid = np.asarray(id_sah).ravel()
    both = (t_ref < np.inf) & (t_sah_f < np.inf) & ok
    assert (tid[both] == id_ref[both]).mean() > 0.995


def test_sah_refit_tightness(scene):
    mesh, _ = scene
    bvh = build_sah_lbvh(mesh, leaf_size=8)
    v2 = deform(mesh, 0.4)
    refit = refit_lbvh(bvh, jnp.asarray(v2), mesh.indices)
    assert float(sah_cost(refit)) > 0.0
    # Root box contains all deformed vertices of referenced triangles.
    assert bool(jnp.all(refit.root_min <= jnp.min(refit.tri_v0, axis=0)))


@pytest.mark.slow
def test_renderer_sah_matches_reference(scene):
    mesh, cam = scene
    light = Light.directional((0.45, 0.8, 0.3))
    r = Renderer(mesh, cam, light,
                 RenderConfig(width=96, height=64, use_pallas=True))
    assert r._use_sah and r.config.gbuffer == "ray"
    a = np.asarray(r.render_frame()["image"])
    b = np.asarray(Renderer(mesh, cam, light,
                            RenderConfig(width=96, height=64,
                                         use_pallas=False)
                            ).render_frame()["image"])
    diff = np.abs(a - b).max(axis=-1)
    assert (diff > 2e-2).mean() < 0.01


def test_sbvh_duplicated_refs_map_to_original_ids(scene):
    """Spatial splits duplicate triangle REFERENCES with clipped boxes;
    every duplicated id must still be a valid original triangle id and
    every original triangle must stay covered (shading correctness)."""
    from tpurt.native import build_sah_bvh
    mesh, _ = scene
    v = np.asarray(mesh.vertices, np.float32)
    idx = np.asarray(mesh.indices, np.int32)
    plain = build_sah_bvh(v, idx, leaf_size=8)
    sbvh = build_sah_bvh(v, idx, leaf_size=8, spatial_alpha=1e-4,
                         spatial_budget=1.3)
    assert sbvh.tri_order.shape[0] >= plain.tri_order.shape[0]
    assert (sbvh.tri_order >= 0).all()
    assert (sbvh.tri_order < idx.shape[0]).all()
    assert np.unique(sbvh.tri_order).shape[0] == idx.shape[0]
    # duplication stays within the budget
    assert sbvh.tri_order.shape[0] <= int(idx.shape[0] * 1.3) + 8


def test_sbvh_traversal_matches_object_split(scene):
    """Any-hit + closest-hit results on the SBVH tree must agree with the
    object-split-only tree (same geometry; clipped boxes only prune)."""
    from tpurt.bvh.traverse import traverse
    mesh, cam = scene
    o, d = generate_rays(cam, 48, 32)
    ts = []
    for alpha in (None, 1e-4):
        bvh = build_sah_lbvh(mesh, leaf_size=8, spatial_alpha=alpha)
        t, tid = traverse(bvh, o, d)
        ts.append((np.asarray(t), np.asarray(tid)))
    (t0, id0), (t1, id1) = ts
    ok = np.isclose(t0, t1, rtol=1e-4, atol=1e-6) | \
        (np.isinf(t0) & np.isinf(t1))
    assert ok.mean() > 0.999
    both = np.isfinite(t0) & np.isfinite(t1) & ok
    assert (id0[both] == id1[both]).mean() > 0.995
