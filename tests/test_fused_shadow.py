"""Fused primary+shadow kernel parity (kernels/traverse.py
trace_closest_shadow_pallas; tpurt/app.py fused frame path).

The fused kernel must (a) reproduce the plain closest-hit kernel's hit set
exactly — phase 1 is the same walk — and (b) reproduce the production
shadow pipeline (gbuffer gnormal flip -> normal-offset bias -> scene-exit
cap -> any-hit trace) up to float-associativity noise at shadow-boundary
pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.lbvh import build_lbvh
from tpurt.bvh.wide import build_wide, order_children_for_point
from tpurt.camera import generate_rays
from tpurt.kernels.traverse import (trace_any_pallas, trace_closest_pallas,
                                    trace_closest_shadow_pallas)
from tpurt.passes.shading import make_shade_table, shade_from_table
from tpurt.passes.shadow import shadow_ray_batch
from tpurt.scenes import default_camera_for, teapot_scene
from tpurt.types import Light, RenderConfig

LIGHT = Light.directional((0.45, 0.8, 0.3))


@pytest.fixture(scope="module")
def scene():
    mesh = teapot_scene(1500)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=8)
    wide = build_wide(bvh)
    cam = default_camera_for(mesh)
    return mesh, bvh, wide, cam


@pytest.mark.slow
def test_fused_matches_separate_passes(scene):
    mesh, bvh, wide, cam = scene
    o, d = generate_rays(cam, 64, 48)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    t_f, sidx_f, occ_f = trace_closest_shadow_pallas(
        acc, o, d, jnp.asarray(LIGHT.direction), 1e-3, interpret=True)
    # Phase 1 must match the plain closest kernel bit-for-bit.
    t_r, _tid, sidx_r = trace_closest_pallas(
        acc, o, d, return_sorted=True, gather_tri_id=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_f), np.asarray(sidx_r))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_r))

    # Phase 2 vs the production raygen + any-hit trace.
    valid = sidx_r >= 0
    st = jax.jit(make_shade_table)(bvh, mesh)
    rows = st[jnp.clip(sidx_r, 0, st.shape[0] - 1)]
    t_safe = jnp.where(valid, t_r, 0.0)
    pos = o + d * t_safe[..., None]
    attrs = shade_from_table(rows, pos, valid)
    facing = jnp.sign(-jnp.sum(attrs["gnormal"] * d, axis=-1, keepdims=True))
    gn = attrs["gnormal"] * jnp.where(facing == 0, 1.0, facing)
    gbuf = {"position": pos, "gnormal": gn, "valid": valid}
    so, sd, stm = shadow_ray_batch(gbuf, LIGHT, 1e-3, None,
                                   scene_bounds=(bvh.root_min, bvh.root_max))
    occ_ref = trace_any_pallas(wide, so, sd, stm, interpret=True)
    validn = np.asarray(valid)
    mism = (np.asarray(occ_f) != np.asarray(occ_ref)) & validn
    # Bias-origin fp noise can flip pixels sitting exactly on a shadow
    # boundary; anything beyond a trace amount is a real bug.
    assert mism.mean() <= 1e-3, f"{mism.sum()} mismatched shadow pixels"
    # Sky lanes must be unoccluded.
    assert not np.asarray(occ_f)[~validn].any()


def test_fused_frame_matches_unfused(scene):
    mesh, bvh, wide, cam = scene
    from tpurt.app import fused_shadow_applicable, render_frame_fn
    st = jax.jit(make_shade_table)(bvh, mesh)
    key = jax.random.PRNGKey(0)
    imgs = {}
    for fused in (False, True):
        cfg = RenderConfig(width=64, height=32, use_pallas=True, leaf_size=8,
                           gbuffer="ray", fused_shadow=fused)
        assert fused_shadow_applicable(cfg, wide, (LIGHT,)) == fused
        out = render_frame_fn(wide, mesh, cam, (LIGHT,), key, cfg,
                              shade_table=st)
        imgs[fused] = np.asarray(out["image"])
    diff = np.abs(imgs[True] - imgs[False]).max(axis=-1)
    assert (diff > 1e-3).mean() <= 2e-3


@pytest.mark.slow
def test_fused_point_light_matches_separate(scene):
    # Slow tier (round-5 re-tier): ~22 s of interpret-mode penumbra
    # kernel; the fused-frame and multi-light parity tests keep the
    # fusion machinery in the fast signal.
    """Hard point-light mode: per-lane directions and the light-distance
    t cap derived in-kernel must match the production point path."""
    mesh, bvh, wide, cam = scene
    ctr = np.asarray(0.5 * (np.asarray(bvh.root_min)
                            + np.asarray(bvh.root_max)))
    lpos = ctr + np.float32([0.2, 1.5, 0.3]) * np.asarray(
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min))
    plight = Light.point(lpos)
    o, d = generate_rays(cam, 64, 48)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    t_f, sidx_f, occ_f = trace_closest_shadow_pallas(
        acc, o, d, jnp.asarray(plight.direction), 1e-3,
        light_pos=jnp.asarray(plight.position), interpret=True)
    t_r, _tid, sidx_r = trace_closest_pallas(
        acc, o, d, return_sorted=True, gather_tri_id=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_f), np.asarray(sidx_r))
    valid = sidx_r >= 0
    st = jax.jit(make_shade_table)(bvh, mesh)
    rows = st[jnp.clip(sidx_r, 0, st.shape[0] - 1)]
    t_safe = jnp.where(valid, t_r, 0.0)
    pos = o + d * t_safe[..., None]
    attrs = shade_from_table(rows, pos, valid)
    facing = jnp.sign(-jnp.sum(attrs["gnormal"] * d, axis=-1, keepdims=True))
    gn = attrs["gnormal"] * jnp.where(facing == 0, 1.0, facing)
    gbuf = {"position": pos, "gnormal": gn, "valid": valid}
    so, sd, stm = shadow_ray_batch(gbuf, plight, 1e-3, None)
    occ_ref = trace_any_pallas(wide, so, sd, stm, interpret=True)
    validn = np.asarray(valid)
    mism = (np.asarray(occ_f) != np.asarray(occ_ref)) & validn
    assert mism.mean() <= 1e-3, f"{mism.sum()} mismatched shadow pixels"
    assert not np.asarray(occ_f)[~validn].any()


@pytest.mark.slow
def test_fused_soft_zero_rng_matches_hard(scene):
    """Fused closest+soft kernel in TPU-interpret mode: the zero PRNG
    stream degenerates every cone sample to the axis, so counts must be
    exactly spp x the fused HARD kernel's occlusion, with an identical
    phase-1 hit set."""
    mesh, bvh, wide, cam = scene
    from tpurt.kernels.traverse import trace_closest_soft_shadow_pallas
    sun = Light.sun((0.45, 0.8, 0.3), angular_radius_deg=2.5)
    o, d = generate_rays(cam, 64, 32)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    spp = 4
    t_s, sidx_s, counts = trace_closest_soft_shadow_pallas(
        acc, o, d, jnp.asarray(sun.direction), jnp.cos(sun.angular_radius),
        spp, 7, 1e-3, interpret=True)
    t_h, sidx_h, occ_h = trace_closest_shadow_pallas(
        acc, o, d, jnp.asarray(sun.direction), 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_s), np.asarray(sidx_h))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_h))
    np.testing.assert_array_equal(
        np.asarray(counts), spp * np.asarray(occ_h).astype(np.int32))


@pytest.mark.slow
def test_fused_sharded_matches_unsharded(scene):
    """--shard path: the fused kernel under shard_map on the fake
    8-device mesh must match the single-device fused frame."""
    mesh, bvh, wide, cam = scene
    from tpurt.app import render_frame_fn
    from tpurt.parallel.tiling import (device_put_replicated, make_tile_mesh,
                                       render_frame_sharded)
    st = jax.jit(make_shade_table)(bvh, mesh)
    key = jax.random.PRNGKey(0)
    cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=8,
                       gbuffer="ray", fused_shadow=True)
    ref = np.asarray(render_frame_fn(wide, mesh, cam, (LIGHT,), key, cfg,
                                     shade_table=st)["image"])
    dev_mesh = make_tile_mesh(jax.devices()[:8])
    widr = device_put_replicated(wide, dev_mesh)
    meshr = device_put_replicated(mesh, dev_mesh)
    str_ = device_put_replicated(st, dev_mesh)
    img = np.asarray(render_frame_sharded(widr, meshr, cam, (LIGHT,), key,
                                          cfg, mesh=dev_mesh,
                                          shade_table=str_))
    diff = np.abs(img - ref).max(axis=-1)
    assert (diff > 1e-3).mean() <= 2e-3


@pytest.mark.slow
def test_fused_multi_light_frame_matches_unfused(scene):
    """An all-hard multi-light set takes the N-light fused kernel
    (fused_multi_applicable); the composite must match the fully-unfused
    frame."""
    mesh, bvh, wide, cam = scene
    from tpurt.app import fused_multi_applicable, render_frame_fn
    st = jax.jit(make_shade_table)(bvh, mesh)
    key = jax.random.PRNGKey(1)
    ctr = 0.5 * (np.asarray(bvh.root_min) + np.asarray(bvh.root_max))
    lpos = ctr + np.float32([0.2, 1.5, 0.3]) * (
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min))
    lights = (LIGHT,
              Light.directional((-0.5, 0.7, 0.2), color=(0.4, 0.4, 0.5)),
              Light.point(lpos, color=(0.3, 0.25, 0.2)))
    imgs = {}
    for fused in (False, True):
        cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=8,
                           gbuffer="ray", fused_shadow=fused)
        assert fused_multi_applicable(cfg, wide, lights) == fused
        out = render_frame_fn(wide, mesh, cam, lights, key, cfg,
                              shade_table=st)
        imgs[fused] = np.asarray(out["image"])
    diff = np.abs(imgs[True] - imgs[False]).max(axis=-1)
    assert (diff > 1e-3).mean() <= 2e-3


@pytest.mark.slow
def test_multi_kernel_matches_single_fused_per_light(scene):
    """The N-light kernel must reproduce the single-light fused kernel
    bit-for-bit per light: identical phase-1 hit set, and each occ bit
    equal to the corresponding single-light run (same in-register raygen
    recipe, so no tolerance needed)."""
    mesh, bvh, wide, cam = scene
    from tpurt.kernels.traverse import trace_closest_multi_shadow_pallas
    ctr = 0.5 * (np.asarray(bvh.root_min) + np.asarray(bvh.root_max))
    lpos = jnp.asarray(ctr + np.float32([0.2, 1.5, 0.3]) * (
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min)), jnp.float32)
    ld0 = jnp.asarray(LIGHT.direction, jnp.float32)
    ld1 = jnp.asarray(Light.directional((-0.5, 0.7, 0.2)).direction,
                      jnp.float32)
    o, d = generate_rays(cam, 64, 48)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    t_m, sidx_m, occm = trace_closest_multi_shadow_pallas(
        acc, o, d, [(ld0, None), (ld1, None), (None, lpos)], 1e-3,
        interpret=True)
    singles = [
        trace_closest_shadow_pallas(acc, o, d, ld0, 1e-3, interpret=True),
        trace_closest_shadow_pallas(acc, o, d, ld1, 1e-3, interpret=True),
        trace_closest_shadow_pallas(acc, o, d, ld0, 1e-3, light_pos=lpos,
                                    interpret=True),
    ]
    np.testing.assert_array_equal(np.asarray(sidx_m),
                                  np.asarray(singles[0][1]))
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(singles[0][0]))
    occm = np.asarray(occm)
    for li, (_, _, occ_s) in enumerate(singles):
        np.testing.assert_array_equal((occm >> li) & 1,
                                      np.asarray(occ_s).astype(np.int32),
                                      err_msg=f"light {li}")


@pytest.mark.slow
def test_fused_multi_sharded_matches_unsharded(scene):
    """--shard path with an all-hard 2-light set: the N-light fused
    kernel under shard_map must match the single-device fused frame."""
    mesh, bvh, wide, cam = scene
    from tpurt.app import render_frame_fn
    from tpurt.parallel.tiling import (device_put_replicated, make_tile_mesh,
                                       render_frame_sharded)
    st = jax.jit(make_shade_table)(bvh, mesh)
    key = jax.random.PRNGKey(0)
    lights = (LIGHT, Light.directional((-0.5, 0.7, 0.2),
                                       color=(0.4, 0.4, 0.5)))
    cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=8,
                       gbuffer="ray", fused_shadow=True)
    ref = np.asarray(render_frame_fn(wide, mesh, cam, lights, key, cfg,
                                     shade_table=st)["image"])
    dev_mesh = make_tile_mesh(jax.devices()[:8])
    widr = device_put_replicated(wide, dev_mesh)
    meshr = device_put_replicated(mesh, dev_mesh)
    str_ = device_put_replicated(st, dev_mesh)
    img = np.asarray(render_frame_sharded(widr, meshr, cam, lights, key,
                                          cfg, mesh=dev_mesh,
                                          shade_table=str_))
    diff = np.abs(img - ref).max(axis=-1)
    assert (diff > 1e-3).mean() <= 2e-3


@pytest.mark.slow
def test_fused_point_soft_zero_rng_matches_hard(scene):
    """Fused closest+point-penumbra kernel in TPU-interpret mode: the zero
    PRNG stream puts every disk sample at the light center, so counts must
    equal spp x the fused HARD point kernel's occlusion (same in-register
    raygen, so bit-exact), with an identical phase-1 hit set."""
    mesh, bvh, wide, cam = scene
    from tpurt.kernels.traverse import trace_closest_point_soft_shadow_pallas
    ctr = 0.5 * (np.asarray(bvh.root_min) + np.asarray(bvh.root_max))
    lpos = jnp.asarray(ctr + np.float32([0.2, 1.5, 0.3]) * (
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min)), jnp.float32)
    o, d = generate_rays(cam, 64, 32)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    spp = 4
    t_s, sidx_s, counts = trace_closest_point_soft_shadow_pallas(
        acc, o, d, lpos, jnp.float32(0.4), spp, 7, 1e-3, interpret=True)
    t_h, sidx_h, occ_h = trace_closest_shadow_pallas(
        acc, o, d, jnp.asarray(LIGHT.direction), 1e-3, light_pos=lpos,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_s), np.asarray(sidx_h))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_h))
    np.testing.assert_array_equal(
        np.asarray(counts), spp * np.asarray(occ_h).astype(np.int32))


@pytest.mark.slow
def test_fused_point_soft_frame_matches_scan(scene):
    """Point light at spp>1: on CPU-interpret the applicability gate must
    REJECT psoft fusion (zero PRNG stream). The fused production's raygen
    plumbing is still checked end-to-end by forcing it with radius=0,
    where the zero-stream disk degenerates to the light center and must
    match the production scan path (whose jitter is also degenerate at
    radius 0) up to shadow-boundary fp noise."""
    mesh, bvh, wide, cam = scene
    from tpurt.app import (fused_shadow_applicable,
                           gbuffer_production,
                           gbuffer_shadow_fused_production,
                           shadow_production)
    ctr = 0.5 * (np.asarray(bvh.root_min) + np.asarray(bvh.root_max))
    lpos = ctr + np.float32([0.2, 1.5, 0.3]) * (
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min))
    cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=8,
                       gbuffer="ray", fused_shadow=True, spp=4)
    # On this CPU box the compiled-backend gate must reject psoft fusion.
    assert not fused_shadow_applicable(cfg, wide,
                                       (Light.point(lpos, radius=0.4),))
    plight0 = Light.point(lpos, radius=0.0)
    st = jax.jit(make_shade_table)(bvh, mesh)
    key = jax.random.PRNGKey(3)
    gbuf_f, vis_f = gbuffer_shadow_fused_production(
        wide, mesh, cam, cfg, plight0, st, key=key)
    gbuf_r = gbuffer_production(wide, mesh, cam, cfg, st)
    vis_r = shadow_production(wide, gbuf_r, plight0, key, cfg)
    v = np.asarray(gbuf_f["valid"])
    np.testing.assert_array_equal(v, np.asarray(gbuf_r["valid"]))
    mism = (np.abs(np.asarray(vis_f) - np.asarray(vis_r)) > 1e-6) & v
    assert mism.mean() <= 1e-3, f"{mism.sum()} mismatched pixels"


@pytest.mark.slow
def test_fused_soft_multi_zero_rng_matches_singles(scene):
    """Mixed fused kernel (soft light 0 + hard directional extras) in
    TPU-interpret mode: the zero PRNG stream degenerates light-0 cone
    samples to the axis (and disk samples to the light center), so counts
    must equal spp x the single-light fused HARD run, and each extra
    light's occ bit must match its own single-light fused run bit-for-bit
    — with the shared phase-1 hit set."""
    mesh, bvh, wide, cam = scene
    from tpurt.kernels.traverse import trace_closest_soft_multi_shadow_pallas
    o, d = generate_rays(cam, 64, 32)
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    spp = 4
    sun = Light.sun((0.45, 0.8, 0.3), angular_radius_deg=2.5)
    ld1 = jnp.asarray(Light.directional((-0.5, 0.7, 0.2)).direction,
                      jnp.float32)
    ld2 = jnp.asarray(Light.directional((0.1, 0.9, -0.4)).direction,
                      jnp.float32)

    # cone light 0 + two hard extras
    t_m, sidx_m, counts, occm = trace_closest_soft_multi_shadow_pallas(
        acc, o, d,
        ("cone", jnp.asarray(sun.direction), jnp.cos(sun.angular_radius)),
        [ld1, ld2], spp, 7, 1e-3, interpret=True)
    t_h, sidx_h, occ0 = trace_closest_shadow_pallas(
        acc, o, d, jnp.asarray(sun.direction), 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_m), np.asarray(sidx_h))
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_h))
    np.testing.assert_array_equal(
        np.asarray(counts), spp * np.asarray(occ0).astype(np.int32))
    occm = np.asarray(occm)
    for i, ld in enumerate([ld1, ld2]):
        _, _, occ_s = trace_closest_shadow_pallas(acc, o, d, ld, 1e-3,
                                                  interpret=True)
        np.testing.assert_array_equal((occm >> i) & 1,
                                      np.asarray(occ_s).astype(np.int32),
                                      err_msg=f"extra {i}")

    # disk light 0 + one hard extra
    ctr = 0.5 * (np.asarray(bvh.root_min) + np.asarray(bvh.root_max))
    lpos = jnp.asarray(ctr + np.float32([0.2, 1.5, 0.3]) * (
        np.asarray(bvh.root_max) - np.asarray(bvh.root_min)), jnp.float32)
    t_m, sidx_m, counts, occm = trace_closest_soft_multi_shadow_pallas(
        acc, o, d, ("disk", lpos, jnp.float32(0.4)), [ld1], spp, 7, 1e-3,
        interpret=True)
    t_h, sidx_h, occ0 = trace_closest_shadow_pallas(
        acc, o, d, ld1, 1e-3, light_pos=lpos, interpret=True)
    np.testing.assert_array_equal(np.asarray(sidx_m), np.asarray(sidx_h))
    np.testing.assert_array_equal(
        np.asarray(counts), spp * np.asarray(occ0).astype(np.int32))
    _, _, occ1 = trace_closest_shadow_pallas(acc, o, d, ld1, 1e-3,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(occm) & 1,
                                  np.asarray(occ1).astype(np.int32))


def test_fused_soft_multi_gate(scene):
    """The mixed path requires a compiled backend (zero-stream interpret
    PRNG would silently harden the penumbra) — on this CPU box the gate
    must reject, and reject non-directional extras everywhere."""
    mesh, bvh, wide, cam = scene
    from tpurt.app import fused_soft_multi_applicable
    sun = Light.sun((0.45, 0.8, 0.3), angular_radius_deg=2.5)
    fill = Light.directional((-0.5, 0.7, 0.2))
    cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=8,
                       gbuffer="ray", fused_shadow=True, spp=4)
    assert not fused_soft_multi_applicable(cfg, wide, (sun, fill))


@pytest.mark.slow
def test_fused_attr_paths_match_table_paths(scene):
    """Every fused kernel family with attr tables (zero-gather fused
    frame) must match its shade-table twin up to the barycentric source
    (kernel-exact u/v vs position-rederived: ~4e-6 in image space), and
    the fused-attr frame must be bit-exact vs the unfused attr frame."""
    from tpurt.app import render_frame_fn
    from tpurt.passes.shading import make_leaf_attr_rows
    mesh, bvh, wide, cam = scene
    st = make_shade_table(bvh, mesh)
    at = make_leaf_attr_rows(bvh, mesh)
    key = jax.random.PRNGKey(0)
    W, H = 64, 32      # 2 packets: six full interpret frames ride this
    l2 = Light.directional((-0.5, 0.7, 0.2), color=(0.5, 0.5, 0.6))
    ctr = 0.5 * (np.asarray(mesh.vertices).min(0)
                 + np.asarray(mesh.vertices).max(0))
    lp = Light.point(ctr + np.float32([0.5, 3.0, 0.5]), radius=0.4)
    cfg_f = RenderConfig(width=W, height=H, use_pallas=True, leaf_size=8,
                         gbuffer="ray", fused_shadow=True)
    cfg_u = RenderConfig(width=W, height=H, use_pallas=True, leaf_size=8,
                         gbuffer="ray")
    cfg_s = RenderConfig(width=W, height=H, spp=4, use_pallas=True,
                         leaf_size=8, gbuffer="ray", fused_shadow=True)

    def run(cfg, lights, **kw):
        return np.asarray(render_frame_fn(wide, mesh, cam, lights, key,
                                          cfg, **kw)["image"])

    # Multi-light hard fused (covers the single-light kernel's phase-2
    # recipe as a special case) + unfused-attr bit-exactness. Tolerance
    # covers the 12-bit oct quantization of the attr rows' smooth
    # normals (N.L shifts ~1e-3) on top of the barycentric source.
    am = run(cfg_f, (LIGHT, l2), shade_table=st, attr_tables=at)
    bm = run(cfg_f, (LIGHT, l2), shade_table=st)
    assert np.abs(am - bm).max() < 5e-3
    a1 = run(cfg_f, (LIGHT,), shade_table=st, attr_tables=at)
    c1 = run(cfg_u, (LIGHT,), attr_tables=at)
    np.testing.assert_array_equal(a1, c1)
    # Point penumbra fused (zero-stream interpret = hard point shadows).
    ap = run(cfg_s, (lp,), shade_table=st, attr_tables=at)
    bp = run(cfg_s, (lp,), shade_table=st)
    assert np.abs(ap - bp).max() < 5e-3
