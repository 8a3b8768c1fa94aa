"""Probe L: Sponza-scale — clip refit cost/quality, node-box leaf slots,
and reps=40 re-timing of the corners-in implicit rebuild.

Chained cheapest-compile-first per the axon protocol.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=40, batches=4):
    _force(fn())
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        _force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.clip_refit import make_clip_refit, refit_sbvh_wide
    from tpurt.bvh.implicit import (build_wide_implicit_corners,
                                    expand_corners)
    from tpurt.bvh.lbvh import build_lbvh, refit_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_lbvh, widen_from_plan, make_wide_plan,
                                order_children_for_point)
    from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    cfg = RenderConfig(width=1920, height=1080, use_pallas=True,
                       leaf_size=LEAF)

    t0 = time.perf_counter()
    sah = build_sah_lbvh(host, LEAF)
    log(f"native SBVH host build: {(time.perf_counter()-t0)*1e3:.0f} ms; "
        f"slots {sah.tri_v0.shape[0]}")
    sah = jax.device_put(sah)
    nw_pad = round_up_bucket(max(count_wide(sah), 1))

    t0 = time.perf_counter()
    plan = make_clip_refit(sah, nw_pad)
    log(f"clip plan precompute: {(time.perf_counter()-t0)*1e3:.0f} ms; "
        f"bary {plan.bary.shape}")
    plan = jax.device_put(plan)

    sbvh = build_wide(sah)
    sbvh_nb = build_wide(sah, from_node_boxes=True)

    # shared shadow rays off the static accel
    st0 = jax.jit(make_shade_table)(sah, mesh)
    gb = jax.jit(lambda a, mesh, cam, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True),
        mesh, cam, 1920, 1080, shade_table=st))
    gbuf = gb(order_children_for_point(sbvh, cam.position), mesh, cam, st0)
    valid = int(np.asarray(gbuf["valid"]).sum())
    rays = jax.jit(lambda gbuf, light, b: shadow_ray_batch(
        gbuf, light, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = rays(gbuf, light, sah)
    log(f"valid rays: {valid}")

    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))

    def shadow_ms(accel, label, reps=64):
        t = timed(lambda: shade(accel, so, sd, stm), reps)
        occ = int(shade(accel, so, sd, stm))
        log(f"shadow [{label}]: {t*1e3:.2f} ms -> "
            f"{valid/t/1e6:.1f} Mrays/s (occ {occ})")
        return t

    shadow_ms(sbvh, "sbvh tri-leafboxes")
    shadow_ms(sbvh_nb, "sbvh node-leafboxes")

    # --- implicit rebuild, reps=40 ---
    c0, c1, c2 = jax.jit(expand_corners)(mesh.vertices, mesh.indices)
    c0, c1, c2 = map(jax.device_put, (c0, c1, c2))
    g = jax.jit(lambda a, b, c: jnp.sum(build_wide_implicit_corners(
        a, b, c, leaf_size=LEAF).nodes))
    t = timed(lambda: g(c0, c1, c2), 40)
    log(f"implicit corners-in build (reps=40): {t*1e3:.2f} ms")

    kbvh = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(
        mesh.vertices, mesh.indices)
    k_pad = round_up_bucket(max(count_wide(kbvh), 1))
    karras_rebuild = jax.jit(lambda v, i: jnp.sum(widen_lbvh(
        build_lbvh(v, i, leaf_size=LEAF), nw_pad=k_pad).nodes))
    t = timed(lambda: karras_rebuild(mesh.vertices, mesh.indices), 40)
    log(f"karras fused rebuild (reps=40): {t*1e3:.2f} ms")

    # --- clip refit: fused corners-path program, reps=40 ---
    s0, s1, s2 = sah.tri_v0, sah.tri_e1, sah.tri_e2

    def deform_slots(a, t):
        ph = a[:, 1:2] * 2.0 + t
        return a + jnp.concatenate(
            [jnp.sin(ph) * 0.02, jnp.zeros_like(ph), jnp.cos(ph) * 0.02],
            axis=1)

    refit_fused = jax.jit(lambda b, s0, s1, s2, t: jnp.sum(refit_sbvh_wide(
        plan, b, deform_slots(s0, t), s1, s2)[0].nodes))
    t = timed(lambda: refit_fused(sah, s0, s1, s2, jnp.float32(0.0)), 40)
    log(f"clip refit fused (deform+refit+widen, reps=40): {t*1e3:.2f} ms")

    # quality: trace on clip-refit accel at t=0 (same geometry as static)
    refit_jit = jax.jit(lambda b, s0, s1, s2, t: refit_sbvh_wide(
        plan, b, deform_slots(s0, t), s1, s2)[0])
    acc_t0 = refit_jit(sah, s0, s1, s2, jnp.float32(0.0))
    shadow_ms(acc_t0, "clip-refit t=0")

    # quality: plain RMQ refit (full-tri leaf boxes) on the same topology
    wplan = jax.jit(make_wide_plan, static_argnames=("nw_pad",))(
        sah, nw_pad=nw_pad)
    plain = jax.jit(lambda b, v: widen_from_plan(
        wplan, refit_lbvh(b, v, None)))
    acc_plain = plain(sah, mesh.vertices)
    shadow_ms(acc_plain, "plain-refit t=0")

    t = timed(lambda: jnp.sum(plain(sah, mesh.vertices).nodes), 40)
    log(f"plain refit fused (gather path, reps=40): {t*1e3:.2f} ms")

    # deformed-quality check: both refits at a real deformation
    amp = jnp.float32(1.0)
    acc_d = refit_jit(sah, s0, s1, s2, amp)
    # occlusion parity vs a fresh implicit build of the deformed corners
    sd0 = deform_slots(s0, amp)
    occ_ref = shade(jax.jit(lambda a, b, c: build_wide_implicit_corners(
        a, b, c, leaf_size=LEAF))(sd0, s1, s2), so, sd, stm)
    occ_clip = shade(acc_d, so, sd, stm)
    log(f"deformed occlusion: clip-refit {int(occ_clip)} vs fresh-build "
        f"{int(occ_ref)}")
    shadow_ms(acc_d, "clip-refit deformed")
    log("probe_r3l done")


if __name__ == "__main__":
    main()
