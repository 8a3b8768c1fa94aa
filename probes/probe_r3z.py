"""Round-3 probe Z: fused primary+shadow kernel on the real TPU.

Measures, Sponza 1080p SBVH:
  1. plain closest-hit kernel consume (phase-1 baseline, cached compile)
  2. separate production sequence: gbuffer (merged shade fetch) +
     shadow_production (raygen + any-hit)      [cached compiles]
  3. frame[ray]                                 [cached]
  4. fused kernel consume (NEW Mosaic compile — LAST per the axon
     compile-service protocol)
  5. frame[ray + fused_shadow]
Decision: flip RenderConfig.fused_shadow's default / the auto G-buffer
policy to whichever frame wins.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=32, batches=4):
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
    import dataclasses

    from tpurt.app import render_frame_fn
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import (trace_closest_pallas,
                                        trace_closest_shadow_pallas)
    from tpurt.passes.shading import make_shade_table, make_shade_table_orig
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    sbvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(build_wide(sbvh))
    acc = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    st = jax.jit(make_shade_table)(sbvh, mesh)
    st_orig = jax.jit(make_shade_table_orig)(mesh)
    key = jax.random.PRNGKey(0)
    o, d = generate_rays(cam, W, H)

    # 1. plain closest kernel (cached)
    cl = jax.jit(lambda a, o, d: jnp.sum(jnp.where(jnp.isfinite(
        trace_closest_pallas(a, o, d, return_sorted=True,
                             gather_tri_id=False)[0]), 1.0, 0.0)))
    t = timed(lambda: cl(acc, o, d), reps=16)
    log(f"closest kernel consume: {t*1e3:.2f} ms")

    # 3. frame[ray] (cached)
    cfg = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray")
    fr = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
        a, m, c, (light,), k, cfg, shade_table=s,
        shade_table_orig=so)["image"]))
    t = timed(lambda: fr(wide, mesh, cam, key, st, st_orig), reps=16)
    log(f"frame[ray]: {t*1e3:.2f} ms")

    # 4. fused kernel alone (NEW compile — last kernel family)
    fu = jax.jit(lambda a, o, d: jnp.sum(trace_closest_shadow_pallas(
        a, o, d, jnp.asarray(light.direction, jnp.float32),
        1e-3)[2].astype(jnp.int32)))
    t = timed(lambda: fu(acc, o, d), reps=16)
    log(f"fused closest+shadow kernel consume: {t*1e3:.2f} ms")

    # 5. frame[ray + fused]
    cfgf = dataclasses.replace(cfg, fused_shadow=True)
    frf = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
        a, m, c, (light,), k, cfgf, shade_table=s,
        shade_table_orig=so)["image"]))
    t = timed(lambda: frf(wide, mesh, cam, key, st, st_orig), reps=16)
    log(f"frame[ray+fused]: {t*1e3:.2f} ms")

    # 6. fused closest+SOFT kernel (NEWEST compile — very last): the
    # config-3 frame analogue. Compare against gbuffer + standalone soft
    # kernel (soft_spp8 numbers in bench).
    try:
        from tpurt.kernels.traverse import trace_closest_soft_shadow_pallas
        sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
        fs = jax.jit(lambda a, o, d: jnp.sum(trace_closest_soft_shadow_pallas(
            a, o, d, jnp.asarray(sun.direction, jnp.float32),
            jnp.cos(sun.angular_radius), 8, 7, 1e-3)[2]))
        t = timed(lambda: fs(acc, o, d), reps=8)
        log(f"fused closest+soft(spp=8) kernel consume: {t*1e3:.2f} ms")
        cfgs = dataclasses.replace(cfg, spp=8, fused_shadow=True)
        frs = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
            a, m, c, (sun,), k, cfgs, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: frs(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[soft spp=8, fused]: {t*1e3:.2f} ms")
        cfgs0 = dataclasses.replace(cfg, spp=8)
        frs0 = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
            a, m, c, (sun,), k, cfgs0, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: frs0(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[soft spp=8, unfused]: {t*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"fused soft FAILED: {type(e).__name__}: {str(e)[:200]}")

    # 7. multi-light fused kernel (NEWEST compile — after soft): 4K
    # 2-directional-light workload, fused N-shadow frame vs the unfused
    # and light0-only-fused frames (the bench multi_light_4k analogue).
    try:
        W4, H4 = 3840, 2160
        lights2 = (light, Light.directional((-0.4, 0.8, 0.3),
                                            color=(0.4, 0.4, 0.5)))
        cfg4 = dataclasses.replace(cfg, width=W4, height=H4)
        fr2 = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
            a, m, c, lights2, k, cfg4, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: fr2(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[4k 2-light, unfused]: {t*1e3:.2f} ms")
        cfg4f = dataclasses.replace(cfg4, fused_shadow=True)
        fr2f = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
            a, m, c, lights2, k, cfg4f, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: fr2f(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[4k 2-light, multi-fused]: {t*1e3:.2f} ms")
        pf = jax.jit(lambda a, m, c, k2, s_, so: render_frame_fn(
            a, m, c, lights2, k2, cfg4, shade_table=s_,
            shade_table_orig=so)["image"])
        a4 = pf(wide, mesh, cam, key, st, st_orig)
        pff = jax.jit(lambda a, m, c, k2, s_, so: render_frame_fn(
            a, m, c, lights2, k2, cfg4f, shade_table=s_,
            shade_table_orig=so)["image"])
        b4 = pff(wide, mesh, cam, key, st, st_orig)
        diff4 = np.abs(np.asarray(a4) - np.asarray(b4)).max(axis=-1)
        log(f"4k 2-light multi-fused diff >1e-3: {(diff4 > 1e-3).mean():.2e}")
        del a4, b4
    except Exception as e:  # noqa: BLE001
        log(f"multi-light fused FAILED: {type(e).__name__}: {str(e)[:200]}")

    # 8. point-light penumbra in-kernel disk sampling (VERY LAST — newest
    # Mosaic compile): the incoherent-workload fusion answer. 1080p spp=4
    # kernel vs the XLA scan (shadow_pass fallback).
    try:
        from tpurt.kernels.traverse import trace_any_point_soft_pallas
        from tpurt.passes.shadow import shadow_pass, shadow_ray_batch
        ctr = 0.5 * (np.asarray(sbvh.root_min) + np.asarray(sbvh.root_max))
        plight = Light.point(ctr + np.float32([0.0, 4.0, 0.0]), radius=1.5)
        # Build a gbuf once via the plain closest kernel.
        tt, _tid, ss = trace_closest_pallas(acc, o, d, return_sorted=True,
                                            gather_tri_id=False)
        valid = ss >= 0
        pos = o + d * jnp.where(valid, tt, 0.0)[..., None]
        up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        gbuf = {"position": pos,
                "gnormal": jnp.broadcast_to(up, pos.shape), "valid": valid}
        gbuf = jax.device_put(jax.tree.map(np.asarray, gbuf))
        spp = 4

        def scan_run(a, g, key):
            # accel enters as an ARGUMENT (closure capture would bake the
            # ~20 MB accel into the program as constants).
            def sample(acc_, s):
                u = jax.random.uniform(jax.random.fold_in(key, s),
                                       (g["valid"].shape[0],
                                        g["valid"].shape[1], 2))
                so, sd, stm = shadow_ray_batch(g, plight, 1e-3, u)
                from tpurt.kernels.traverse import trace_any_pallas
                occ = trace_any_pallas(a, so, sd, stm)
                return acc_ + jnp.sum(occ.astype(jnp.int32)), None
            a2, _ = jax.lax.scan(sample, jnp.int32(0), jnp.arange(spp))
            return a2
        fscan = jax.jit(scan_run)
        t = timed(lambda: fscan(acc, gbuf, jax.random.PRNGKey(5)), reps=4)
        log(f"penumbra 1080p spp=4 XLA scan: {t*1e3:.2f} ms")

        def krun(a, g):
            o2 = g["position"] + g["gnormal"] * 1e-3
            return jnp.sum(trace_any_point_soft_pallas(
                a, o2, g["valid"],
                jnp.asarray(plight.position, jnp.float32),
                jnp.asarray(plight.radius, jnp.float32), spp, 5))
        fk = jax.jit(krun)
        t = timed(lambda: fk(acc, gbuf), reps=4)
        log(f"penumbra 1080p spp=4 IN-KERNEL: {t*1e3:.2f} ms")

        # Fused closest+psoft frame (newest compile of all).
        cfgp = dataclasses.replace(cfg, spp=spp)
        frp0 = jax.jit(lambda a, m, c, k2, s, so: jnp.sum(render_frame_fn(
            a, m, c, (plight,), k2, cfgp, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: frp0(wide, mesh, cam, key, st, st_orig), reps=4)
        log(f"frame[point spp=4, unfused]: {t*1e3:.2f} ms")
        cfgpf = dataclasses.replace(cfgp, fused_shadow=True)
        frpf = jax.jit(lambda a, m, c, k2, s, so: jnp.sum(render_frame_fn(
            a, m, c, (plight,), k2, cfgpf, shade_table=s,
            shade_table_orig=so)["image"]))
        t = timed(lambda: frpf(wide, mesh, cam, key, st, st_orig), reps=4)
        log(f"frame[point spp=4, FUSED psoft]: {t*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"point-soft FAILED: {type(e).__name__}: {str(e)[:200]}")

    # 9. mixed fused kernel (soft sun + hard fill, THE newest compile):
    # the config-3-with-fill-light frame, one dispatch.
    try:
        sun2 = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
        fill = Light.directional((-0.4, 0.8, 0.3), color=(0.4, 0.4, 0.5))
        cfgm = dataclasses.replace(cfg, spp=8)
        fm0 = jax.jit(lambda a, m, c, k2, s_, so: jnp.sum(render_frame_fn(
            a, m, c, (sun2, fill), k2, cfgm, shade_table=s_,
            shade_table_orig=so)["image"]))
        t = timed(lambda: fm0(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[soft spp=8 + fill, unfused]: {t*1e3:.2f} ms")
        cfgmf = dataclasses.replace(cfgm, fused_shadow=True)
        fmf = jax.jit(lambda a, m, c, k2, s_, so: jnp.sum(render_frame_fn(
            a, m, c, (sun2, fill), k2, cfgmf, shade_table=s_,
            shade_table_orig=so)["image"]))
        t = timed(lambda: fmf(wide, mesh, cam, key, st, st_orig), reps=8)
        log(f"frame[soft spp=8 + fill, MIXED-fused]: {t*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"mixed fused FAILED: {type(e).__name__}: {str(e)[:200]}")

    # Parity spot check on hardware.
    pa = jax.jit(lambda a, m, c, k2, s_, so: render_frame_fn(
        a, m, c, (light,), k2, cfg, shade_table=s_,
        shade_table_orig=so)["image"])
    a_img = pa(wide, mesh, cam, key, st, st_orig)
    pb = jax.jit(lambda a, m, c, k2, s_, so: render_frame_fn(
        a, m, c, (light,), k2, cfgf, shade_table=s_,
        shade_table_orig=so)["image"])
    b_img = pb(wide, mesh, cam, key, st, st_orig)
    diff = np.abs(np.asarray(a_img) - np.asarray(b_img)).max(axis=-1)
    log(f"frame diff >1e-3: {(diff > 1e-3).mean():.2e}")
    log("probe_r3z done")


if __name__ == "__main__":
    main()
