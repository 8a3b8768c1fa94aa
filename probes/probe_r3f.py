"""Probe F: (1) trig-free soft kernel compile (tiny), (2) kernel-topology
build + fused rebuild timing, (3) SBVH G-buffer/frame numbers, (4) soft
kernel at Sponza scale vs XLA twin."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps, batches=4):
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
    from tpurt.app import make_tracers
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, widen_lbvh, count_wide,
                                round_up_bucket)
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import (trace_any_soft_pallas,
                                        trace_closest_pallas)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_pass, shadow_ray_batch
    from tpurt.scenes import (default_camera_for, sponza_interior_camera,
                              sponza_scene, teapot_scene)
    from tpurt.types import Light, RenderConfig

    # --- 1. tiny soft kernel (trig-free) ----------------------------------
    try:
        tm = jax.device_put(teapot_scene(1200))
        tb = build_lbvh(tm.vertices, tm.indices, leaf_size=8,
                        builder="search")
        tw = build_wide(tb)
        tc = default_camera_for(teapot_scene(1200))
        o, d = generate_rays(tc, 64, 64)
        t, tid = trace_closest_pallas(tw, o, d)
        valid = tid >= 0
        pos = o + d * jnp.where(valid, t, 0.0)[..., None]
        axis = jnp.asarray([0.45, 0.8, 0.3])
        axis = axis / jnp.linalg.norm(axis)
        f = jax.jit(lambda s: trace_any_soft_pallas(
            tw, pos + 1e-3 * axis, valid, axis, jnp.cos(0.05), 8, s))
        c = np.asarray(f(jnp.int32(7)))[np.asarray(valid)]
        c2 = np.asarray(f(jnp.int32(9)))[np.asarray(valid)]
        log(f"soft tiny: OK mean={c.mean():.3f} detdiff={(c != c2).mean():.3f} "
            f"distinct={np.unique(c)[:6]}")
    except Exception as e:  # noqa: BLE001
        log(f"soft tiny FAILED: {type(e).__name__}: {str(e)[:250]}")
        log("probe_r3f aborting soft-dependent steps")

    # --- 2. build with kernel topology ------------------------------------
    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    try:
        for b in ("search", "kernel"):
            bf = jax.jit(lambda v, i, b=b: jnp.sum(build_lbvh(
                v, i, leaf_size=LEAF, builder=b).nodes_box))
            t = timed(lambda: bf(mesh.vertices, mesh.indices), 10)
            log(f"build ({b} topo): {t*1e3:.2f} ms")
        bvh = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF,
                                              builder="search"))(
            mesh.vertices, mesh.indices)
        nw_pad = round_up_bucket(max(count_wide(bvh), 1))
        for b in ("search", "kernel"):
            reb = jax.jit(lambda v, i, b=b: jnp.sum(widen_lbvh(
                build_lbvh(v, i, leaf_size=LEAF, builder=b),
                nw_pad=nw_pad).nodes))
            t = timed(lambda: reb(mesh.vertices, mesh.indices), 10)
            log(f"fused rebuild ({b} topo): {t*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"build step FAILED: {type(e).__name__}: {str(e)[:250]}")

    # --- 3. SBVH production numbers ---------------------------------------
    cam = sponza_interior_camera()
    cfg = RenderConfig(width=1920, height=1080, leaf_size=LEAF)
    _, trace_any = make_tracers(cfg)
    light = Light.directional((0.25, 0.9, 0.2))
    sbvh = build_sah_lbvh(host, LEAF)     # now SBVH by default
    wide = build_wide(jax.device_put(sbvh))
    gb = jax.jit(lambda a, m, c: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d), m, c, 1920, 1080))
    gbuf = gb(wide, mesh, cam)
    valid = int(np.asarray(gbuf["valid"]).sum())
    gbs = jax.jit(lambda a, m, c: jnp.sum(jnp.where(
        gb(a, m, c)["valid"], 1.0, 0.0)))
    t = timed(lambda: gbs(wide, mesh, cam), 10)
    log(f"SBVH gbuffer ray-cast: {t*1e3:.2f} ms (valid {valid})")
    so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))(gbuf, light, sbvh)
    shade = jax.jit(lambda a, o, d, t: jnp.sum(
        trace_any(a, o, d, t).astype(jnp.int32)))
    t = timed(lambda: shade(wide, so, sd, stm), 48)
    log(f"SBVH shadow: {t*1e3:.2f} ms -> {valid/t/1e6/1e3*1e3:.1f} Mrays/s")

    # --- 4. soft kernel at scale ------------------------------------------
    try:
        sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
        soft = jax.jit(lambda a, g, s: jnp.sum(trace_any_soft_pallas(
            a, g["position"] + g["gnormal"] * 1e-3, g["valid"],
            jnp.asarray(sun.direction), jnp.cos(sun.angular_radius), 8, s)))
        t = timed(lambda: soft(wide, gbuf, jnp.int32(7)), 10)
        log(f"soft-KERNEL sponza spp=8 (SBVH): {t*1e3:.2f} ms -> "
            f"{valid*8/t/1e6:.1f} Mrays/s")
        sp8 = jax.jit(lambda a, g, k: jnp.sum(shadow_pass(
            lambda o, d, tm: trace_any(a, o, d, tm), g, sun, 8, k, 1e-3,
            scene_bounds=(sbvh.root_min, sbvh.root_max))))
        t = timed(lambda: sp8(wide, gbuf, jax.random.PRNGKey(1)), 10)
        log(f"soft-XLA sponza spp=8 (SBVH): {t*1e3:.2f} ms -> "
            f"{valid*8/t/1e6:.1f} Mrays/s")
    except Exception as e:  # noqa: BLE001
        log(f"soft scale FAILED: {type(e).__name__}: {str(e)[:250]}")
    log("probe_r3f done")


if __name__ == "__main__":
    main()
