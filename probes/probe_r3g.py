"""Probe G: per-pass accel choice — closest-hit G-buffer + full frame on
object-SAH vs SBVH; decide whether the Renderer should keep two accels."""
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
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H, LEAF = 1920, 1080, 14
    cfg = RenderConfig(width=W, height=H, leaf_size=LEAF)
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    _, trace_any = make_tracers(cfg)
    light = Light.directional((0.25, 0.9, 0.2))

    accels = {}
    for name, alpha in (("sah3ax", None), ("sbvh", 1e-4)):
        t0 = time.perf_counter()
        b = build_sah_lbvh(host, LEAF, spatial_alpha=alpha)
        accels[name] = (jax.device_put(b), build_wide(jax.device_put(b)))
        log(f"{name}: host build {time.perf_counter()-t0:.2f}s "
            f"leaves={b.num_sorted_tris//LEAF}")

    gbuf = None
    for name, (b, w) in accels.items():
        # closest-hit gbuffer, with + without camera child ordering,
        # with + without shade table
        wo = jax.jit(order_children_for_point)(w, cam.position)
        st = jax.jit(make_shade_table)(b, mesh)
        for label, acc, table in ((f"{name}", wo, None),
                                  (f"{name}+table", wo, st)):
            if table is not None:
                gb = jax.jit(lambda a, m, c, t: gbuffer_pass(
                    lambda o, d: trace_closest_pallas(a, o, d,
                                                      return_sorted=True),
                    m, c, W, H, shade_table=t))
                gbs = jax.jit(lambda a, m, c, t: jnp.sum(jnp.where(
                    gb(a, m, c, t)["valid"], 1.0, 0.0)))
                tms = timed(lambda: gbs(acc, mesh, cam, st), 10) * 1e3
                if gbuf is None:
                    gbuf = gb(acc, mesh, cam, st)
            else:
                gb = jax.jit(lambda a, m, c: gbuffer_pass(
                    lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
                gbs = jax.jit(lambda a, m, c: jnp.sum(jnp.where(
                    gb(a, m, c)["valid"], 1.0, 0.0)))
                tms = timed(lambda: gbs(acc, mesh, cam), 10) * 1e3
            log(f"gbuffer {label}: {tms:.2f} ms")

    valid = int(np.asarray(gbuf["valid"]).sum())
    so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))(gbuf, light,
                                                accels["sbvh"][0])
    shade = jax.jit(lambda a, o, d, t: jnp.sum(
        trace_any(a, o, d, t).astype(jnp.int32)))
    for name, (b, w) in accels.items():
        t = timed(lambda: shade(w, so, sd, stm), 48)
        log(f"shadow {name}: {t*1e3:.2f} ms -> {valid/t/1e6:.1f} Mrays/s")
    log("probe_r3g done")


if __name__ == "__main__":
    main()
