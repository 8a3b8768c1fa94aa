"""Round-3 probe U: trace-side levers on the static SBVH accel —
collapse frontier modes (fixed/bfs/area) x any-hit child ordering
(none/area) for the 1080p shadow trace, plus the closest-hit G-buffer
kernel on each. Same traversal kernel family (known-good Mosaic ops);
different num_wide buckets only."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=48, batches=4):
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
    from tpurt.bvh.wide import (build_wide, order_children_by_area,
                                order_children_for_point)
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H, LEAF = 1920, 1080, 14
    cfg = RenderConfig(width=W, height=H, leaf_size=LEAF)
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    _, trace_any = make_tracers(cfg)

    sbvh = jax.device_put(build_sah_lbvh(host_mesh, LEAF))
    log("sbvh built")

    wides = {}
    for mode in ("fixed", "bfs", "area"):
        try:
            wides[mode] = build_wide(sbvh, from_node_boxes=True, mode=mode)
            log(f"collapse {mode}: num_wide={wides[mode].num_wide}")
        except Exception as e:  # noqa: BLE001
            log(f"collapse {mode} FAILED: {type(e).__name__}: {str(e)[:160]}")

    # Shared G-buffer (fixed-mode accel) for shadow-ray generation.
    w0 = order_children_for_point(wides["fixed"], cam.position)
    gb = jax.jit(lambda a, m, c: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
    gbuf = gb(w0, mesh, cam)
    valid = int(np.asarray(gbuf["valid"]).sum())
    so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))(gbuf, light, sbvh)
    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any(a, o, d, tm).astype(jnp.int32)))

    for mode, wacc in wides.items():
        try:
            t = timed(lambda: shade(wacc, so, sd, stm))
            log(f"shadow {mode}/unordered: {t*1e3:.2f} ms "
                f"-> {valid/t/1e6:.1f} Mrays/s")
            wa = jax.jit(order_children_by_area)(wacc)
            t = timed(lambda: shade(wa, so, sd, stm))
            log(f"shadow {mode}/area-ordered: {t*1e3:.2f} ms "
                f"-> {valid/t/1e6:.1f} Mrays/s")
        except Exception as e:  # noqa: BLE001
            log(f"shadow {mode} FAILED: {type(e).__name__}: {str(e)[:160]}")

    # Closest-hit kernel per collapse mode (camera-ordered, raw kernel).
    for mode, wacc in wides.items():
        try:
            wp = jax.jit(order_children_for_point)(wacc, cam.position)
            gbk = jax.jit(lambda a, m, c: jnp.sum(gbuffer_pass(
                lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H
            )["position"]))
            t = timed(lambda: gbk(wp, mesh, cam), reps=16)
            log(f"gbuffer-ray {mode}: {t*1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"gbuffer {mode} FAILED: {type(e).__name__}: {str(e)[:160]}")
    log("probe_r3u done")


if __name__ == "__main__":
    main()
