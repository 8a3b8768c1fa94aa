"""SBVH quality probe: iterations/packet + shadow Mrays/s, SAH vs SBVH."""
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
    from tpurt.bvh.sah import cpu_bvh_to_lbvh
    from tpurt.native import build_sah_bvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.kernels.traverse import (trace_closest_pallas,
                                        trace_any_pallas_stats)
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H, leaf_size=14)
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    v = np.asarray(host_mesh.vertices, np.float32)
    idx = np.asarray(host_mesh.indices, np.int32)
    _, trace_any = make_tracers(cfg)

    variants = [("sah", dict())]
    for alpha, budget in ((1e-5, 1.3), (1e-4, 1.2), (1e-6, 1.5)):
        variants.append((f"sbvh_a{alpha:g}_b{budget:g}",
                         dict(spatial_alpha=alpha, spatial_budget=budget)))
    gbuf = None
    for name, kw in variants:
        try:
            t0 = time.perf_counter()
            cpu = build_sah_bvh(v, idx, leaf_size=14, **kw)
            bvh = cpu_bvh_to_lbvh(cpu, host_mesh, 14)
            wide = build_wide(bvh)
            tb = time.perf_counter() - t0
            if gbuf is None:
                gb = jax.jit(lambda a, m, c: gbuffer_pass(
                    lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
                gbuf = gb(wide, mesh, cam)
                valid = int(np.asarray(gbuf["valid"]).sum())
                log(f"valid px {valid}")
            so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
                g, l, cfg.shadow_bias, None,
                scene_bounds=(b.root_min, b.root_max)))(gbuf, light, bvh)
            occ, iters = trace_any_pallas_stats(wide, so, sd, stm)
            it = np.asarray(iters)
            occn = int(np.asarray(occ).sum())
            shade = jax.jit(lambda a, o, d, t: jnp.sum(
                trace_any(a, o, d, t).astype(jnp.int32)))
            s = timed(lambda: shade(wide, so, sd, stm), 48)
            nl = bvh.num_sorted_tris // 14
            log(f"{name}: build {tb:.2f}s refs={cpu.tri_order.shape[0]} "
                f"leaves={nl} leafVMEM={nl*512/1e6:.1f}MB "
                f"iters mean={it.mean():.2f} p90={np.percentile(it, 90):.0f} "
                f"occ={occn} trace {s*1e3:.2f} ms -> {valid/s/1e6:.1f} Mrays/s")
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:250]}")
    log("probe_r3b done")


if __name__ == "__main__":
    main()
