"""Probe r4c (TPU): interior attr G-buffer vs static-accel leaf size.

VERDICT r4 #4: interior 33.5 ms -> <= 25. Probe r4d (CPU, exact counts)
says ordering is maxed; the cost is event count: 13.2 pops + 16.8 leaf
tests/packet at leaf 14. A leaf-8 or leaf-11 SBVH trades more pops for
fewer wasted triangle tests per leaf visit (and 72/99 vs 126 scalar
field reads per leaf test). Measure the attr G-buffer pass + the shadow
any-hit trace per leaf size — the shadow kernel shares the accel, so a
G-buffer win must not cost the 252 Mrays/s headline.
"""

import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(r):
    if isinstance(r, dict):
        r = next(iter(r.values()))
    r = r[0] if isinstance(r, tuple) else r
    return np.asarray(r).ravel()[0]


def timed(fn, reps, batches=3):
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

    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.kernels.traverse import trace_any_pallas
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shading import make_leaf_attr_rows
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    for leaf in (14, 11, 8):
        try:
            sah = build_sah_lbvh(host_mesh, leaf)
            sbvh = jax.device_put(sah)
            from tpurt.bvh.wide import order_children_for_point
            # Match production: camera-distance child ordering
            # (app.gbuffer_production) — the headline 33.5 includes it.
            acc = order_children_for_point(build_wide(sbvh), cam.position)
            at = jax.jit(make_leaf_attr_rows)(sbvh, mesh)
            gb = jax.jit(lambda a, t, m, c: gbuffer_attr_pass(
                a, t, m, c, W, H))
            gb_ms = timed(lambda: gb(acc, at, mesh, cam), 12) * 1e3

            gbuf = gb(acc, at, mesh, cam)
            so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
                g, l, 1e-3, None,
                scene_bounds=(b.root_min, b.root_max)))(gbuf, light, sbvh)
            sh = jax.jit(lambda a, o, d, tm: jnp.sum(
                trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
            sh_ms = timed(lambda: sh(acc, so, sd, stm), 32) * 1e3
            mrays = 2.0736e6 / (sh_ms * 1e-3) / 1e6
            log(f"leaf {leaf:2d}: gbuffer {gb_ms:6.2f} ms  shadow "
                f"{sh_ms:5.2f} ms ({mrays:5.1f} Mrays/s)  "
                f"wide_nodes {acc.num_wide}")
        except Exception as e:  # noqa: BLE001
            log(f"leaf {leaf:2d}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
