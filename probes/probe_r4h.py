"""Probe r4h (TPU): w8t attribute-tracked G-buffer vs the row attr path.

VERDICT r4 #4 (interior G-buffer 34.5 -> <= 25 ms): probe r4d says the
wall is event count x per-event cost, and the per-event cost of a leaf
visit is dominated by per-candidate vreg->sreg scalar lane reads (~126
geometry + ~5/candidate attrs at leaf 14). The w8t attr kernel
(_w8t_closest_walk_attr) eliminates ALL of them: triangle fields are
static (8,1) slices of the transposed leaf blocks, winner attributes are
one-hot sublane reduces. Measures, in ONE process for comparability:

  A. row  leaf14 SBVH: attr G-buffer + shadow any-hit   (production)
  B. w8t  leaf16 SBVH: attr G-buffer + shadow any-hit   (candidate)
  C. w8t  leaf8  SBVH: attr G-buffer                    (tree-shape check)

NOTE: contains ONE NEW Mosaic kernel compile (the w8t attr kernel) — a
failed compile wedges the remote helper ~25 min, so this probe must run
LAST in any queue (NOTES_ROUND4 landmine notes).
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

    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, build_wide_t,
                                order_children_for_point)
    from tpurt.kernels.traverse import trace_any_pallas
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shading import (make_leaf_attr_rows,
                                      make_leaf_attr_rows_t)
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    gbj = jax.jit(lambda a, t, m, c: gbuffer_attr_pass(a, t, m, c, W, H))
    shj = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
    srj = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, 1e-3, None, scene_bounds=(b.root_min, b.root_max)))

    def run(tag, leaf, transposed, shadow=True):
        try:
            sah = build_sah_lbvh(host_mesh, leaf)
            sbvh = jax.device_put(sah)
            acc = order_children_for_point(build_wide(sbvh), cam.position)
            if transposed:
                acc = jax.jit(build_wide_t)(acc, sbvh)
                at = jax.jit(make_leaf_attr_rows_t)(sbvh, mesh)
            else:
                at = jax.jit(make_leaf_attr_rows)(sbvh, mesh)
            gb_ms = timed(lambda: gbj(acc, at, mesh, cam), 12) * 1e3
            line = f"{tag}: gbuffer {gb_ms:6.2f} ms"
            if shadow:
                gbuf = gbj(acc, at, mesh, cam)
                so, sd, stm = srj(gbuf, light, sbvh)
                sh_ms = timed(lambda: shj(acc, so, sd, stm), 32) * 1e3
                mrays = 2.0736e6 / (sh_ms * 1e-3) / 1e6
                line += f"  shadow {sh_ms:5.2f} ms ({mrays:5.1f} Mrays/s)"
            log(line + f"  wide_nodes {acc.num_wide}")
        except Exception as e:  # noqa: BLE001
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")

    run("A row leaf14", 14, False)           # proven kernels first
    run("B w8t leaf16", 16, True)            # NEW kernel compile
    run("C w8t leaf8 ", 8, True, shadow=False)


if __name__ == "__main__":
    main()
