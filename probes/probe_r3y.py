"""Round-3 probe Y: scene-scale story — 1M-triangle interior, 1080p hard
shadows through the chunked two-level accel (bvh/chunked.py).

The single-accel Pallas kernels cap at ~350k tris (VMEM); the chunked path
is the over-budget strategy and has CPU parity tests but no TPU number.
Kernel families are the proven traversal programs (new const shapes only,
no new op families), so this probe is chain-safe anywhere.

Reports: chunked build time, chunks, any-hit shadow trace ms + Mrays/s,
closest-hit G-buffer trace ms, and the same scene at 287k (single accel)
for scaling context.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=16, batches=4):
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
    from tpurt.bvh.chunked import (build_chunked, chunks_needed,
                                   trace_any_chunked, trace_closest_chunked)
    from tpurt.camera import generate_rays
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    light = Light.directional((0.25, 0.9, 0.2))

    for ntris in (1_000_000,):
        host_mesh = sponza_scene(ntris)
        mesh = jax.device_put(host_mesh)
        n = host_mesh.num_triangles
        from tpurt.app import Renderer
        nc = chunks_needed(n, 14, Renderer._VMEM_BUDGET,
                           Renderer._VMEM_OVERHEAD)
        log(f"tris={n} chunks={nc}")
        t0 = time.perf_counter()
        acc = build_chunked(mesh.vertices, mesh.indices, num_chunks=nc,
                            leaf_size=14)
        acc = jax.block_until_ready(acc)
        log(f"chunked build (host-orchestrated, {nc} chunks): "
            f"{time.perf_counter()-t0:.2f} s")

        cam = sponza_interior_camera()
        o, d = generate_rays(cam, W, H)

        # Closest hit (primary visibility) through the chunk loop.
        gb = jax.jit(lambda o, d: trace_closest_chunked(acc, o, d))
        tt, tid = gb(o, d)
        tt = jax.block_until_ready(tt)
        valid = int(np.asarray(tid >= 0).sum())
        gb_s = jax.jit(lambda o, d: jnp.sum(trace_closest_chunked(
            acc, o, d)[0]))
        t = timed(lambda: gb_s(o, d), reps=8)
        log(f"closest-hit 1080p ({n} tris): {t*1e3:.2f} ms "
            f"(valid {valid})")

        # Shadow rays from the hit points.
        hit = o + d * np.asarray(tt)[..., None]
        gbuf = dict(position=jnp.asarray(hit),
                    gnormal=jnp.zeros_like(hit).at[..., 1].set(1.0),
                    valid=jnp.asarray(tid >= 0))
        so, sd, stm = shadow_ray_batch(gbuf, light, 1e-3, None,
                                       scene_bounds=(acc.root_min,
                                                     acc.root_max))
        sh = jax.jit(lambda so, sd, stm: jnp.sum(trace_any_chunked(
            acc, so, sd, stm).astype(jnp.int32)))
        t = timed(lambda: sh(so, sd, stm), reps=16)
        log(f"shadow any-hit 1080p ({n} tris): {t*1e3:.2f} ms "
            f"-> {valid/t/1e6:.1f} Mrays/s")
    log("probe_r3y done")


if __name__ == "__main__":
    main()
