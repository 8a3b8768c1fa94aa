"""Probe r5g (TPU): the 1M-triangle scale row via the SAMPLED chunk split.

r5f isolated the old 800 s chunked-build wall to the 1M argsort program's
one-time device load (~24 min/process, recurs with a warm compile cache).
split_sampled (bvh/chunked.py) skips that program entirely. This probe
measures the production scale path end to end on the real chip:

  - build_chunked(1M tris, production chunk count) cold wall + warm
    steady-state (the per-frame relevant number is warm; the cold number
    is the first-build experience)
  - chunked closest-hit (G-buffer) and any-hit (shadow) at 1080p,
    interior camera, with the standard scalar-fused timing

Numbers feed the bench's scale-row section (tris_1m_* keys).
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

    from tpurt.bvh.chunked import (build_chunked, chunks_needed,
                                   trace_any_chunked, trace_closest_chunked)
    from tpurt.camera import generate_rays
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    leaf = 14
    t0 = time.perf_counter()
    host_mesh = sponza_scene(1_000_000)
    mesh = jax.device_put(host_mesh)
    log(f"scene gen + put: {time.perf_counter() - t0:.2f} s")
    nc = chunks_needed(1_000_000, leaf, 20_000_000, 1_500_000)
    log(f"chunks: {nc}")

    t0 = time.perf_counter()
    acc = build_chunked(mesh.vertices, mesh.indices, nc, leaf_size=leaf)
    _force(jnp.sum(acc.chunks[-1].nodes))
    cold_s = time.perf_counter() - t0
    log(f"build_chunked COLD (compiles + program loads): {cold_s:.2f} s")

    def rebuild():
        a = build_chunked(mesh.vertices, mesh.indices, nc, leaf_size=leaf)
        return jnp.sum(a.chunks[-1].nodes)
    t0 = time.perf_counter()
    rebuild()
    _force(rebuild())
    warm_s = (time.perf_counter() - t0) / 2
    log(f"build_chunked WARM: {warm_s:.2f} s")

    cam = sponza_interior_camera()
    o, d = generate_rays(cam, W, H)
    cl = jax.jit(lambda a, o, d: trace_closest_chunked(a, o, d))
    t, tid = cl(acc, o, d)
    gb_ms = timed(lambda: jnp.sum(cl(acc, o, d)[0].clip(0, 1e9)), 8) * 1e3
    log(f"chunked closest (G-buffer) 1080p: {gb_ms:.2f} ms")

    light = Light.directional((0.25, 0.9, 0.2))
    valid = tid >= 0
    pos = o + d * jnp.where(valid, t, 0.0)[..., None]
    ldir = jnp.asarray(light.direction, jnp.float32)
    ldir = ldir / jnp.linalg.norm(ldir)
    so = pos + 1e-3 * ldir
    sd = jnp.broadcast_to(ldir, so.shape)
    tm = jnp.where(valid, 3.4e38, 0.0)
    sh = jax.jit(lambda a, o, d, t: jnp.sum(
        trace_any_chunked(a, o, d, t).astype(jnp.int32)))
    sh_ms = timed(lambda: sh(acc, so, sd, tm), 16) * 1e3
    nvalid = int(np.asarray(valid).sum())
    mrays = nvalid / (sh_ms / 1e3) / 1e6
    log(f"chunked shadow 1080p: {sh_ms:.2f} ms, valid {nvalid}, "
        f"{mrays:.1f} Mrays/s")


if __name__ == "__main__":
    main()
