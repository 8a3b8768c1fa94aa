"""Probe r4e (TPU): cost of per-candidate triangle field reads in the
leaf Möller–Trumbore — the single largest component of the interior
closest walk (probe r4d: 16.8 leaf tests/packet x 14 tris x 9 reads;
probe r3ae: each vreg->sreg scalar lane read is the cost, VMEM loads and
vector FMAs are ~free).

Microbenchmark three formulations of "field f of triangle j" from a
(1, 128) leaf row, inside a serial loop shaped like the traversal:

  A. row[0, b]            scalar extract (current production)
  B. row[:, b:b+1]        (1,1) vreg slice broadcast against (8,128)
  C. row8[j]              row pre-split: leaf stored (k, 9) in SMEM,
                          scalar reads from SMEM instead of vregs

Each variant runs the full 14-triangle MT against an (8,128) ray packet
N times (static leaf id alternation so nothing folds), so the delta is
the read style alone.
"""

import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 14
ITERS = 600


def _mt_body(read, ox, oy, oz, dx, dy, dz, best_t):
    import jax.numpy as jnp
    for j in range(K):
        b = 9 * j
        v0x, v0y, v0z = read(b), read(b + 1), read(b + 2)
        e1x, e1y, e1z = read(b + 3), read(b + 4), read(b + 5)
        e2x, e2y, e2z = read(b + 6), read(b + 7), read(b + 8)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= 1e-9
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        t = jnp.where(ok, t, 3.4e38)
        best_t = jnp.minimum(best_t, t)
    return best_t


def make_kernel(style: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tr_ref, rays_ref, out_ref):
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
        best = jnp.full(ox.shape, 3.4e38, jnp.float32)

        def body(i, best):
            leaf = i & 15

            if style == "scalar":
                row = tr_ref[pl.ds(leaf, 1), :]

                def read(b):
                    return row[0, b]
            elif style == "slice":
                row = tr_ref[pl.ds(leaf, 1), :]

                def read(b):
                    return row[:, b:b + 1]
            else:
                raise ValueError(style)
            return _mt_body(read, ox, oy, oz, dx, dy, dz, best)

        best = jax.lax.fori_loop(0, ITERS, body, best, unroll=False)
        out_ref[...] = best

    rows = np.random.default_rng(0).normal(
        size=(16, 128)).astype(np.float32)
    rays = np.random.default_rng(1).normal(
        size=(6, 8, 128)).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    return lambda: f(rows, rays)


def timed(fn, reps=20, batches=3):
    np.asarray(fn()).ravel()[0]
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        np.asarray(r).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    for style in ("scalar", "slice"):
        try:
            fn = make_kernel(style)
            ms = timed(fn) * 1e3
            per = ms * 1e6 / (ITERS * K)     # ns per triangle test
            log(f"{style:8s} {ms:8.3f} ms/call  {per:7.1f} ns/tri-test")
        except Exception as e:  # noqa: BLE001
            log(f"{style:8s} FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
