"""Probe r3ai: phase decomposition of the CURRENT fused rebuild on TPU.

Phases (cumulative jits, deltas are the signal):
  1. gather+bounds    : corner gather + leaf boxes + scene bounds
  2. +codes (kernel)  : morton_codes_pallas
  3. +sort            : full payload sort
  4. +topology        : topology_pallas (+depths)
  5. +deferred build  : build_lbvh(boxes="defer", want_depth=True)
  6. +widen (fixed)   : full fused rebuild (the bench rebuild_ms program)
Run: AXON... python probes/probe_r3ai.py
"""
import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.scenes import sponza_scene
from tpurt.bvh.lbvh import (build_lbvh, adjacent_deltas, _round_up)
from tpurt.bvh.wide import count_wide, round_up_bucket, widen_lbvh

LEAF = 14


def timed(fn, reps=40, batches=4):
    fn()  # compile
    best = 1e9
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    mesh = sponza_scene(260_000)
    V = jax.device_put(mesh.vertices)
    I = jax.device_put(mesh.indices)
    num_tris = int(I.shape[0])
    print(f"tris={num_tris}")

    tpad = _round_up(max(num_tris, 2 * LEAF), LEAF)
    pad = tpad - num_tris

    def phase_gather(v, i):
        idx = jnp.concatenate(
            [i, jnp.broadcast_to(i[-1:], (pad, 3))]) if pad else i
        tri = idx.astype(jnp.int32)
        vv = v[tri.reshape(-1)].reshape(tpad, 3, 3)
        v0, v1, v2 = vv[:, 0], vv[:, 1], vv[:, 2]
        tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
        tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
        centroid = (tmin + tmax) * 0.5
        pb = jnp.concatenate([tmin, -tmax], axis=1).min(axis=0)
        return v0, v1 - v0, v2 - v0, centroid, pb, tri

    g = jax.jit(lambda v, i: jnp.sum(phase_gather(v, i)[3]))
    t1 = timed(lambda: g(V, I))
    print(f"1 gather+centroid            : {t1:7.2f} ms")

    from tpurt.kernels.build import morton_codes_pallas

    def phase_codes(v, i):
        v0, e1, e2, centroid, pb, tri = phase_gather(v, i)
        return morton_codes_pallas(centroid, pb[:3], -pb[3:])

    c = jax.jit(lambda v, i: jnp.sum(phase_codes(v, i)))
    t2 = timed(lambda: c(V, I))
    print(f"2 +codes(kernel)             : {t2:7.2f} ms  (delta {t2-t1:+.2f})")

    def phase_sort(v, i):
        v0, e1, e2, centroid, pb, tri = phase_gather(v, i)
        chi = morton_codes_pallas(centroid, pb[:3], -pb[3:])
        payload = (jnp.arange(tpad, dtype=jnp.int32),
                   v0[:, 0], v0[:, 1], v0[:, 2],
                   e1[:, 0], e1[:, 1], e1[:, 2],
                   e2[:, 0], e2[:, 1], e2[:, 2],
                   tri[:, 0], tri[:, 1], tri[:, 2])
        s = jax.lax.sort((chi,) + payload, num_keys=1)
        return s[0], s[2]

    sfn = jax.jit(lambda v, i: jnp.sum(phase_sort(v, i)[1]))
    t3 = timed(lambda: sfn(V, I))
    print(f"3 +sort(13 payload)          : {t3:7.2f} ms  (delta {t3-t2:+.2f})")

    from tpurt.kernels.build import topology_pallas

    def phase_topo(v, i):
        chs, _ = phase_sort(v, i)
        leaf_codes = (chs[::LEAF], None)
        child, first, last, depth = topology_pallas(
            adjacent_deltas(leaf_codes), want_depth=True)
        return child

    tp = jax.jit(lambda v, i: jnp.sum(phase_topo(v, i)))
    t4 = timed(lambda: tp(V, I))
    print(f"4 +topology(kernel)+depth    : {t4:7.2f} ms  (delta {t4-t3:+.2f})")

    bd = jax.jit(lambda v, i: jnp.sum(build_lbvh(
        v, i, leaf_size=LEAF, boxes="defer", want_depth=True)[0].tri_v0))
    t5 = timed(lambda: bd(V, I))
    print(f"5 build_lbvh(defer,depth)    : {t5:7.2f} ms  (delta {t5-t4:+.2f})")

    bvh = build_lbvh(V, I, leaf_size=LEAF)
    nw_pad = round_up_bucket(max(count_wide(bvh, mode="fixed"), 1))

    def _rebuild(v, i):
        b, dep = build_lbvh(v, i, leaf_size=LEAF, boxes="defer",
                            want_depth=True)
        return jnp.sum(widen_lbvh(b, nw_pad=nw_pad, mode="fixed",
                                  depths=dep).nodes)

    rb = jax.jit(_rebuild)
    t6 = timed(lambda: rb(V, I))
    print(f"6 full fused rebuild         : {t6:7.2f} ms  (delta {t6-t5:+.2f})")


if __name__ == "__main__":
    main()
