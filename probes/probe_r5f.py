"""Probe r5f (TPU): WHERE do 800 s of 1M-tri chunked build go?

probe r3y measured build_chunked(1M, 4 chunks) at 801.8 s wall — far
beyond any compile+execute estimate for four shape-shared jitted
builds. Phase-times every stage (split sort, per-chunk build, count
syncs, widen, tri_id compose) with forced materialization between
stages, plus a second iteration to separate compile from steady state.
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


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import dataclasses

    from tpurt.bvh.chunked import split_morton
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import count_wide, round_up_bucket, widen_lbvh
    from tpurt.scenes import sponza_scene

    host_mesh = sponza_scene(1_000_000)
    mesh = jax.device_put(host_mesh)
    nc = 4
    leaf = 14

    def phase(tag, fn):
        t0 = time.perf_counter()
        r = fn()
        r = jax.block_until_ready(r)
        # force a real host materialization of ONE scalar (block_until_
        # ready returns early on axon)
        leaf_el = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf_el).ravel()[:1]
        log(f"  {tag}: {time.perf_counter() - t0:8.2f} s")
        return r

    for it in range(2):
        log(f"iteration {it} ({'cold compiles' if it == 0 else 'warm'}):")
        ct, co = phase("split_morton (sort 1M)", lambda: jax.jit(
            split_morton, static_argnames=("num_chunks",))(
                mesh.vertices, mesh.indices, nc))
        build = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=leaf))
        bvhs = []
        for c in range(nc):
            bvhs.append(phase(f"build chunk {c}",
                              lambda c=c: build(mesh.vertices, ct[c])))
        counts = []
        for c in range(nc):
            counts.append(phase(f"count_wide chunk {c}",
                                lambda c=c: jnp.asarray(
                                    count_wide(bvhs[c]))))
        nw = round_up_bucket(max(int(np.asarray(x)) for x in counts))
        widen = jax.jit(widen_lbvh, static_argnames=("nw_pad",))
        wides = []
        for c in range(nc):
            wides.append(phase(f"widen chunk {c}",
                               lambda c=c: widen(bvhs[c], nw_pad=nw)))
        for c in range(nc):
            phase(f"tri_id compose {c}", lambda c=c: dataclasses.replace(
                wides[c], tri_id=co[c][wides[c].tri_id]))


if __name__ == "__main__":
    main()
