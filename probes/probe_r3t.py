"""Round-3 probe T: the deferred-box fused rebuild + init-folded topology
kernel on the real TPU. Compile order: XLA-only first, kernel-dependent
last (axon compile-service protocol)."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=32, batches=4):
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
    from tpurt.bvh import lbvh as L
    from tpurt.bvh import wide as W
    from tpurt.scenes import sponza_scene

    LEAF = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)

    # XLA-only first: search-builder rebuilds (no Pallas).
    bvh0 = jax.jit(lambda v, i: L.build_lbvh(
        v, i, leaf_size=LEAF, builder="search"))(mesh.vertices, mesh.indices)
    # Deferred-box rebuilds collapse with the "fixed" frontier (area needs
    # node boxes); count with the same mode or the pad can undershoot.
    nw_pad = W.round_up_bucket(max(W.count_wide(bvh0, mode="fixed"), 1))
    log(f"nw_pad={nw_pad}")

    reb_s = jax.jit(lambda v, i: jnp.sum(W.widen_lbvh(
        L.build_lbvh(v, i, leaf_size=LEAF, builder="search", boxes="defer"),
        nw_pad=nw_pad).nodes))
    t = timed(lambda: reb_s(mesh.vertices, mesh.indices))
    log(f"rebuild-defer(search): {t*1e3:.2f} ms")

    # Kernel topology (new Mosaic compile: init folded into push loop).
    reb_k = jax.jit(lambda v, i: jnp.sum(W.widen_lbvh(
        L.build_lbvh(v, i, leaf_size=LEAF, boxes="defer"),
        nw_pad=nw_pad).nodes))
    t = timed(lambda: reb_k(mesh.vertices, mesh.indices))
    log(f"rebuild-defer(kernel): {t*1e3:.2f} ms")

    reb_full = jax.jit(lambda v, i: jnp.sum(W.widen_lbvh(
        L.build_lbvh(v, i, leaf_size=LEAF), nw_pad=nw_pad).nodes))
    t = timed(lambda: reb_full(mesh.vertices, mesh.indices))
    log(f"rebuild-full(kernel): {t*1e3:.2f} ms")

    bs = jax.jit(lambda v, i: jnp.sum(jnp.concatenate(
        [L.build_lbvh(v, i, leaf_size=LEAF, boxes='defer').tri_v0])))
    t = timed(lambda: bs(mesh.vertices, mesh.indices))
    log(f"build-defer-alone(kernel): {t*1e3:.2f} ms")

    # Topology kernel alone (old vs new cost): deltas precomputed.
    from tpurt.bvh.lbvh import adjacent_deltas
    from tpurt.kernels.build import topology_pallas
    codes = None
    b = jax.jit(lambda v, i: L.build_lbvh(v, i, leaf_size=LEAF))(
        mesh.vertices, mesh.indices)
    # recover sorted leaf codes by rebuilding them (cheap, host-side once)
    import tpurt.bvh.morton as M
    v0 = b.tri_v0
    v1 = v0 + b.tri_e1
    v2 = v0 + b.tri_e2
    c = (jnp.minimum(jnp.minimum(v0, v1), v2)
         + jnp.maximum(jnp.maximum(v0, v1), v2)) * 0.5
    lc = (M.morton_of_points(c, b.root_min, b.root_max)[::LEAF], None)
    d = jax.device_put(np.asarray(adjacent_deltas(lc)))
    topo = jax.jit(lambda d: jnp.sum(topology_pallas(d)[0]))
    t = timed(lambda: topo(d))
    log(f"topology-kernel(init-folded): {t*1e3:.2f} ms")
    log("probe_r3t done")


if __name__ == "__main__":
    main()
