"""Probe I: fast-permutation strategies for the rebuild (and raster setup).

Every phase of the fused rebuild that is slow is a row gather through the
Morton sort permutation (tri-gather16 6.1 ms, codes' vertex gather inside
3.6 ms, RMQ queries inside 4.5 ms). Measure, with HONEST hoisted-jit
timing, every way to move 287k rows through an arbitrary permutation,
plus the complete-tree (implicit topology) box/collapse alternative.
Pallas suspect compiles LAST (axon compile-helper wedge protocol).
"""
import functools
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=20, batches=4):
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

    N = 287182  # tpad for 287176 tris, leaf 14
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))
    key = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))

    for C in (8, 16, 32, 128):
        data = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
        g = jax.jit(lambda d, p: jnp.sum(d[p]))
        t = timed(lambda: g(data, perm))
        log(f"gather rows [N,{C}]: {t*1e3:.2f} ms "
            f"({N*C*4/t/1e9:.1f} GB/s)")
        s = jax.jit(lambda d, p: jnp.sum(
            jnp.zeros_like(d).at[p].set(d)))
        t = timed(lambda: s(data, inv))
        log(f"scatter rows [N,{C}]: {t*1e3:.2f} ms")

    # co-sort: payload operands riding the key sort
    for k in (0, 2, 4, 9, 16):
        pay = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
               for _ in range(k)]
        f = jax.jit(lambda key, *pay: sum(
            [jnp.sum(x) for x in jax.lax.sort(
                (key, jnp.arange(N, dtype=jnp.int32)) + tuple(pay),
                num_keys=1)[1:]], jnp.float32(0)))
        t = timed(lambda: f(key, *pay))
        log(f"sort + {k} f32 payload operands: {t*1e3:.2f} ms")

    # morton interleave alone (no gather): centroids given
    cent = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.morton import morton_of_points
    mi = jax.jit(lambda c: jnp.sum(morton_of_points(
        c, jnp.zeros(3), jnp.ones(3))))
    t = timed(lambda: mi(cent))
    log(f"morton interleave alone [N]: {t*1e3:.2f} ms")

    # strided leaf-code slice [::14]
    sl = jax.jit(lambda x: jnp.sum(x[::14]))
    t = timed(lambda: sl(key))
    log(f"strided slice [::14]: {t*1e3:.2f} ms")

    # complete-tree pairwise box reduction: 32768 leaves, 15 levels,
    # [n,8] rows (min.xyz,max.xyz,pad2) -> per-level arrays
    L = 32768
    leaf = jnp.asarray(rng.normal(size=(L, 8)).astype(np.float32))

    def uptree(leaf):
        acc = jnp.float32(0)
        x = leaf
        for _ in range(15):
            a = x.reshape(-1, 2, 8)
            mn = jnp.minimum(a[:, 0, :4], a[:, 1, :4])
            mx = jnp.maximum(a[:, 0, 4:], a[:, 1, 4:])
            x = jnp.concatenate([mn, mx], axis=1)
            acc = acc + jnp.sum(x)
        return acc
    ut = jax.jit(uptree)
    t = timed(lambda: ut(leaf))
    log(f"complete-tree 15-level pairwise reduce [32k,8]: {t*1e3:.2f} ms")

    # implicit wide collapse: 3-level grouping -> [Nw,128] rows from level
    # arrays via reshape/concat (mock shapes: 4681 wide nodes of 8 children)
    lv = jnp.asarray(rng.normal(size=(L, 16)).astype(np.float32))

    def wpack(lv):
        # children of wide level: 8 consecutive rows -> one 128-lane row
        return jnp.sum(lv.reshape(-1, 128))
    wp = jax.jit(wpack)
    t = timed(lambda: wp(lv))
    log(f"implicit wide pack reshape [32k,16]->[4k,128]: {t*1e3:.2f} ms")

    # RMQ baseline at this scale for comparison (current build path)
    from tpurt.bvh.lbvh import range_boxes
    lmin = jnp.asarray(rng.normal(size=(20513, 3)).astype(np.float32))
    lmax = lmin + 1.0
    fi = jnp.asarray(rng.integers(0, 20000, 20512).astype(np.int32))
    la = jnp.minimum(fi + jnp.asarray(
        rng.integers(1, 500, 20512).astype(np.int32)), 20512)
    rb = jax.jit(lambda a, b, f, l: jnp.sum(range_boxes(a, b, f, l)[0]))
    t = timed(lambda: rb(lmin, lmax, fi, la))
    log(f"RMQ table+query [20.5k leaves]: {t*1e3:.2f} ms")

    # ---- Pallas gather kernels LAST (compile-crash protocol) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gather_pallas(data, idx, G):
        N, C = data.shape
        n_out = idx.shape[0]
        grid = n_out // G

        def kernel(idx_ref, *refs):
            out = refs[G]
            for j in range(G):
                out[j, :] = refs[j][0, :]

        def mk_map(j):
            def im(i, idx_ref):
                return (idx_ref[i * G + j], 0)
            return im

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, C), mk_map(j)) for j in range(G)],
            out_specs=pl.BlockSpec((G, C), lambda i, idx_ref: (i, 0)),
        )
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((n_out, C), data.dtype),
        )(idx, *([data] * G))

    for C, G in ((128, 8), (128, 16), (16, 8)):
        data = jnp.asarray(rng.normal(size=(N // 16 * 16, C))
                           .astype(np.float32))
        permc = perm[:N // 16 * 16] % (N // 16 * 16)
        try:
            gp = jax.jit(functools.partial(gather_pallas, G=G))
            f = jax.jit(lambda d, p: jnp.sum(gp(d, p)))
            t = timed(lambda: f(data, permc))
            log(f"PALLAS gather G={G} [N,{C}]: {t*1e3:.2f} ms "
                f"({data.size*4/t/1e9:.1f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"PALLAS gather G={G} C={C} FAILED: "
                f"{type(e).__name__}: {str(e)[:160]}")
    log("probe_r3i done")


if __name__ == "__main__":
    main()
