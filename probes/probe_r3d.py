"""Probe D: Pallas build-kernel feasibility on this TPU.

D1: SMEM scratch capacity — how big an i32 SMEM scratch compiles+runs?
D2: scalar-core throughput — cycles per iteration of an SMEM-walking
    scalar loop (the monotonic-stack topology's cost model).
D3: dynamic-sublane VMEM row load + lane-group select + blend-store loop
    (the box bottom-up pass's cost model).
"""
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


def d1_smem(nwords: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref, s_ref):
        s_ref[0] = x_ref[0, 0].astype(jnp.int32)
        s_ref[nwords - 1] = jnp.int32(7)
        o_ref[...] = x_ref[...] + (s_ref[nwords - 1]
                                   + s_ref[0]).astype(jnp.float32)

    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((nwords,), jnp.int32)])
    out = np.asarray(f(jnp.ones((8, 128))))
    log(f"D1 SMEM {nwords} words ({nwords*4/1024:.0f} KB): OK "
        f"sum={out.sum():.0f}")


def d2_scalar_loop(n: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(d_ref, o_ref, stack_ref):
        # ANSV-like monotonic stack over SMEM-prefetched values.
        def body(g, carry):
            sp, acc = carry

            def cond(c):
                sp, _ = c
                return (sp > 0) & (d_ref[stack_ref[
                    jnp.maximum(sp - 1, 0)]] > d_ref[g])

            def pop(c):
                sp, acc = c
                x = stack_ref[sp - 1]
                return sp - 1, acc + x

            sp, acc = jax.lax.while_loop(cond, pop, (sp, acc))
            stack_ref[sp] = g
            return sp + 1, acc

        _, acc = jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,), in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((n + 1,), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
    d = jnp.asarray(np.random.default_rng(0).integers(0, 97, n), jnp.int32)
    got = int(np.asarray(f(d))[0, 0])
    t = timed(lambda: f(d), 20)
    log(f"D2 scalar stack loop n={n}: {t*1e3:.3f} ms "
        f"(~{t*0.94e9/n:.0f} cyc/elem) acc={got}")


def d3_rowwalk(n_rows: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(idx_ref, box_ref, o_ref):
        def body(i, acc):
            j = idx_ref[i]
            row = box_ref[pl.ds(j, 1), :]        # dynamic sublane row
            # lane-group select: pick group (j & 7) of 16 lanes
            g = j & 7
            h = jnp.where((g & 4) > 0, row[:, 64:128], row[:, 0:64])
            q = jnp.where((g & 2) > 0, h[:, 32:64], h[:, 0:32])
            r = jnp.where((g & 1) > 0, q[:, 16:32], q[:, 0:16])
            return acc + jnp.sum(r)

        o_ref[0, 0] = jax.lax.fori_loop(0, n_rows, body, jnp.float32(0))

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    box = jnp.ones((n_rows, 128), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, n_rows, n_rows),
                      jnp.int32)
    _ = f(idx, box)
    t = timed(lambda: f(idx, box), 20)
    log(f"D3 dyn-row + group-select loop n={n_rows}: {t*1e3:.3f} ms "
        f"(~{t*0.94e9/n_rows:.0f} cyc/iter)")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for step in sys.argv[1:] or ["d1a", "d1b", "d1c", "d2", "d3"]:
        try:
            if step == "d1a":
                d1_smem(16 * 1024)        # 64 KB
            elif step == "d1b":
                d1_smem(64 * 1024)        # 256 KB
            elif step == "d1c":
                d1_smem(160 * 1024)       # 640 KB
            elif step == "d2":
                d2_scalar_loop(20480)
            elif step == "d3":
                d3_rowwalk(20480)
        except Exception as e:  # noqa: BLE001
            log(f"{step} FAILED: {type(e).__name__}: {str(e)[:250]}")
    log("probe_r3d done")
