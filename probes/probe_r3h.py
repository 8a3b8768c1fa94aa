"""Probe H: raster cost breakdown — binning phases vs kernel, 1080p + 4K."""
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


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tpurt.raster import setup as S
    from tpurt.kernels.raster import rasterize_rows
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    for W, H in ((1920, 1080), (3840, 2160)):
        cap = S.default_cap_rows(mesh.num_triangles)
        log(f"--- {W}x{H} cap_pairs={cap}")
        binf = jax.jit(lambda m, c: S.bin_rows(c, m, W, H, cap))
        bins = binf(mesh, cam)
        t = timed(lambda: jnp.sum(binf(mesh, cam).pair_rows), 10)
        log(f"bin_rows total: {t*1e3:.2f} ms (overflow="
            f"{bool(np.asarray(bins.overflow))})")

        # phase: setup records
        def ph_setup(m, c):
            clip = S.clip_transform(c, W, H, m.vertices)
            tri = m.indices.astype(jnp.int32)
            t_count = tri.shape[0]
            wt = -(-W // S.TILE)
            ht = -(-H // S.TILE)
            z = jnp.zeros(t_count, jnp.int32)
            rec = S._setup_records32(clip, m, W, H,
                                     jnp.arange(t_count, dtype=jnp.int32),
                                     (z, z, z + wt - 1, z + ht - 1))
            return jnp.sum(rec)
        t = timed(lambda: jax.jit(ph_setup)(mesh, cam), 10)
        log(f"  setup_records32: {t*1e3:.2f} ms")

        # phase: pair expansion pieces on realistic inputs
        nrows = -(-mesh.num_triangles // S.RECS32_PER_ROW)
        rng = np.random.default_rng(0)
        counts = jnp.asarray(rng.integers(0, 4, nrows), jnp.int32)

        def ph_expand(counts):
            starts = jnp.cumsum(counts) - counts
            p = jnp.arange(cap, dtype=jnp.int32)
            row_ids = jnp.arange(nrows, dtype=jnp.int32)
            seg = jnp.full((cap,), -1, jnp.int32).at[
                jnp.where(counts > 0, starts, cap)].max(row_ids,
                                                        mode="drop")
            pair_row = jax.lax.cummax(seg)
            return jnp.sum(pair_row)
        t = timed(lambda: jax.jit(ph_expand)(counts), 10)
        log(f"  scatter+cummax expansion: {t*1e3:.2f} ms")

        def ph_argsort(counts):
            keys = jnp.asarray(rng.integers(0, 2040, cap), jnp.int32)
            return jnp.sum(jnp.argsort(keys))
        keys = jnp.asarray(rng.integers(0, 2040, cap), jnp.int32)
        t = timed(lambda: jax.jit(lambda k: jnp.sum(jnp.argsort(k)))(keys),
                  10)
        log(f"  argsort[{cap}]: {t*1e3:.2f} ms")

        table = jnp.asarray(rng.normal(size=(nrows, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, nrows, cap), jnp.int32)
        t = timed(lambda: jax.jit(lambda t_, i: jnp.sum(t_[i]))(table, idx),
                  10)
        log(f"  row gather [{cap},128]: {t*1e3:.2f} ms")

        ntiles = (-(-W // S.TILE)) * (-(-H // S.TILE))
        sorted_keys = jnp.sort(keys)
        t = timed(lambda: jax.jit(lambda s: jnp.sum(jax.numpy.searchsorted(
            s, jnp.arange(ntiles, dtype=jnp.int32), side="left")))(
                sorted_keys), 10)
        log(f"  searchsorted[{ntiles} tiles]: {t*1e3:.2f} ms")

        # kernel alone on prebuilt bins
        t = timed(lambda: jnp.sum(jax.jit(
            lambda b: rasterize_rows(b, W, H)[1])(bins)), 10)
        log(f"  kernel (rasterize_rows): {t*1e3:.2f} ms")
    log("probe_r3h done")


if __name__ == "__main__":
    main()
