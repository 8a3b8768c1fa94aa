"""Probe K: corners-in implicit rebuild — phase breakdown on TPU.

Goal: config-2 rebuild <= ~8 ms so rebuild + static trace (7.9) < 16.
Measures cumulative phase prefixes of the gather-free build to find the
marginal cost of each phase, plus the full gather path for reference.
"""
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
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.implicit import (build_wide_implicit,
                                    build_wide_implicit_corners,
                                    expand_corners, level_sizes, _round_up,
                                    _pad_level)
    from tpurt.bvh.morton import morton_of_points
    from tpurt.scenes import sponza_scene

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    T = int(mesh.indices.shape[0])
    log(f"tris={T}")
    c0, c1, c2 = jax.jit(expand_corners)(mesh.vertices, mesh.indices)
    c0, c1, c2 = map(jax.device_put, (c0, c1, c2))

    # full gather-path build (baseline re-check)
    f = jax.jit(lambda v, i: jnp.sum(build_wide_implicit(
        v, i, leaf_size=LEAF).nodes))
    t = timed(lambda: f(mesh.vertices, mesh.indices), 10)
    log(f"implicit build (gather path): {t*1e3:.2f} ms")

    # corners-in build
    g = jax.jit(lambda a, b, c: jnp.sum(build_wide_implicit_corners(
        a, b, c, leaf_size=LEAF).nodes))
    t = timed(lambda: g(c0, c1, c2), 10)
    log(f"implicit build (corners-in): {t*1e3:.2f} ms")

    # deform + corners-in fused (the honest dynamic-frame program)
    def deform_build(a, b, c, t):
        ph = a[:, 1:2] * 2.0 + t
        off = jnp.concatenate(
            [jnp.sin(ph) * 0.02, jnp.zeros_like(ph), jnp.cos(ph) * 0.02],
            axis=1)
        return jnp.sum(build_wide_implicit_corners(
            a + off, b, c, leaf_size=LEAF).nodes)
    h = jax.jit(deform_build)
    t = timed(lambda: h(c0, c1, c2, jnp.float32(0.3)), 10)
    log(f"deform + corners-in build fused: {t*1e3:.2f} ms")

    # --- cumulative phase prefixes of the corners-in build ---
    k = LEAF
    tpad = _round_up(max(T, 2 * k), k)

    def pads(v0, e1, e2):
        p = tpad - T
        if p:
            v0 = jnp.concatenate([v0, jnp.broadcast_to(v0[-1:], (p, 3))])
            e1 = jnp.concatenate([e1, jnp.broadcast_to(e1[-1:], (p, 3))])
            e2 = jnp.concatenate([e2, jnp.broadcast_to(e2[-1:], (p, 3))])
        return v0, e1, e2

    def ph_codes(v0, e1, e2):
        v0, e1, e2 = pads(v0, e1, e2)
        p1 = v0 + e1
        p2 = v0 + e2
        tmin = jnp.minimum(jnp.minimum(v0, p1), p2)
        tmax = jnp.maximum(jnp.maximum(v0, p1), p2)
        centroid = (tmin + tmax) * 0.5
        smin = tmin.min(axis=0)
        smax = tmax.max(axis=0)
        code = morton_of_points(centroid, smin, smax)
        return code, v0, e1, e2, smin, smax

    def ph_sort(v0, e1, e2):
        code, v0, e1, e2, smin, smax = ph_codes(v0, e1, e2)
        ops = (code, jnp.arange(tpad, dtype=jnp.int32),
               v0[:, 0], v0[:, 1], v0[:, 2],
               e1[:, 0], e1[:, 1], e1[:, 2],
               e2[:, 0], e2[:, 1], e2[:, 2])
        s = jax.lax.sort(ops, num_keys=1)
        return s, smin, smax

    def ph_leaf(v0, e1, e2):
        s, smin, smax = ph_sort(v0, e1, e2)
        sv0 = jnp.stack(s[2:5], axis=1)
        se1 = jnp.stack(s[5:8], axis=1)
        se2 = jnp.stack(s[8:11], axis=1)
        p1 = sv0 + se1
        p2 = sv0 + se2
        tmin = jnp.minimum(jnp.minimum(sv0, p1), p2)
        tmax = jnp.maximum(jnp.maximum(sv0, p1), p2)
        n_leaves = tpad // k
        lmin = tmin.reshape(n_leaves, k, 3).min(axis=1)
        lmax = tmax.reshape(n_leaves, k, 3).max(axis=1)
        return lmin, lmax, sv0, se1, se2

    def ph_levels(v0, e1, e2):
        lmin, lmax, sv0, se1, se2 = ph_leaf(v0, e1, e2)
        n_leaves = tpad // k
        acc = jnp.float32(0)
        cur_min, cur_max = lmin, lmax
        for s in level_sizes(n_leaves):
            pmin, pmax = _pad_level(cur_min, cur_max, s * 8)
            gmin = pmin.reshape(s, 8, 3)
            gmax = pmax.reshape(s, 8, 3)
            cur_min = gmin.min(axis=1)
            cur_max = gmax.max(axis=1)
            acc = acc + cur_min.sum() + cur_max.sum()
        return acc + sv0.sum()

    for name, fn, scal in (
            ("codes", ph_codes, lambda r: r[0].astype(jnp.uint32).sum()),
            ("+sort", ph_sort, lambda r: r[0][1].sum()),
            ("+leafboxes", ph_leaf, lambda r: r[0].sum()),
            ("+levels", ph_levels, lambda r: r),
    ):
        j = jax.jit(lambda a, b, c, fn=fn, scal=scal: scal(fn(a, b, c)))
        t = timed(lambda: j(c0, c1, c2), 10)
        log(f"prefix {name}: {t*1e3:.2f} ms")

    log("probe_r3k done")


if __name__ == "__main__":
    main()
