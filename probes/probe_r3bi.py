"""Round-3 probe BI: phase decomposition of the CURRENT production fused
rebuild (kernel builder, boxes=defer, fixed frontier) + a leaf-size sweep.

Goal: find the cuts that take rebuild 13.6 -> <= 8 ms (the <16 ms config-2
budget with the 7.96 ms static trace). Phases are cumulative prefixes of
build_lbvh's body; deltas are the per-phase costs.
"""
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
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tpurt.bvh import lbvh as L
    from tpurt.bvh import wide as W
    from tpurt.kernels.build import morton_codes_pallas, topology_pallas
    from tpurt.kernels.traverse import trace_closest_pallas, trace_any_pallas
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.camera import camera_rays
    from tpurt.types import Light

    LEAF = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    vv, ii = mesh.vertices, mesh.indices
    num_tris = int(ii.shape[0])
    log(f"tris={num_tris}")

    def prefix(stage):
        def fn(vertices, indices):
            tpad = ((num_tris + LEAF - 1) // LEAF) * LEAF
            pad = tpad - num_tris
            idx = jnp.concatenate(
                [indices, jnp.broadcast_to(indices[-1:], (pad, 3))]) \
                if pad else indices
            tri = idx.astype(jnp.int32)
            v = vertices[tri.reshape(-1)].reshape(tpad, 3, 3)
            v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
            tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
            tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
            centroid = (tmin + tmax) * 0.5
            pb = jnp.concatenate([tmin, -tmax], axis=1).min(axis=0)
            scene_min, scene_max = pb[:3], -pb[3:]
            if stage == "gather":
                return jnp.sum(centroid) + jnp.sum(pb)
            chi = morton_codes_pallas(centroid, scene_min, scene_max)
            if stage == "codes":
                return jnp.sum(chi.astype(jnp.uint32)) + jnp.sum(centroid)
            e1 = v1 - v0
            e2 = v2 - v0
            payload = (jnp.arange(tpad, dtype=jnp.int32),
                       v0[:, 0], v0[:, 1], v0[:, 2],
                       e1[:, 0], e1[:, 1], e1[:, 2],
                       e2[:, 0], e2[:, 1], e2[:, 2],
                       tri[:, 0], tri[:, 1], tri[:, 2])
            if stage == "sort2":
                s = jax.lax.sort((chi, payload[0]), num_keys=1)
                return jnp.sum(s[1])
            s = jax.lax.sort((chi,) + payload, num_keys=1)
            chs, s = s[0], s[1:]
            if stage == "sort":
                return sum(jnp.sum(x) for x in s[1:4]) + jnp.sum(s[0])
            leaf_codes = (chs[::LEAF], None)
            child, first, last = topology_pallas(
                L.adjacent_deltas(leaf_codes))
            if stage == "topo":
                return jnp.sum(child) + jnp.sum(s[1])
            sv0 = jnp.stack(s[1:4], axis=1)
            se1 = jnp.stack(s[4:7], axis=1)
            se2 = jnp.stack(s[7:10], axis=1)
            lmin, lmax, _, _ = L._leaf_boxes(sv0, se1, se2, LEAF)
            return jnp.sum(lmin) + jnp.sum(lmax) + jnp.sum(child)
        return jax.jit(fn)

    for st in ("gather", "codes", "sort2", "sort", "topo", "leafbox"):
        t = timed(lambda f=prefix(st): f(vv, ii))
        log(f"prefix[{st}]: {t:.2f} ms")

    # Full defer build + widen, per leaf size; plus rebuilt-tree trace.
    # Shadow rays generated ONCE from the leaf-14 rebuilt tree's closest
    # hits, so every leaf size traces identical rays.
    cam = sponza_interior_camera()
    Wd, Hd = 1920, 1080
    light = Light(direction=jnp.asarray([0.35, -1.0, 0.25]))
    so = sd = stm = None
    for leaf in (14, 21, 28):
        bvh0 = jax.jit(lambda v, i, l=leaf: L.build_lbvh(
            v, i, leaf_size=l, builder="search"))(vv, ii)
        nw_pad = W.round_up_bucket(max(W.count_wide(bvh0, mode="fixed"), 1))
        bd = jax.jit(lambda v, i, l=leaf: jnp.sum(
            L.build_lbvh(v, i, leaf_size=l, boxes="defer").tri_v0))
        t_build = timed(lambda: bd(vv, ii))
        reb = jax.jit(lambda v, i, l=leaf, p=nw_pad: W.widen_lbvh(
            L.build_lbvh(v, i, leaf_size=l, boxes="defer"),
            nw_pad=p, mode="fixed"))
        reb_scalar = jax.jit(lambda v, i, l=leaf, p=nw_pad: jnp.sum(
            W.widen_lbvh(L.build_lbvh(v, i, leaf_size=l, boxes="defer"),
                         nw_pad=p, mode="fixed").nodes))
        t_reb = timed(lambda: reb_scalar(vv, ii))
        kw = reb(vv, ii)
        if so is None:
            o, d = camera_rays(cam, Wd, Hd)
            o = o.reshape(-1, 3)
            d = d.reshape(-1, 3)
            t, tid = jax.jit(lambda a, o, d: trace_closest_pallas(a, o, d))(
                kw, o, d)
            gbuf = {"t": t.reshape(Hd, Wd), "tri_id": tid.reshape(Hd, Wd),
                    "position": (o + t[:, None] * d).reshape(Hd, Wd, 3),
                    "normal": jnp.zeros((Hd, Wd, 3)),
                    "valid": (tid >= 0).reshape(Hd, Wd)}
            so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
                g, l, 1e-3, None, scene_bounds=(b.root_min, b.root_max)))(
                    gbuf, light, kw)
        shade = jax.jit(lambda a, o, d, tm: jnp.sum(
            trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
        t_tr = timed(lambda: shade(kw, so, sd, stm))
        log(f"leaf={leaf}: build-defer {t_build:.2f} ms, "
            f"rebuild(+widen) {t_reb:.2f} ms, nw_pad={nw_pad}, "
            f"rebuilt-trace {t_tr:.2f} ms")
    log("probe_r3bi done")


if __name__ == "__main__":
    main()
