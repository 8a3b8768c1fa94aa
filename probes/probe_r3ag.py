"""Round-3 probe AG: decompose the fused rebuild's collapse cost + A/B
the traversal grid semantics.

The config-2 headline needs rebuild+collapse 11.9 -> ~8.4 ms. Build
alone is 7.1 (r3t), so the collapse adds ~4.8. Sub-phases measured here
(all on the deferred-box Morton rebuild, fixed frontier):
  a. leaf boxes (reshape min/max over sorted tris)
  b. a + RMQ packed sparse table build
  c. frontiers(fixed) + reachability + cumsum + nonzero(size=nw_pad)
  d. the full widen (a+b+c + assembly gathers)
Also: VERDICT r2 weak #9 — _GRID_SEMANTICS "arbitrary" vs "parallel"
on the hot shadow kernel, measured once behind the compile cache.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=24):
    fn()
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.bvh.lbvh import build_lbvh, range_boxes
    import tpurt.bvh.wide as W
    from tpurt.scenes import sponza_scene

    host_mesh = sponza_scene()
    mesh = jax.device_put(host_mesh)
    v, i = mesh.vertices, mesh.indices
    LEAF = 14

    bvh0 = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(v, i)
    nw_pad = W.round_up_bucket(max(W.count_wide(bvh0, mode="fixed"), 1))
    log(f"tris={host_mesh.indices.shape[0]} nw_pad={nw_pad} "
        f"n_leaves={bvh0.num_leaves}")

    def bld(v, i):
        return build_lbvh(v, i, leaf_size=LEAF, boxes="defer")

    # Baseline: build alone / build+widen. (Define the jitted fns ONCE:
    # a fresh lambda inside timed() retraces every call, ~1.9 s each.)
    f_build = jax.jit(lambda v, i: jnp.sum(bld(v, i).tri_v0))
    log(f"build alone: {timed(lambda: f_build(v, i)):.2f} ms")
    f_widen = jax.jit(lambda v, i: jnp.sum(
        W.widen_lbvh(bld(v, i), nw_pad=nw_pad, mode='fixed').nodes))
    log(f"build+widen: {timed(lambda: f_widen(v, i)):.2f} ms")

    # a. + leaf boxes.
    def fa(v, i):
        b = bld(v, i)
        lmin, lmax = W._leaf_boxes_from_tris(b)
        return jnp.sum(lmin) + jnp.sum(lmax)
    log(f"build+leafboxes: {timed(lambda g=jax.jit(fa): g(v, i)):.2f} ms")

    # b. + RMQ table (query all leaves' trivial ranges to force the table).
    def fb(v, i):
        b = bld(v, i)
        lmin, lmax = W._leaf_boxes_from_tris(b)
        q = jnp.arange(b.num_leaves, dtype=jnp.int32)
        wmin, wmax = range_boxes(lmin, lmax, q[:64], q[:64] + 7)
        return jnp.sum(wmin) + jnp.sum(wmax)
    log(f"build+leafboxes+RMQ(64q): {timed(lambda g=jax.jit(fb): g(v, i)):.2f} ms")

    # c. + frontier machinery (fixed cut + mask + cumsum + nonzero).
    def fc(v, i):
        b = bld(v, i)
        front, wide = W._front_and_mask(b.nodes_child, None, mode="fixed")
        ids = jnp.cumsum(wide.astype(jnp.int32)) - 1
        src = jnp.nonzero(wide, size=nw_pad,
                          fill_value=b.nodes_child.shape[0] - 1)[0]
        return jnp.sum(front[src]) + jnp.sum(ids)
    log(f"build+frontier: {timed(lambda g=jax.jit(fc): g(v, i)):.2f} ms")

    # Payload-attr rebuild (the production tables="attr" program).
    from tpurt.app import _rebuild_fused
    def fr(v, i):
        out = _rebuild_fused(v, i, mesh, LEAF, nw_pad, tables="attr",
                             textured=False)
        return (jnp.sum(out[1].nodes) + jnp.sum(out[4][0])
                + jnp.sum(out[4][1]))
    log(f"rebuild+collapse+ATTR(payload): {timed(lambda g=jax.jit(fr): g(v, i)):.2f} ms")
    def fs(v, i):
        out = _rebuild_fused(v, i, mesh, LEAF, nw_pad, tables="sto")
        return jnp.sum(out[1].nodes) + jnp.sum(out[3])
    log(f"rebuild+collapse+STO(prod):     {timed(lambda g=jax.jit(fs): g(v, i)):.2f} ms")

    # Grid-semantics A/B on the hot shadow kernel (VERDICT r2 weak #9).
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.camera import generate_rays
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
    import tpurt.kernels.traverse as T
    from tpurt.scenes import sponza_interior_camera
    from tpurt.types import Light

    cam = sponza_interior_camera()
    sbvh = build_sah_lbvh(host_mesh, LEAF)
    wide = jax.device_put(build_wide(sbvh))
    o, d = jax.jit(lambda: generate_rays(cam, 1920, 1080))()
    t, _, sidx = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True, gather_tri_id=False))(wide, o, d)
    gbuf = {"position": o + d * jnp.where(sidx >= 0, t, 0.0)[..., None],
            "gnormal": jnp.broadcast_to(jnp.float32([0, 1, 0]), o.shape),
            "valid": sidx >= 0}
    light = Light.directional((0.25, 0.9, 0.2))
    so, sd, stm = jax.jit(lambda g: shadow_ray_batch(
        g, light, 1e-3, None, scene_bounds=(wide.root_min,
                                            wide.root_max)))(gbuf)
    shade = jax.jit(lambda a, o_, d_, tm: jnp.sum(
        trace_any_pallas(a, o_, d_, tm).astype(jnp.int32)))
    log(f"shadow trace [arbitrary]: {timed(lambda: shade(wide, so, sd, stm), 48):.2f} ms")
    T._GRID_SEMANTICS = "parallel"
    try:
        shade2 = jax.jit(lambda a, o_, d_, tm: jnp.sum(
            trace_any_pallas(a, o_, d_, tm).astype(jnp.int32) + 0))
        log(f"shadow trace [parallel]:  {timed(lambda: shade2(wide, so, sd, stm), 48):.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"parallel semantics FAILED: {type(e).__name__}: {str(e)[:200]}")
    finally:
        T._GRID_SEMANTICS = "arbitrary"
    log("probe_r3ag done")


if __name__ == "__main__":
    main()
# (appended) payload-attr rebuild timing — python probes/probe_r3ag.py pay
