"""Round-3 probe AC: settle the "auto" G-buffer strategy for REBUILD mode.

Static/refit scenes already resolve auto->ray (SAH trace 2x faster and the
attr kernel halved the ray G-buffer again). Rebuild mode still resolves
auto->raster on compiled backends, justified by the Morton tree's slow
closest hit (round 2). Re-measure with the attr kernel: 1080p Sponza,
per-frame Morton tree (fixed-frontier collapse, deferred boxes), attr
G-buffer vs the tile rasterizer (v2, 64.5 ms static-tree number), plus
the rebuild-table cost delta (st+st_orig+attrs vs trimmed sets).
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=20):
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

    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import (count_wide, round_up_bucket, widen_lbvh,
                                order_children_for_point)
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shading import (make_leaf_attr_rows, make_shade_table,
                                      make_shade_table_orig)
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    host_mesh = sponza_scene()
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    W, H = 1920, 1080
    LEAF = 14
    v, i = mesh.vertices, mesh.indices

    bvh0 = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(v, i)
    nw_pad = round_up_bucket(max(count_wide(bvh0, mode="fixed"), 1))
    log(f"tris={host_mesh.indices.shape[0]} nw_pad={nw_pad}")

    # The production rebuild program variants (build+collapse+tables):
    def reb_all(v, i):
        b = build_lbvh(v, i, leaf_size=LEAF, boxes="defer")
        w = widen_lbvh(b, nw_pad=nw_pad, mode="fixed")
        st = make_shade_table(b, mesh)
        sto = make_shade_table_orig(mesh)
        at = make_leaf_attr_rows(b, mesh)
        return (jnp.sum(w.nodes) + jnp.sum(st) + jnp.sum(sto)
                + jnp.sum(at[0]) + jnp.sum(at[1]))

    def reb_attr_only(v, i):
        b = build_lbvh(v, i, leaf_size=LEAF, boxes="defer")
        w = widen_lbvh(b, nw_pad=nw_pad, mode="fixed")
        at = make_leaf_attr_rows(b, mesh)
        return jnp.sum(w.nodes) + jnp.sum(at[0]) + jnp.sum(at[1])

    def reb_sto_only(v, i):
        b = build_lbvh(v, i, leaf_size=LEAF, boxes="defer")
        w = widen_lbvh(b, nw_pad=nw_pad, mode="fixed")
        return jnp.sum(w.nodes) + jnp.sum(make_shade_table_orig(mesh))

    def reb_bare(v, i):
        b = build_lbvh(v, i, leaf_size=LEAF, boxes="defer")
        w = widen_lbvh(b, nw_pad=nw_pad, mode="fixed")
        return jnp.sum(w.nodes)

    for name, f in (("bare", reb_bare), ("sto-only", reb_sto_only),
                    ("attr-only", reb_attr_only), ("all-tables", reb_all)):
        log(f"rebuild+collapse [{name}]: {timed(lambda f=f: jax.jit(f)(v, i)):.2f} ms")

    # Attr G-buffer on the REBUILT Morton tree (auto-strategy question).
    reb = jax.jit(lambda v, i: widen_lbvh(
        build_lbvh(v, i, leaf_size=LEAF, boxes="defer"),
        nw_pad=nw_pad, mode="fixed"))(v, i)
    bvh_m = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(v, i)
    at_m = jax.jit(make_leaf_attr_rows)(bvh_m, mesh)
    acc = jax.device_put(order_children_for_point(
        reb, jnp.asarray(cam.position)))

    def gb(a, a0, a1):
        g = gbuffer_attr_pass(a, (a0, a1), mesh, cam, W, H)
        return (g["position"].sum() + g["normal"].sum() + g["albedo"].sum()
                + g["tri_id"].sum() + g["valid"].sum())
    f = jax.jit(gb)
    log(f"attr G-buffer on Morton rebuild tree: "
        f"{timed(lambda: f(acc, at_m[0], at_m[1])):.2f} ms "
        f"(static-tree raster v2 was 64.5; static SBVH attr 13.5)")
    log("probe_r3ac done")


if __name__ == "__main__":
    main()
