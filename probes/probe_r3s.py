"""Round-3 probe S: decompose the fused-rebuild cost (18.24 ms r3 mid) and
measure the batched-collapse + packed-RMQ variants. All-XLA except the
known-good topology kernel — no new Mosaic compiles, no wedge risk."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=24, batches=4):
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
    from tpurt.bvh.morton import morton_of_points
    from tpurt.scenes import sponza_scene

    LEAF = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)

    build = jax.jit(lambda v, i: L.build_lbvh(v, i, leaf_size=LEAF))
    bvh = build(mesh.vertices, mesh.indices)
    nw_pad = W.round_up_bucket(max(W.count_wide(bvh), 1))
    ni = bvh.num_internal
    log(f"tris={mesh.num_triangles} leaves={bvh.num_leaves} ni={ni} "
        f"nw_pad={nw_pad}")

    # ---- full rebuild + build, current code --------------------------
    reb = jax.jit(lambda v, i: jnp.sum(W.widen_lbvh(
        L.build_lbvh(v, i, leaf_size=LEAF), nw_pad=nw_pad).nodes))
    t = timed(lambda: reb(mesh.vertices, mesh.indices))
    log(f"rebuild-fused(new): {t*1e3:.2f} ms")
    bs = jax.jit(lambda v, i: jnp.sum(build(v, i).nodes_box))
    t = timed(lambda: bs(mesh.vertices, mesh.indices))
    log(f"build-alone(new): {t*1e3:.2f} ms")

    # ---- collapse alone + sub-phases ----------------------------------
    wl = jax.jit(lambda b: jnp.sum(W.widen_lbvh(b, nw_pad=nw_pad).nodes))
    t = timed(lambda: wl(bvh))
    log(f"collapse-alone(new): {t*1e3:.2f} ms")

    child = bvh.nodes_child
    t = timed(lambda: jnp.sum(jax.jit(W.frontiers)(child)))
    log(f"  frontiers: {t*1e3:.2f} ms")
    t = timed(lambda: jnp.sum(jax.jit(W.node_depths)(child)))
    log(f"  node_depths: {t*1e3:.2f} ms")

    def plan_phase(child, nodes_box):
        front, wide = W._front_and_mask(child, nodes_box)
        ids = jnp.cumsum(wide.astype(jnp.int32)) - 1
        src = jnp.nonzero(wide, size=nw_pad, fill_value=ni - 1)[0]
        rows_front = front[src]
        is_pad = jnp.arange(nw_pad) >= jnp.sum(wide)
        return jnp.where(is_pad[:, None], W.EMPTY, rows_front), ids
    refs, ids = jax.jit(plan_phase)(child, bvh.nodes_box)
    t = timed(lambda: jnp.sum(jax.jit(
        lambda c, nb: plan_phase(c, nb)[0])(child, bvh.nodes_box)))
    log(f"  plan-phase(front+mask+nonzero): {t*1e3:.2f} ms")

    def asm(refs, ids, nodes_box, b):
        lmin, lmax = W._leaf_boxes_from_tris(b)
        return W._assemble_wide_nodes(refs, nodes_box, lmin, lmax, ids=ids)
    t = timed(lambda: jnp.sum(jax.jit(asm)(refs, ids, bvh.nodes_box, bvh)))
    log(f"  assembly-batched(+leafboxes): {t*1e3:.2f} ms")

    # ---- RMQ variants --------------------------------------------------
    lmin, lmax = jax.jit(W._leaf_boxes_from_tris)(bvh)
    first, last = bvh.nodes_first, bvh.nodes_last
    for name in ("gather", "packed"):
        fn = jax.jit(lambda a, b, f, l, n=name: jnp.sum(
            L.range_boxes(a, b, f, l, variant=n)[0]))
        t = timed(lambda: fn(lmin, lmax, first, last))
        log(f"  rmq-{name}: {t*1e3:.2f} ms")
    asmb = jax.jit(lambda a, b, c, f, l: jnp.sum(
        L._assemble_node_boxes(a, b, c, f, l)[0]))
    t = timed(lambda: asmb(lmin, lmax, child, first, last))
    log(f"  assemble_node_boxes(packed rmq): {t*1e3:.2f} ms")

    # ---- codes sub-phases ----------------------------------------------
    num_tris = int(mesh.indices.shape[0])
    tpad = -(-max(num_tris, 2 * LEAF) // LEAF) * LEAF
    pad = tpad - num_tris
    tri = jnp.concatenate([mesh.indices, jnp.broadcast_to(
        mesh.indices[-1:], (pad, 3))]).astype(jnp.int32)

    def vg(verts, tri):
        return verts[tri[:, 0]] + verts[tri[:, 1]] + verts[tri[:, 2]]
    t = timed(lambda: jnp.sum(jax.jit(vg)(mesh.vertices, tri)))
    log(f"  codes/vertex-gathers(3): {t*1e3:.2f} ms")

    def codes_full(verts, tri):
        v0 = verts[tri[:, 0]]
        v1 = verts[tri[:, 1]]
        v2 = verts[tri[:, 2]]
        tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
        tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
        c = (tmin + tmax) * 0.5
        return morton_of_points(c, tmin.min(0), tmax.max(0))
    t = timed(lambda: jnp.sum(jax.jit(codes_full)(mesh.vertices, tri)))
    log(f"  codes/full: {t*1e3:.2f} ms")

    cent = jax.jit(lambda v, t: (lambda v0, v1, v2: (
        jnp.minimum(jnp.minimum(v0, v1), v2)
        + jnp.maximum(jnp.maximum(v0, v1), v2)) * 0.5)(
            v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]))(mesh.vertices, tri)
    smin = jnp.min(cent, axis=0)
    smax = jnp.max(cent, axis=0)
    t = timed(lambda: jnp.sum(jax.jit(morton_of_points)(cent, smin, smax)))
    log(f"  codes/encode-only: {t*1e3:.2f} ms")

    # ---- sort payload cost ----------------------------------------------
    codes = jax.jit(codes_full)(mesh.vertices, tri)
    iota = jnp.arange(tpad, dtype=jnp.int32)
    f = jnp.ones((tpad,), jnp.float32)
    s1 = jax.jit(lambda c, i: jnp.sum(jax.lax.sort((c, i), num_keys=1)[1]))
    t = timed(lambda: s1(codes, iota))
    log(f"  sort/key+1: {t*1e3:.2f} ms")
    s13 = jax.jit(lambda c, i, f: jnp.sum(jax.lax.sort(
        (c, i) + (f,) * 12, num_keys=1)[1]))
    t = timed(lambda: s13(codes, iota, f))
    log(f"  sort/key+13: {t*1e3:.2f} ms")
    log("probe_r3s done")


if __name__ == "__main__":
    main()
