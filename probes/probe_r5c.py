"""Probe r5c (CPU, exact): quality of the BLOCK-STRUCTURED adaptive-cut
scheme — the one the device can build without a random re-gather.

Scheme: keep all grid cuts (every cap=14, as today) and additionally
split the top-M blocks at their single best INTERNAL boundary (max
score, offset 1..13). Leaf count is exactly T/14 + M (static — sized to
the ~30k SMEM topology-kernel gate), and the tri-block expansion is
pure per-block vector shifts + selects (no [L*cap] random gather, which
costs ~8-10 ms at Sponza scale on this latency-bound platform).

vs probe r5b's free-position thresh (shadow 5.3-5.9 pops): how much
quality does the one-split-per-block restriction cost?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from probe_r4d import walk_packet
from probe_r4f import walk_packet_any
from probe_r5a import half_area


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def runs_block(score, T, cap, M):
    """Grid cuts every cap + top-M blocks split at their best internal
    boundary. score[b] scores the boundary AFTER sorted position b."""
    nb = T // cap
    # internal boundary positions of block k: k*cap + 1 .. k*cap + cap-1
    # (boundary index into score[] is position-1)
    sc = np.full((nb, cap - 1), -1.0)
    for off in range(1, cap):
        pos = np.arange(nb) * cap + off        # cut BEFORE this position
        bidx = pos - 1                         # score index
        ok = bidx < score.shape[0]
        sc[ok, off - 1] = score[bidx[ok]]
    best_off = sc.argmax(axis=1) + 1
    best_sc = sc.max(axis=1)
    split = np.zeros(nb, bool)
    split[np.argsort(-best_sc)[:M]] = True
    is_cut = np.zeros(T, bool)
    is_cut[::cap] = True
    cutpos = np.arange(nb) * cap + best_off
    is_cut[cutpos[split & (cutpos < T)]] = True
    starts = np.nonzero(is_cut)[0].astype(np.int64)
    lens = np.diff(np.concatenate([starts, [T]])).astype(np.int64)
    assert lens.max() <= cap
    return starts, lens


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpurt.bvh.lbvh import LBVH, _assemble_node_boxes, karras_topology
    from tpurt.bvh.morton import morton_of_points
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import to_packets
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    cap = 14
    W, H = 1920, 1080
    mesh = sponza_scene(260_000)
    cam = sponza_interior_camera()
    v = np.asarray(mesh.vertices, np.float32)
    idx = np.asarray(mesh.indices, np.int64)
    T = idx.shape[0]
    p0, p1, p2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    cen = (tmin + tmax) * 0.5
    smin, smax = tmin.min(0), tmax.max(0)
    codes = np.asarray(morton_of_points(jnp.asarray(cen), jnp.asarray(smin),
                                        jnp.asarray(smax)))
    order = np.argsort(codes, kind="stable").astype(np.int64)
    codes_s = codes[order]
    tmin_s, tmax_s = tmin[order], tmax[order]

    score_delta = (codes_s[:-1].astype(np.uint64)
                   ^ codes_s[1:].astype(np.uint64)).astype(np.float64)
    umin = np.minimum(tmin_s[:-1], tmin_s[1:])
    umax = np.maximum(tmax_s[:-1], tmax_s[1:])
    score_area = half_area(umin, umax)

    def lbvh_from_runs(starts, lens):
        slot = np.arange(cap, dtype=np.int64)
        rows = starts[:, None] + np.minimum(slot[None, :], lens[:, None] - 1)
        flat = order[rows.reshape(-1)]
        tri = idx[flat]
        tv0 = v[tri[:, 0]]
        te1 = v[tri[:, 1]] - tv0
        te2 = v[tri[:, 2]] - tv0
        lmin = np.minimum.reduceat(tmin_s, starts)
        lmax = np.maximum.reduceat(tmax_s, starts)
        leaf_codes = codes_s[starts].astype(np.uint32)
        child, first, last = karras_topology((jnp.asarray(leaf_codes), None))
        nodes_box, rmin, rmax = _assemble_node_boxes(
            jnp.asarray(lmin), jnp.asarray(lmax), child, first, last)
        return LBVH(nodes_box=nodes_box, nodes_child=child,
                    nodes_first=first, nodes_last=last,
                    tri_v0=jnp.asarray(tv0), tri_e1=jnp.asarray(te1),
                    tri_e2=jnp.asarray(te2),
                    tri_sorted=jnp.asarray(tri.astype(np.int32)),
                    tri_id=jnp.asarray(flat.astype(np.int32)),
                    root_min=rmin, root_max=rmax, leaf_size=cap)

    ldir = np.float32([0.25, 0.9, 0.2])
    ldir /= np.linalg.norm(ldir)
    o, d = generate_rays(cam, W, H)
    comps = [to_packets(jnp.asarray(x2[..., c]).reshape(H, W))
             for x2 in (o, d) for c in range(3)]
    P = comps[0].shape[0]
    sel = np.random.default_rng(0).choice(P, size=40, replace=False)
    comps = [np.asarray(c)[sel] for c in comps]
    ray_tmax = np.full_like(comps[0], 3.0e38)

    def tris_of(w):
        k = w.leaf_size
        rows = np.asarray(w.tris)
        return rows[:, :9 * k].reshape(rows.shape[0], k, 9)

    def measure(name, bvh, nleaves):
        acc = build_wide(bvh)
        accp = order_children_for_point(acc, cam.position)
        nodes_p = np.asarray(accp.nodes).reshape(-1, 8, 16)
        nodes_b = np.asarray(acc.nodes).reshape(-1, 8, 16)
        lt_p = tris_of(accp)
        lt_b = tris_of(acc)
        k = acc.leaf_size
        cp = cl = sp_ = sl = 0
        for p in range(len(sel)):
            ox, oy, oz = (comps[c][p].ravel() for c in range(3))
            dx, dy, dz = (comps[c][p].ravel() for c in range(3, 6))
            pops, lv, bt = walk_packet(nodes_p, ox, oy, oz, dx, dy, dz,
                                       ray_tmax[p].ravel(), lt_p, k,
                                       return_t=True)
            cp += pops
            cl += lv
            hit = bt < 1e37
            pops, lv = walk_packet_any(
                nodes_b, ox + dx * bt, oy + dy * bt, oz + dz * bt,
                np.full_like(ox, ldir[0]), np.full_like(ox, ldir[1]),
                np.full_like(ox, ldir[2]),
                np.where(hit, 3.0e38, -1.0), lt_b, k)
            sp_ += pops
            sl += lv
        n = len(sel)
        log(f"{name:26s} L={nleaves:6d} wide={acc.num_wide:6d}"
            f" | closest {cp / n:6.1f} pops {cl / n:5.1f} lf"
            f" | shadow {sp_ / n:6.1f} pops {sl / n:5.1f} lf")

    variants = [
        ("block delta M=T/28", score_delta, T // 28),
        ("block delta M=T/14", score_delta, T // 14),
        ("block delta M=11400", score_delta, 11400),
        ("block area M=11400", score_area, 11400),
    ]
    for name, score, M in variants:
        starts, lens = runs_block(score, T, cap, M)
        log(f"{name}: {len(starts)} runs, occ {lens.mean():.1f}")
        measure(name, lbvh_from_runs(starts, lens), len(starts))


if __name__ == "__main__":
    main()
