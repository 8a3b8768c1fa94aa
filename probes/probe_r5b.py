"""Probe r5b (CPU, exact): parameter sweep for the adaptive-leaf-cut
("thresh") rebuild strategy that probe r5a found near-PLOC quality at
vector-ops cost.

Axes: natural-cut count M (T/M_div), leaf cap, and score function
(union-box area vs Morton adjacent delta — delta needs NO sort on
device: integer histogram threshold). Total leaf count L gates the SMEM
topology kernel (~30k leaves at 8 i32 arrays in 1 MB SMEM), so the
sweep reports L alongside quality.
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


def runs_thresh(score, cap, M):
    T = score.shape[0] + 1
    kth = np.partition(score, T - 1 - M)[T - 1 - M]
    nat = score >= kth
    cutpos = np.where(nat, np.arange(1, T), 0)
    seg_start = np.maximum.accumulate(np.concatenate([[0], cutpos]))
    off = np.arange(T) - seg_start
    forced = (off > 0) & (off % cap == 0)
    is_cut = np.zeros(T, bool)
    is_cut[1:] |= nat
    is_cut |= forced
    is_cut[0] = True
    starts = np.nonzero(is_cut)[0].astype(np.int64)
    lens = np.diff(np.concatenate([starts, [T]])).astype(np.int64)
    assert lens.max() <= cap, lens.max()
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

    # scores
    umin = np.minimum(tmin_s[:-1], tmin_s[1:])
    umax = np.maximum(tmax_s[:-1], tmax_s[1:])
    score_area = half_area(umin, umax)
    x = codes_s[:-1].astype(np.uint64) ^ codes_s[1:].astype(np.uint64)
    # delta score: higher = bigger Morton jump (use xor magnitude)
    score_delta = x.astype(np.float64)

    def lbvh_from_runs(starts, lens, cap):
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
        log(f"{name:24s} L={nleaves:6d} wide={acc.num_wide:6d}"
            f" | closest {cp / n:6.1f} pops {cl / n:5.1f} lf"
            f" | shadow {sp_ / n:6.1f} pops {sl / n:5.1f} lf")

    # NB: the row-kernel leaf layout caps k at 14 (9*k floats must fit a
    # 128-lane row); cap16 would need the transposed (w8t) leaf layout.
    variants = [
        ("area M=T/10 cap14", score_area, 10, 14),
        ("area M=T/28 cap14", score_area, 28, 14),
        ("area M=T/20 cap14", score_area, 20, 14),
        ("delta M=T/14 cap14", score_delta, 14, 14),
    ]
    for name, score, mdiv, cap in variants:
        starts, lens = runs_thresh(score, cap, T // mdiv)
        log(f"{name}: {len(starts)} runs, occ {lens.mean():.1f}")
        measure(name, lbvh_from_runs(starts, lens, cap), len(starts))


if __name__ == "__main__":
    main()
