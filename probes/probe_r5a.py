"""Probe r5a (CPU, exact): can adaptive leaf CUTS of the Morton curve —
variable-length contiguous runs instead of fixed 14-chops — close the
rebuilt-tree leaf-content gap vs SBVH?

Round-4 verdict: topology steering plateaued at ~16 shadow pops/packet
(SBVH 3.0) and the rest of the edge is leaf CONTENT (spatially-compact
SAH leaves vs 14-chops of the curve). VERDICT r4 #1 proposes a PLOC-
style cluster pass. Because clusters formed by merging ONLY adjacent
runs of the sorted order stay contiguous, the whole existing machinery
(Karras over per-leaf codes, RMQ, widen, repeat-padded leaf blocks like
the SBVH path) works unchanged — the question is pure QUALITY, which
this probe answers with the exact packet walkers before any TPU time:

  strategies (all over the same Morton sort, leaf cap 14):
    chop14        fixed chops (current rebuild; anchor ~12.9 device it)
    thresh        top-M union-area boundary cuts + cap-forced fills
    ploc-heap-a   exact greedy adjacent merge, union-area cost
    ploc-heap-s   exact greedy adjacent merge, SAH delta cost
    ploc-rounds   round-based mutual-merge (the device-buildable form)
    sbvh          native SBVH (quality ceiling anchor)

  counts: closest pops/leaves on the cam-ordered copy (G-buffer path),
  shadow pops/leaves on the AS-BUILT accel (production shadow path,
  probe r4g correction).
"""

import heapq
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from probe_r4d import walk_packet
from probe_r4f import walk_packet_any


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def half_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def runs_chop(T, cap):
    starts = np.arange(0, T, cap, dtype=np.int64)
    lens = np.minimum(T - starts, cap)
    return starts, lens


def runs_thresh(tmin_s, tmax_s, cap, M):
    """Top-M cuts by union-box area across each boundary, then forced
    cuts every cap within natural segments (the fully-vectorized
    on-device candidate)."""
    T = tmin_s.shape[0]
    umin = np.minimum(tmin_s[:-1], tmin_s[1:])
    umax = np.maximum(tmax_s[:-1], tmax_s[1:])
    score = half_area(umin, umax)
    # natural cut AFTER position b (b in 0..T-2) for top-M scores
    kth = np.partition(score, T - 1 - M)[T - 1 - M]
    nat = score >= kth
    # cap-forced: within each natural segment, cut at offsets cap, 2cap...
    cutpos = np.where(nat, np.arange(1, T), 0)  # cut index = pos after b
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


def runs_ploc_heap(tmin_s, tmax_s, cap, target, cost="area"):
    """Exact greedy: repeatedly merge the cheapest adjacent pair of runs
    (respecting cap) until `target` runs remain. Linked list + heap."""
    T = tmin_s.shape[0]
    bmin = tmin_s.copy()
    bmax = tmax_s.copy()
    cnt = np.ones(T, np.int64)
    start = np.arange(T, dtype=np.int64)
    nxt = np.arange(1, T + 1, dtype=np.int64)
    prv = np.arange(-1, T - 1, dtype=np.int64)
    alive = np.ones(T, bool)
    ver = np.zeros(T, np.int64)

    def pair_cost(i, j):
        um = np.minimum(bmin[i], bmin[j])
        ux = np.maximum(bmax[i], bmax[j])
        a = half_area(um, ux)
        if cost == "sah":
            return (a * (cnt[i] + cnt[j])
                    - half_area(bmin[i], bmax[i]) * cnt[i]
                    - half_area(bmin[j], bmax[j]) * cnt[j])
        return a

    heap = []
    for i in range(T - 1):
        heap.append((pair_cost(i, i + 1), i, 0, 0))
    heapq.heapify(heap)
    n = T
    while n > target and heap:
        c, i, vi, vj = heapq.heappop(heap)
        j = nxt[i]
        if not alive[i] or j >= T or not alive[j]:
            continue
        if ver[i] != vi or ver[j] != vj:
            continue
        if cnt[i] + cnt[j] > cap:
            continue
        # merge j into i
        bmin[i] = np.minimum(bmin[i], bmin[j])
        bmax[i] = np.maximum(bmax[i], bmax[j])
        cnt[i] += cnt[j]
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[i] < T:
            prv[nxt[i]] = i
        ver[i] += 1
        n -= 1
        if cnt[i] < cap:
            p = prv[i]
            if p >= 0 and alive[p] and cnt[p] + cnt[i] <= cap:
                heapq.heappush(heap, (pair_cost(p, i), p, ver[p], ver[i]))
            k = nxt[i]
            if k < T and alive[k] and cnt[i] + cnt[k] <= cap:
                heapq.heappush(heap, (pair_cost(i, k), i, ver[i], ver[k]))
    starts = start[alive]
    lens = cnt[alive]
    return starts.astype(np.int64), lens.astype(np.int64)


def runs_ploc_rounds(tmin_s, tmax_s, cap, target, rounds=24):
    """Round-based mutual-preference adjacent merging — the shape a
    vectorized on-device pass would take. Each round: every run picks
    its cheaper neighbour; mutually-picked pairs below the round's
    cost percentile merge (cap-respecting); runs compact."""
    bmin = tmin_s.copy()
    bmax = tmax_s.copy()
    cnt = np.ones(tmin_s.shape[0], np.int64)
    start = np.arange(tmin_s.shape[0], dtype=np.int64)
    for _ in range(rounds):
        n = cnt.shape[0]
        if n <= target:
            break
        um = np.minimum(bmin[:-1], bmin[1:])
        ux = np.maximum(bmax[:-1], bmax[1:])
        pc = half_area(um, ux)
        okcap = (cnt[:-1] + cnt[1:]) <= cap
        pc = np.where(okcap, pc, np.inf)
        left = np.concatenate([[np.inf], pc])    # cost with left nbr
        right = np.concatenate([pc, [np.inf]])
        prefer_right = right <= left
        # pair (i, i+1) merges if i prefers right and i+1 prefers left
        mutual = prefer_right[:-1] & ~prefer_right[1:] & okcap
        # keep merges below an adaptive threshold: cheapest 60% of
        # mutual pairs (drives convergence without bad merges)
        mc = pc[mutual]
        if mc.size == 0:
            break
        thr = np.quantile(mc, 0.6)
        merge = mutual & (pc <= thr)
        # never exceed the target: if this round would overshoot, keep
        # only the cheapest merges
        overshoot = n - merge.sum() < target
        if overshoot:
            need = n - target
            mi = np.nonzero(merge)[0]
            keep = mi[np.argsort(pc[mi])[:need]]
            merge = np.zeros_like(merge)
            merge[keep] = True
        keep_row = np.ones(n, bool)
        keep_row[1:][merge] = False            # row i+1 folds into i
        nbmin = bmin.copy()
        nbmax = bmax.copy()
        ncnt = cnt.copy()
        mi = np.nonzero(merge)[0]
        nbmin[mi] = np.minimum(bmin[mi], bmin[mi + 1])
        nbmax[mi] = np.maximum(bmax[mi], bmax[mi + 1])
        ncnt[mi] = cnt[mi] + cnt[mi + 1]
        bmin, bmax = nbmin[keep_row], nbmax[keep_row]
        cnt, start = ncnt[keep_row], start[keep_row]
    return start, cnt


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpurt.bvh.lbvh import LBVH, _assemble_node_boxes, karras_topology
    from tpurt.bvh.morton import morton_of_points
    from tpurt.bvh.sah import build_sah_lbvh
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

    def lbvh_from_runs(starts, lens):
        L = starts.shape[0]
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
    comps = [to_packets(jnp.asarray(x[..., c]).reshape(H, W))
             for x in (o, d) for c in range(3)]
    P = comps[0].shape[0]
    sel = np.random.default_rng(0).choice(P, size=40, replace=False)
    comps = [np.asarray(c)[sel] for c in comps]
    ray_tmax = np.full_like(comps[0], 3.0e38)

    def tris_of(w):
        k = w.leaf_size
        rows = np.asarray(w.tris)
        return rows[:, :9 * k].reshape(rows.shape[0], k, 9)

    def measure(name, bvh, nleaves):
        acc = build_wide(bvh)                       # as-built (shadow path)
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
        log(f"{name:22s} L={nleaves:6d} wide={acc.num_wide:6d}"
            f" | closest {cp / n:6.1f} pops {cl / n:5.1f} lf"
            f" | shadow(as-built) {sp_ / n:6.1f} pops {sl / n:5.1f} lf")

    tgt10 = T // 10
    strategies = [
        ("chop14", lambda: runs_chop(T, cap)),
        ("thresh M=T/14", lambda: runs_thresh(tmin_s, tmax_s, cap, T // 14)),
        ("ploc-heap area T/10", lambda: runs_ploc_heap(
            tmin_s, tmax_s, cap, tgt10, "area")),
        ("ploc-heap sah T/10", lambda: runs_ploc_heap(
            tmin_s, tmax_s, cap, tgt10, "sah")),
        ("ploc-heap area T/14", lambda: runs_ploc_heap(
            tmin_s, tmax_s, cap, T // 14, "area")),
        ("ploc-rounds T/10", lambda: runs_ploc_rounds(
            tmin_s, tmax_s, cap, tgt10)),
    ]
    for name, fn in strategies:
        starts, lens = fn()
        log(f"{name}: {len(starts)} runs, occ {lens.mean():.1f}, "
            f"max {lens.max()}")
        measure(name, lbvh_from_runs(starts, lens), len(starts))

    sah = build_sah_lbvh(mesh, cap)
    if sah is not None:
        measure("sbvh (anchor)", sah, sah.num_leaves)


if __name__ == "__main__":
    main()
