"""Probe r4i (CPU, exact): PRE-SPLIT REFERENCES for the config-2 rebuild.

The on-device Morton rebuild's trace gap vs the static SBVH is leaf
CONTENT, and half of SBVH's edge is spatial splits: Sponza's large
floor/wall triangles blow up every leaf box they touch. The classic
linear-time substitute (Ernst-Greiner 2007 early split clipping;
Karras-Aila 2013 triangle pre-splitting) splits big triangles' AABBs
into clipped sub-references BEFORE Morton coding, at a fixed reference
budget — embarrassingly parallel, so it maps to XLA with static shapes.

This probe answers, with the exact packet-walk counters (AS-BUILT child
order for shadow — the r4g lesson: cam-ordering DOUBLES shadow iters and
misled r4f), whether pre-splitting closes enough of the quality gap to
justify a device implementation:

  SBVH leaf14 (bound) | Morton fixed (r3 rebuild) | presplit x1.3 /
  x1.5 / x2.0 + fixed widen | presplit x1.5 + clipped vs full-tri leaf
  boxes (isolates the clip contribution).
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


def clip_aabb(tv, box, axis, m, side):
    """Exact AABB of (triangle ∩ half-space) ∩ box. tv: (3,3) vertices;
    side +1 keeps axis >= m, -1 keeps axis <= m. Returns (bmin, bmax) or
    None if empty."""
    pts = []
    for a in range(3):
        p, q = tv[a], tv[(a + 1) % 3]
        pa, qa = p[axis], q[axis]
        pin = (pa >= m) if side > 0 else (pa <= m)
        qin = (qa >= m) if side > 0 else (qa <= m)
        if pin:
            pts.append(p)
        if pin != qin and qa != pa:
            t = (m - pa) / (qa - pa)
            pts.append(p + t * (q - p))
    if not pts:
        return None
    pts = np.asarray(pts)
    lo = np.maximum(pts.min(axis=0), box[0])
    hi = np.minimum(pts.max(axis=0), box[1])
    if (lo > hi).any():
        return None
    return lo, hi


def presplit(verts, idx, budget_factor):
    """-> (ref_tri i32[R], ref_min f32[R,3], ref_max f32[R,3])."""
    t = verts[idx]                                   # (T, 3, 3)
    bmin = t.min(axis=1)
    bmax = t.max(axis=1)
    T = len(idx)
    extra = int(round((budget_factor - 1.0) * T))
    ext = bmax - bmin
    imp = ext.max(axis=1)                            # largest extent
    # Largest-remainder proportional allocation of split counts.
    raw = imp / imp.sum() * extra
    s = np.floor(raw).astype(np.int64)
    rem = extra - s.sum()
    if rem > 0:
        top = np.argsort(raw - s)[::-1][:rem]
        s[top] += 1
    refs_tri, refs_min, refs_max = [], [], []
    for i in range(T):
        if s[i] == 0:
            refs_tri.append(i)
            refs_min.append(bmin[i])
            refs_max.append(bmax[i])
            continue
        tv = t[i]
        # heap of (-max_extent, seq, (lo, hi)); split the fattest box.
        h = [(-(bmax[i] - bmin[i]).max(), 0, (bmin[i], bmax[i]))]
        seq = 1
        for _ in range(int(s[i])):
            _, _, (lo, hi) = heapq.heappop(h)
            axis = int(np.argmax(hi - lo))
            m = 0.5 * (lo[axis] + hi[axis])
            for side, bx in ((-1, (lo, np.where(np.arange(3) == axis,
                                                m, hi))),
                             (+1, (np.where(np.arange(3) == axis, m, lo),
                                   hi))):
                c = clip_aabb(tv, bx, axis, m, side)
                if c is not None:
                    heapq.heappush(h, (-(c[1] - c[0]).max(), seq, c))
                    seq += 1
            if not h:
                break
        for _, _, (lo, hi) in h:
            refs_tri.append(i)
            refs_min.append(lo)
            refs_max.append(hi)
    return (np.asarray(refs_tri, np.int32),
            np.asarray(refs_min, np.float32),
            np.asarray(refs_max, np.float32))


def build_presplit_accel(verts, idx, ref_tri, ref_min, ref_max,
                         leaf_size=14, clipped_leaf_boxes=True,
                         mode="fixed"):
    import jax.numpy as jnp
    from tpurt.bvh.lbvh import (LBVH, _assemble_node_boxes,
                                karras_topology)
    from tpurt.bvh.morton import morton_of_points
    from tpurt.bvh.wide import count_wide, round_up_bucket, widen_lbvh

    r = len(ref_tri)
    pad = (-r) % leaf_size
    if pad:
        ref_tri = np.concatenate([ref_tri, np.repeat(ref_tri[-1:], pad)])
        ref_min = np.concatenate([ref_min, np.repeat(ref_min[-1:], pad, 0)])
        ref_max = np.concatenate([ref_max, np.repeat(ref_max[-1:], pad, 0)])
    cent = 0.5 * (ref_min + ref_max)
    smin, smax = ref_min.min(axis=0), ref_max.max(axis=0)
    codes = np.asarray(morton_of_points(jnp.asarray(cent),
                                        jnp.asarray(smin),
                                        jnp.asarray(smax)))
    order = np.argsort(codes, kind="stable")
    ref_tri = ref_tri[order]
    ref_min = ref_min[order]
    ref_max = ref_max[order]
    codes = codes[order]

    tv = verts[idx[ref_tri]]                         # (R, 3, 3)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    nl = len(ref_tri) // leaf_size
    if clipped_leaf_boxes:
        lmin = ref_min.reshape(nl, leaf_size, 3).min(axis=1)
        lmax = ref_max.reshape(nl, leaf_size, 3).max(axis=1)
    else:
        t0 = tv.min(axis=1)
        t1 = tv.max(axis=1)
        lmin = t0.reshape(nl, leaf_size, 3).min(axis=1)
        lmax = t1.reshape(nl, leaf_size, 3).max(axis=1)

    child, first, last = karras_topology(
        (jnp.asarray(codes[::leaf_size]), None))
    nodes_box, rmin, rmax = _assemble_node_boxes(
        jnp.asarray(lmin), jnp.asarray(lmax), child, first, last)
    bvh = LBVH(nodes_box=nodes_box, nodes_child=child, nodes_first=first,
               nodes_last=last, tri_v0=jnp.asarray(v0),
               tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
               tri_sorted=jnp.asarray(idx[ref_tri]),
               tri_id=jnp.asarray(ref_tri), root_min=rmin, root_max=rmax,
               leaf_size=leaf_size)
    nw = round_up_bucket(max(count_wide(bvh, mode=mode), 1))
    return widen_lbvh(bvh, nw_pad=nw, from_node_boxes=True, mode=mode)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide,
                                order_children_for_point, round_up_bucket,
                                widen_lbvh)
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import to_packets
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    cam = sponza_interior_camera()
    verts = np.asarray(host_mesh.vertices)
    idx = np.asarray(host_mesh.indices)
    v = jnp.asarray(verts)
    i = jnp.asarray(idx)
    ldir = np.float32([0.25, 0.9, 0.2])
    ldir /= np.linalg.norm(ldir)

    def morton_fixed():
        b, dep = build_lbvh(v, i, leaf_size=14, boxes="defer",
                            want_depth=True)
        nw = round_up_bucket(max(count_wide(
            build_lbvh(v, i, leaf_size=14), mode="fixed"), 1))
        return widen_lbvh(b, nw_pad=nw, mode="fixed", depths=dep)

    accels = [("SBVH leaf14 (static bound)", build_wide(
        build_sah_lbvh(host_mesh, 14))),
        ("Morton fixed (r3 rebuild)", morton_fixed())]
    for bf in (1.3, 1.5, 2.0):
        rt, rmn, rmx = presplit(verts, idx, bf)
        log(f"presplit x{bf}: {len(rt)} refs")
        accels.append((f"presplit x{bf} fixed clip",
                       build_presplit_accel(verts, idx, rt, rmn, rmx)))
        if bf == 1.5:
            accels.append((f"presplit x{bf} fixed FULLBOX",
                           build_presplit_accel(verts, idx, rt, rmn, rmx,
                                                clipped_leaf_boxes=False)))
            accels.append((f"presplit x{bf} AREA clip",
                           build_presplit_accel(verts, idx, rt, rmn, rmx,
                                                mode="area")))

    o, d = generate_rays(cam, W, H)
    comps = [to_packets(jnp.asarray(x[..., c]).reshape(H, W))
             for x in (o, d) for c in range(3)]
    P = comps[0].shape[0]
    sel = np.random.default_rng(0).choice(P, size=40, replace=False)
    comps = [np.asarray(c)[sel] for c in comps]
    tmax = np.full_like(comps[0], 3.0e38)

    def tris_of(w):
        k = w.leaf_size
        rows = np.asarray(w.tris)
        return rows[:, :9 * k].reshape(rows.shape[0], k, 9)

    for name, acc in accels:
        k = acc.leaf_size
        # Closest walk on the CAM-ORDERED copy (production G-buffer);
        # shadow walk on the AS-BUILT order (production shadow — r4g).
        accp = order_children_for_point(acc, cam.position)
        nodes_cam = np.asarray(accp.nodes).reshape(-1, 8, 16)
        nodes_ab = np.asarray(acc.nodes).reshape(-1, 8, 16)
        lt = tris_of(acc)
        cp = cl = sp_ = sl = 0
        for p in range(len(sel)):
            ox, oy, oz = (comps[c][p].ravel() for c in range(3))
            dx, dy, dz = (comps[c][p].ravel() for c in range(3, 6))
            pops, lv, bt = walk_packet(nodes_cam, ox, oy, oz, dx, dy, dz,
                                       tmax[p].ravel(), lt, k,
                                       return_t=True)
            cp += pops
            cl += lv
            hit = bt < 1e37
            sox = ox + dx * bt
            soy = oy + dy * bt
            soz = oz + dz * bt
            stm = np.where(hit, 3.0e38, -1.0)
            pops, lv = walk_packet_any(
                nodes_ab, sox, soy, soz,
                np.full_like(sox, ldir[0]), np.full_like(sox, ldir[1]),
                np.full_like(sox, ldir[2]), stm, lt, k)
            sp_ += pops
            sl += lv
        n = len(sel)
        log(f"{name:30s} closest {cp / n:6.1f} pops {cl / n:6.1f} lv"
            f" | shadow AS-BUILT {sp_ / n:6.1f} pops {sl / n:6.1f} lv"
            f" | wide {acc.num_wide} leaves {lt.shape[0]}")


if __name__ == "__main__":
    main()
