"""Probe r4f (CPU, exact): config-2 rebuilt-tree quality — any-hit
SHADOW iteration counts on the three candidate accels, via the exact
numpy mirror of the 8-wide packet walks.

The strict config-2 metric needs the REBUILT tree's own trace close to
the static SBVH's (r3: 20.25 vs 7.86 ms). Counts predict trace time
(probe r4d: per-pop cost is ~1.05 us for both kernels), so this decides
whether sweep-SAH top-tree steering closes the gap BEFORE burning TPU
time:

  accels: SBVH leaf14 (static ref) | Morton leaf14 + fixed widen
          (r3 rebuild) | top_sah Morton leaf14 + fixed widen
  rays:   primary interior packets (closest counts) and their
          directional-light shadow rays (any-hit counts, early-exit
          checked every 4 pops like the kernel).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from probe_r4d import walk_packet  # exact closest walker


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def walk_packet_any(nodes, ox, oy, oz, dx, dy, dz, tmax, leaf_tris, k):
    """Exact mirror of _any_hit_kernel_w8 for ONE packet: per-lane
    occlusion masking, early exit checked every 4 pops."""
    ix = np.clip(1.0 / dx, -3.4e38, 3.4e38)
    iy = np.clip(1.0 / dy, -3.4e38, 3.4e38)
    iz = np.clip(1.0 / dz, -3.4e38, 3.4e38)
    t_min = 1e-4
    active0 = tmax > t_min
    occ = np.zeros(ox.shape, bool)
    stack = [0]
    pops = 0
    leaves = 0
    while stack and pops < 100000:
        node = stack.pop()
        pops += 1
        rec = nodes[node]
        lanes = active0 & ~occ
        cap = np.where(lanes, tmax, -3.4e38)
        pushed = []
        for c in range(8):
            b0, b1 = rec[c, 0:3], rec[c, 3:6]
            ref = int(rec[c, 6])
            if not (b0[0] <= b1[0]):
                continue
            lx = np.minimum((b0[0] - ox) * ix, (b1[0] - ox) * ix)
            hx = np.maximum((b0[0] - ox) * ix, (b1[0] - ox) * ix)
            ly = np.minimum((b0[1] - oy) * iy, (b1[1] - oy) * iy)
            hy = np.maximum((b0[1] - oy) * iy, (b1[1] - oy) * iy)
            lz = np.minimum((b0[2] - oz) * iz, (b1[2] - oz) * iz)
            hz = np.maximum((b0[2] - oz) * iz, (b1[2] - oz) * iz)
            enter = np.maximum(np.maximum(lx, ly), np.maximum(lz, t_min))
            exit_ = np.minimum(np.minimum(hx, hy), np.minimum(hz, cap))
            hit = (enter <= exit_) & lanes
            if not hit.any():
                continue
            if ref < 0:
                leaf = -ref - 1
                leaves += 1
                tri = leaf_tris[leaf]
                for j in range(k):
                    v0, e1, e2 = tri[j, 0:3], tri[j, 3:6], tri[j, 6:9]
                    px = dy * e2[2] - dz * e2[1]
                    py = dz * e2[0] - dx * e2[2]
                    pz = dx * e2[1] - dy * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    ok = np.abs(det) >= 1e-9
                    inv = 1.0 / np.where(ok, det, 1.0)
                    tx, ty, tz = ox - v0[0], oy - v0[1], oz - v0[2]
                    u = (tx * px + ty * py + tz * pz) * inv
                    qx = ty * e1[2] - tz * e1[1]
                    qy = tz * e1[0] - tx * e1[2]
                    qz = tx * e1[1] - ty * e1[0]
                    v = (dx * qx + dy * qy + dz * qz) * inv
                    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
                    ok = (ok & (u >= 0) & (u <= 1) & (v >= 0)
                          & (u + v <= 1) & (t > t_min) & (t < tmax))
                    occ = occ | (ok & active0)
            else:
                pushed.append(ref)
        stack.extend(pushed)
        if (pops & 3) == 3 and not (active0 & ~occ).any():
            break
    return pops, leaves


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

    leaf = int(os.environ.get("R4F_LEAF", "14"))
    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    cam = sponza_interior_camera()
    v = jnp.asarray(host_mesh.vertices)
    i = jnp.asarray(host_mesh.indices)
    ldir = np.float32([0.25, 0.9, 0.2])
    ldir /= np.linalg.norm(ldir)

    def morton_accel(top_sah, bits=30, ls=None):
        ls = ls or leaf
        b, dep = build_lbvh(v, i, leaf_size=ls, boxes="defer",
                            want_depth=True, top_sah=top_sah,
                            morton_bits=bits)
        nw = round_up_bucket(max(count_wide(
            build_lbvh(v, i, leaf_size=ls, top_sah=top_sah,
                       morton_bits=bits), mode="fixed"), 1))
        return widen_lbvh(b, nw_pad=nw, mode="fixed", depths=dep)

    if os.environ.get("R4F_SET") == "deep":
        # Full-depth sweep: every split above 8-leaf blocks chosen by
        # SAH (min_blocks 2, depth cap 32) — the max quality this
        # representation can express at block granularity.
        def full_accel(bvh, mode):
            nw = round_up_bucket(max(count_wide(bvh, mode=mode), 1))
            return widen_lbvh(bvh, nw_pad=nw, mode=mode)

        deep = (8, 32, 1)
        m_deep = build_lbvh(v, i, leaf_size=leaf, top_sah=deep)
        b4 = (4, 32, 1)
        m_b4 = build_lbvh(v, i, leaf_size=leaf, top_sah=b4)
        accels = [("deep sweep (8,32,1) AREA", full_accel(m_deep, "area")),
                  ("deep sweep (8,32,1) fixed", full_accel(m_deep,
                                                           "fixed")),
                  ("deep sweep (4,32,1) AREA", full_accel(m_b4, "area"))]
    elif os.environ.get("R4F_SET") == "ext2":
        # Decompose tree quality vs collapse quality.
        from tpurt.bvh.wide import build_wide as _bw

        def full_accel(bvh, mode):
            nw = round_up_bucket(max(count_wide(bvh, mode=mode), 1))
            return widen_lbvh(bvh, nw_pad=nw, mode=mode)

        mor = build_lbvh(v, i, leaf_size=leaf)
        mor_ts = build_lbvh(v, i, leaf_size=leaf, top_sah=True)
        sah = build_sah_lbvh(host_mesh, leaf)
        accels = [("Morton30 AREA widen", full_accel(mor, "area")),
                  ("Morton30 BFS widen", full_accel(mor, "bfs")),
                  ("Morton30+topsah AREA", full_accel(mor_ts, "area")),
                  ("SBVH FIXED widen", full_accel(sah, "fixed"))]
    elif os.environ.get("R4F_SET") == "ext":
        accels = [("Morton60 fixed", morton_accel(False, bits=60)),
                  ("Morton60 + top_sah", morton_accel(True, bits=60)),
                  ("Morton60 leaf8 fixed", morton_accel(False, bits=60,
                                                        ls=8))]
    else:
        accels = [("SBVH leaf14 (static)", build_wide(
            build_sah_lbvh(host_mesh, leaf))),
            ("Morton fixed widen (r3)", morton_accel(False)),
            ("top_sah fixed widen", morton_accel(True))]

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
        leaf = acc.leaf_size
        accp = order_children_for_point(acc, cam.position)
        nodes = np.asarray(accp.nodes).reshape(-1, 8, 16)
        lt = tris_of(accp)
        cp = cl = sp_ = sl = 0
        for p in range(len(sel)):
            ox, oy, oz = (comps[c][p].ravel() for c in range(3))
            dx, dy, dz = (comps[c][p].ravel() for c in range(3, 6))
            pops, lv, bt = walk_packet(nodes, ox, oy, oz, dx, dy, dz,
                                       tmax[p].ravel(), lt, leaf,
                                       return_t=True)
            cp += pops
            cl += lv
            # Shadow rays from the primary hits toward the light.
            hit = bt < 1e37
            sox = ox + dx * bt
            soy = oy + dy * bt
            soz = oz + dz * bt
            stm = np.where(hit, 3.0e38, -1.0)
            pops, lv = walk_packet_any(
                nodes, sox, soy, soz,
                np.full_like(sox, ldir[0]), np.full_like(sox, ldir[1]),
                np.full_like(sox, ldir[2]), stm, lt, leaf)
            sp_ += pops
            sl += lv
        n = len(sel)
        log(f"{name:26s} closest {cp / n:6.1f} pops {cl / n:6.1f} leaves"
            f" | shadow {sp_ / n:6.1f} pops {sl / n:6.1f} leaves")


if __name__ == "__main__":
    main()
