"""Probe r4d (CPU, exact): iteration counts of the 8-wide closest-hit
packet walk on Sponza interior primary rays, per child-ordering variant.

The interior attr G-buffer is 33.5 ms (28.3 plain closest + 4.7 attr);
VERDICT r4 wants <= 25. Before spending TPU time: is there ITERATION
slack left over the shipped per-frame camera-distance child ordering
(app.gbuffer_production -> order_children_for_point)? This walker
mirrors the kernel's push rules exactly (unordered LIFO stack, slab cap
= per-lane best_t, leaf test all-k, _child_anyhit8 semantics) in numpy,
so the counts are exact for any ordering:

  A. accel as built (no ordering)
  B. order_children_for_point(camera)     [production]
  C. order_children_octant + XOR visit    [kernels W8_OCTANT]
  D. B + XOR visit                        [the scrambling hazard]
  E. order_children_octant, no XOR visit

Counts: node pops/packet (the while-loop trip count == TPU serial cost)
and leaf tests/packet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def walk_packet(nodes, ox, oy, oz, dx, dy, dz, tmax, leaf_tris, k,
                xor_oct=False, return_t=False):
    """Exact mirror of _closest_w8_b_impl for ONE packet (1024 lanes).
    nodes: (Nw, 8, 16) rows; leaf_tris: (L, k, 9). Returns (pops,
    leaf_tests)."""
    ix = np.clip(1.0 / dx, -3.4e38, 3.4e38)
    iy = np.clip(1.0 / dy, -3.4e38, 3.4e38)
    iz = np.clip(1.0 / dz, -3.4e38, 3.4e38)
    t_min = 0.0
    active0 = tmax > t_min
    best_t = np.where(active0, tmax, -3.4e38)
    if xor_oct:
        oct_ = ((int(dx.sum() < 0) << 2) | (int(dy.sum() < 0) << 1)
                | int(dz.sum() < 0))
    stack = [0]
    pops = 0
    leaves = 0
    while stack and pops < 100000:
        node = stack.pop()
        pops += 1
        rec = nodes[node]                      # (8, 16)
        cap = np.where(active0, best_t, -3.4e38)
        order = range(8)
        if xor_oct:
            # kernel pushes rank 7..0 so rank 0 (nearest) pops first;
            # pop order is therefore rank ascending = visit near-first.
            # For the POP-equivalent sequential walk here, process
            # pushes in the kernel's push order.
            order = [r ^ oct_ for r in range(7, -1, -1)]
        pushed = []
        for c in order:
            b0, b1 = rec[c, 0:3], rec[c, 3:6]
            ref = int(rec[c, 6])
            valid = b0[0] <= b1[0]
            if not valid:
                continue
            lx = np.minimum((b0[0] - ox) * ix, (b1[0] - ox) * ix)
            hx = np.maximum((b0[0] - ox) * ix, (b1[0] - ox) * ix)
            ly = np.minimum((b0[1] - oy) * iy, (b1[1] - oy) * iy)
            hy = np.maximum((b0[1] - oy) * iy, (b1[1] - oy) * iy)
            lz = np.minimum((b0[2] - oz) * iz, (b1[2] - oz) * iz)
            hz = np.maximum((b0[2] - oz) * iz, (b1[2] - oz) * iz)
            enter = np.maximum(np.maximum(lx, ly), np.maximum(lz, t_min))
            exit_ = np.minimum(np.minimum(hx, hy), np.minimum(hz, cap))
            anyhit = bool((enter <= exit_).any())
            if not anyhit:
                continue
            if ref < 0:
                leaf = -ref - 1
                leaves += 1
                tri = leaf_tris[leaf]          # (k, 9)
                for j in range(k):
                    v0 = tri[j, 0:3]
                    e1 = tri[j, 3:6]
                    e2 = tri[j, 6:9]
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
                    ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                    t = np.where(ok, t, 3.4e38)
                    better = (t > t_min) & (t < best_t) & active0
                    best_t = np.where(better, t, best_t)
            else:
                pushed.append(ref)
        stack.extend(pushed)
    if return_t:
        return pops, leaves, best_t
    return pops, leaves


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, order_children_for_point,
                                order_children_octant)
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import to_packets
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    leaf = int(os.environ.get("R4D_LEAF", "14"))
    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    cam = sponza_interior_camera()
    sah = build_sah_lbvh(host_mesh, leaf)
    wide = build_wide(sah)
    k = wide.leaf_size
    log(f"leaf_size={k} wide_nodes={wide.num_wide}")

    o, d = generate_rays(cam, W, H)
    comps = [to_packets(jnp.asarray(x[..., c]).reshape(H, W))
             for x in (o, d) for c in range(3)]
    P = comps[0].shape[0]
    rng = np.random.default_rng(0)
    sel = rng.choice(P, size=48, replace=False)
    comps = [np.asarray(c)[sel] for c in comps]
    tmax = np.full_like(comps[0], 3.0e38)

    def tris_of(w):
        rows = np.asarray(w.tris)              # (L, 128)
        return rows[:, :9 * k].reshape(rows.shape[0], k, 9)

    variants = [
        ("A as-built", wide, False),
        ("B for_point(cam) [prod]", order_children_for_point(
            wide, cam.position), False),
        ("C octant slots + XOR", order_children_octant(wide), True),
        ("D for_point + XOR (hazard)", order_children_for_point(
            wide, cam.position), True),
        ("E octant slots, no XOR", order_children_octant(wide), False),
    ]
    for name, acc, xo in variants:
        nodes = np.asarray(acc.nodes).reshape(-1, 8, 16)
        lt = tris_of(acc)
        tp = tl = 0
        for p in range(len(sel)):
            pops, lv = walk_packet(
                nodes, comps[0][p].ravel(), comps[1][p].ravel(),
                comps[2][p].ravel(), comps[3][p].ravel(),
                comps[4][p].ravel(), comps[5][p].ravel(),
                tmax[p].ravel(), lt, k, xor_oct=xo)
            tp += pops
            tl += lv
        n = len(sel)
        log(f"{name:28s} pops/packet {tp / n:7.1f}  leaves/packet "
            f"{tl / n:7.1f}")


if __name__ == "__main__":
    main()
