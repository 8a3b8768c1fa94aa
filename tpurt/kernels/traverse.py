"""Pallas TPU wavefront packet-traversal kernel.

TPU-native replacement for the reference's per-pixel BVH walk
(Source/Shaders/RayTracedShadows.comp ``castShadowRay``: stackless skip-link
loop, one SIMT thread per pixel [RECALL]). TPUs have no SIMT divergence
machinery — a Pallas program owns an entire 8x128 VPU tile — so the design is
classic *packet traversal* re-shaped for the VPU:

- One grid step = one packet of 8x128 = 1024 rays, cut from a 32x32 pixel
  tile (spatially coherent, so the packet's node-visit union stays small —
  the coherence the reference gets from SIMT warps on adjacent pixels).
- One *shared* traversal stack per packet, held in SMEM and driven by the
  scalar core while the VPU does 1024-wide box/triangle tests: a node is
  descended if ANY active lane hits its box.
- Node fetch = one dynamic row load. Binary nodes pack 8 per 128-lane VMEM
  row (kernels/pack.py) with a 3-level vector-select picking the record;
  8-wide nodes occupy one full row each (bvh/wide.py). Record scalars are
  extracted at compile-time lane offsets.
- Leaf fetch = one aligned row load: all leaf triangles live in one 128-lane
  row; Möller–Trumbore runs for all lanes x leaf-tris with static offsets.
- Any-hit mode keeps a per-lane ``occluded`` mask and exits as soon as every
  active lane is resolved (the reference's early-out, but packet-wide);
  closest-hit mode keeps per-lane (best_t, best_index) and culls nodes
  against the per-lane best_t.
- Whole-packet skips: padding/sky packets (all t_max <= 0) never enter the
  loop — the reference's invalid-pixel skip, amortized to packet granularity.

The BVH (nodes + leaf triangles) is VMEM-resident: ~(16 + 9.15) bytes/tri
at leaf_size 14, so Sponza-class scenes (~260k tris) fit in ~6.7 MB.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.lbvh import LBVH
from .pack import NODES_PER_ROW, PackedBVH, pack_bvh

STACK_DEPTH = 128  # 60-bit keys: delta <= ~93 -> depth bound ~94
TILE = 32  # 32x32 pixel tile -> one 8x128 packet
_BIG = 3.4e38  # plain float: a jnp scalar would be captured as a kernel const
# Safety cap on traversal iterations per packet: every node is pushed at
# most once (tree), so pops <= Ni + 1; anything beyond that is a corrupted
# walk. The cap guarantees a runaway loop can NEVER spin the TPU forever and
# wedge the device (observed during bring-up: a hung kernel takes the whole
# terminal down with it).


def _iter_cap(num_internal: int) -> int:
    return 2 * num_internal + 64


def _compiled_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _load_node(ns_ref, node):
    """-> ((1,16) record, childL i32, childR i32).

    The 16-float group is selected with a 3-level vector-select tree (three
    cheap VPU selects) instead of an 8-way lax.switch: scalar branches cost
    real cycles on the while-loop hot path.
    """
    row = ns_ref[pl.ds(node >> 3, 1), :]                      # (1, 128)
    grp = node & 7
    h = jnp.where((grp & 4) > 0, row[:, 64:128], row[:, 0:64])   # (1, 64)
    q = jnp.where((grp & 2) > 0, h[:, 32:64], h[:, 0:32])        # (1, 32)
    rec = jnp.where((grp & 1) > 0, q[:, 16:32], q[:, 0:16])      # (1, 16)
    children = rec[:, 12:14].astype(jnp.int32)  # float-encoded exact ints
    return rec, children[0, 0], children[0, 1]


def _inv3(dx, dy, dz):
    """Clamped inverse directions: finite +/-_BIG instead of inf so slab
    products are NaN-free (0 * BIG = 0, unlike 0 * inf = NaN)."""
    return (jnp.clip(1.0 / dx, -_BIG, _BIG),
            jnp.clip(1.0 / dy, -_BIG, _BIG),
            jnp.clip(1.0 / dz, -_BIG, _BIG))


def _slab(rec, off, ox, oy, oz, ix, iy, iz, t_min, t_cap):
    """Packet ray-AABB test for the child box at record offset ``off``.

    Returns bool (8,128). NaNs (origin on slab plane of an axis-parallel
    ray) resolve hit-permissively, matching the oracle/JAX paths.
    """
    bx0, by0, bz0 = rec[0, off], rec[0, off + 1], rec[0, off + 2]
    bx1, by1, bz1 = rec[0, off + 3], rec[0, off + 4], rec[0, off + 5]

    # Callers clamp inv to finite (+/-_BIG), so t0/t1 can overflow to inf
    # but can never be NaN -- the 12 NaN-cleanup ops per slab are gone.
    def axis(b0, b1, o, inv):
        t0 = (b0 - o) * inv
        t1 = (b1 - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    lx, hx = axis(bx0, bx1, ox, ix)
    ly, hy = axis(by0, by1, oy, iy)
    lz, hz = axis(bz0, bz1, oz, iz)
    enter = jnp.maximum(jnp.maximum(lx, ly), jnp.maximum(lz, t_min))
    exit_ = jnp.minimum(jnp.minimum(hx, hy), jnp.minimum(hz, t_cap))
    return enter <= exit_


def _leaf_ts(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz, eps=1e-9):
    """Möller–Trumbore for all ``k`` leaf triangles -> list of t (8,128)
    arrays (inf = miss). Lane offsets are static; only the row is dynamic."""
    row = tr_ref[pl.ds(leaf_id, 1), :]                        # (1, 128)
    ts = []
    for j in range(k):
        b = 9 * j
        v0x, v0y, v0z = row[0, b], row[0, b + 1], row[0, b + 2]
        e1x, e1y, e1z = row[0, b + 3], row[0, b + 4], row[0, b + 5]
        e2x, e2y, e2z = row[0, b + 6], row[0, b + 7], row[0, b + 8]
        # pvec = d x e2  (e2 scalar, d lanes)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= eps
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ts.append(jnp.where(ok, t, _BIG))
    return ts


def _leaf_ts_n(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz, eps=1e-9):
    """_leaf_ts plus each triangle's (unnormalized) geometric normal
    e1 x e2 as THREE SCALARS per triangle — the fused closest+shadow
    kernel tracks the winning triangle's normal for the in-kernel
    normal-offset shadow bias (passes/gbuffer.py flips gnormal toward the
    viewer; the caller applies the same flip). Returns a list of
    (t (8,128), nx, ny, nz) with the n components scalar."""
    row = tr_ref[pl.ds(leaf_id, 1), :]                        # (1, 128)
    out = []
    for j in range(k):
        b = 9 * j
        v0x, v0y, v0z = row[0, b], row[0, b + 1], row[0, b + 2]
        e1x, e1y, e1z = row[0, b + 3], row[0, b + 4], row[0, b + 5]
        e2x, e2y, e2z = row[0, b + 6], row[0, b + 7], row[0, b + 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= eps
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        nx = e1y * e2z - e1z * e2y                            # scalars
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        out.append((jnp.where(ok, t, _BIG), nx, ny, nz))
    return out


def _leaf_occluded(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz, t_min, tmax,
                   eps=1e-9):
    """Division-free Möller–Trumbore occlusion: all comparisons scaled by
    |det| (two-sided via sign multiply), accumulating one bool (8,128) mask.
    ~25% fewer VPU ops than computing t per triangle."""
    row = tr_ref[pl.ds(leaf_id, 1), :]
    hit = None
    for j in range(k):
        b = 9 * j
        v0x, v0y, v0z = row[0, b], row[0, b + 1], row[0, b + 2]
        e1x, e1y, e1z = row[0, b + 3], row[0, b + 4], row[0, b + 5]
        e2x, e2y, e2z = row[0, b + 6], row[0, b + 7], row[0, b + 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        sgn = jnp.where(det < 0.0, -1.0, 1.0)
        adet = det * sgn
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        nu = (tx * px + ty * py + tz * pz) * sgn
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        nv = (dx * qx + dy * qy + dz * qz) * sgn
        nt = (e2x * qx + e2y * qy + e2z * qz) * sgn
        ok = ((adet >= eps) & (nu >= 0.0) & (nv >= 0.0)
              & (nu + nv <= adet)
              & (nt > t_min * adet) & (nt < tmax * adet))
        hit = ok if hit is None else (hit | ok)
    return hit


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _any_hit_kernel(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref, ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tmax_ref, out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min

    stack_ref[0] = jnp.int32(0)

    # ``occ`` is an int32 0/1 mask, not bool: Mosaic cannot legalize i1
    # vectors as scf.if (lax.cond) results.
    def visit_child(child, anyhit, sp, occ):
        is_leaf = child < 0

        def test_leaf(occ):
            leaf_id = jnp.maximum(-child - 1, 0)
            hit = _leaf_occluded(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz,
                                 t_min, tmax)
            return occ | jnp.where(hit & active0, 1, 0)

        occ = jax.lax.cond(anyhit & is_leaf, test_leaf, lambda o: o, occ)
        push = anyhit & (~is_leaf)
        # Unconditional store: slot ``sp`` is free whether or not we push, so
        # writing a dummy on the no-push path is safe and avoids predicated
        # SMEM stores inside the while body.
        stack_ref[sp] = jnp.where(push, child, 0)
        return sp + push.astype(jnp.int32), occ

    # Early-exit flag is a carried SCALAR: vector reductions inside the
    # while *cond* hang Mosaic on v5e (bisected during bring-up); reducing in
    # the body and carrying the scalar is equivalent and safe.
    def cond(state):
        it, sp, alive, occ = state
        return (sp > 0) & (it < max_iters) & alive

    def body(state):
        it, sp, alive, occ = state
        sp = sp - 1
        node = stack_ref[sp]
        rec, child_l, child_r = _load_node(ns_ref, node)
        lanes = active0 & (occ == 0)
        cap = jnp.where(lanes, tmax, -_BIG)
        hit_l = _slab(rec, 0, ox, oy, oz, ix, iy, iz, t_min, cap) & lanes
        hit_r = _slab(rec, 6, ox, oy, oz, ix, iy, iz, t_min, cap) & lanes
        # ONE vector->scalar sync per node: pack both children's hit counts
        # into disjoint bit fields of a single sum (<= 1024 per field).
        fused = hit_l.astype(jnp.int32) + (hit_r.astype(jnp.int32) << 11)
        bits = jnp.sum(fused)
        sp, occ = visit_child(child_l, (bits & 2047) > 0, sp, occ)
        sp, occ = visit_child(child_r, (bits >> 11) > 0, sp, occ)
        # Amortized early-exit reduction (every 8th iteration).
        alive = jax.lax.cond((it & 7) == 7,
                             lambda: jnp.any(active0 & (occ == 0)),
                             lambda: alive)
        return it + 1, sp, alive, occ

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    alive0 = jnp.any(active0)
    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    out_ref[0] = occ


def _closest_hit_kernel(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref, ox_ref, oy_ref,
                        oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, t_out_ref,
                        idx_out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min

    stack_ref[0] = jnp.int32(0)

    def visit_child(child, anyhit, sp, best_t, best_i):
        is_leaf = child < 0

        def test_leaf(carry):
            best_t, best_i = carry
            leaf_id = jnp.maximum(-child - 1, 0)
            ts = _leaf_ts(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz)
            base = leaf_id * k
            for j, t in enumerate(ts):
                better = (t > t_min) & (t < best_t) & active0
                best_t = jnp.where(better, t, best_t)
                best_i = jnp.where(better, base + j, best_i)
            return best_t, best_i

        best_t, best_i = jax.lax.cond(anyhit & is_leaf, test_leaf,
                                      lambda c: c, (best_t, best_i))
        push = anyhit & (~is_leaf)
        stack_ref[sp] = jnp.where(push, child, 0)
        return sp + push.astype(jnp.int32), best_t, best_i

    def cond(state):
        it, sp, _, _ = state
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp, best_t, best_i = state
        sp = sp - 1
        node = stack_ref[sp]
        rec, child_l, child_r = _load_node(ns_ref, node)
        cap = jnp.where(active0, best_t, -_BIG)
        hit_l = _slab(rec, 0, ox, oy, oz, ix, iy, iz, t_min, cap)
        hit_r = _slab(rec, 6, ox, oy, oz, ix, iy, iz, t_min, cap)
        fused = hit_l.astype(jnp.int32) + (hit_r.astype(jnp.int32) << 11)
        bits = jnp.sum(fused)
        sp, best_t, best_i = visit_child(child_l, (bits & 2047) > 0, sp,
                                         best_t, best_i)
        sp, best_t, best_i = visit_child(child_r, (bits >> 11) > 0, sp,
                                         best_t, best_i)
        return it + 1, sp, best_t, best_i

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), best_t0, best_i0))
    t_out_ref[0] = jnp.where(best_i >= 0, best_t, _BIG)
    idx_out_ref[0] = best_i


# ---------------------------------------------------------------------------
# Kernels w8: 8-wide BVH traversal
# ---------------------------------------------------------------------------
#
# The while loop's serial latency chain (pop -> load -> test -> push) puts a
# hard floor on cycles/iteration, so the win comes from FEWER iterations: an
# 8-wide node does ~7 binary nodes' worth of culling per pop. One node = one
# 128-lane row (see bvh/wide.py), so there is no group-select at all; per-
# child "any lane hit" booleans come from four fused two-field sum
# reductions.

WIDE_STACK_DEPTH = 384

# Vector->scalar reduction strategy for the per-node 8-child "any lane hit"
# decisions:
#   "sum4": two 11-bit count fields per jnp.sum word (4 syncs/node).
#   "sum2": 2 syncs — per-child sublane any, 4x 8-bit lane-count fields per
#           int32 word, one jnp.sum per word (fields < 2^32 under modular
#           arithmetic; extracted with logical shifts).
#   "roll1": 1 sync — bit-pack the 8 child masks per lane, OR-fold across
#           sublanes+lanes with pltpu.roll, read one scalar.
# Measured on a v5e (round 2, Sponza 1080p, within-process): sum4 is the
# FASTEST (sum2 ~ +15%, roll1 ~ +10-20%) — contrary to the round-1 cost
# model, the vector->scalar syncs do NOT dominate per-node cost; the slab
# vector work and leaf Möller–Trumbore do. Kept for reproducibility.
W8_REDUCE = "sum4"

# Early-exit check period for the batched any-hit kernels: the packet-wide
# "all lanes resolved?" reduction runs every 2**W8_EXIT_LOG iterations.
W8_EXIT_LOG = 2

# Skip the prologue jnp.any(active0) whole-packet-skip reduction: inactive
# (sky/pad) packets then pay one cheap root iteration instead of a
# vector->scalar sync on EVERY packet.
W8_SKIP_ALIVE0 = True

# Debug/probe knob: when set, overrides the traversal iteration cap in
# _common_call (used to fit the per-packet fixed cost vs per-iteration
# marginal cost on hardware; results are WRONG when it truncates walks).
_ITER_CAP_OVERRIDE = None

# Packet-grid step semantics knob. Measured round 3 (v5e, Sponza SBVH
# shadows, honest timing): "parallel" 7.91 ms vs "arbitrary" 7.95 ms —
# within run-to-run noise, so the semantically-safer default stays. (The
# per-step machinery cost is hidden by the batched-packet kernels' single
# ray-block DMA, which is why step-overlap buys nothing measurable.)
_GRID_SEMANTICS = "arbitrary"


def _child_anyhit8(hits, valids, variant=None):
    """8 scalar bools: does any lane hit child c's box (and is the slot
    non-empty)? See W8_REDUCE for the sync-count tradeoff."""
    variant = variant or W8_REDUCE
    out = []
    if variant == "roll1":
        m = hits[0].astype(jnp.int32)
        for c in range(1, 8):
            m = m | (hits[c].astype(jnp.int32) << c)
        for s in (4, 2, 1):
            m = m | pltpu.roll(m, s, 0)
        for s in (64, 32, 16, 8, 4, 2, 1):
            m = m | pltpu.roll(m, s, 1)
        bits = m[0, 0]
        return [((bits >> c) & 1 > 0) & valids[c] for c in range(8)]
    if variant == "sum2":
        for w in range(2):
            packed = None
            for f in range(4):
                c = 4 * w + f
                colany = (jnp.sum(hits[c].astype(jnp.int32), axis=0,
                                  keepdims=True) > 0).astype(jnp.int32)
                colany = colany << (8 * f)
                packed = colany if packed is None else packed + colany
            bits = jnp.sum(packed)
            for f in range(4):
                fld = jax.lax.shift_right_logical(bits, 8 * f) & 255
                out.append((fld > 0) & valids[4 * w + f])
        return out
    # "sum4" baseline: two 11-bit count fields per reduction.
    for p in range(4):
        fused = (hits[2 * p].astype(jnp.int32)
                 + (hits[2 * p + 1].astype(jnp.int32) << 11))
        bits = jnp.sum(fused)
        out.append(((bits & 2047) > 0) & valids[2 * p])
        out.append(((bits >> 11) > 0) & valids[2 * p + 1])
    return out


def _wide_child(rec, c):
    """(bmin scalars, bmax scalars, ref i32) for child c of a (1,128) row."""
    b = 16 * c
    ref = rec[0, b + 6].astype(jnp.int32)
    return b, ref


# Near-first traversal for the closest walks. The widen post-pass
# (bvh/wide.order_children_octant) places each child in the slot equal to
# its centroid octant relative to the node center; at run time the rank
# of slot s for a ray in octant o is s XOR o (Ylitie et al. 2017's
# octant reordering, re-derived for packet traversal: the packet's
# DOMINANT octant — sign of the per-axis direction sums — stands in for
# the per-ray octant, which is exact for coherent primary tiles).
# Visiting near children first tightens best_t early, so the slab cap
# culls far subtrees instead of pushing them. Any visit order is CORRECT
# (the stack still drains every non-culled child). DEFAULT OFF: the
# production G-buffer accel is ordered per-frame by camera distance
# (app.gbuffer_production -> order_children_for_point), which the XOR
# permute would scramble; flip on (with octant-slot accels) only on
# measured wins. Cost when on: 3 reduces/packet + 48 scalar selects/node.
W8_OCTANT = False


def _octant_flags(dx, dy, dz):
    """Per-packet dominant-octant sign bits (x, y, z)."""
    if not W8_OCTANT:
        return None
    return (jnp.sum(dx) < 0.0, jnp.sum(dy) < 0.0, jnp.sum(dz) < 0.0)


def _octant_visit(anyhit, refs, flags):
    """Permute the slot-ordered per-child scalars into far-to-near PUSH
    order (the LIFO stack then pops nearest first). XOR permutation =
    three conditional pairwise-swap layers; all scalar selects."""
    if flags is None:
        return anyhit, refs

    def perm(arr):
        for m, flag in ((4, flags[0]), (2, flags[1]), (1, flags[2])):
            arr = [jnp.where(flag, arr[j ^ m], arr[j]) for j in range(8)]
        # arr[rank] = slot rank^oct, nearest at 0; push far-to-near.
        return arr[::-1]

    return perm(anyhit), perm(refs)


def _any_hit_kernel_w8(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min

    stack_ref[0] = jnp.int32(0)

    def leaf_test(leaf_id, occ):
        h = _leaf_occluded(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz,
                           t_min, tmax)
        return occ | jnp.where(h & active0, 1, 0)

    def cond(state):
        it, sp, alive, occ = state
        return (sp > 0) & (it < max_iters) & alive

    def body(state):
        it, sp, alive, occ = state
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]                       # (1, 128)
        lanes = active0 & (occ == 0)
        cap = jnp.where(lanes, tmax, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            b, ref = _wide_child(rec, c)
            hits.append(_slab(rec, b, ox, oy, oz, ix, iy, iz, t_min, cap)
                        & lanes)
            refs.append(ref)
            valids.append(rec[0, b] <= rec[0, b + 3])  # empty-slot guard
        anyhit = _child_anyhit8(hits, valids)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            occ = jax.lax.cond(anyhit[c] & is_leaf,
                               lambda o, r=ref: leaf_test(
                                   jnp.maximum(-r - 1, 0), o),
                               lambda o: o, occ)
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        alive = jax.lax.cond((it & 3) == 3,
                             lambda: jnp.any(active0 & (occ == 0)),
                             lambda: alive)
        return it + 1, sp, alive, occ

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    alive0 = jnp.any(active0)
    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    out_ref[0] = occ


def _closest_hit_kernel_w8(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref,
                           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tmax_ref, t_out_ref, idx_out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min

    stack_ref[0] = jnp.int32(0)

    def leaf_test(leaf_id, carry):
        best_t, best_i = carry
        ts = _leaf_ts(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz)
        base = leaf_id * k
        for j, t in enumerate(ts):
            better = (t > t_min) & (t < best_t) & active0
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, base + j, best_i)
        return best_t, best_i

    def cond(state):
        it, sp, _, _ = state
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp, best_t, best_i = state
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]
        cap = jnp.where(active0, best_t, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            b, ref = _wide_child(rec, c)
            hits.append(_slab(rec, b, ox, oy, oz, ix, iy, iz, t_min, cap))
            refs.append(ref)
            valids.append(rec[0, b] <= rec[0, b + 3])  # empty-slot guard
        anyhit = _child_anyhit8(hits, valids)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            best_t, best_i = jax.lax.cond(
                anyhit[c] & is_leaf,
                lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0), car),
                lambda car: car, (best_t, best_i))
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        return it + 1, sp, best_t, best_i

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), best_t0, best_i0))
    t_out_ref[0] = jnp.where(best_i >= 0, best_t, _BIG)
    idx_out_ref[0] = best_i


# ---------------------------------------------------------------------------
# Kernels v2: frustum-culled packet traversal (scalar descend decisions)
# ---------------------------------------------------------------------------
#
# Profiling the v1 kernels on a v5e showed ~800 cycles/node dominated by
# vector->scalar synchronization: every node needs per-child "any lane hit?"
# booleans (jnp.any) to drive the scalar traversal, and each such reduction
# stalls the scalar core on the VPU pipeline. v2 removes ALL per-node vector
# work: the packet precomputes conservative interval bounds (origin AABB and
# per-axis inverse-direction intervals — Wald-style packet frustum culling),
# and each node's descend decision is ~100 *scalar* ops of interval
# arithmetic. The VPU only runs at leaves (masked Möller–Trumbore on all
# lanes), and the any-hit early-exit reduction is amortized to every 8th
# iteration. Conservative culling can only ADD node visits, never lose hits,
# so per-lane results are identical.

# ---------------------------------------------------------------------------
# Packet layout: image <-> (P, 8, 128) tiles
# ---------------------------------------------------------------------------

def _tile_shape(h: int, w: int) -> Tuple[int, int]:
    return -(-h // TILE), -(-w // TILE)


def to_packets(a: jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """f32[H, W] -> f32[P, 8, 128]: 32x32 pixel tiles, row-major in-tile."""
    h, w = a.shape
    ht, wt = _tile_shape(h, w)
    ap = jnp.pad(a, ((0, ht * TILE - h), (0, wt * TILE - w)),
                 constant_values=fill)
    t = ap.reshape(ht, TILE, wt, TILE).transpose(0, 2, 1, 3)
    return t.reshape(ht * wt, 8, 128)


def from_packets(p: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of to_packets."""
    ht, wt = _tile_shape(h, w)
    t = p.reshape(ht, wt, TILE, TILE).transpose(0, 2, 1, 3)
    return t.reshape(ht * TILE, wt * TILE)[:h, :w]


# ---------------------------------------------------------------------------
# Batched kernels: B packets per grid step
# ---------------------------------------------------------------------------
#
# Iteration-capped probes on a v5e measured ~13k cycles of FIXED cost per
# grid step (a cap=1 run is as slow as the full traversal): with one packet
# per step, the 8 small per-step block DMAs (7 ray components in + outputs)
# dominate — each DMA issue/latency is ~1-2 us and they serialize against
# the short traversal compute. The batched path amortizes the step
# machinery two ways: the 7 ray components are packed into ONE array
# (f32[P, 7, 8, 128] -> one input DMA per step) and each step processes
# PACKETS_PER_STEP packets with an in-kernel fori_loop.

PACKETS_PER_STEP = 8


def _packet_body_rays(rays_ref, b):
    """Ray components of packet b from a (B,10,8,128) block ref: origins,
    directions, PRECOMPUTED clamped inverse directions (hoisted into the
    XLA-fused ray batch — VPU divides inside the kernel cost ~hundreds of
    cycles per packet), and t_max."""
    ox = rays_ref[b, 0]
    oy = rays_ref[b, 1]
    oz = rays_ref[b, 2]
    dx = rays_ref[b, 3]
    dy = rays_ref[b, 4]
    dz = rays_ref[b, 5]
    ix = rays_ref[b, 6]
    iy = rays_ref[b, 7]
    iz = rays_ref[b, 8]
    tmax = rays_ref[b, 9]
    return ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax


def _w8_anyhit_walk(k: int, max_iters: int, ns_ref, tr_ref, stack_ref,
                    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min):
    """One 8-wide any-hit packet walk -> occ i32 (8,128). The shared body of
    the batched and soft-shadow kernels (identical control flow)."""
    active0 = tmax > t_min
    stack_ref[0] = jnp.int32(0)

    def leaf_test(leaf_id, occ):
        h = _leaf_occluded(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz,
                           t_min, tmax)
        return occ | jnp.where(h & active0, 1, 0)

    def cond(state):
        it, sp, alive, occ = state
        return (sp > 0) & (it < max_iters) & alive

    def body(state):
        it, sp, alive, occ = state
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]
        lanes = active0 & (occ == 0)
        cap = jnp.where(lanes, tmax, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            bb, ref = _wide_child(rec, c)
            hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min,
                              cap) & lanes)
            refs.append(ref)
            valids.append(rec[0, bb] <= rec[0, bb + 3])
        anyhit = _child_anyhit8(hits, valids)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            occ = jax.lax.cond(anyhit[c] & is_leaf,
                               lambda o, r=ref: leaf_test(
                                   jnp.maximum(-r - 1, 0), o),
                               lambda o: o, occ)
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        period = (1 << W8_EXIT_LOG) - 1
        alive = jax.lax.cond((it & period) == period,
                             lambda: jnp.any(active0 & (occ == 0)),
                             lambda: alive)
        return it + 1, sp, alive, occ

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    alive0 = jnp.bool_(True) if W8_SKIP_ALIVE0 else jnp.any(active0)
    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    return occ


def _sincos_2pi(t):
    """(sin, cos) of 2*pi*(t - 0.5) for t in [0, 1) WITHOUT jnp trig
    (Mosaic has no sin/cos lowering): degree-7/6 Taylor on the half-angle
    psi = pi*(t-0.5) in [-pi/2, pi/2) + double-angle. Max error ~1e-6 —
    far below sampling noise; callers renormalize the direction anyway.
    The phase shift by pi is irrelevant for a uniform angle. Shared by
    every in-kernel sampling loop (cone + disk, any-hit + fused)."""
    psi = 3.14159265 * (t - 0.5)
    p2 = psi * psi
    s1 = psi * (1.0 + p2 * (-1.0 / 6.0 + p2 * (1.0 / 120.0
                                               + p2 * (-1.0 / 5040.0))))
    c1 = 1.0 + p2 * (-0.5 + p2 * (1.0 / 24.0 + p2 * (-1.0 / 720.0)))
    return 2.0 * s1 * c1, 1.0 - 2.0 * s1 * s1


def _uniform01(shape):
    """One uniform [0, 1) draw per lane from the hardware PRNG: 23 random
    mantissa bits onto exponent 127 -> [1, 2) -> [0, 1). Zero bit stream
    (-> 0.0) under the TPU-semantics interpreter."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    m = (bits >> 9) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(m, jnp.float32) - 1.0


def _lane_axis_onb(ex0, ey0, ez0):
    """Per-lane unit axis from a lane-varying delta vector + branchless
    Duff orthonormal basis, all elementwise on the VPU (the cone kernels'
    basis is a scalar broadcast; point lights need it per pixel).
    Returns (ax, ay, az, t0x, t0y, t0z, t1x, t1y, t1z)."""
    arn = jax.lax.rsqrt(jnp.maximum(ex0 * ex0 + ey0 * ey0 + ez0 * ez0,
                                    1e-24))
    ax = ex0 * arn
    ay = ey0 * arn
    az = ez0 * arn
    sgn = jnp.where(az >= 0.0, 1.0, -1.0)
    aa = -1.0 / (sgn + az)
    bb = ax * ay * aa
    t0x = 1.0 + sgn * ax * ax * aa
    t0y = sgn * bb
    t0z = -sgn * ax
    t1x = bb
    t1y = sgn + ay * ay * aa
    t1z = -ay
    return ax, ay, az, t0x, t0y, t0z, t1x, t1y, t1z


def _w8_closest_walk_n(k: int, max_iters: int, ns_ref, tr_ref, stack_ref,
                       ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min):
    """One 8-wide closest-hit packet walk that ALSO tracks the winning
    triangle's unnormalized geometric normal (three scalar selects per
    leaf triangle — the triangle data is already in registers). The
    shared phase 1 of every fused primary+shadow kernel. Returns
    (best_t, best_i, nx, ny, nz); best_i < 0 = miss (best_t then holds
    the entry cap, callers mask it)."""
    active0 = tmax > t_min
    stack_ref[0] = jnp.int32(0)

    def leaf_test(leaf_id, carry):
        best_t, best_i, nx, ny, nz = carry
        tn = _leaf_ts_n(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz)
        base = leaf_id * k
        for j, (t, cnx, cny, cnz) in enumerate(tn):
            better = (t > t_min) & (t < best_t) & active0
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, base + j, best_i)
            nx = jnp.where(better, cnx, nx)
            ny = jnp.where(better, cny, ny)
            nz = jnp.where(better, cnz, nz)
        return best_t, best_i, nx, ny, nz

    def cond(state):
        it, sp = state[0], state[1]
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp, best_t, best_i, nx, ny, nz = state
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]
        cap = jnp.where(active0, best_t, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            bb, ref = _wide_child(rec, c)
            hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min,
                              cap))
            refs.append(ref)
            valids.append(rec[0, bb] <= rec[0, bb + 3])
        anyhit = _child_anyhit8(hits, valids)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            best_t, best_i, nx, ny, nz = jax.lax.cond(
                anyhit[c] & is_leaf,
                lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0),
                                             car),
                lambda car: car, (best_t, best_i, nx, ny, nz))
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        return it + 1, sp, best_t, best_i, nx, ny, nz

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    _, _, best_t, best_i, nx, ny, nz = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(1), best_t0, best_i0,
         zero, zero, zero))
    return best_t, best_i, nx, ny, nz


def _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz, best_t, nx, ny, nz):
    """Shadow-ray origin from a phase-1 hit: hit point offset along the
    viewer-facing unit geometric normal by the bias — the exact
    passes/gbuffer.py + passes/shadow.py raygen recipe, in registers."""
    rn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    flip = jnp.where(nx * dx + ny * dy + nz * dz > 0.0, -1.0, 1.0)
    off = bias * rn * flip
    sox = ox + best_t * dx + nx * off
    soy = oy + best_t * dy + ny * off
    soz = oz + best_t * dz + nz * off
    return sox, soy, soz


def _scene_exit_cap(active, ox, oy, oz, ix, iy, iz,
                    rx0, ry0, rz0, rx1, ry1, rz1):
    """Root-box exit t cap for a shadow ray (shadow.scene_exit_t in
    registers): no occluder exists outside the scene AABB; inactive lanes
    get -BIG so the walk skips them. Shared by every in-kernel
    directional/cone shadow path — keep the epsilon here so the fused
    kernels can never drift from scene_exit_t parity."""
    ex = jnp.minimum(
        jnp.minimum(jnp.maximum((rx0 - ox) * ix, (rx1 - ox) * ix),
                    jnp.maximum((ry0 - oy) * iy, (ry1 - oy) * iy)),
        jnp.maximum((rz0 - oz) * iz, (rz1 - oz) * iz))
    return jnp.where(active, jnp.maximum(ex, 0.0) * 1.0001, -_BIG)


def _any_hit_kernel_w8_b(k: int, max_iters: int, nb: int, tmin_ref, ns_ref,
                         tr_ref, rays_ref, out_ref, stack_ref):
    """8-wide any-hit over nb packets per grid step (see batching note)."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        out_ref[b] = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref, stack_ref,
                                     ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                     tmax, t_min)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _any_hit_kernel_w8_soft(k: int, max_iters: int, nb: int, spp: int,
                            tmin_ref, seed_ref, scal_ref, ns_ref, tr_ref,
                            rays_ref, out_ref, stack_ref):
    """Fused area-light soft shadows: cone sampling INSIDE the traversal
    kernel (BASELINE config 3).

    The XLA formulation (shadow_pass's scan) pays ~5 ms/sample of ray
    generation at 1080p — threefry RNG, cone trig, scene-exit slab, and the
    packet layout transform all rematerialize per sample in HBM. Here each
    packet's origins load ONCE; every sample draws two uniforms from the
    hardware PRNG (pltpu.prng_random_bits), builds the cone direction on
    the VPU (d, t0, t1 orthonormal => unit by construction, no normalize),
    caps t at the root-box exit, and runs the shared any-hit walk,
    accumulating a per-pixel occlusion COUNT. HBM traffic per sample: zero.

    rays_ref: (B, 4, 8, 128) = origins xyz + valid flag.
    scal_ref: f32[16] = axis d(3), basis t0(3), t1(3), cone_cos, root box
    min(3)/max(3). seed_ref: i32[1]; streams are decorrelated per grid step
    and packet via prng_seed(seed, step, packet).
    """
    t_min = tmin_ref[0]
    adx, ady, adz = scal_ref[0], scal_ref[1], scal_ref[2]
    t0x, t0y, t0z = scal_ref[3], scal_ref[4], scal_ref[5]
    t1x, t1y, t1z = scal_ref[6], scal_ref[7], scal_ref[8]
    cone_cos = scal_ref[9]
    rx0, ry0, rz0 = scal_ref[10], scal_ref[11], scal_ref[12]
    rx1, ry1, rz1 = scal_ref[13], scal_ref[14], scal_ref[15]

    # One PRNG stream per grid step; packets/samples consume it
    # sequentially (decorrelated without re-seeding on traced indices).
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def per_packet(b, _):
        ox = rays_ref[b, 0]
        oy = rays_ref[b, 1]
        oz = rays_ref[b, 2]
        valid = rays_ref[b, 3] > 0.0

        def per_sample(s, count):
            u1 = _uniform01(ox.shape)
            u2 = _uniform01(ox.shape)
            cos_t = 1.0 - u1 * (1.0 - cone_cos)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            sphi, cphi = _sincos_2pi(u2)
            sc = sin_t * cphi
            ss = sin_t * sphi
            dx = adx * cos_t + t0x * sc + t1x * ss
            dy = ady * cos_t + t0y * sc + t1y * ss
            dz = adz * cos_t + t0z * sc + t1z * ss
            # Renormalize: the polynomial sin/cos are 1e-6-accurate, so
            # this is belt-and-braces for the slab/leaf t comparisons.
            rn = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                           1e-20))
            dx = dx * rn
            dy = dy * rn
            dz = dz * rn
            ix, iy, iz = _inv3(dx, dy, dz)
            tmax = _scene_exit_cap(valid, ox, oy, oz, ix, iy, iz,
                                   rx0, ry0, rz0, rx1, ry1, rz1)
            occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref, stack_ref,
                                  ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                  tmax, t_min)
            return count + occ

        count = jax.lax.fori_loop(0, spp, per_sample,
                                  jnp.zeros(ox.shape, jnp.int32),
                                  unroll=False)
        out_ref[b] = count
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _any_hit_kernel_w8_psoft(k: int, max_iters: int, nb: int, spp: int,
                             tmin_ref, seed_ref, scal_ref, ns_ref, tr_ref,
                             rays_ref, out_ref, stack_ref):
    """Fused point-light penumbra: disk sampling INSIDE the traversal
    kernel — the LIGHT_POINT twin of _any_hit_kernel_w8_soft and the
    least-coherent workload this renderer produces (per-pixel directions
    fan out toward the light AND jitter across its disk; the measurement
    that retired full-resolution ray sorting).

    Per lane: axis = normalize(light_pos - origin), a branchless Duff
    orthonormal basis AROUND THAT PER-LANE AXIS (vector registers — the
    cone kernel's basis is a scalar broadcast), then per sample
    target = light_pos + t0*(r cos phi) + t1*(r sin phi) with
    r = sqrt(u1)*radius, phi = 2 pi u2 — exactly shadow_ray_batch's
    jittered-disk recipe — and t capped at the target distance.

    rays_ref: (B, 4, 8, 128) = biased origins xyz + valid flag.
    scal_ref: f32[4] = light position(3), source radius.
    """
    t_min = tmin_ref[0]
    lpx, lpy, lpz = scal_ref[0], scal_ref[1], scal_ref[2]
    radius = scal_ref[3]

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def per_packet(b, _):
        ox = rays_ref[b, 0]
        oy = rays_ref[b, 1]
        oz = rays_ref[b, 2]
        valid = rays_ref[b, 3] > 0.0

        # Per-lane unit axis toward the light + Duff ONB (elementwise).
        ex0 = lpx - ox
        ey0 = lpy - oy
        ez0 = lpz - oz
        _, _, _, t0x, t0y, t0z, t1x, t1y, t1z = \
            _lane_axis_onb(ex0, ey0, ez0)

        def per_sample(s, count):
            u1 = _uniform01(ox.shape)
            u2 = _uniform01(ox.shape)
            r = jnp.sqrt(u1) * radius
            sphi, cphi = _sincos_2pi(u2)
            rc = r * cphi
            rs = r * sphi
            ddx = ex0 + t0x * rc + t1x * rs
            ddy = ey0 + t0y * rc + t1y * rs
            ddz = ez0 + t0z * rc + t1z * rs
            d2 = jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-24)
            drn = jax.lax.rsqrt(d2)
            dx = ddx * drn
            dy = ddy * drn
            dz = ddz * drn
            ix, iy, iz = _inv3(dx, dy, dz)
            tmax = jnp.where(valid, d2 * drn * (1.0 - 1e-4), -_BIG)
            occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref, stack_ref,
                                  ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                  tmax, t_min)
            return count + occ

        count = jax.lax.fori_loop(0, spp, per_sample,
                                  jnp.zeros(ox.shape, jnp.int32),
                                  unroll=False)
        out_ref[b] = count
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_soft_shadow_kernel_w8_b(k: int, max_iters: int, nb: int,
                                     spp: int, attrs: bool, tmin_ref,
                                     seed_ref, scal_ref, ns_ref, tr_ref,
                                     *rest):
    """Fused primary visibility + area-light SOFT shadows: ONE program.

    Phase 1 = the closest-hit walk with geometric-normal tracking
    (_closest_shadow_kernel_w8_b); phase 2 = the in-kernel cone-sampling
    occlusion loop (_any_hit_kernel_w8_soft) fed from registers: the
    biased shadow origins never touch HBM at all — the config-3 frame's
    only remaining XLA work is the shade-row gather and the composite
    (or, with ``attrs``, NOT EVEN THAT: phase 1 tracks the full shading
    attributes and the gather disappears).

    scal_ref f32[17]: cone axis d(3), basis t0(3), t1(3), cone_cos, root
    box min(3)/max(3), bias. Outputs: closest t, sorted hit index (or the
    ATTR_CH channels when ``attrs``), occlusion counts i32 in [0, spp].
    """
    if attrs:
        a0_ref, a1_ref, rays_ref, out_ref, cnt_out_ref, stack_ref = rest
    else:
        rays_ref, t_out_ref, idx_out_ref, cnt_out_ref, stack_ref = rest
    t_min = tmin_ref[0]
    adx, ady, adz = scal_ref[0], scal_ref[1], scal_ref[2]
    t0x, t0y, t0z = scal_ref[3], scal_ref[4], scal_ref[5]
    t1x, t1y, t1z = scal_ref[6], scal_ref[7], scal_ref[8]
    cone_cos = scal_ref[9]
    rx0, ry0, rz0 = scal_ref[10], scal_ref[11], scal_ref[12]
    rx1, ry1, rz1 = scal_ref[13], scal_ref[14], scal_ref[15]
    bias = scal_ref[16]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        if attrs:
            res = _w8_closest_walk_attr(
                k, max_iters, attrs == 2, ns_ref, tr_ref, a0_ref, a1_ref,
                stack_ref, ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            best_t, best_i = res[0], res[1]
            nx, ny, nz = res[12], res[13], res[14]
            _write_attr_out(out_ref, b, res)
        else:
            best_t, best_i, nx, ny, nz = _w8_closest_walk_n(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
            idx_out_ref[b] = best_i

        hitm = best_i >= 0
        sox, soy, soz = _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz,
                                           best_t, nx, ny, nz)

        def per_sample(s, count):
            u1 = _uniform01(ox.shape)
            u2 = _uniform01(ox.shape)
            cos_t = 1.0 - u1 * (1.0 - cone_cos)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            sphi, cphi = _sincos_2pi(u2)
            sc = sin_t * cphi
            ss = sin_t * sphi
            sdx = adx * cos_t + t0x * sc + t1x * ss
            sdy = ady * cos_t + t0y * sc + t1y * ss
            sdz = adz * cos_t + t0z * sc + t1z * ss
            srn = jax.lax.rsqrt(jnp.maximum(
                sdx * sdx + sdy * sdy + sdz * sdz, 1e-20))
            sdx = sdx * srn
            sdy = sdy * srn
            sdz = sdz * srn
            six, siy, siz = _inv3(sdx, sdy, sdz)
            stmax = _scene_exit_cap(hitm, sox, soy, soz, six, siy, siz,
                                    rx0, ry0, rz0, rx1, ry1, rz1)
            occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref, stack_ref,
                                  sox, soy, soz, sdx, sdy, sdz,
                                  six, siy, siz, stmax, 0.0)
            return count + occ

        cnt_out_ref[b] = jax.lax.fori_loop(
            0, spp, per_sample, jnp.zeros(ox.shape, jnp.int32),
            unroll=False)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_psoft_shadow_kernel_w8_b(k: int, max_iters: int, nb: int,
                                      spp: int, attrs: bool, tmin_ref,
                                      seed_ref, scal_ref, ns_ref, tr_ref,
                                      *rest):
    """Fused primary visibility + point-light PENUMBRA: ONE program.

    Phase 1 = the closest-hit walk with geometric-normal tracking
    (_closest_shadow_kernel_w8_b); phase 2 = the in-kernel jittered-disk
    occlusion loop (_any_hit_kernel_w8_psoft) fed from registers — the
    per-lane axis toward the light and its Duff basis derive from the
    phase-1 hit point, so the least-coherent workload family never
    materializes a shadow ray in HBM.

    scal_ref f32[5]: light position(3), source radius, bias. Outputs:
    closest t, sorted hit index (or the ATTR_CH channels when ``attrs``),
    occlusion counts i32 in [0, spp].
    """
    if attrs:
        a0_ref, a1_ref, rays_ref, out_ref, cnt_out_ref, stack_ref = rest
    else:
        rays_ref, t_out_ref, idx_out_ref, cnt_out_ref, stack_ref = rest
    t_min = tmin_ref[0]
    lpx, lpy, lpz = scal_ref[0], scal_ref[1], scal_ref[2]
    radius = scal_ref[3]
    bias = scal_ref[4]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        if attrs:
            res = _w8_closest_walk_attr(
                k, max_iters, attrs == 2, ns_ref, tr_ref, a0_ref, a1_ref,
                stack_ref, ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            best_t, best_i = res[0], res[1]
            nx, ny, nz = res[12], res[13], res[14]
            _write_attr_out(out_ref, b, res)
        else:
            best_t, best_i, nx, ny, nz = _w8_closest_walk_n(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
            idx_out_ref[b] = best_i

        hitm = best_i >= 0
        sox, soy, soz = _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz,
                                           best_t, nx, ny, nz)

        # Per-lane axis toward the light + Duff ONB (see
        # _any_hit_kernel_w8_psoft).
        ex0 = lpx - sox
        ey0 = lpy - soy
        ez0 = lpz - soz
        _, _, _, t0x, t0y, t0z, t1x, t1y, t1z = \
            _lane_axis_onb(ex0, ey0, ez0)

        def per_sample(s, count):
            u1 = _uniform01(ox.shape)
            u2 = _uniform01(ox.shape)
            r = jnp.sqrt(u1) * radius
            sphi, cphi = _sincos_2pi(u2)
            rc = r * cphi
            rs = r * sphi
            ddx = ex0 + t0x * rc + t1x * rs
            ddy = ey0 + t0y * rc + t1y * rs
            ddz = ez0 + t0z * rc + t1z * rs
            d2 = jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-24)
            drn = jax.lax.rsqrt(d2)
            sdx = ddx * drn
            sdy = ddy * drn
            sdz = ddz * drn
            six, siy, siz = _inv3(sdx, sdy, sdz)
            stmax = jnp.where(hitm, d2 * drn * (1.0 - 1e-4), -_BIG)
            occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref, stack_ref,
                                  sox, soy, soz, sdx, sdy, sdz,
                                  six, siy, siz, stmax, 0.0)
            return count + occ

        cnt_out_ref[b] = jax.lax.fori_loop(
            0, spp, per_sample, jnp.zeros(ox.shape, jnp.int32),
            unroll=False)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_w8_b_impl(first_hit: bool, k: int, max_iters: int, nb: int,
                       tmin_ref, ns_ref, tr_ref, rays_ref, t_out_ref,
                       idx_out_ref, stack_ref):
    """8-wide closest-hit over nb packets per grid step.

    first_hit=True turns it into the SEED pass of the two-pass primary
    ray cast: identical walk, but the packet exits as soon as every lane
    has found SOME hit (checked every 4 iterations, like the any-hit
    early exit). The output (t, idx) is then a valid conservative UPPER
    bound on the closest hit per lane (best-so-far only decreases), which
    the second, normal closest pass consumes as its per-ray t_max cap —
    culling far subtrees from iteration 0 instead of only after the cap
    tightens organically."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        active0 = tmax > t_min
        oflags = _octant_flags(dx, dy, dz)
        stack_ref[0] = jnp.int32(0)

        def leaf_test(leaf_id, carry):
            best_t, best_i = carry
            ts = _leaf_ts(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz)
            base = leaf_id * k
            for j, t in enumerate(ts):
                better = (t > t_min) & (t < best_t) & active0
                best_t = jnp.where(better, t, best_t)
                best_i = jnp.where(better, base + j, best_i)
            return best_t, best_i

        def cond(state):
            it, sp, alive, _, _ = state
            return (sp > 0) & (it < max_iters) & alive

        def body(state):
            it, sp, alive, best_t, best_i = state
            sp = sp - 1
            node = stack_ref[sp]
            rec = ns_ref[pl.ds(node, 1), :]
            cap = jnp.where(active0, best_t, -_BIG)
            hits = []
            refs = []
            valids = []
            for c in range(8):
                bb, ref = _wide_child(rec, c)
                hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min,
                                  cap))
                refs.append(ref)
                valids.append(rec[0, bb] <= rec[0, bb + 3])
            anyhit = _child_anyhit8(hits, valids)
            anyhit, refs = _octant_visit(anyhit, refs, oflags)
            for c in range(8):
                ref = refs[c]
                is_leaf = ref < 0
                best_t, best_i = jax.lax.cond(
                    anyhit[c] & is_leaf,
                    lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0), car),
                    lambda car: car, (best_t, best_i))
                push = anyhit[c] & (~is_leaf)
                stack_ref[sp] = jnp.where(push, ref, 0)
                sp = sp + push.astype(jnp.int32)
            if first_hit:
                period = (1 << W8_EXIT_LOG) - 1
                alive = jax.lax.cond(
                    (it & period) == period,
                    lambda: jnp.any(active0 & (best_i < 0)),
                    lambda: alive)
            return it + 1, sp, alive, best_t, best_i

        best_t0 = jnp.where(active0, tmax, -_BIG)
        best_i0 = jnp.full(ox.shape, -1, jnp.int32)
        _, _, _, best_t, best_i = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(1), jnp.bool_(True), best_t0, best_i0))
        t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
        idx_out_ref[b] = best_i
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_hit_kernel_w8_b(k: int, max_iters: int, nb: int, *refs):
    _closest_w8_b_impl(False, k, max_iters, nb, *refs)


def _first_hit_kernel_w8_b(k: int, max_iters: int, nb: int, *refs):
    _closest_w8_b_impl(True, k, max_iters, nb, *refs)


# Channel order of the attribute-tracked closest hit's single f32 output
# (see _w8_closest_walk_attr): t, sorted idx (float), MT barycentrics u/v,
# interpolated texture uv, packed kd, texture layer, original tri id,
# PACKED oct(n0)/oct(n1)/oct(n2) (shading.pack_oct12), unnormalized
# geometric normal.
ATTR_CH = 15


def _w8_closest_walk_attr(k: int, max_iters: int, textured: bool, ns_ref,
                          tr_ref, a0_ref, a1_ref, stack_ref, ox, oy, oz,
                          dx, dy, dz, ix, iy, iz, tmax, t_min):
    """Closest-hit packet walk that tracks the WINNER'S FULL SHADING
    ATTRIBUTES via in-register selects — the per-pixel shade-table gather
    (2M rows ~23 ms at 1080p, width-flat) replaced by per-candidate
    selects while its data is already loaded. Probe r3ae isolated the
    cost structure: extra VMEM row loads and loop carries are ~free;
    each per-candidate SCALAR LANE READ (vreg->sreg) is not — so the
    layout packs each oct normal pair into one exact-integer float
    (unpacked in XLA post, never here) and ``textured``=False skips the
    uv/layer reads entirely: 5 scalar reads per candidate untextured
    (packed oct x3, kd, tid), 12 textured. a0/a1: leaf-major attribute
    rows (passes/shading.make_leaf_attr_rows; ATTR_STRIDE lane map).
    Returns the 15-tuple matching ATTR_CH; attribute lanes are only
    meaningful where best_i >= 0."""
    active0 = tmax > t_min
    oflags = _octant_flags(dx, dy, dz)
    stack_ref[0] = jnp.int32(0)
    zero = jnp.zeros(ox.shape, jnp.float32)

    def leaf_test(leaf_id, carry):
        (best_t, best_i, bu, bv, uvu, uvv, kd, lay, tid,
         o0, o1, o2, nx, ny, nz) = carry
        row = tr_ref[pl.ds(leaf_id, 1), :]                    # (1, 128)
        ra0 = a0_ref[pl.ds(leaf_id, 1), :]
        ra1 = a1_ref[pl.ds(leaf_id, 1), :] if k > 8 else None
        base = leaf_id * k
        for j in range(k):
            b = 9 * j
            v0x, v0y, v0z = row[0, b], row[0, b + 1], row[0, b + 2]
            e1x, e1y, e1z = row[0, b + 3], row[0, b + 4], row[0, b + 5]
            e2x, e2y, e2z = row[0, b + 6], row[0, b + 7], row[0, b + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= 1e-9
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            t = jnp.where(ok, t, _BIG)
            better = (t > t_min) & (t < best_t) & active0
            ar, ab = (ra0, 16 * j) if j < 8 else (ra1, 16 * (j - 8))
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, base + j, best_i)
            bu = jnp.where(better, u, bu)
            bv = jnp.where(better, v, bv)
            kd = jnp.where(better, ar[0, ab + 3], kd)
            tid = jnp.where(better, ar[0, ab + 11], tid)
            o0 = jnp.where(better, ar[0, ab + 0], o0)
            o1 = jnp.where(better, ar[0, ab + 1], o1)
            o2 = jnp.where(better, ar[0, ab + 2], o2)
            if textured:
                uvh_u = ar[0, ab + 5] + u * ar[0, ab + 7] \
                    + v * ar[0, ab + 9]
                uvh_v = ar[0, ab + 6] + u * ar[0, ab + 8] \
                    + v * ar[0, ab + 10]
                uvu = jnp.where(better, uvh_u, uvu)
                uvv = jnp.where(better, uvh_v, uvv)
                lay = jnp.where(better, ar[0, ab + 4], lay)
            nx = jnp.where(better, e1y * e2z - e1z * e2y, nx)
            ny = jnp.where(better, e1z * e2x - e1x * e2z, ny)
            nz = jnp.where(better, e1x * e2y - e1y * e2x, nz)
        return (best_t, best_i, bu, bv, uvu, uvv, kd, lay, tid,
                o0, o1, o2, nx, ny, nz)

    def cond(state):
        it, sp = state[0], state[1]
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp = state[0], state[1]
        carry = state[2:]
        best_t, best_i = carry[0], carry[1]
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]
        cap = jnp.where(active0, best_t, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            bb, ref = _wide_child(rec, c)
            hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min, cap))
            refs.append(ref)
            valids.append(rec[0, bb] <= rec[0, bb + 3])
        anyhit = _child_anyhit8(hits, valids)
        anyhit, refs = _octant_visit(anyhit, refs, oflags)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            carry = jax.lax.cond(
                anyhit[c] & is_leaf,
                lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0), car),
                lambda car: car, carry)
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        return (it + 1, sp) + tuple(carry)

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    init = (jnp.int32(0), jnp.int32(1), best_t0, best_i0) \
        + tuple(zero for _ in range(ATTR_CH - 2))
    state = jax.lax.while_loop(cond, body, init)
    return state[2:]


def _write_attr_out(out_ref, b, res):
    """Store an attr walk's ATTR_CH-tuple (15) as the channels of packet
    b (sorted idx rides as an exact float value; t = _BIG on miss)."""
    best_t, best_i = res[0], res[1]
    out_ref[b, 0] = jnp.where(best_i >= 0, best_t, _BIG)
    out_ref[b, 1] = best_i.astype(jnp.float32)
    for c in range(2, ATTR_CH):
        out_ref[b, c] = res[c]


def _closest_attr_kernel_w8_b(k: int, max_iters: int, nb: int,
                              textured: bool, tmin_ref,
                              ns_ref, tr_ref, a0_ref, a1_ref, rays_ref,
                              out_ref, stack_ref):
    """Batched attribute-tracked closest hit: ONE f32 output of ATTR_CH
    channels per packet (sorted idx rides as an exact float value)."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        res = _w8_closest_walk_attr(k, max_iters, textured, ns_ref,
                                    tr_ref, a0_ref, a1_ref, stack_ref,
                                    ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                    tmax, t_min)
        _write_attr_out(out_ref, b, res)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_shadow_kernel_w8_b(k: int, max_iters: int, nb: int, point: bool,
                                attrs: bool, tmin_ref, scal_ref, ns_ref,
                                tr_ref, *rest):
    """Fused primary visibility + hard shadow: ONE program.

    Phase 1 is the batched closest-hit walk, additionally tracking the
    winning triangle's unnormalized geometric normal (three scalar selects
    per leaf triangle — the triangle data is already in registers). Phase 2
    derives light-0's shadow ray entirely in-kernel — origin = hit point
    offset along the viewer-facing unit normal by the shadow bias (the
    exact passes/gbuffer.py + passes/shadow.py raygen recipe), t capped at
    the root-box exit (directional) or the light distance (point) — and
    runs the shared any-hit walk. This removes the separate shadow pass's
    XLA raygen, the (o,d,inv,t) packet re-layout round trip through HBM,
    and one kernel dispatch per frame.

    point=False — scal_ref f32[13]: light dir(3), clamped 1/dir(3), bias,
    root box min(3)/max(3). point=True — scal_ref f32[4]: light
    position(3), bias; the per-lane direction, inverse and t cap are
    derived in registers. Outputs per packet: closest t, sorted hit index,
    occluded i32 (0 for sky/inactive lanes) — or, with ``attrs``, the
    full ATTR_CH attribute channels (phase 1 = _w8_closest_walk_attr; the
    zero-gather G-buffer rides out of the fused program) + occluded.
    """
    if attrs:
        a0_ref, a1_ref, rays_ref, out_ref, occ_out_ref, stack_ref = rest
    else:
        rays_ref, t_out_ref, idx_out_ref, occ_out_ref, stack_ref = rest
    t_min = tmin_ref[0]
    if point:
        lpx, lpy, lpz = scal_ref[0], scal_ref[1], scal_ref[2]
        bias = scal_ref[3]
    else:
        ldx, ldy, ldz = scal_ref[0], scal_ref[1], scal_ref[2]
        ilx, ily, ilz = scal_ref[3], scal_ref[4], scal_ref[5]
        bias = scal_ref[6]
        rx0, ry0, rz0 = scal_ref[7], scal_ref[8], scal_ref[9]
        rx1, ry1, rz1 = scal_ref[10], scal_ref[11], scal_ref[12]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        if attrs:
            res = _w8_closest_walk_attr(
                k, max_iters, attrs == 2, ns_ref, tr_ref, a0_ref, a1_ref,
                stack_ref, ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            best_t, best_i = res[0], res[1]
            nx, ny, nz = res[12], res[13], res[14]
            _write_attr_out(out_ref, b, res)
        else:
            best_t, best_i, nx, ny, nz = _w8_closest_walk_n(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
            idx_out_ref[b] = best_i

        # Phase 2: shadow ray per lane, derived in registers. The offset
        # matches gbuffer_pass: unit gnormal flipped toward the viewer
        # (sign(-dot(n, d)), zero -> +1), scaled by the bias.
        hitm = best_i >= 0
        sox, soy, soz = _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz,
                                           best_t, nx, ny, nz)
        if point:
            # Per-lane direction toward the light; t capped at the light
            # distance (shadow_ray_batch's point path).
            ex_ = lpx - sox
            ey_ = lpy - soy
            ez_ = lpz - soz
            d2 = jnp.maximum(ex_ * ex_ + ey_ * ey_ + ez_ * ez_, 1e-24)
            drn = jax.lax.rsqrt(d2)
            sdx = ex_ * drn
            sdy = ey_ * drn
            sdz = ez_ * drn
            six, siy, siz = _inv3(sdx, sdy, sdz)
            stmax = jnp.where(hitm, d2 * drn * (1.0 - 1e-4), -_BIG)
        else:
            sdx, sdy, sdz = ldx, ldy, ldz
            six, siy, siz = ilx, ily, ilz
            stmax = _scene_exit_cap(hitm, sox, soy, soz, ilx, ily, ilz,
                                    rx0, ry0, rz0, rx1, ry1, rz1)
        occ_out_ref[b] = _w8_anyhit_walk(
            k, max_iters, ns_ref, tr_ref, stack_ref,
            sox, soy, soz, sdx, sdy, sdz, six, siy, siz, stmax, 0.0)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_multi_shadow_kernel_w8_b(k: int, max_iters: int, nb: int,
                                      points, attrs: bool, tmin_ref,
                                      scal_ref, ns_ref, tr_ref, *rest):
    """Fused primary visibility + N hard shadows: ONE program.

    The multi-light generalization of _closest_shadow_kernel_w8_b: phase 1
    is the same closest-hit walk tracking the winner's geometric normal;
    phase 2 statically unrolls over ``points`` (a tuple of per-light
    is-point flags), deriving each light's shadow ray in registers from
    the SAME biased hit point and running the shared any-hit walk once per
    light. The frame pays ONE primary dispatch for the whole light set —
    no per-light raygen, packet re-layout, or extra kernel launches.

    scal_ref layout: [bias, root_min(3), root_max(3)] then per light —
    directional: toward-light dir(3) + clamped 1/dir(3); point:
    position(3). Output occ i32 bitmask: bit l set = light l occluded.
    ``attrs``: phase 1 = the attribute-tracked walk; (t, idx) outputs are
    replaced by the ATTR_CH channels (zero-gather G-buffer).
    """
    if attrs:
        a0_ref, a1_ref, rays_ref, out_ref, occ_out_ref, stack_ref = rest
    else:
        rays_ref, t_out_ref, idx_out_ref, occ_out_ref, stack_ref = rest
    t_min = tmin_ref[0]
    bias = scal_ref[0]
    rx0, ry0, rz0 = scal_ref[1], scal_ref[2], scal_ref[3]
    rx1, ry1, rz1 = scal_ref[4], scal_ref[5], scal_ref[6]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        if attrs:
            res = _w8_closest_walk_attr(
                k, max_iters, attrs == 2, ns_ref, tr_ref, a0_ref, a1_ref,
                stack_ref, ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            best_t, best_i = res[0], res[1]
            nx, ny, nz = res[12], res[13], res[14]
            _write_attr_out(out_ref, b, res)
        else:
            best_t, best_i, nx, ny, nz = _w8_closest_walk_n(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
            idx_out_ref[b] = best_i

        # Phase 2: one shadow walk per light from the shared biased hit
        # point (the _closest_shadow_kernel_w8_b raygen recipe).
        hitm = best_i >= 0
        sox, soy, soz = _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz,
                                           best_t, nx, ny, nz)
        occm = jnp.zeros(ox.shape, jnp.int32)
        s = 7
        for li, is_point in enumerate(points):
            if is_point:
                lpx, lpy, lpz = scal_ref[s], scal_ref[s + 1], scal_ref[s + 2]
                s += 3
                ex_ = lpx - sox
                ey_ = lpy - soy
                ez_ = lpz - soz
                d2 = jnp.maximum(ex_ * ex_ + ey_ * ey_ + ez_ * ez_, 1e-24)
                drn = jax.lax.rsqrt(d2)
                sdx = ex_ * drn
                sdy = ey_ * drn
                sdz = ez_ * drn
                six, siy, siz = _inv3(sdx, sdy, sdz)
                stmax = jnp.where(hitm, d2 * drn * (1.0 - 1e-4), -_BIG)
            else:
                sdx, sdy, sdz = scal_ref[s], scal_ref[s + 1], scal_ref[s + 2]
                six, siy, siz = (scal_ref[s + 3], scal_ref[s + 4],
                                 scal_ref[s + 5])
                s += 6
                stmax = _scene_exit_cap(hitm, sox, soy, soz,
                                        six, siy, siz,
                                        rx0, ry0, rz0, rx1, ry1, rz1)
            occ = _w8_anyhit_walk(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                sox, soy, soz, sdx, sdy, sdz, six, siy, siz, stmax, 0.0)
            occm = occm | jnp.where(occ > 0, jnp.int32(1 << li), 0)
        occ_out_ref[b] = occm
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _closest_soft_multi_shadow_kernel_w8_b(k: int, max_iters: int, nb: int,
                                           spp: int, disk: bool,
                                           n_extra: int, attrs: bool,
                                           tmin_ref, seed_ref,
                                           scal_ref, ns_ref, tr_ref,
                                           *rest):
    """Fused primary + SOFT light 0 + N hard directional extras: ONE
    program — the mixed completion of the fused-kernel matrix (e.g. an
    area sun with fill lights). Phase 1 = the shared closest walk; phase
    2a = light-0's in-kernel sampling loop (``disk``: jittered-disk point
    penumbra with a per-lane basis; else cone) -> counts; phase 2b = one
    hard walk per extra directional light -> occlusion bitmask (bit i =
    extra light i, i.e. frame light i+1).

    scal_ref: [bias, root_min(3), root_max(3)] then light 0 — disk:
    position(3) + radius; cone: axis(3) + basis t0(3) + t1(3) +
    cone_cos — then per extra light dir(3) + clamped 1/dir(3).
    ``attrs``: phase 1 = the attribute-tracked walk; (t, idx) outputs are
    replaced by the ATTR_CH channels (zero-gather G-buffer).
    """
    if attrs:
        (a0_ref, a1_ref, rays_ref, out_ref, cnt_out_ref, occ_out_ref,
         stack_ref) = rest
    else:
        (rays_ref, t_out_ref, idx_out_ref, cnt_out_ref, occ_out_ref,
         stack_ref) = rest
    t_min = tmin_ref[0]
    bias = scal_ref[0]
    rx0, ry0, rz0 = scal_ref[1], scal_ref[2], scal_ref[3]
    rx1, ry1, rz1 = scal_ref[4], scal_ref[5], scal_ref[6]
    if disk:
        lpx, lpy, lpz = scal_ref[7], scal_ref[8], scal_ref[9]
        radius = scal_ref[10]
        ex_base = 11
    else:
        adx, ady, adz = scal_ref[7], scal_ref[8], scal_ref[9]
        c0x, c0y, c0z = scal_ref[10], scal_ref[11], scal_ref[12]
        c1x, c1y, c1z = scal_ref[13], scal_ref[14], scal_ref[15]
        cone_cos = scal_ref[16]
        ex_base = 17
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        if attrs:
            res = _w8_closest_walk_attr(
                k, max_iters, attrs == 2, ns_ref, tr_ref, a0_ref, a1_ref,
                stack_ref, ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            best_t, best_i = res[0], res[1]
            nx, ny, nz = res[12], res[13], res[14]
            _write_attr_out(out_ref, b, res)
        else:
            best_t, best_i, nx, ny, nz = _w8_closest_walk_n(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min)
            t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
            idx_out_ref[b] = best_i

        hitm = best_i >= 0
        sox, soy, soz = _biased_hit_origin(bias, ox, oy, oz, dx, dy, dz,
                                           best_t, nx, ny, nz)

        # Phase 2a: light 0's sampling loop.
        if disk:
            ex0 = lpx - sox
            ey0 = lpy - soy
            ez0 = lpz - soz
            _, _, _, t0x, t0y, t0z, t1x, t1y, t1z = \
                _lane_axis_onb(ex0, ey0, ez0)

            def per_sample(s, count):
                u1 = _uniform01(sox.shape)
                u2 = _uniform01(sox.shape)
                r = jnp.sqrt(u1) * radius
                sphi, cphi = _sincos_2pi(u2)
                rc = r * cphi
                rs = r * sphi
                ddx = ex0 + t0x * rc + t1x * rs
                ddy = ey0 + t0y * rc + t1y * rs
                ddz = ez0 + t0z * rc + t1z * rs
                d2 = jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-24)
                drn = jax.lax.rsqrt(d2)
                sdx = ddx * drn
                sdy = ddy * drn
                sdz = ddz * drn
                six, siy, siz = _inv3(sdx, sdy, sdz)
                stmax = jnp.where(hitm, d2 * drn * (1.0 - 1e-4), -_BIG)
                occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref,
                                      stack_ref, sox, soy, soz,
                                      sdx, sdy, sdz, six, siy, siz,
                                      stmax, 0.0)
                return count + occ
        else:
            def per_sample(s, count):
                u1 = _uniform01(sox.shape)
                u2 = _uniform01(sox.shape)
                cos_t = 1.0 - u1 * (1.0 - cone_cos)
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                sphi, cphi = _sincos_2pi(u2)
                sc = sin_t * cphi
                ss = sin_t * sphi
                sdx = adx * cos_t + c0x * sc + c1x * ss
                sdy = ady * cos_t + c0y * sc + c1y * ss
                sdz = adz * cos_t + c0z * sc + c1z * ss
                srn = jax.lax.rsqrt(jnp.maximum(
                    sdx * sdx + sdy * sdy + sdz * sdz, 1e-20))
                sdx = sdx * srn
                sdy = sdy * srn
                sdz = sdz * srn
                six, siy, siz = _inv3(sdx, sdy, sdz)
                stmax = _scene_exit_cap(hitm, sox, soy, soz,
                                        six, siy, siz,
                                        rx0, ry0, rz0, rx1, ry1, rz1)
                occ = _w8_anyhit_walk(k, max_iters, ns_ref, tr_ref,
                                      stack_ref, sox, soy, soz,
                                      sdx, sdy, sdz, six, siy, siz,
                                      stmax, 0.0)
                return count + occ

        cnt_out_ref[b] = jax.lax.fori_loop(
            0, spp, per_sample, jnp.zeros(sox.shape, jnp.int32),
            unroll=False)

        # Phase 2b: hard walk per extra directional light.
        occm = jnp.zeros(sox.shape, jnp.int32)
        for li in range(n_extra):
            s = ex_base + 6 * li
            sdx, sdy, sdz = scal_ref[s], scal_ref[s + 1], scal_ref[s + 2]
            six, siy, siz = (scal_ref[s + 3], scal_ref[s + 4],
                             scal_ref[s + 5])
            stmax = _scene_exit_cap(hitm, sox, soy, soz, six, siy, siz,
                                    rx0, ry0, rz0, rx1, ry1, rz1)
            occ = _w8_anyhit_walk(
                k, max_iters, ns_ref, tr_ref, stack_ref,
                sox, soy, soz, sdx, sdy, sdz, six, siy, siz, stmax, 0.0)
            occm = occm | jnp.where(occ > 0, jnp.int32(1 << li), 0)
        occ_out_ref[b] = occm
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


# ---------------------------------------------------------------------------
# w8t kernels: sublane-major (transposed) node/leaf layout
# ---------------------------------------------------------------------------
#
# Profiling the batched kernels showed ~685 cycles/iteration of marginal
# cost, dominated by vreg->sreg scalar extracts: the row layout needs ~50
# box/ref scalars per node broadcast from vector registers (the raster
# kernel hit the same pathology and measured 3x from switching its record
# reads to SMEM). The w8t layout (bvh/wide.py WideBVHT) puts the CHILD (or
# leaf-triangle) index in the SUBLANE dimension, so every box plane /
# triangle field is a static (8,1) vector slice broadcasting against
# (1,128) ray sub-blocks — the only scalar extracts left are the ~2-3
# taken child refs per node.

def _select_lane_group(row, g, width: int):
    """(8,128) row -> (8,width) lane group g (g in 0..128/width-1) via a
    select tree of static slices (no dynamic lane indexing)."""
    span = 128
    while span > width:
        half = span // 2
        lo = row[:, :half]
        hi = row[:, half:span]
        row = jnp.where((g & (half // width)) > 0, hi, lo)
        span = half
    return row


def _roll_lanes_left(row, j, unit: int, jmax: int):
    """Rotate lanes left by unit*j (j in 0..jmax-1) with STATIC rolls
    selected by j's bits (dynamic-shift rolls are not relied on)."""
    out = row
    bit = 1
    while bit < jmax:
        rolled = pltpu.roll(out, 128 - unit * bit, 1)
        out = jnp.where((j & bit) > 0, rolled, out)
        bit *= 2
    return out


def _leaf_row_t(tr_ref, leaf_id, k: int):
    """Load + lane-align the transposed leaf row for leaf_id (leaf j ends
    up at lane 0). Returns the (8,128) aligned row."""
    from ..bvh.wide import leaves_per_block
    lpb = leaves_per_block(k)
    unit = 9 * (k // 8)
    blk = jax.lax.div(leaf_id, jnp.int32(lpb))
    j = leaf_id - blk * lpb
    return _roll_lanes_left(tr_ref[blk], j, unit, lpb)


def _leaf_occluded_t(tr_ref, leaf_id, k: int, occ, active0, ox, oy, oz,
                     dx, dy, dz, tmax, t_min):
    """Transposed-leaf occlusion: one (8,128) op tests 8 triangles x 128
    rays; 8 ray sub-blocks cover the packet. Zero scalar extracts."""
    row = _leaf_row_t(tr_ref, leaf_id, k)
    rows = []
    for s in range(8):
        lanes_s = (active0[s:s + 1] & (occ[s:s + 1] == 0))
        dxs, dys, dzs = dx[s:s + 1], dy[s:s + 1], dz[s:s + 1]
        oxs, oys, ozs = ox[s:s + 1], oy[s:s + 1], oz[s:s + 1]
        tms = tmax[s:s + 1]
        hit = None
        for h in range(k // 8):
            g = 9 * h
            v0x, v0y, v0z = row[:, g:g + 1], row[:, g + 1:g + 2], \
                row[:, g + 2:g + 3]
            e1x, e1y, e1z = row[:, g + 3:g + 4], row[:, g + 4:g + 5], \
                row[:, g + 5:g + 6]
            e2x, e2y, e2z = row[:, g + 6:g + 7], row[:, g + 7:g + 8], \
                row[:, g + 8:g + 9]
            px = dys * e2z - dzs * e2y
            py = dzs * e2x - dxs * e2z
            pz = dxs * e2y - dys * e2x
            det = e1x * px + e1y * py + e1z * pz
            sgn = jnp.where(det < 0.0, -1.0, 1.0)
            adet = det * sgn
            tx = oxs - v0x
            ty = oys - v0y
            tz = ozs - v0z
            nu = (tx * px + ty * py + tz * pz) * sgn
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            nv = (dxs * qx + dys * qy + dzs * qz) * sgn
            nt = (e2x * qx + e2y * qy + e2z * qz) * sgn
            ok = ((adet >= 1e-9) & (nu >= 0.0) & (nv >= 0.0)
                  & (nu + nv <= adet)
                  & (nt > t_min * adet) & (nt < tms * adet))
            hit = ok if hit is None else (hit | ok)
        # any over the 8 triangle sublanes -> does ray sub-block s hit?
        rows.append((jnp.sum((hit & lanes_s).astype(jnp.int32), axis=0,
                             keepdims=True) > 0).astype(jnp.int32))
    return occ | jnp.concatenate(rows, axis=0)


def _leaf_closest_t(tr_ref, leaf_id, k: int, best_t, best_i, active0,
                    ox, oy, oz, dx, dy, dz, t_min):
    """Transposed-leaf closest hit: per ray sub-block, min-reduce t over
    the 8 triangle sublanes (per group), argmin via an iota select."""
    row = _leaf_row_t(tr_ref, leaf_id, k)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    t_rows = []
    i_rows = []
    for s in range(8):
        dxs, dys, dzs = dx[s:s + 1], dy[s:s + 1], dz[s:s + 1]
        oxs, oys, ozs = ox[s:s + 1], oy[s:s + 1], oz[s:s + 1]
        bt_s = best_t[s:s + 1]
        bi_s = best_i[s:s + 1]
        for h in range(k // 8):
            g = 9 * h
            v0x, v0y, v0z = row[:, g:g + 1], row[:, g + 1:g + 2], \
                row[:, g + 2:g + 3]
            e1x, e1y, e1z = row[:, g + 3:g + 4], row[:, g + 4:g + 5], \
                row[:, g + 5:g + 6]
            e2x, e2y, e2z = row[:, g + 6:g + 7], row[:, g + 7:g + 8], \
                row[:, g + 8:g + 9]
            px = dys * e2z - dzs * e2y
            py = dzs * e2x - dxs * e2z
            pz = dxs * e2y - dys * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= 1e-9
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tx = oxs - v0x
            ty = oys - v0y
            tz = ozs - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dxs * qx + dys * qy + dzs * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            tv = jnp.where(ok & (t > t_min), t, _BIG)     # (8,128) tri x ray
            tm_s = jnp.min(tv, axis=0, keepdims=True)     # (1,128)
            # lowest matching sublane = triangle index within the group
            im_s = jnp.min(jnp.where(tv == tm_s, sub8, 8), axis=0,
                           keepdims=True)
            better = (tm_s < bt_s) & active0[s:s + 1]
            bt_s = jnp.where(better, tm_s, bt_s)
            bi_s = jnp.where(better, leaf_id * k + 8 * h + im_s, bi_s)
        t_rows.append(bt_s)
        i_rows.append(bi_s)
    return jnp.concatenate(t_rows, axis=0), jnp.concatenate(i_rows, axis=0)


def _any_hit_kernel_w8t(k: int, max_iters: int, nb: int, tmin_ref, ns_ref,
                        tr_ref, rays_ref, out_ref, stack_ref):
    """Hybrid 8-wide any-hit: row-layout node slabs (as _any_hit_kernel_w8)
    + transposed leaf tests; nb packets per grid step."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        active0 = tmax > t_min
        stack_ref[0] = jnp.int32(0)

        def leaf_test(leaf_id, occ):
            return _leaf_occluded_t(tr_ref, leaf_id, k, occ, active0,
                                    ox, oy, oz, dx, dy, dz, tmax, t_min)

        def cond(state):
            it, sp, alive, occ = state
            return (sp > 0) & (it < max_iters) & alive

        def body(state):
            it, sp, alive, occ = state
            sp = sp - 1
            node = stack_ref[sp]
            rec = ns_ref[pl.ds(node, 1), :]                    # (1, 128)
            lanes = active0 & (occ == 0)
            cap = jnp.where(lanes, tmax, -_BIG)
            hits = []
            refs = []
            valids = []
            for c in range(8):
                bb, ref = _wide_child(rec, c)
                hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min,
                                  cap) & lanes)
                refs.append(ref)
                valids.append(rec[0, bb] <= rec[0, bb + 3])
            anyhit = _child_anyhit8(hits, valids)
            for c in range(8):
                ref = refs[c]
                is_leaf = ref < 0
                occ = jax.lax.cond(anyhit[c] & is_leaf,
                                   lambda o, r=ref: leaf_test(
                                       jnp.maximum(-r - 1, 0), o),
                                   lambda o: o, occ)
                push = anyhit[c] & (~is_leaf)
                stack_ref[sp] = jnp.where(push, ref, 0)
                sp = sp + push.astype(jnp.int32)
            alive = jax.lax.cond((it & 3) == 3,
                                 lambda: jnp.any(active0 & (occ == 0)),
                                 lambda: alive)
            return it + 1, sp, alive, occ

        occ0 = jnp.zeros((8, 128), jnp.int32)
        # No prologue jnp.any: inactive (sky/pad) packets fail the root box
        # test and exit after one cheap iteration.
        _, _, _, occ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(1), True, occ0))
        out_ref[b] = occ
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0)


def _closest_hit_kernel_w8t(k: int, max_iters: int, nb: int, tmin_ref,
                            ns_ref, tr_ref, rays_ref, t_out_ref,
                            idx_out_ref, stack_ref):
    """Hybrid 8-wide closest-hit: row-layout node slabs + transposed leaf
    tests; nb packets per grid step."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        active0 = tmax > t_min
        stack_ref[0] = jnp.int32(0)

        def leaf_test(leaf_id, carry):
            best_t, best_i = carry
            return _leaf_closest_t(tr_ref, leaf_id, k, best_t, best_i,
                                   active0, ox, oy, oz, dx, dy, dz, t_min)

        def cond(state):
            it, sp, _, _ = state
            return (sp > 0) & (it < max_iters)

        def body(state):
            it, sp, best_t, best_i = state
            sp = sp - 1
            node = stack_ref[sp]
            rec = ns_ref[pl.ds(node, 1), :]
            cap = jnp.where(active0, best_t, -_BIG)
            hits = []
            refs = []
            valids = []
            for c in range(8):
                bb, ref = _wide_child(rec, c)
                hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min,
                                  cap))
                refs.append(ref)
                valids.append(rec[0, bb] <= rec[0, bb + 3])
            anyhit = _child_anyhit8(hits, valids)
            for c in range(8):
                ref = refs[c]
                is_leaf = ref < 0
                best_t, best_i = jax.lax.cond(
                    anyhit[c] & is_leaf,
                    lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0),
                                                 car),
                    lambda car: car, (best_t, best_i))
                push = anyhit[c] & (~is_leaf)
                stack_ref[sp] = jnp.where(push, ref, 0)
                sp = sp + push.astype(jnp.int32)
            return it + 1, sp, best_t, best_i

        best_t0 = jnp.where(active0, tmax, -_BIG)
        best_i0 = jnp.full((8, 128), -1, jnp.int32)
        _, _, best_t, best_i = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(1), best_t0, best_i0))
        t_out_ref[b] = jnp.where(best_i >= 0, best_t, _BIG)
        idx_out_ref[b] = best_i
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0)


def _w8t_closest_walk_attr(k: int, max_iters: int, textured: bool, ns_ref,
                           tr_ref, a0_ref, a1_ref, stack_ref, ox, oy, oz,
                           dx, dy, dz, ix, iy, iz, tmax, t_min):
    """Transposed-leaf attribute-tracked closest hit — the w8t twin of
    _w8_closest_walk_attr with ZERO per-candidate scalar lane reads.

    The row walk's leaf test broadcasts every triangle field out of vector
    registers (~9*k geometry + ~5/candidate attr vreg->sreg extracts per
    leaf visit — THE G-buffer cost, probes r3ae/r4d/r4e); here triangles
    live in SUBLANES (WideBVHT.tris_t), so the Möller–Trumbore runs as
    (8,128) ops on static (8,1) field slices, and the winner's attributes
    are selected by a one-hot sublane reduce from the TRANSPOSED attr rows
    (shading.make_leaf_attr_rows_t — same lane geometry, same _leaf_row_t
    alignment roll).

    Cost shape per leaf visit: the MT/update loop marshals only the four
    per-sub-block carries (best_t/i/u/v); the 8-11 attribute carries stay
    (8,128) whole and are updated by full-height masks inside a per-sub-
    block epilogue GUARDED by "did this leaf win any lane here" — leaf
    visits that improve nothing skip all attribute work. Returns the
    ATTR_CH tuple (_write_attr_out contract)."""
    active0 = tmax > t_min
    stack_ref[0] = jnp.int32(0)
    zero = jnp.zeros(ox.shape, jnp.float32)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    groups = k // 8

    def leaf_test(leaf_id, carry):
        (best_t, best_i, bu, bv, uvu, uvv, kd, lay, tid,
         o0, o1, o2, nx, ny, nz) = carry
        row = _leaf_row_t(tr_ref, leaf_id, k)
        arow = _leaf_row_t(a0_ref, leaf_id, k)
        brow = _leaf_row_t(a1_ref, leaf_id, k) if textured else None
        base = leaf_id * k
        t_rows, i_rows, u_rows, v_rows = [], [], [], []
        attrs = (uvu, uvv, kd, lay, tid, o0, o1, o2, nx, ny, nz)
        for s in range(8):
            dxs, dys, dzs = dx[s:s + 1], dy[s:s + 1], dz[s:s + 1]
            oxs, oys, ozs = ox[s:s + 1], oy[s:s + 1], oz[s:s + 1]
            bt_s = best_t[s:s + 1]
            bi_s = best_i[s:s + 1]
            bu_s = bu[s:s + 1]
            bv_s = bv[s:s + 1]
            act_s = active0[s:s + 1]
            for h in range(groups):
                g = 9 * h
                v0x, v0y, v0z = row[:, g:g + 1], row[:, g + 1:g + 2], \
                    row[:, g + 2:g + 3]
                e1x, e1y, e1z = row[:, g + 3:g + 4], row[:, g + 4:g + 5], \
                    row[:, g + 5:g + 6]
                e2x, e2y, e2z = row[:, g + 6:g + 7], row[:, g + 7:g + 8], \
                    row[:, g + 8:g + 9]
                px = dys * e2z - dzs * e2y
                py = dzs * e2x - dxs * e2z
                pz = dxs * e2y - dys * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = jnp.abs(det) >= 1e-9
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tx = oxs - v0x
                ty = oys - v0y
                tz = ozs - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dxs * qx + dys * qy + dzs * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                    & (u + v <= 1.0)
                tv = jnp.where(ok & (t > t_min), t, _BIG)   # (8,128)
                tm_s = jnp.min(tv, axis=0, keepdims=True)   # (1,128)
                im_s = jnp.min(jnp.where(tv == tm_s, sub8, 8), axis=0,
                               keepdims=True)
                oneh = (sub8 == im_s) & (tv < _BIG)
                better = (tm_s < bt_s) & act_s
                bt_s = jnp.where(better, tm_s, bt_s)
                bi_s = jnp.where(better, base + 8 * h + im_s, bi_s)
                us = jnp.sum(jnp.where(oneh, u, 0.0), axis=0, keepdims=True)
                vs = jnp.sum(jnp.where(oneh, v, 0.0), axis=0, keepdims=True)
                bu_s = jnp.where(better, us, bu_s)
                bv_s = jnp.where(better, vs, bv_s)

            # Attribute epilogue for sub-block s: runs only if this leaf
            # won at least one of its 128 lanes. bi_s in [base, base+k)
            # <=> won during THIS visit (a leaf hangs under exactly one
            # wide node; the EMPTY->leaf-0 re-visits recompute identical
            # values). Attr carries update as FULL (8,128) arrays through
            # sublane-s masks — no slicing, no concat, no scalar reads.
            local = bi_s - base                             # (1,128)
            inleaf = (local >= 0) & (local < k)
            upd = (sub8 == s) & inleaf                      # (8,128)

            def do_attrs(a, local=local, inleaf=inleaf, upd=upd,
                         bu_s=bu_s, bv_s=bv_s):
                (uvu, uvv, kd, lay, tid, o0, o1, o2, nx, ny, nz) = a
                w = local & 7
                gsel = local >> 3

                def sel(src, f):
                    acc = None
                    for h in range(groups):
                        oneh = inleaf & (gsel == h) & (sub8 == w)
                        val = jnp.sum(
                            jnp.where(oneh, src[:, 9 * h + f:9 * h + f + 1],
                                      0.0), axis=0, keepdims=True)
                        acc = val if acc is None else acc + val
                    return acc

                def selv(vals_by_group):
                    acc = None
                    for h in range(groups):
                        oneh = inleaf & (gsel == h) & (sub8 == w)
                        val = jnp.sum(
                            jnp.where(oneh, vals_by_group[h], 0.0),
                            axis=0, keepdims=True)
                        acc = val if acc is None else acc + val
                    return acc

                o0 = jnp.where(upd, sel(arow, 0), o0)
                o1 = jnp.where(upd, sel(arow, 1), o1)
                o2 = jnp.where(upd, sel(arow, 2), o2)
                kd = jnp.where(upd, sel(arow, 3), kd)
                tid = jnp.where(upd, sel(arow, 4), tid)
                gnx, gny, gnz = [], [], []
                for h in range(groups):
                    g = 9 * h
                    e1x, e1y, e1z = row[:, g + 3:g + 4], \
                        row[:, g + 4:g + 5], row[:, g + 5:g + 6]
                    e2x, e2y, e2z = row[:, g + 6:g + 7], \
                        row[:, g + 7:g + 8], row[:, g + 8:g + 9]
                    gnx.append(e1y * e2z - e1z * e2y)
                    gny.append(e1z * e2x - e1x * e2z)
                    gnz.append(e1x * e2y - e1y * e2x)
                nx = jnp.where(upd, selv(gnx), nx)
                ny = jnp.where(upd, selv(gny), ny)
                nz = jnp.where(upd, selv(gnz), nz)
                if textured:
                    lay = jnp.where(upd, sel(arow, 5), lay)
                    u0u = sel(arow, 6)
                    u0v = sel(arow, 7)
                    d1u = sel(brow, 0)
                    d1v = sel(brow, 1)
                    d2u = sel(brow, 2)
                    d2v = sel(brow, 3)
                    uvu = jnp.where(upd, u0u + bu_s * d1u + bv_s * d2u, uvu)
                    uvv = jnp.where(upd, u0v + bu_s * d1v + bv_s * d2v, uvv)
                return (uvu, uvv, kd, lay, tid, o0, o1, o2, nx, ny, nz)

            attrs = jax.lax.cond(jnp.any(inleaf), do_attrs, lambda a: a,
                                 attrs)
            t_rows.append(bt_s)
            i_rows.append(bi_s)
            u_rows.append(bu_s)
            v_rows.append(bv_s)
        (uvu, uvv, kd, lay, tid, o0, o1, o2, nx, ny, nz) = attrs
        return (jnp.concatenate(t_rows, axis=0),
                jnp.concatenate(i_rows, axis=0),
                jnp.concatenate(u_rows, axis=0),
                jnp.concatenate(v_rows, axis=0),
                uvu, uvv, kd, lay, tid, o0, o1, o2, nx, ny, nz)

    def cond(state):
        it, sp = state[0], state[1]
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp = state[0], state[1]
        carry = state[2:]
        best_t = carry[0]
        sp = sp - 1
        node = stack_ref[sp]
        rec = ns_ref[pl.ds(node, 1), :]
        cap = jnp.where(active0, best_t, -_BIG)
        hits = []
        refs = []
        valids = []
        for c in range(8):
            bb, ref = _wide_child(rec, c)
            hits.append(_slab(rec, bb, ox, oy, oz, ix, iy, iz, t_min, cap))
            refs.append(ref)
            valids.append(rec[0, bb] <= rec[0, bb + 3])
        anyhit = _child_anyhit8(hits, valids)
        for c in range(8):
            ref = refs[c]
            is_leaf = ref < 0
            carry = jax.lax.cond(
                anyhit[c] & is_leaf,
                lambda car, r=ref: leaf_test(jnp.maximum(-r - 1, 0), car),
                lambda car: car, carry)
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        return (it + 1, sp) + tuple(carry)

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    lay0 = zero if textured else jnp.full(ox.shape, -1.0, jnp.float32)
    init = (jnp.int32(0), jnp.int32(1), best_t0, best_i0, zero, zero,
            zero, zero, zero, lay0) + tuple(zero for _ in range(7))
    state = jax.lax.while_loop(cond, body, init)
    return state[2:]


def _closest_attr_kernel_w8t_b(k: int, max_iters: int, nb: int,
                               textured: bool, tmin_ref, ns_ref, tr_ref,
                               a0_ref, a1_ref, rays_ref, out_ref,
                               stack_ref):
    """Batched w8t attribute-tracked closest hit (transposed leaves +
    transposed attr rows): ONE f32 output of ATTR_CH channels/packet."""
    t_min = tmin_ref[0]

    def per_packet(b, _):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
            _packet_body_rays(rays_ref, b)
        res = _w8t_closest_walk_attr(k, max_iters, textured, ns_ref,
                                     tr_ref, a0_ref, a1_ref, stack_ref,
                                     ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                     tmax, t_min)
        _write_attr_out(out_ref, b, res)
        return 0

    jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)


def _attr_call_t(packed, at0, at1, rays, t_min, interpret, batch,
                 textured: bool = False):
    """_common_call_t with the two TRANSPOSED leaf-attribute arrays as
    extra VMEM inputs and one (pb, ATTR_CH, 8, 128) f32 output."""
    from ..bvh.wide import WideBVHT
    assert isinstance(packed, WideBVHT)
    pb = rays.shape[0]
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 10, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, ATTR_CH, 8, 128),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pb // batch,),
        in_specs=[const_spec(packed.nodes.shape),
                  const_spec(packed.tris_t.shape),
                  const_spec(at0.shape), const_spec(at1.shape), ray_spec],
        out_specs=(out_spec,),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(_closest_attr_kernel_w8t_b, packed.leaf_size,
                          iter_cap, batch, textured),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((pb, ATTR_CH, 8, 128),
                                        jnp.float32, vma=vma),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    return fn(tmin_arr, packed.nodes, packed.tris_t, at0, at1, rays)[0]


def _common_call_t(packed, kernel, out_shapes, rays, t_min, interpret,
                   batch: int):
    from ..bvh.wide import WideBVHT
    assert isinstance(packed, WideBVHT)
    pb = rays.shape[0]
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE  # cost-model probes only
    if interpret is None:
        interpret = not _compiled_backend()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 10, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pb // batch,),
        in_specs=[const_spec(packed.nodes.shape),
                  const_spec(packed.tris_t.shape), ray_spec],
        out_specs=tuple(out_spec for _ in out_shapes),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(kernel, packed.leaf_size, iter_cap, batch),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((pb, 8, 128), dt, vma=vma)
            for dt in out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    return fn(tmin_arr, packed.nodes, packed.tris_t, rays)


def _ray_packets_packed(origins, dirs, t_max, batch: int):
    """Rays -> ONE packed f32[PB, 10, 8, 128] array (PB = P padded to a
    multiple of ``batch``; padding packets have t_max = -1 -> inactive).
    Components: o.xyz, d.xyz, clamped 1/d.xyz (precomputed here so the
    kernels never pay VPU divides), t_max."""
    comps, tm, meta = _ray_packets(origins, dirs, t_max)
    invs = [jnp.clip(1.0 / c, -_BIG, _BIG) for c in comps[3:6]]
    rays = jnp.stack(comps + invs + [tm], axis=1)     # (P, 10, 8, 128)
    p = rays.shape[0]
    pb = -(-p // batch) * batch
    if pb != p:
        pad = jnp.zeros((pb - p, 10, 8, 128), rays.dtype)
        pad = pad.at[:, 9].set(-1.0)
        rays = jnp.concatenate([rays, pad])
    return rays, p, meta


def _common_call_b(packed, kernel, out_shapes, rays, t_min, interpret,
                   batch: int):
    from ..bvh.wide import WideBVH
    assert isinstance(packed, WideBVH)
    pb = rays.shape[0]
    nodes = packed.nodes
    tris = packed.tris
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE  # cost-model probes only
    if interpret is None:
        interpret = not _compiled_backend()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 10, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pb // batch,),
        in_specs=[const_spec(nodes.shape), const_spec(tris.shape), ray_spec],
        out_specs=tuple(out_spec for _ in out_shapes),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(kernel, packed.leaf_size, iter_cap, batch),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((pb, 8, 128), dt, vma=vma)
            for dt in out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    return fn(tmin_arr, nodes, tris, rays)


def _attr_call_b(packed, at0, at1, rays, t_min, interpret, batch,
                 textured: bool = False):
    """_common_call_b with the two leaf-attribute row tables as extra
    VMEM-resident inputs and one (pb, ATTR_CH, 8, 128) f32 output."""
    from ..bvh.wide import WideBVH
    assert isinstance(packed, WideBVH)
    pb = rays.shape[0]
    nodes = packed.nodes
    tris = packed.tris
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 10, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, ATTR_CH, 8, 128),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pb // batch,),
        in_specs=[const_spec(nodes.shape), const_spec(tris.shape),
                  const_spec(at0.shape), const_spec(at1.shape), ray_spec],
        out_specs=(out_spec,),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(_closest_attr_kernel_w8_b, packed.leaf_size,
                          iter_cap, batch, textured),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((pb, ATTR_CH, 8, 128),
                                        jnp.float32, vma=vma),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    return fn(tmin_arr, nodes, tris, at0, at1, rays)[0]


# ---------------------------------------------------------------------------
# Host-callable wrappers
# ---------------------------------------------------------------------------

def _ray_packets(origins, dirs, t_max):
    """(H,W,3) rays -> seven (P,8,128) component arrays (spatial tiling), or
    flat chunking for non-image ray sets."""
    if origins.ndim == 3:
        h, w = origins.shape[:2]
        comps = [to_packets(origins[..., c]) for c in range(3)]
        comps += [to_packets(dirs[..., c], fill=1.0) for c in range(3)]
        tm = to_packets(jnp.broadcast_to(t_max, (h, w)), fill=-1.0)
        meta = ("img", h, w)
    else:
        n = origins.shape[0]
        npad = -(-n // 1024) * 1024
        def flat(x, fill):
            x = jnp.concatenate(
                [x, jnp.full((npad - n,), fill, x.dtype)]) if npad != n else x
            return x.reshape(-1, 8, 128)
        comps = [flat(origins[:, c], 0.0) for c in range(3)]
        comps += [flat(dirs[:, c], 1.0) for c in range(3)]
        tm = flat(jnp.broadcast_to(t_max, (n,)).astype(jnp.float32), -1.0)
        meta = ("flat", n, npad)
    return comps, tm, meta


def _unpack(res, meta):
    kind, a, b = meta
    if kind == "img":
        return from_packets(res, a, b)
    return res.reshape(-1)[:a]


def _common_call(packed, kernel, out_shapes, comps, tm, t_min,
                 interpret):
    from ..bvh.wide import WideBVH
    p = comps[0].shape[0]
    nodes = packed.nodes
    tris = packed.tris
    if isinstance(packed, WideBVH):
        stack_depth = WIDE_STACK_DEPTH
        iter_cap = 2 * packed.num_wide + 64
    else:
        stack_depth = STACK_DEPTH
        iter_cap = _iter_cap(packed.num_internal)
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE  # cost-model probes only
    if interpret is None:
        interpret = not _compiled_backend()
    # NB: with PrefetchScalarGridSpec the index maps receive the scalar
    # prefetch refs after the grid indices — accept and ignore them.
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[const_spec(nodes.shape), const_spec(tris.shape)]
        + [ray_spec] * 7,
        out_specs=tuple(ray_spec for _ in out_shapes),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
    )
    # Under shard_map(check_vma=True) the outputs must declare how they vary
    # across mesh axes: they vary exactly like the ray inputs (the BVH is
    # replicated; rays are sharded). jax.typeof carries the vma of the traced
    # value; outside shard_map it is frozenset() (not varying), which is
    # equally valid.
    vma = getattr(jax.typeof(comps[0]), "vma", None)
    fn = pl.pallas_call(
        functools.partial(kernel, packed.leaf_size, iter_cap),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((p, 8, 128), dt, vma=vma)
            for dt in out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    return fn(tmin_arr, nodes, tris, *comps, tm)


def _as_packed(bvh):
    from ..bvh.wide import WideBVH, WideBVHT
    if isinstance(bvh, (PackedBVH, WideBVH, WideBVHT)):
        return bvh
    return pack_bvh(bvh)


def trace_any_pallas(bvh, origins, dirs, t_max, cfg=None, t_min: float = 0.0,
                     interpret: Optional[bool] = None,
                     variant: str = "lanes") -> jnp.ndarray:
    """Occlusion query: bool[H, W] (True = something between t_min and t_max).

    Rays with t_max <= t_min are inactive and return False (sky skip).
    variant (binary-BVH path only): "lanes" (per-lane vector culling,
    default — measured faster: occlusion masks shrink the traversal union)
    or "frustum" (scalar interval culling, kept for reference)."""
    from ..bvh.wide import WideBVH, WideBVHT
    packed = _as_packed(bvh)
    if isinstance(packed, WideBVHT):
        rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                            PACKETS_PER_STEP)
        (occ,) = _common_call_t(packed, _any_hit_kernel_w8t, (jnp.int32,),
                                rays, t_min, interpret, PACKETS_PER_STEP)
        return _unpack(occ[:p], meta) > 0
    if isinstance(packed, WideBVH) and variant == "lanes" \
            and PACKETS_PER_STEP > 1:
        rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                            PACKETS_PER_STEP)
        (occ,) = _common_call_b(packed, _any_hit_kernel_w8_b, (jnp.int32,),
                                rays, t_min, interpret, PACKETS_PER_STEP)
        return _unpack(occ[:p], meta) > 0
    comps, tm, meta = _ray_packets(origins, dirs, t_max)
    if isinstance(packed, WideBVH):
        if variant == "x2":         # retired variant (kernels/_variants.py)
            from ._variants import _any_hit_kernel_w8_x2 as kernel
        else:
            kernel = _any_hit_kernel_w8
    elif variant == "frustum":      # retired variant (kernels/_variants.py)
        from ._variants import _any_hit_kernel_v2 as kernel
    else:
        kernel = _any_hit_kernel
    (occ,) = _common_call(packed, kernel, (jnp.int32,), comps, tm,
                          t_min, interpret)
    return _unpack(occ, meta) > 0


def trace_any_pallas_stats(*args, **kw):
    """Observability twin of trace_any_pallas — lives with the retired
    variants (kernels/_variants.py); thin re-export for probe compat."""
    from ._variants import trace_any_pallas_stats as fn
    return fn(*args, **kw)


def _onb3(d):
    """Branchless orthonormal basis (Duff et al. 2017) for a (3,) unit
    vector — XLA-side twin of passes.shadow._onb, for kernel scalars."""
    s = jnp.where(d[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + d[2])
    b = d[0] * d[1] * a
    t0 = jnp.stack([1.0 + s * d[0] * d[0] * a, s * b, -s * d[0]])
    t1 = jnp.stack([b, s + d[1] * d[1] * a, -d[1]])
    return t0, t1


def _pack_soft_origins(origins, valid, batch):
    """Pack biased shadow origins + valid flags into (P, 4, 8, 128) ray
    blocks padded to a batch multiple — the shared prologue of the
    standalone in-kernel soft-shadow wrappers. Returns (rays, p, meta)
    for _unpack."""
    if origins.ndim == 3:
        h, w = origins.shape[:2]
        comps = [to_packets(origins[..., c]) for c in range(3)]
        comps.append(to_packets(valid.astype(jnp.float32)))
        meta = ("img", h, w)
    else:
        n = origins.shape[0]
        npad = -(-n // 1024) * 1024

        def flat(x, fill):
            x = jnp.concatenate(
                [x, jnp.full((npad - n,), fill, x.dtype)]) if npad != n else x
            return x.reshape(-1, 8, 128)

        comps = [flat(origins[:, c], 0.0) for c in range(3)]
        comps.append(flat(valid.astype(jnp.float32), 0.0))
        meta = ("flat", n, npad)
    rays = jnp.stack(comps, axis=1)                   # (P, 4, 8, 128)
    p = rays.shape[0]
    pb = -(-p // batch) * batch
    if pb != p:
        rays = jnp.concatenate(
            [rays, jnp.zeros((pb - p, 4, 8, 128), rays.dtype)])
    return rays, p, meta


def trace_any_soft_pallas(bvh, origins, valid, axis_dir, cone_cos, spp: int,
                          seed, t_min: float = 0.0,
                          interpret=None) -> jnp.ndarray:
    """Area-light (cone) soft shadows with in-kernel sampling: occlusion
    COUNTS i32[H, W] in [0, spp] (visibility = 1 - counts/spp).

    origins: f32[H, W, 3] biased shadow origins; valid: bool[H, W];
    axis_dir: f32[3] unit cone axis (toward the light); cone_cos: scalar
    cos(angular radius); seed: int32 scalar (vary per frame/light).

    Uses the TPU hardware PRNG — each (grid step, packet) gets a distinct
    stream, so results are deterministic per (seed, topology) on TPU. On
    CPU this runs in TPU-interpret mode where prng_random_bits is a ZERO
    stream: every sample degenerates to the exact cone axis (== hard
    shadow x spp), which tests exploit for deterministic parity. See
    passes/shadow.py shadow_pass for the XLA twin this replaces at
    BASELINE-config-3 scale (~5 ms/sample of ray-gen eliminated)."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH), "soft kernel needs the 8-wide accel"
    batch = PACKETS_PER_STEP
    rays, p, meta = _pack_soft_origins(origins, valid, batch)
    pb = rays.shape[0]

    t0, t1 = _onb3(axis_dir)
    scal = jnp.concatenate([
        axis_dir.astype(jnp.float32), t0, t1,
        jnp.asarray(cone_cos, jnp.float32)[None],
        packed.root_min.astype(jnp.float32),
        packed.root_max.astype(jnp.float32)])          # f32[16]

    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    if interpret is True:
        # The HLO interpreter has no prng_seed; the TPU-semantics
        # interpreter runs the kernel with a zero bit stream.
        interpret = pltpu.InterpretParams()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 4, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pb // batch,),
        in_specs=[const_spec(packed.nodes.shape),
                  const_spec(packed.tris.shape), ray_spec],
        out_specs=(out_spec,),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(_any_hit_kernel_w8_soft, packed.leaf_size,
                          iter_cap, batch, spp),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((pb, 8, 128), jnp.int32, vma=vma),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    (counts,) = fn(tmin_arr, seed_arr, scal, packed.nodes, packed.tris, rays)
    return _unpack(counts[:p], meta)


def trace_closest_soft_multi_shadow_pallas(bvh, origins, dirs, light0,
                                           extra_dirs, spp: int, seed, bias,
                                           t_max=_BIG, t_min: float = 0.0,
                                           attr_tables=None,
                                           textured: bool = False,
                                           interpret=None):
    """Fused primary + soft light 0 + N hard directional extras (ONE
    kernel). light0: either ("cone", axis_dir f32[3], cone_cos scalar) or
    ("disk", position f32[3], radius scalar). extra_dirs: sequence of
    toward-light f32[3] directions for the hard extras. Returns
    (t f32[H, W], sorted_idx i32[H, W], counts0 i32[H, W] in [0, spp],
    occ_mask i32[H, W] with bit i = extra light i occluded) — or, with
    ``attr_tables``, (channel dict, counts0, occ_mask). The mixed
    completion of trace_closest_{soft,point_soft,multi}_shadow_pallas
    (_closest_soft_multi_shadow_kernel_w8_b). Batched 8-wide accel path
    only."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "fused soft-multi needs the batched 8-wide accel path"
    kind, vec, scalar = light0
    assert kind in ("cone", "disk"), kind
    disk = kind == "disk"
    attrs = 0 if attr_tables is None else (2 if textured else 1)
    batch = PACKETS_PER_STEP
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max, batch)
    pb = rays.shape[0]
    blocks = [jnp.asarray(bias, jnp.float32).reshape(1),
              packed.root_min.astype(jnp.float32),
              packed.root_max.astype(jnp.float32)]
    if disk:
        blocks.append(jnp.asarray(vec, jnp.float32))
        blocks.append(jnp.asarray(scalar, jnp.float32).reshape(1))
    else:
        axis = jnp.asarray(vec, jnp.float32)
        t0, t1 = _onb3(axis)
        blocks.extend([axis, t0, t1,
                       jnp.asarray(scalar, jnp.float32).reshape(1)])
    for ld in extra_dirs:
        d = jnp.asarray(ld, jnp.float32)
        blocks.append(d)
        blocks.append(jnp.clip(1.0 / d, -_BIG, _BIG))
    scal = jnp.concatenate(blocks)
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    if interpret is True:
        # prng_seed needs the TPU-semantics interpreter (zero bit stream).
        interpret = pltpu.InterpretParams()
    vma = getattr(jax.typeof(rays), "vma", None)
    consts, in_specs, out_specs, out_shape = _fused_specs(
        packed, attr_tables, pb, batch, vma, extra_i32=2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pb // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    fn = pl.pallas_call(
        functools.partial(_closest_soft_multi_shadow_kernel_w8_b,
                          packed.leaf_size, iter_cap, batch, spp, disk,
                          len(extra_dirs), attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if attrs:
        out, counts, occm = fn(tmin_arr, seed_arr, scal, *consts, rays)
        return (_attr_channels(out, p, meta), _unpack(counts[:p], meta),
                _unpack(occm[:p], meta))
    t, sidx, counts, occm = fn(tmin_arr, seed_arr, scal, *consts, rays)
    t = _unpack(t[:p], meta)
    sidx = _unpack(sidx[:p], meta)
    counts = _unpack(counts[:p], meta)
    occm = _unpack(occm[:p], meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    return t, sidx, counts, occm


def trace_closest_point_soft_shadow_pallas(bvh, origins, dirs, light_pos,
                                           radius, spp: int, seed, bias,
                                           t_max=_BIG, t_min: float = 0.0,
                                           attr_tables=None,
                                           textured: bool = False,
                                           interpret=None):
    """Fused primary visibility + point-light penumbra (ONE kernel).

    Returns (t f32[H, W], sorted_idx i32[H, W], counts i32[H, W] in
    [0, spp]) — the closest hit per camera ray plus the in-kernel
    jittered-disk occlusion count from its biased hit point
    (_closest_psoft_shadow_kernel_w8_b); visibility = 1 - counts/spp.
    With ``attr_tables``: (channel dict, counts).
    The LIGHT_POINT spp>1 analogue of trace_closest_soft_shadow_pallas;
    same zero-stream interpret semantics (every sample degenerates to the
    disk center == hard point shadow). Batched 8-wide accel path only."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "fused closest+psoft needs the batched 8-wide accel path"
    batch = PACKETS_PER_STEP
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max, batch)
    pb = rays.shape[0]
    scal = jnp.concatenate([
        jnp.asarray(light_pos, jnp.float32),
        jnp.asarray(radius, jnp.float32).reshape(1),
        jnp.asarray(bias, jnp.float32).reshape(1)])    # f32[5]
    attrs = 0 if attr_tables is None else (2 if textured else 1)
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    if interpret is True:
        # prng_seed needs the TPU-semantics interpreter (zero bit stream).
        interpret = pltpu.InterpretParams()
    vma = getattr(jax.typeof(rays), "vma", None)
    consts, in_specs, out_specs, out_shape = _fused_specs(
        packed, attr_tables, pb, batch, vma, extra_i32=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pb // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    fn = pl.pallas_call(
        functools.partial(_closest_psoft_shadow_kernel_w8_b,
                          packed.leaf_size, iter_cap, batch, spp, attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if attrs:
        out, counts = fn(tmin_arr, seed_arr, scal, *consts, rays)
        return _attr_channels(out, p, meta), _unpack(counts[:p], meta)
    t, sidx, counts = fn(tmin_arr, seed_arr, scal, *consts, rays)
    t = _unpack(t[:p], meta)
    sidx = _unpack(sidx[:p], meta)
    counts = _unpack(counts[:p], meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    return t, sidx, counts


def trace_any_point_soft_pallas(bvh, origins, valid, light_pos, radius,
                                spp: int, seed, t_min: float = 0.0,
                                interpret=None) -> jnp.ndarray:
    """Point-light penumbra with in-kernel disk sampling: occlusion COUNTS
    i32[H, W] in [0, spp] (visibility = 1 - counts/spp).

    origins: f32[H, W, 3] biased shadow origins; valid: bool[H, W];
    light_pos: f32[3]; radius: scalar source radius (Light.radius);
    seed: int32 scalar. The LIGHT_POINT twin of trace_any_soft_pallas —
    same PRNG/stream semantics (TPU-interpret mode is a zero bit stream:
    every sample degenerates to the disk center == hard point shadow,
    which tests exploit for deterministic parity). Replaces shadow_pass's
    scan for the least-coherent workload family (the one that retired ray
    sorting); per-sample HBM traffic: zero."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH), "psoft kernel needs the 8-wide accel"
    batch = PACKETS_PER_STEP
    rays, p, meta = _pack_soft_origins(origins, valid, batch)
    pb = rays.shape[0]

    scal = jnp.concatenate([
        jnp.asarray(light_pos, jnp.float32),
        jnp.asarray(radius, jnp.float32).reshape(1)])  # f32[4]

    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    if interpret is True:
        # prng_seed needs the TPU-semantics interpreter (zero bit stream).
        interpret = pltpu.InterpretParams()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 4, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pb // batch,),
        in_specs=[const_spec(packed.nodes.shape),
                  const_spec(packed.tris.shape), ray_spec],
        out_specs=(out_spec,),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    vma = getattr(jax.typeof(rays), "vma", None)
    fn = pl.pallas_call(
        functools.partial(_any_hit_kernel_w8_psoft, packed.leaf_size,
                          iter_cap, batch, spp),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((pb, 8, 128), jnp.int32, vma=vma),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    (counts,) = fn(tmin_arr, seed_arr, scal, packed.nodes, packed.tris, rays)
    return _unpack(counts[:p], meta)


def trace_closest_pallas(bvh, origins, dirs, t_max=_BIG, cfg=None,
                         t_min: float = 0.0,
                         interpret: Optional[bool] = None,
                         variant: str = "lanes",
                         return_sorted: bool = False,
                         seeded: bool = False,
                         gather_tri_id: bool = True):
    """Closest hit: (t f32[H, W], tri_id i32[H, W]); miss = (inf, -1).
    With return_sorted=True also returns the Morton-sorted hit index
    (t, tri_id, sorted_idx) — the key into sorted-order side tables
    (e.g. the packed shading table), cheaper to consume than tri_id.

    seeded=True (WideBVH lanes path only) runs the two-pass variant:
    a cheap first-hit pass (early exit once every lane has SOME hit)
    produces per-ray conservative t upper bounds; the main pass then
    starts with those as its caps and never descends subtrees entirely
    behind the seed. Exact: the seed bound is >= the true closest t, so
    the main pass always (re-)finds the closest hit."""
    from ..bvh.wide import WideBVH, WideBVHT
    packed = _as_packed(bvh)
    if isinstance(packed, WideBVHT):
        rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                            PACKETS_PER_STEP)
        t, sidx = _common_call_t(packed, _closest_hit_kernel_w8t,
                                 (jnp.float32, jnp.int32), rays, t_min,
                                 interpret, PACKETS_PER_STEP)
        t, sidx = t[:p], sidx[:p]
    elif isinstance(packed, WideBVH) and variant == "lanes" \
            and PACKETS_PER_STEP > 1:
        rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                            PACKETS_PER_STEP)
        if seeded:
            t1, s1 = _common_call_b(packed, _first_hit_kernel_w8_b,
                                    (jnp.float32, jnp.int32), rays, t_min,
                                    interpret, PACKETS_PER_STEP)
            # Loosen the seed by ~33 ulps so the main pass's strict '<'
            # always re-accepts the seed triangle itself.
            cap = jnp.where(s1 >= 0, t1 * (1.0 + 4e-6) + 1e-6, rays[:, 9])
            rays = rays.at[:, 9].set(cap)
        t, sidx = _common_call_b(packed, _closest_hit_kernel_w8_b,
                                 (jnp.float32, jnp.int32), rays, t_min,
                                 interpret, PACKETS_PER_STEP)
        t, sidx = t[:p], sidx[:p]
    else:
        comps, tm, meta = _ray_packets(origins, dirs, t_max)
        if isinstance(packed, WideBVH):
            kernel = _closest_hit_kernel_w8
        elif variant == "frustum":  # retired variant (kernels/_variants.py)
            from ._variants import _closest_hit_kernel_v2 as kernel
        else:
            kernel = _closest_hit_kernel
        t, sidx = _common_call(packed, kernel,
                               (jnp.float32, jnp.int32), comps, tm, t_min,
                               interpret)
    t = _unpack(t, meta)
    sidx = _unpack(sidx, meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    if not gather_tri_id:
        # Caller derives tri_id from a side table keyed by sidx (the
        # packed shade table carries the id bits) — skips a ~2M-row
        # gather per frame at 1080p.
        assert return_sorted, "gather_tri_id=False requires return_sorted"
        return t, None, sidx
    tri_id = jnp.where(sidx >= 0,
                       packed.tri_id[jnp.clip(sidx, 0,
                                              packed.tri_id.shape[0] - 1)],
                       -1)
    if return_sorted:
        return t, tri_id, sidx
    return t, tri_id


def _fused_specs(packed, attr_tables, pb, batch, vma, extra_i32: int):
    """Shared pallas_call plumbing for the five fused primary+shadow
    wrappers: const operand list (accel +, with attr tables, the leaf
    attr rows), in_specs, out_specs and out_shape. The leading outputs
    are (t f32, sidx i32) — replaced by ONE ATTR_CH-channel f32 output
    when attr tables ride along — followed by ``extra_i32`` i32 outputs
    (occlusion / counts / masks)."""
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((batch, 10, 8, 128), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    i32_out = jax.ShapeDtypeStruct((pb, 8, 128), jnp.int32, vma=vma)
    consts = [packed.nodes, packed.tris]
    if attr_tables is not None:
        consts += [attr_tables[0], attr_tables[1]]
        attr_spec = pl.BlockSpec((batch, ATTR_CH, 8, 128),
                                 lambda i, *_: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = (attr_spec,) + (out_spec,) * extra_i32
        out_shape = (jax.ShapeDtypeStruct((pb, ATTR_CH, 8, 128),
                                          jnp.float32, vma=vma),) \
            + (i32_out,) * extra_i32
    else:
        out_specs = (out_spec,) * (2 + extra_i32)
        out_shape = (jax.ShapeDtypeStruct((pb, 8, 128), jnp.float32,
                                          vma=vma), i32_out) \
            + (i32_out,) * extra_i32
    in_specs = [const_spec(c.shape) for c in consts] + [ray_spec]
    return consts, in_specs, out_specs, out_shape


def trace_closest_attrs_pallas(bvh, at0, at1, origins, dirs, t_max=_BIG,
                               t_min: float = 0.0, textured: bool = False,
                               interpret: Optional[bool] = None):
    """Attribute-tracked closest hit: the kernel returns the winner's FULL
    shading attributes (tracked by in-register selects during the walk),
    so the G-buffer needs ZERO per-pixel gathers — replacing the packed
    shade-table gather, which costs ~23 ms per 2M-pixel frame regardless
    of row width.

    at0/at1: leaf-major attribute rows (passes/shading.make_leaf_attr_rows
    — must be built from the SAME LBVH this accel was widened from).
    Returns a dict of image-shaped arrays: t (inf = miss), sidx (i32, -1 =
    miss), u, v (MT barycentrics), uv (interpolated texture coords, [..,2]),
    kd (packed rgb float), layer (f32, -1 = untextured), tri_id (i32,
    -1 = miss), oct (f32[..,6]: oct(n0),oct(n1),oct(n2)), gn (f32[..,3]
    unnormalized geometric normal). Batched 8-wide accel path only."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "attribute-tracked closest hit needs the batched 8-wide accel path"
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                        PACKETS_PER_STEP)
    out = _attr_call_b(packed, at0, at1, rays, t_min, interpret,
                       PACKETS_PER_STEP, textured=textured)
    return _attr_channels(out, p, meta)


def trace_closest_attrs_pallas_t(bvh, at0_t, at1_t, origins, dirs,
                                 t_max=_BIG, t_min: float = 0.0,
                                 textured: bool = False,
                                 interpret: Optional[bool] = None):
    """w8t twin of trace_closest_attrs_pallas: transposed-leaf accel
    (bvh/wide.WideBVHT, leaf_size 8 or 16) + TRANSPOSED attr rows
    (passes/shading.make_leaf_attr_rows_t — from the SAME LBVH). The
    walk selects the winner's attributes by one-hot sublane reduces
    instead of per-candidate scalar lane reads (the row kernel's
    G-buffer cost — probes r3ae/r4d). Same return contract."""
    from ..bvh.wide import WideBVHT
    assert isinstance(bvh, WideBVHT), \
        "trace_closest_attrs_pallas_t needs a WideBVHT accel"
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max,
                                        PACKETS_PER_STEP)
    out = _attr_call_t(bvh, at0_t, at1_t, rays, t_min, interpret,
                       PACKETS_PER_STEP, textured=textured)
    return _attr_channels(out, p, meta)


def _attr_channels(out, p, meta):
    """(pb, ATTR_CH, 8, 128) kernel output -> image-shaped channel dict
    (the trace_closest_attrs_pallas return contract). The oct normal
    pairs ride packed (shading.pack_oct12) and are unpacked here —
    elementwise XLA work, fused for free."""
    from ..passes.shading import unpack_oct12
    ch = [_unpack(out[:p, c], meta) for c in range(ATTR_CH)]
    sidx = ch[1].astype(jnp.int32)
    valid = sidx >= 0
    oct = jnp.concatenate([unpack_oct12(ch[9]), unpack_oct12(ch[10]),
                           unpack_oct12(ch[11])], axis=-1)
    return {
        "t": jnp.where(valid, ch[0], jnp.inf),
        "sidx": jnp.where(valid, sidx, -1),
        "u": ch[2], "v": ch[3],
        "uv": jnp.stack([ch[4], ch[5]], axis=-1),
        "kd": ch[6],
        "layer": jnp.where(valid, ch[7], -1.0),
        "tri_id": jnp.where(valid, ch[8].astype(jnp.int32), -1),
        "oct": oct,
        "gn": jnp.stack(ch[12:15], axis=-1),
    }


def trace_closest_shadow_pallas(bvh, origins, dirs, light_dir, bias,
                                t_max=_BIG, t_min: float = 0.0,
                                light_pos=None,
                                attr_tables=None, textured: bool = False,
                                interpret: Optional[bool] = None):
    """Fused primary visibility + hard shadow (ONE kernel).

    Returns (t f32[H, W], sorted_idx i32[H, W], occluded bool[H, W]) —
    miss = (inf, -1, False). Equivalent to trace_closest_pallas(...,
    return_sorted=True, gather_tri_id=False) followed by the
    gbuffer/shadow raygen (viewer-facing normal-offset bias, scene-exit
    or light-distance t cap) and trace_any_pallas toward the light, but
    the shadow ray never leaves the kernel: no XLA raygen, no second
    packet layout round trip through HBM, no second dispatch (see
    _closest_shadow_kernel_w8_b).

    light_dir: f32[3] direction TOWARD the light (Light.direction), used
    when ``light_pos`` is None; light_pos: f32[3] point-light position
    (hard point shadows — per-lane directions derived in-kernel);
    bias: the normal-offset shadow bias (RenderConfig.shadow_bias).
    attr_tables: optional (at0, at1) leaf attribute rows — phase 1 then
    tracks the winner's full shading attributes and the return becomes
    (channel dict, occluded) (the zero-gather fused G-buffer).
    Batched 8-wide accel path only."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "fused closest+shadow needs the batched 8-wide accel path"
    batch = PACKETS_PER_STEP
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max, batch)
    pb = rays.shape[0]
    point = light_pos is not None
    if point:
        scal = jnp.concatenate([
            jnp.asarray(light_pos, jnp.float32),
            jnp.asarray(bias, jnp.float32).reshape(1)])    # f32[4]
    else:
        ld = jnp.asarray(light_dir, jnp.float32)
        inv = jnp.clip(1.0 / ld, -_BIG, _BIG)
        scal = jnp.concatenate([
            ld, inv, jnp.asarray(bias, jnp.float32).reshape(1),
            packed.root_min.astype(jnp.float32),
            packed.root_max.astype(jnp.float32)])          # f32[13]
    attrs = 0 if attr_tables is None else (2 if textured else 1)
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    vma = getattr(jax.typeof(rays), "vma", None)
    consts, in_specs, out_specs, out_shape = _fused_specs(
        packed, attr_tables, pb, batch, vma, extra_i32=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pb // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    fn = pl.pallas_call(
        functools.partial(_closest_shadow_kernel_w8_b, packed.leaf_size,
                          iter_cap, batch, point, attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    if attrs:
        out, occ = fn(tmin_arr, scal, *consts, rays)
        occ = _unpack(occ[:p], meta)
        return _attr_channels(out, p, meta), occ > 0
    t, sidx, occ = fn(tmin_arr, scal, *consts, rays)
    t = _unpack(t[:p], meta)
    sidx = _unpack(sidx[:p], meta)
    occ = _unpack(occ[:p], meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    return t, sidx, occ > 0


def trace_closest_multi_shadow_pallas(bvh, origins, dirs, lights, bias,
                                      t_max=_BIG, t_min: float = 0.0,
                                      attr_tables=None,
                                      textured: bool = False,
                                      interpret: Optional[bool] = None):
    """Fused primary visibility + N hard shadows (ONE kernel).

    lights: sequence of (light_dir, light_pos) pairs, exactly one of each
    pair non-None — directional lights pass a toward-light direction,
    point lights a position. Returns (t f32[H, W], sorted_idx i32[H, W],
    occ_mask i32[H, W]): bit l of occ_mask set = light l occluded at that
    pixel. Equivalent to trace_closest_shadow_pallas per light but the
    whole light set shares one primary walk and one dispatch
    (_closest_multi_shadow_kernel_w8_b). attr_tables: optional (at0, at1)
    — phase 1 tracks the full shading attributes and the return becomes
    (channel dict, occ_mask). Batched 8-wide accel path only.
    """
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "fused closest+multi-shadow needs the batched 8-wide accel path"
    assert len(lights) >= 1
    batch = PACKETS_PER_STEP
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max, batch)
    pb = rays.shape[0]
    blocks = [jnp.asarray(bias, jnp.float32).reshape(1),
              packed.root_min.astype(jnp.float32),
              packed.root_max.astype(jnp.float32)]
    points = []
    for ld, lp in lights:
        if lp is not None:
            points.append(True)
            blocks.append(jnp.asarray(lp, jnp.float32))
        else:
            points.append(False)
            d = jnp.asarray(ld, jnp.float32)
            blocks.append(d)
            blocks.append(jnp.clip(1.0 / d, -_BIG, _BIG))
    scal = jnp.concatenate(blocks)
    attrs = 0 if attr_tables is None else (2 if textured else 1)
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    vma = getattr(jax.typeof(rays), "vma", None)
    consts, in_specs, out_specs, out_shape = _fused_specs(
        packed, attr_tables, pb, batch, vma, extra_i32=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pb // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    fn = pl.pallas_call(
        functools.partial(_closest_multi_shadow_kernel_w8_b,
                          packed.leaf_size, iter_cap, batch, tuple(points),
                          attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    if attrs:
        out, occm = fn(tmin_arr, scal, *consts, rays)
        return _attr_channels(out, p, meta), _unpack(occm[:p], meta)
    t, sidx, occm = fn(tmin_arr, scal, *consts, rays)
    t = _unpack(t[:p], meta)
    sidx = _unpack(sidx[:p], meta)
    occm = _unpack(occm[:p], meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    return t, sidx, occm


def trace_closest_soft_shadow_pallas(bvh, origins, dirs, axis_dir, cone_cos,
                                     spp: int, seed, bias, t_max=_BIG,
                                     t_min: float = 0.0, attr_tables=None,
                                     textured: bool = False,
                                     interpret=None):
    """Fused primary visibility + area-light soft shadows (ONE kernel).

    Returns (t f32[H, W], sorted_idx i32[H, W], counts i32[H, W] in
    [0, spp]): the closest hit per camera ray plus the in-kernel
    cone-sampled occlusion count from its biased hit point
    (_closest_soft_shadow_kernel_w8_b) — visibility = 1 - counts/spp.
    With ``attr_tables``: (channel dict, counts) — the config-3 frame
    then does no per-pixel gathers at all.
    The config-3 frame analogue of trace_closest_shadow_pallas: no
    shadow origins or per-sample rays ever reach HBM. Same PRNG
    semantics as trace_any_soft_pallas (zero bit stream under the
    TPU-interpret mode: every sample degenerates to the cone axis).
    Batched 8-wide accel path only."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH) and PACKETS_PER_STEP > 1, \
        "fused closest+soft needs the batched 8-wide accel path"
    batch = PACKETS_PER_STEP
    rays, p, meta = _ray_packets_packed(origins, dirs, t_max, batch)
    pb = rays.shape[0]
    axis = jnp.asarray(axis_dir, jnp.float32)
    t0, t1 = _onb3(axis)
    scal = jnp.concatenate([
        axis, t0, t1, jnp.asarray(cone_cos, jnp.float32)[None],
        packed.root_min.astype(jnp.float32),
        packed.root_max.astype(jnp.float32),
        jnp.asarray(bias, jnp.float32).reshape(1)])        # f32[17]
    attrs = 0 if attr_tables is None else (2 if textured else 1)
    iter_cap = 2 * packed.num_wide + 64
    if _ITER_CAP_OVERRIDE is not None:
        iter_cap = _ITER_CAP_OVERRIDE
    if interpret is None:
        interpret = not _compiled_backend()
    if interpret is True:
        # prng_seed needs the TPU-semantics interpreter (zero bit stream).
        interpret = pltpu.InterpretParams()
    vma = getattr(jax.typeof(rays), "vma", None)
    consts, in_specs, out_specs, out_shape = _fused_specs(
        packed, attr_tables, pb, batch, vma, extra_i32=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pb // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )
    fn = pl.pallas_call(
        functools.partial(_closest_soft_shadow_kernel_w8_b,
                          packed.leaf_size, iter_cap, batch, spp, attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_GRID_SEMANTICS,)),
    )
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if attrs:
        out, counts = fn(tmin_arr, seed_arr, scal, *consts, rays)
        return _attr_channels(out, p, meta), _unpack(counts[:p], meta)
    t, sidx, counts = fn(tmin_arr, seed_arr, scal, *consts, rays)
    t = _unpack(t[:p], meta)
    sidx = _unpack(sidx[:p], meta)
    counts = _unpack(counts[:p], meta)
    t = jnp.where(sidx >= 0, t, jnp.inf)
    return t, sidx, counts
