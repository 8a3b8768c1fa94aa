"""Measured-and-retired traversal kernel variants + observability twins.

Everything here was built for a hypothesis, measured on TPU, and lost to
(or merely instruments) the production kernels in ``kernels/traverse.py``
— kept runnable for probes and parity tests, but OUT of the hot file so
it stays navigable (VERDICT r4 weak #4 / next-step #7):

- ``_any_hit_kernel_w8_x2``  — dual-pop wide any-hit (round 3: no win;
  the two pops' scalar syncs did not overlap enough to pay for the
  doubled child loop).
- ``_any_hit_kernel_v2`` / ``_closest_hit_kernel_v2`` — scalar packet-
  frustum culling on the binary-BVH walk (round 2: per-lane vector
  culling wins; occlusion masks shrink the traversal union).
- ``_any_hit_kernel_w8_stats`` + ``trace_any_pallas_stats`` — the wide
  any-hit walk instrumented with per-packet iteration counts: the
  observability hook behind the traversal cost model (pops x ~1.05 us
  = trace ms; probes r4d/r4g).

Import note: this module imports FROM ``traverse`` (shared walk helpers);
``traverse`` only references this module lazily inside its variant
dispatch branches, so there is no import cycle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .traverse import (_BIG, _as_packed, _child_anyhit8, _common_call,
                       _inv3, _leaf_occluded, _leaf_ts, _load_node,
                       _ray_packets, _slab, _unpack, _wide_child)


def _any_hit_kernel_w8_stats(k: int, max_iters: int, tmin_ref, ns_ref,
                             tr_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                             dz_ref, tmax_ref, out_ref, it_ref, stack_ref):
    """_any_hit_kernel_w8 plus a per-packet iteration count (observability:
    node visits are the traversal cost model's independent variable)."""
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
        rec = ns_ref[pl.ds(node, 1), :]
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
            valids.append(rec[0, b] <= rec[0, b + 3])
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
    it, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    out_ref[0] = occ
    it_ref[0] = jnp.full(ox.shape, it, jnp.int32)


def _any_hit_kernel_w8_x2(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref,
                          ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tmax_ref, out_ref, stack_ref):
    """Dual-pop variant: two nodes per while iteration. The two nodes'
    slab/reduction chains are independent, so their vector->scalar sync
    latencies overlap and the loop-control overhead amortizes over 16
    child tests."""
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
        spA = sp - 1
        nodeA = stack_ref[spA]
        haveB = spA > 0
        spB = jnp.maximum(spA - 1, 0)
        nodeB = jnp.where(haveB, stack_ref[spB], 0)
        sp = jnp.where(haveB, spB, spA)
        recA = ns_ref[pl.ds(nodeA, 1), :]
        recB = ns_ref[pl.ds(nodeB, 1), :]
        lanes = active0 & (occ == 0)
        cap = jnp.where(lanes, tmax, -_BIG)
        hits = []
        refs = []
        valids = []
        for rec, have in ((recA, True), (recB, haveB)):
            for c in range(8):
                b, ref = _wide_child(rec, c)
                hits.append(_slab(rec, b, ox, oy, oz, ix, iy, iz, t_min, cap)
                            & lanes)
                refs.append(ref)
                ok = rec[0, b] <= rec[0, b + 3]
                valids.append(ok if have is True else ok & have)
        anyhit = (_child_anyhit8(hits[:8], valids[:8])
                  + _child_anyhit8(hits[8:], valids[8:]))
        for c in range(16):
            ref = refs[c]
            is_leaf = ref < 0
            occ = jax.lax.cond(anyhit[c] & is_leaf,
                               lambda o, r=ref: leaf_test(
                                   jnp.maximum(-r - 1, 0), o),
                               lambda o: o, occ)
            push = anyhit[c] & (~is_leaf)
            stack_ref[sp] = jnp.where(push, ref, 0)
            sp = sp + push.astype(jnp.int32)
        alive = jax.lax.cond((it & 1) == 1,
                             lambda: jnp.any(active0 & (occ == 0)),
                             lambda: alive)
        return it + 1, sp, alive, occ

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    alive0 = jnp.any(active0)
    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    out_ref[0] = occ


# ---------------------------------------------------------------------------
# Scalar packet-frustum culling (binary-BVH v2 kernels)
# ---------------------------------------------------------------------------

def _min4(a, b, c, d):
    return jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, d))


def _max4(a, b, c, d):
    return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def _interval_bounds(v, active, big):
    """(min, max) over active lanes of (8,128) v; inactive lanes excluded."""
    lo = jnp.min(jnp.where(active, v, big))
    hi = jnp.max(jnp.where(active, v, -big))
    return lo, hi


def _packet_frustum(ox, oy, oz, ix, iy, iz, active):
    """Scalar per-packet bounds: origin box + inv-direction intervals."""
    bounds = []
    for o, i in ((ox, ix), (oy, iy), (oz, iz)):
        olo, ohi = _interval_bounds(o, active, _BIG)
        ilo, ihi = _interval_bounds(i, active, _BIG)
        bounds.append((olo, ohi, ilo, ihi))
    return bounds


def _axis_interval(b, olo, ohi, ilo, ihi):
    """Conservative [lo, hi] of (b - o) * i over the packet intervals."""
    s0 = b - ohi
    s1 = b - olo
    p1 = s0 * ilo
    p2 = s0 * ihi
    p3 = s1 * ilo
    p4 = s1 * ihi
    lo = _min4(p1, p2, p3, p4)
    hi = _max4(p1, p2, p3, p4)
    lo = jnp.where(jnp.isnan(lo), -_BIG, lo)
    hi = jnp.where(jnp.isnan(hi), _BIG, hi)
    return lo, hi


def _slab_scalar(rec, off, frustum, t_min, cap_hi):
    """Conservative scalar ray-packet vs child-box test -> bool scalar."""
    enter_lo = t_min
    exit_hi = cap_hi
    for ax in range(3):
        olo, ohi, ilo, ihi = frustum[ax]
        lo0, hi0 = _axis_interval(rec[0, off + ax], olo, ohi, ilo, ihi)
        lo1, hi1 = _axis_interval(rec[0, off + 3 + ax], olo, ohi, ilo, ihi)
        enter_lo = jnp.maximum(enter_lo, jnp.minimum(lo0, lo1))
        exit_hi = jnp.minimum(exit_hi, jnp.maximum(hi0, hi1))
    return enter_lo <= exit_hi


def _any_hit_kernel_v2(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min
    frustum = _packet_frustum(ox, oy, oz, ix, iy, iz, active0)
    cap_hi = jnp.max(jnp.where(active0, tmax, -_BIG))

    stack_ref[0] = jnp.int32(0)

    def visit_child(child, hit, sp, occ):
        is_leaf = child < 0

        def test_leaf(occ):
            leaf_id = jnp.maximum(-child - 1, 0)
            h = _leaf_occluded(tr_ref, leaf_id, k, ox, oy, oz, dx, dy, dz,
                               t_min, tmax)
            return occ | jnp.where(h & active0, 1, 0)

        occ = jax.lax.cond(hit & is_leaf, test_leaf, lambda o: o, occ)
        push = hit & (~is_leaf)
        stack_ref[sp] = jnp.where(push, child, 0)
        return sp + push.astype(jnp.int32), occ

    def cond(state):
        it, sp, alive, occ = state
        return (sp > 0) & (it < max_iters) & alive

    def body(state):
        it, sp, alive, occ = state
        sp = sp - 1
        node = stack_ref[sp]
        rec, child_l, child_r = _load_node(ns_ref, node)
        hit_l = _slab_scalar(rec, 0, frustum, t_min, cap_hi)
        hit_r = _slab_scalar(rec, 6, frustum, t_min, cap_hi)
        sp, occ = visit_child(child_l, hit_l, sp, occ)
        sp, occ = visit_child(child_r, hit_r, sp, occ)
        # Amortized early-exit: the vector->scalar reduction costs ~100s of
        # cycles, so only refresh every 8th iteration.
        alive = jax.lax.cond((it & 7) == 0,
                             lambda: jnp.any(active0 & (occ == 0)),
                             lambda: alive)
        return it + 1, sp, alive, occ

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    alive0 = jnp.any(active0)
    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), alive0, occ0))
    out_ref[0] = occ


def _closest_hit_kernel_v2(k: int, max_iters: int, tmin_ref, ns_ref, tr_ref,
                           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tmax_ref, t_out_ref, idx_out_ref, stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = tmin_ref[0]
    ix, iy, iz = _inv3(dx, dy, dz)
    active0 = tmax > t_min
    frustum = _packet_frustum(ox, oy, oz, ix, iy, iz, active0)

    stack_ref[0] = jnp.int32(0)

    def visit_child(child, hit, sp, best_t, best_i):
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

        best_t, best_i = jax.lax.cond(hit & is_leaf, test_leaf,
                                      lambda c: c, (best_t, best_i))
        push = hit & (~is_leaf)
        stack_ref[sp] = jnp.where(push, child, 0)
        return sp + push.astype(jnp.int32), best_t, best_i

    def cond(state):
        it, sp, cap, _, _ = state
        return (sp > 0) & (it < max_iters)

    def body(state):
        it, sp, cap, best_t, best_i = state
        sp = sp - 1
        node = stack_ref[sp]
        rec, child_l, child_r = _load_node(ns_ref, node)
        hit_l = _slab_scalar(rec, 0, frustum, t_min, cap)
        hit_r = _slab_scalar(rec, 6, frustum, t_min, cap)
        sp, best_t, best_i = visit_child(child_l, hit_l, sp, best_t, best_i)
        sp, best_t, best_i = visit_child(child_r, hit_r, sp, best_t, best_i)
        # Packet-wide cap (max over lanes of best_t) culls far nodes once
        # every lane has some hit; refreshed every 8th iteration (stale cap
        # is merely conservative).
        cap = jax.lax.cond((it & 7) == 7,
                           lambda: jnp.max(jnp.where(active0, best_t, -_BIG)),
                           lambda: cap)
        return it + 1, sp, cap, best_t, best_i

    best_t0 = jnp.where(active0, tmax, -_BIG)
    best_i0 = jnp.full(ox.shape, -1, jnp.int32)
    cap0 = jnp.max(best_t0)
    _, _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), cap0, best_t0, best_i0))
    t_out_ref[0] = jnp.where(best_i >= 0, best_t, _BIG)
    idx_out_ref[0] = best_i


def trace_any_pallas_stats(bvh, origins, dirs, t_max, t_min: float = 0.0,
                           interpret: Optional[bool] = None):
    """trace_any_pallas (wide path) + per-packet traversal iteration counts.

    Returns (occluded bool[...], iters i32[P]) — the observability hook for
    the traversal cost model (cycles/node x nodes/packet)."""
    from ..bvh.wide import WideBVH
    packed = _as_packed(bvh)
    assert isinstance(packed, WideBVH), "stats variant is wide-BVH only"
    comps, tm, meta = _ray_packets(origins, dirs, t_max)
    occ, its = _common_call(packed, _any_hit_kernel_w8_stats,
                            (jnp.int32, jnp.int32), comps, tm, t_min,
                            interpret)
    return _unpack(occ, meta) > 0, its[:, 0, 0]
