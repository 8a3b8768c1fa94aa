"""Pallas LBVH build kernel: Karras topology + node boxes in ONE program.

The XLA formulation of the on-device build (bvh/lbvh.py) is OP-OVERHEAD
bound on TPU: the Karras binary searches are ~30 sequential dependent
gathers and the RMQ box phase another ~6, each a separate tiny XLA op with
~0.3 ms of dispatch/loop overhead — topology + boxes cost ~11 ms of the
~19 ms Sponza-class rebuild while moving only a few MB.

This kernel computes BOTH in one Pallas program using the Cartesian-tree
view of the Karras radix tree (see lbvh.karras_topology_scan for the
derivation): internal node g <-> the gap between sorted leaves g and g+1,
keyed by the adjacent-delta D[g], tree = min-Cartesian tree over
D' = (D[g], g). One monotonic-stack sweep on the SCALAR core builds the
topology in O(n); a node is FINALIZED exactly when it pops, which is a
children-first order, so the same sweep computes every node's AABB as a
16-lane vector union the moment its children are complete. No gathers, no
per-op dispatch: one kernel.

Layouts (all static shapes):
  d          : i32[ni]  adjacent deltas (scalar-prefetch -> SMEM)
  leaf boxes : f32[ceil(nl/16), 128] — 16 leaves/row, 8 floats each
               [lmin xyz, lmax xyz, 0, 0]
  node boxes : f32[ceil(ni/8), 128] — 8 nodes/row, 16 floats each
               [Lmin xyz, Lmax xyz, Rmin xyz, Rmax xyz, 0...]
  childl/r, first, last : i32[ni] SMEM outputs, GAP-indexed with child
               refs encoding leaves as -(leaf_id+1); root gap id in
               root[0]. The XLA wrapper renumbers the root to node 0
               (the LBVH entry point) with two cheap elementwise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NONE = -(1 << 30)  # plain int: a jnp scalar would be a captured const


def _compiled_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _group16(row, g):
    """(1,128) row -> (1,16) group g (0..7) via a 3-level select tree."""
    h = jnp.where((g & 4) > 0, row[:, 64:128], row[:, 0:64])
    q = jnp.where((g & 2) > 0, h[:, 32:64], h[:, 0:32])
    return jnp.where((g & 1) > 0, q[:, 16:32], q[:, 0:16])


def _group8(row, g):
    """(1,128) row -> (1,8) group g (0..15) via a 4-level select tree."""
    q = _group16(row, (g >> 1))
    return jnp.where((g & 1) > 0, q[:, 8:16], q[:, 0:8])


def _build_kernel(ni: int, with_boxes: bool, with_depth: bool, d_ref,
                  lbox_ref, nbox_ref, childl_ref, childr_ref, first_ref,
                  last_ref, depth_ref, root_ref, stack_ref, seq_ref):
    """See module docstring. with_boxes=False skips the per-finalize box
    unions (measured on a v5e: each dynamic VMEM row access in the serial
    sweep costs ~470 cycles, making the in-kernel box pass SLOWER than the
    XLA RMQ it replaces — the scalar-core topology alone is the win:
    ~2.5 ms vs ~6.9 ms of sequential XLA gathers).

    The child arrays double as the build scratch (lc is final at push
    time; rc's tentative values live in childr until finalize rewrites
    the leaf encoding) — SMEM is the binding resource for the kernel's
    leaf-count gate, and the fold also drops one read+write per node.

    with_depth=True additionally emits every node's depth (root = 0):
    ``seq_ref`` records the finalize order (children-first by
    construction), so one extra serial sweep in REVERSE seq order visits
    parents before children and assigns depth[child] = depth[node] + 1.
    This replaces the XLA pointer-doubling depth pass (7 sequential
    [Ni,2] gathers) that the fixed-frontier 8-wide collapse needs —
    the per-frame rebuild's wide mask is just depth % 3 == 0."""

    def leaf_box8(leaf):
        row = lbox_ref[pl.ds(leaf >> 4, 1), :]
        return _group8(row, leaf & 15)                  # (1, 8)

    def node_box8(g):
        """Union of node g's stored child boxes -> (1,8) [min xyz, max
        xyz, 0, 0]. Record layout: [Lmin(3) Lmax(3) Rmin(3) Rmax(3)]."""
        row = nbox_ref[pl.ds(g >> 3, 1), :]
        rec = _group16(row, g & 7)                      # (1, 16)
        lo = jnp.minimum(rec[:, 0:3], rec[:, 6:9])
        hi = jnp.maximum(rec[:, 3:6], rec[:, 9:12])
        return jnp.concatenate([lo, hi, jnp.zeros((1, 2), jnp.float32)],
                               axis=1)

    def box_of(ref):
        return jax.lax.cond(ref < 0,
                            lambda: leaf_box8(-ref - 1),
                            lambda: node_box8(ref))

    def first_of(ref):
        return jax.lax.cond(ref < 0, lambda: -ref - 1,
                            lambda: first_ref[ref])

    def last_of(ref):
        return jax.lax.cond(ref < 0, lambda: -ref - 1,
                            lambda: last_ref[ref])

    def finalize(x, k):
        """x's children are final: record child refs, range, and write
        x's 16-float node record [Lbox(6) pad2 Rbox(6) pad2]... packed as
        [Lmin,Lmax,Rmin,Rmax, 0,0,0,0] to match lbvh nodes_box order.
        ``k`` is the finalize ordinal (pops so far) for the seq record."""
        lc = childl_ref[x]
        rc = childr_ref[x]
        rc = jnp.where(rc == _NONE, -(x + 2), rc)      # right leaf x+1
        childr_ref[x] = rc
        first_ref[x] = first_of(lc)
        last_ref[x] = last_of(rc)
        if with_depth:
            seq_ref[k] = x
        if not with_boxes:
            return
        lb = box_of(lc)                                 # (1,8) min3 max3 _
        rb = box_of(rc)
        # Assemble [Lmin(3) Lmax(3) Rmin(3) Rmax(3) 0^4] into lanes
        # [16*(x&7), +16) of row x>>3 via a masked blend.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        base = (x & 7) * 16
        off = lane - base
        rec = jnp.zeros((1, 128), jnp.float32)
        # Broadcast each of the 12 scalars via lane compare.
        vals = [lb[:, 0:1], lb[:, 1:2], lb[:, 2:3],
                lb[:, 3:4], lb[:, 4:5], lb[:, 5:6],
                rb[:, 0:1], rb[:, 1:2], rb[:, 2:3],
                rb[:, 3:4], rb[:, 4:5], rb[:, 5:6]]
        for k, v in enumerate(vals):
            rec = jnp.where(off == k, v, rec)
        row_i = x >> 3
        old = nbox_ref[pl.ds(row_i, 1), :]
        keep = (off < 0) | (off >= 16)
        nbox_ref[pl.ds(row_i, 1), :] = jnp.where(keep, old, rec)

    def push_body(g, sp):
        # g's rc slot is first touched when a LATER gap claims g from the
        # stack top, so initializing it here (g is pushed exactly once)
        # replaces the separate init sweep — one serial pass instead of two.
        childr_ref[g] = jnp.int32(_NONE)
        dg = d_ref[g]

        def cond(c):
            sp, _ = c
            return (sp > 0) & (d_ref[stack_ref[jnp.maximum(sp - 1, 0)]]
                               > dg)

        def pop(c):
            sp, _ = c
            x = stack_ref[sp - 1]
            # pops so far = pushes so far (g) - current stack size (sp).
            finalize(x, g - sp)
            return sp - 1, x

        sp, last_popped = jax.lax.while_loop(cond, pop,
                                             (sp, jnp.int32(_NONE)))
        childl_ref[g] = jnp.where(last_popped == _NONE, -(g + 1),
                                  last_popped)

        @pl.when(sp > 0)
        def _():
            childr_ref[stack_ref[sp - 1]] = g

        stack_ref[sp] = g
        return sp + 1

    sp = jax.lax.fori_loop(0, ni, push_body, jnp.int32(0), unroll=False)

    # Drain the right spine (top -> bottom is children-first).
    def drain_cond(c):
        sp = c
        return sp > 0

    def drain(c):
        sp = c
        finalize(stack_ref[sp - 1], ni - sp)
        return sp - 1

    jax.lax.while_loop(drain_cond, drain, sp)
    root_ref[0] = stack_ref[0]

    if with_depth:
        # Reverse finalize order visits parents before children (finalize
        # is children-first): seq[ni-1] is the root; each node hands
        # depth+1 to its internal children. O(ni) serial SMEM ops.
        depth_ref[stack_ref[0]] = jnp.int32(0)

        def depth_body(k, _):
            x = seq_ref[ni - 1 - k]
            dc = depth_ref[x] + 1
            lc = childl_ref[x]
            rc = childr_ref[x]

            @pl.when(lc >= 0)
            def _():
                depth_ref[lc] = dc

            @pl.when(rc >= 0)
            def _():
                depth_ref[rc] = dc

            return 0

        jax.lax.fori_loop(0, ni, depth_body, 0, unroll=False)


def _topology_call(d, lbox, ni, nip, with_boxes, interpret,
                   with_depth=False):
    out_shape = (
        jax.ShapeDtypeStruct(((nip // 8) if with_boxes else 1, 128),
                             jnp.float32),                    # node boxes
        jax.ShapeDtypeStruct((ni,), jnp.int32),               # child_l
        jax.ShapeDtypeStruct((ni,), jnp.int32),               # child_r
        jax.ShapeDtypeStruct((ni,), jnp.int32),               # first
        jax.ShapeDtypeStruct((ni,), jnp.int32),               # last
        jax.ShapeDtypeStruct((ni if with_depth else 1,),
                             jnp.int32),                      # depth
        jax.ShapeDtypeStruct((1,), jnp.int32),                # root gap
    )
    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   smem_out, smem_out, smem_out, smem_out, smem_out,
                   smem_out),
        scratch_shapes=[pltpu.SMEM((ni + 1,), jnp.int32),   # stack
                        pltpu.SMEM((ni if with_depth else 1,),
                                   jnp.int32)],             # finalize seq
    )
    fn = pl.pallas_call(
        functools.partial(_build_kernel, ni, with_boxes, with_depth),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    return fn(d, lbox)


def _renumber(root, cl, cr, first, last):
    """Swap the root gap id with 0 (values then rows)."""
    def renum_vals(v):
        return jnp.where(v < 0, v,
                         jnp.where(v == root, 0,
                                   jnp.where(v == 0, root, v)))

    def swap_rows(a):
        a0 = a[0]
        ar = a[root]
        return a.at[0].set(ar).at[root].set(a0)

    child = jnp.stack([renum_vals(cl), renum_vals(cr)], axis=1)
    return swap_rows(child), swap_rows(first), swap_rows(last), swap_rows


def topology_pallas(d: jnp.ndarray, interpret=None, want_depth=False):
    """Scalar-core Karras topology only (the production kernel mode):
    (child i32[ni,2], first, last) with root = node 0 — drop-in for
    lbvh.karras_topology; boxes stay on the XLA RMQ path. Measured v5e,
    Sponza 20.5k leaves: ~2.5 ms vs ~6.9 ms for the gather-bound search.

    want_depth=True returns (child, first, last, depth) with depth[n] the
    node's depth (root row = 0) — feeds the fixed-frontier collapse's
    wide mask without the XLA pointer-doubling pass (bvh/wide.py
    node_depths: a scatter + 7 sequential gathers)."""
    ni = int(d.shape[0])
    if interpret is None:
        interpret = not _compiled_backend()
    lbox = jnp.zeros((1, 128), jnp.float32)
    _, cl, cr, first, last, depth, root = _topology_call(
        d, lbox, ni, 8, with_boxes=False, interpret=interpret,
        with_depth=want_depth)
    child, first, last, swap_rows = _renumber(root[0], cl, cr, first, last)
    if want_depth:
        return child, first, last, swap_rows(depth)
    return child, first, last


def topology_and_boxes_pallas(d: jnp.ndarray, leaf_min: jnp.ndarray,
                              leaf_max: jnp.ndarray, interpret=None):
    """d: i32[ni] adjacent deltas of the sorted leaf keys; leaf_min/max:
    f32[nl, 3]. Returns (child i32[ni,2], first, last, nodes_box
    f32[ni,12], root_min, root_max) with the root renumbered to node 0 —
    drop-in for karras_topology + _assemble_node_boxes. NOTE: measured
    SLOWER than topology_pallas + XLA RMQ on a v5e (the serial box sweep
    pays ~470 cycles per dynamic VMEM row access); kept as the reference
    single-program formulation and for exact-parity tests."""
    ni = int(d.shape[0])
    nl = ni + 1
    if interpret is None:
        interpret = not _compiled_backend()

    # Pack leaf boxes: [nl,3]+[nl,3] -> (ceil(nl/16), 128).
    nlp = -(-nl // 16) * 16
    lb8 = jnp.concatenate([leaf_min, leaf_max,
                           jnp.zeros((nl, 2), jnp.float32)], axis=1)
    lb8 = jnp.pad(lb8, ((0, nlp - nl), (0, 0)))
    lbox = lb8.reshape(nlp // 16, 128)
    nip = -(-ni // 8) * 8

    nbox_packed, cl, cr, first, last, _, root = _topology_call(
        d, lbox, ni, nip, with_boxes=True, interpret=interpret)
    root = root[0]
    child, first, last, swap_rows = _renumber(root, cl, cr, first, last)
    nbox16 = nbox_packed.reshape(nip, 16)[:ni]
    nbox = swap_rows(nbox16)[:, :12]
    root_min = jnp.minimum(nbox[0, 0:3], nbox[0, 6:9])
    root_max = jnp.maximum(nbox[0, 3:6], nbox[0, 9:12])
    return child, first, last, nbox, root_min, root_max


# ---------------------------------------------------------------------------
# Fused Morton-code kernel (quantize + bit interleave as ONE program)
# ---------------------------------------------------------------------------

def _codes_kernel(ux_ref, uy_ref, uz_ref, code_ref):
    """unit-cube coords -> 30-bit Morton codes. The XLA formulation is ~20
    separate integer ops (quantize + 5-step magic-number dilation per axis
    + combine), each paying the measured ~0.1-0.3 ms op-overhead floor on
    this platform (probe r3s: 'codes/encode-only' 3.8 ms for 287k tris of
    trivially-fusible elementwise work). One Pallas program makes it one
    op. Integer shifts/and/or only — known-good Mosaic lowerings."""
    grid = jnp.float32(1023.0)

    def expand(q):
        v = q & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    def quant(u_ref):
        q = jnp.clip(u_ref[...] * (grid + 1.0), 0.0, grid)
        # Mosaic has no f32->u32 cast; go through i32 (values fit in 10
        # bits, so the signed intermediate is exact).
        return q.astype(jnp.int32).astype(jnp.uint32)

    code = (expand(quant(ux_ref)) << 2) | (expand(quant(uy_ref)) << 1) \
        | expand(quant(uz_ref))
    code_ref[...] = code.astype(jnp.int32)


def morton_codes_pallas(centroid: jnp.ndarray, scene_min, scene_max,
                        interpret=None) -> jnp.ndarray:
    """centroid f32[n, 3] + scene bounds -> uint32[n] 30-bit Morton codes.
    Bit-exact drop-in for bvh.morton.morton_of_points (parity-tested).
    Normalization to the unit cube stays in XLA (2 broadcast ops — the
    scene bounds are traced scalars); the op-heavy quantize+interleave
    chain runs as one kernel over [rows, 128] blocks."""
    if interpret is None:
        interpret = not _compiled_backend()
    n = centroid.shape[0]
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    unit = (centroid - scene_min) / extent                  # [n, 3]
    rows = -(-n // 128)
    pad = rows * 128 - n
    u = jnp.pad(unit, ((0, pad), (0, 0)))
    ux = u[:, 0].reshape(rows, 128)
    uy = u[:, 1].reshape(rows, 128)
    uz = u[:, 2].reshape(rows, 128)
    vma = getattr(jax.typeof(ux), "vma", None)
    spec = pl.BlockSpec((rows, 128), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    code = pl.pallas_call(
        _codes_kernel,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma),
        interpret=interpret,
    )(ux, uy, uz)
    return code.reshape(-1)[:n].astype(jnp.uint32)


def _codes60_kernel(ux_ref, uy_ref, uz_ref, hi_ref, lo_ref):
    """unit-cube coords -> 60-bit Morton keys as two 30-bit words
    (bvh/morton.py morton_of_points_60 layout)."""
    grid = jnp.float32(float((1 << 20) - 1))

    def expand(q):
        v = q & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    def quant(u_ref):
        q = jnp.clip(u_ref[...] * (grid + 1.0), 0.0, grid)
        # Mosaic has no f32->u32 cast; i32 intermediate is exact (20 bits).
        return q.astype(jnp.int32).astype(jnp.uint32)

    qx, qy, qz = quant(ux_ref), quant(uy_ref), quant(uz_ref)
    hi = (expand(qx >> 10) << 2) | (expand(qy >> 10) << 1) \
        | expand(qz >> 10)
    lo = (expand(qx) << 2) | (expand(qy) << 1) | expand(qz)
    hi_ref[...] = hi.astype(jnp.int32)
    lo_ref[...] = lo.astype(jnp.int32)


def morton_codes60_pallas(centroid: jnp.ndarray, scene_min, scene_max,
                          interpret=None):
    """Fused 60-bit variant: (hi, lo) uint32[n] — bit-exact drop-in for
    bvh.morton.morton_of_points_60."""
    if interpret is None:
        interpret = not _compiled_backend()
    n = centroid.shape[0]
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    unit = (centroid - scene_min) / extent
    rows = -(-n // 128)
    pad = rows * 128 - n
    u = jnp.pad(unit, ((0, pad), (0, 0)))
    ux = u[:, 0].reshape(rows, 128)
    uy = u[:, 1].reshape(rows, 128)
    uz = u[:, 2].reshape(rows, 128)
    vma = getattr(jax.typeof(ux), "vma", None)
    spec = pl.BlockSpec((rows, 128), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    hi, lo = pl.pallas_call(
        _codes60_kernel,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma),
                   jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma)),
        interpret=interpret,
    )(ux, uy, uz)
    return (hi.reshape(-1)[:n].astype(jnp.uint32),
            lo.reshape(-1)[:n].astype(jnp.uint32))


# ---------------------------------------------------------------------------
# Sweep-SAH top-tree reprioritization (config-2 rebuilt-tree quality)
# ---------------------------------------------------------------------------
#
# The Karras radix tree is the min-Cartesian tree over the adjacent-delta
# array D of the sorted leaf keys — so the TOPOLOGY can be steered without
# touching the topology kernel at all: rewrite PRIORITIES. This pass
# chooses the top ~log2(nl/R) levels of splits by a true surface-area
# sweep over the Morton order (the split that minimizes
# SA(prefix)*count + SA(suffix)*count among block-aligned candidates),
# then emits D' where chosen gap g at top-tree depth t gets priority t
# and every other gap keeps D[g] + MAXD. The min-Cartesian tree over D'
# IS the hybrid tree: sweep-SAH splits above, Morton structure below —
# leaf ranges stay contiguous, so the RMQ box path, the 8-wide collapse,
# refits, and the attr tables all work unchanged.
#
# Why this attacks the config-2 gap: LBVH quality loss is concentrated in
# the top levels (Morton bit splits at power-of-two planes slice long
# thin geometry mid-feature and produce heavily overlapping top nodes);
# the sweep chooses the minimum-SAH cut of the actual leaf boxes instead.
# Work is O(nb * levels) on 8-leaf BLOCK boxes (nb = nl/8), serial on the
# scalar core with SMEM reads — ~1 ms at Sponza scale vs ~12 ms for the
# whole rebuild.

SWEEP_BLOCK = 8          # leaves per SAH block (split granularity)
SWEEP_MAXD = 21          # top-tree depth cap; priorities 0..MAXD-1
SWEEP_MIN_BLOCKS = 8     # stop splitting below this many blocks (R)


def _sweep_sah_kernel(nb: int, ni: int, maxn: int, block: int,
                      maxd: int, min_blocks: int, bx_ref,
                      gaps_ref, ranks_ref, sa_ref, stka_ref, stkb_ref,
                      stkd_ref):
    """Scalar-core sweep: explicit range stack, two passes per node over
    its block range (backward suffix SA into sa_ref, forward prefix +
    argmin). bx_ref: f32[nb*6] block boxes [min xyz | max xyz] per block
    (SMEM). Outputs gaps/ranks i32[maxn] (gap ni = unused slot)."""

    def sa(x0, y0, z0, x1, y1, z1):
        dx = jnp.maximum(x1 - x0, 0.0)
        dy = jnp.maximum(y1 - y0, 0.0)
        dz = jnp.maximum(z1 - z0, 0.0)
        return dx * dy + dy * dz + dz * dx

    def box(j):
        b = j * 6
        return (bx_ref[b], bx_ref[b + 1], bx_ref[b + 2],
                bx_ref[b + 3], bx_ref[b + 4], bx_ref[b + 5])

    # out slot counter rides stkd_ref[maxn] (spare lane): SMEM scalars.
    def outer_cond(c):
        sp, _ = c
        return sp > 0

    def outer(c):
        sp, nout = c
        sp = sp - 1
        a = stka_ref[sp]
        b = stkb_ref[sp]
        dep = stkd_ref[sp]
        n = b - a + 1

        def split():
            # Backward pass: sa_ref[j] = SA(box(j..b)) for j in [a+1, b].
            def back(i, carry):
                j = b - i
                x0, y0, z0, x1, y1, z1 = carry
                bx0, by0, bz0, bx1, by1, bz1 = box(j)
                x0 = jnp.minimum(x0, bx0)
                y0 = jnp.minimum(y0, by0)
                z0 = jnp.minimum(z0, bz0)
                x1 = jnp.maximum(x1, bx1)
                y1 = jnp.maximum(y1, by1)
                z1 = jnp.maximum(z1, bz1)
                sa_ref[j] = sa(x0, y0, z0, x1, y1, z1)
                return (x0, y0, z0, x1, y1, z1)

            big = jnp.float32(3.4e38)
            jax.lax.fori_loop(0, n - 1, back,
                              (big, big, big, -big, -big, -big),
                              unroll=False)

            # Forward pass: prefix box + cost argmin over splits after
            # block j (j in [a, b-1]).
            def fwd(i, carry):
                j = a + i
                x0, y0, z0, x1, y1, z1, bc, bj = carry
                bx0, by0, bz0, bx1, by1, bz1 = box(j)
                x0 = jnp.minimum(x0, bx0)
                y0 = jnp.minimum(y0, by0)
                z0 = jnp.minimum(z0, bz0)
                x1 = jnp.maximum(x1, bx1)
                y1 = jnp.maximum(y1, by1)
                z1 = jnp.maximum(z1, bz1)
                nl_ = (j - a + 1).astype(jnp.float32)
                nr_ = (b - j).astype(jnp.float32)
                cost = sa(x0, y0, z0, x1, y1, z1) * nl_ \
                    + sa_ref[j + 1] * nr_
                better = cost < bc
                bc = jnp.where(better, cost, bc)
                bj = jnp.where(better, j, bj)
                return (x0, y0, z0, x1, y1, z1, bc, bj)

            big = jnp.float32(3.4e38)
            r = jax.lax.fori_loop(0, n - 1, fwd,
                                  (big, big, big, -big, -big, -big,
                                   big, a), unroll=False)
            return r[7]

        do = (n > min_blocks) & (dep < maxd) & (nout < maxn)
        bj = jax.lax.cond(do, split, lambda: a)

        def emit(sp):
            # gap between leaf blocks bj and bj+1 => leaf gap id
            gaps_ref[nout] = (bj + 1) * block - 1
            ranks_ref[nout] = dep
            stka_ref[sp] = a
            stkb_ref[sp] = bj
            stkd_ref[sp] = dep + 1
            stka_ref[sp + 1] = bj + 1
            stkb_ref[sp + 1] = b
            stkd_ref[sp + 1] = dep + 1
            return sp + 2

        sp = jax.lax.cond(do, emit, lambda s: s, sp)
        return sp, nout + do.astype(jnp.int32)

    # init: whole range, depth 0; outputs prefilled by the caller? SMEM
    # outputs are uninitialized -> fill unused slots with ni (dropped by
    # the XLA scatter).
    def fill(i, _):
        gaps_ref[i] = ni
        ranks_ref[i] = 0
        return 0

    jax.lax.fori_loop(0, maxn, fill, 0, unroll=False)
    stka_ref[0] = jnp.int32(0)
    stkb_ref[0] = jnp.int32(nb - 1)
    stkd_ref[0] = jnp.int32(0)
    jax.lax.while_loop(outer_cond, outer, (jnp.int32(1), jnp.int32(0)))


def sweep_sah_priorities(d: jnp.ndarray, leaf_min: jnp.ndarray,
                         leaf_max: jnp.ndarray, interpret=None,
                         block: int = SWEEP_BLOCK, maxd: int = SWEEP_MAXD,
                         min_blocks: int = SWEEP_MIN_BLOCKS
                         ) -> jnp.ndarray:
    """D -> D' (see block comment above): adjacent-delta priorities with
    the top tree re-chosen by a sweep-SAH over ``block``-leaf block
    boxes, down to ranges of ``min_blocks`` blocks or depth ``maxd``.
    The result feeds topology_pallas / karras-from-deltas unchanged.
    Cost: one scalar-core kernel, O(nb log nb) SMEM work (~1 ms Sponza
    at the 8/21/8 defaults)."""
    if interpret is None:
        interpret = not _compiled_backend()
    ni = int(d.shape[0])
    nl = ni + 1
    nb = -(-nl // block)
    pad = nb * block - nl
    lmin = jnp.concatenate([leaf_min, jnp.broadcast_to(
        leaf_min[-1:], (pad, 3))]) if pad else leaf_min
    lmax = jnp.concatenate([leaf_max, jnp.broadcast_to(
        leaf_max[-1:], (pad, 3))]) if pad else leaf_max
    bmin = lmin.reshape(nb, block, 3).min(axis=1)
    bmax = lmax.reshape(nb, block, 3).max(axis=1)
    bx = jnp.concatenate([bmin, bmax], axis=1).reshape(-1)   # [nb*6]
    maxn = 2 * (nb // max(min_blocks, 1) + 2)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    gaps, ranks = pl.pallas_call(
        functools.partial(_sweep_sah_kernel, nb, ni, maxn, block, maxd,
                          min_blocks),
        in_specs=[smem],
        out_specs=(smem, smem),
        out_shape=(jax.ShapeDtypeStruct((maxn,), jnp.int32),
                   jax.ShapeDtypeStruct((maxn,), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((nb,), jnp.float32),      # suffix SA
                        pltpu.SMEM((maxn + 2,), jnp.int32),  # stack a
                        pltpu.SMEM((maxn + 2,), jnp.int32),  # stack b
                        pltpu.SMEM((maxn + 2,), jnp.int32)], # stack depth
        interpret=interpret,
    )(bx)
    dprime = d.astype(jnp.int32) + jnp.int32(maxd)
    return dprime.at[gaps].set(ranks, mode="drop")


# ---------------------------------------------------------------------------
# Area-greedy 8-wide collapse kernel (config-2 rebuild quality)
# ---------------------------------------------------------------------------
#
# The AREA collapse (wide.frontiers_area: expand the largest-area internal
# slot until the wide node has 8 children) beats the fixed depth-3 cut by
# ~30% traversal pops on Morton trees (probe r4f: shadow 22.7 vs 32.8
# pops/packet, closest 32.9 vs 44.4) but its XLA formulation needs a
# 64-sweep scatter reachability pass that a per-frame rebuild cannot
# afford. This kernel does the WHOLE collapse — reachability, frontier
# choice, dense wide ids, kernel-ref remap — in ONE serial scalar-core
# pass: a BFS queue of wide roots in SMEM (a child's wide id IS its queue
# position, so refs are remapped at push time with no second pass), with
# per-node greedy expansion over 8 register slots keyed by node surface
# area (f32[ni] in SMEM, ~80 KB at the 20k-leaf Sponza scale).
#
# ~300 scalar ops per wide node x ~3k wide nodes ≈ 1 ms, replacing the
# ~20 ms sweep pass. Same SMEM-bound leaf gate as topology_pallas.

_C_EMPTY = -(1 << 31)      # wide.EMPTY (int32 min) as a plain int


def _collapse_area_kernel(ni: int, nw_pad: int, childl_ref, childr_ref,
                          area_ref, front_ref, src_ref, count_ref,
                          queue_ref):
    """See block comment. Outputs:
    front_ref i32[nw_pad*8] — slot refs ALREADY in kernel convention
      (>= 0: dense wide id = BFS queue position; < 0: leaf as
      -(leaf_id+1); _C_EMPTY: empty slot),
    src_ref   i32[nw_pad]   — binary node id of each wide root (box
      lookup key; pad rows hold 0 and are never referenced),
    count_ref i32[1]        — number of wide nodes produced (> nw_pad
      means the pad overflowed and the accel must be rebuilt bigger;
      slots past nw_pad are dropped, never written)."""

    def fill(i, _):
        front_ref[i * 8 + 0] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 1] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 2] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 3] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 4] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 5] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 6] = jnp.int32(_C_EMPTY)
        front_ref[i * 8 + 7] = jnp.int32(_C_EMPTY)
        src_ref[i] = jnp.int32(0)
        return 0

    jax.lax.fori_loop(0, nw_pad, fill, 0, unroll=False)
    queue_ref[0] = jnp.int32(0)

    def cond(c):
        head, tail = c
        return head < jnp.minimum(tail, nw_pad)

    def body(c):
        head, tail = c
        x = queue_ref[head]
        src_ref[head] = x

        def aof(ref):
            # Expansion key: internal -> its surface area; leaf/EMPTY -> -1.
            return jnp.where(ref >= 0,
                             area_ref[jnp.maximum(ref, 0)],
                             jnp.float32(-1.0))

        slots = [childl_ref[x], childr_ref[x]] + \
            [jnp.int32(_C_EMPTY)] * 6
        keys = [aof(slots[0]), aof(slots[1])] + [jnp.float32(-1.0)] * 6
        cnt = jnp.int32(2)

        for _ in range(6):
            # argmax over slot keys (first max wins, matching jnp.argmax
            # in wide.frontiers_area).
            best = keys[0]
            bj = jnp.int32(0)
            for s in range(1, 8):
                better = keys[s] > best
                best = jnp.where(better, keys[s], best)
                bj = jnp.where(better, jnp.int32(s), bj)
            can = (cnt < 8) & (best >= 0.0)
            # ref = slots[bj] via select tree
            ref = slots[0]
            for s in range(1, 8):
                ref = jnp.where(bj == s, slots[s], ref)
            refc = jnp.maximum(ref, 0)
            lc = childl_ref[refc]
            rc = childr_ref[refc]
            # replace slot bj with lc, append rc at slot cnt
            for s in range(8):
                put_l = can & (bj == s)
                put_r = can & (cnt == s)
                slots[s] = jnp.where(put_l, lc,
                                     jnp.where(put_r, rc, slots[s]))
                keys[s] = jnp.where(put_l, aof(lc),
                                    jnp.where(put_r, aof(rc), keys[s]))
            cnt = cnt + can.astype(jnp.int32)

        # Emit: push internal slots (child wide id = its queue position).
        for s in range(8):
            ref = slots[s]
            is_int = ref >= 0
            push = is_int & (tail < nw_pad)
            qpos = jnp.minimum(tail, nw_pad - 1)

            @pl.when(push)
            def _(qpos=qpos, ref=ref):
                queue_ref[qpos] = ref

            front_ref[head * 8 + s] = jnp.where(is_int, tail, ref)
            tail = tail + is_int.astype(jnp.int32)
        return head + 1, tail

    _, tail = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
    count_ref[0] = tail


def collapse_area_pallas(childl, childr, area, nw_pad: int,
                         interpret=None):
    """Binary topology + per-node surface areas -> BFS-ordered area-greedy
    8-wide collapse (see _collapse_area_kernel). Returns (front
    i32[nw_pad, 8] kernel refs, src i32[nw_pad] binary ids, count)."""
    if interpret is None:
        interpret = not _compiled_backend()
    ni = int(childl.shape[0])
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    front, src, count = pl.pallas_call(
        functools.partial(_collapse_area_kernel, ni, nw_pad),
        in_specs=[smem, smem, smem],
        out_specs=(smem, smem, smem),
        out_shape=(jax.ShapeDtypeStruct((nw_pad * 8,), jnp.int32),
                   jax.ShapeDtypeStruct((nw_pad,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((nw_pad + 8,), jnp.int32)],  # BFS queue
        interpret=interpret,
    )(childl, childr, area)
    return front.reshape(nw_pad, 8), src, count[0]
