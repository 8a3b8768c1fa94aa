"""On-device LBVH: Morton sort + Karras-2012 topology + RMQ box computation.

This is the TPU-native replacement for the reference's CPU BVH builder
(Source/BVHBuilder.cpp ``BVHBuilder::build``: recursive SAH/median split +
depth-first flatten with skip links [RECALL; mount empty at survey time]).
Rationale (SURVEY.md §3.3): a recursive CPU build takes seconds for
Sponza-class meshes and would leave the accelerator idle; the LBVH pipeline is
embarrassingly parallel and runs fully inside jit, enabling per-frame rebuilds
(BASELINE config 2) and cheap refits for animation (config 4).

Design notes (TPU-first, not a translation):

- **Leaves are K consecutive Morton-sorted triangles.** Triangle data is
  gathered once into sorted order, so every leaf is a *contiguous* slice —
  the traversal kernels stream leaf triangles with dense reads instead of
  per-triangle gathers.
- **Topology** is Karras 2012: every internal node found independently by
  binary search over common-prefix lengths. All loops here are fixed-bound
  with masking => one fused XLA program, no host control flow.
- **Node AABBs via range-min/max query (RMQ)** instead of the classic
  bottom-up atomic-flag walk (which XLA has no efficient analogue for):
  internal node *i* covers the contiguous sorted-leaf range [first_i, last_i],
  so its box is a range reduction over leaf boxes. We build an O(n log n)
  sparse table in log2(n) vectorized sweeps and answer every node's box with
  two gathers. The same routine IS the refit fast path (config 4): topology
  fixed, recompute leaf boxes + table + node boxes.
- **Stackless-depth bound**: delta (common-prefix length) strictly increases
  root->leaf and is <= 60 + 32 (code bits + index-tiebreak bits), so
  traversal stacks of 128 entries are provably sufficient.

The flattened node layout stores, per internal node, BOTH children's boxes
(so the traversal tests 2 boxes per fetched row) and child references with
leaves encoded as negative ids — the same role as the reference's
``BVHNode{bboxMin, bboxMax, prim, next}`` but shaped for vector hardware.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .morton import morton_of_points, morton_of_points_60
from ..types import Mesh


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class LBVH:
    """Flattened LBVH (all arrays device-resident, jit-friendly).

    Ni = n_leaves - 1 internal nodes; leaf ``l`` covers sorted triangles
    [l*leaf_size, (l+1)*leaf_size).

    nodes_box   : f32[Ni, 12] = [Lmin, Lmax, Rmin, Rmax] child boxes
    nodes_child : i32[Ni, 2]  child refs; >= 0 internal index, < 0 leaf
                  encoded as -(leaf_id + 1)
    nodes_first : i32[Ni] first covered sorted-leaf index (refit metadata)
    nodes_last  : i32[Ni] last covered sorted-leaf index (inclusive)
    tri_v0/e1/e2: f32[Tpad, 3] Morton-sorted precomputed triangle data
                  (the Möller–Trumbore layout the reference bakes into
                  leaves [RECALL])
    tri_sorted  : i32[Tpad, 3] vertex indices in sorted order (refit path)
    tri_id      : i32[Tpad] sorted position -> original triangle id
    root_min/max: f32[3] scene bounds
    leaf_size   : static int

    Sub-leaf clustering (build_lbvh(split_blocks=M), config-2 rebuild
    quality — round 5). When ``leaf_block`` is not None the TREE's leaves
    are L = num_blocks + M *sub-leaves*: tree-leaf ``l`` has its own
    tight box (``leaf_min/leaf_max[l]`` — one side of the best internal
    Morton-jump cut of its block) but its triangle content is the FULL
    14-triangle block ``leaf_block[l]`` (rows [blk*k, (blk+1)*k)). The
    box gates traversal visits (the quality win: probe r5c measured
    shadow pops 11.1 -> 6.4 vs fixed chops); scanning the whole block on
    a visit is the same vectorized k-row loop either way, so the
    triangle arrays never need the ~8-10 ms [L*k] re-gather a physical
    re-layout would cost on this latency-bound platform.

    leaf_block  : i32[L] tree-leaf -> triangle-block id, or None
    leaf_min/max: f32[L, 3] per-tree-leaf boxes, or None (derive from
                  the k-chop triangle blocks)
    """

    nodes_box: Any
    nodes_child: Any
    nodes_first: Any
    nodes_last: Any
    tri_v0: Any
    tri_e1: Any
    tri_e2: Any
    tri_sorted: Any
    tri_id: Any
    root_min: Any
    root_max: Any
    leaf_size: int = 4
    leaf_block: Any = None
    leaf_min: Any = None
    leaf_max: Any = None

    @property
    def num_internal(self) -> int:
        return int(self.nodes_child.shape[0])

    @property
    def num_leaves(self) -> int:
        return self.num_internal + 1

    @property
    def num_sorted_tris(self) -> int:
        return int(self.tri_id.shape[0])

    @property
    def num_blocks(self) -> int:
        """Triangle blocks (= leaves unless sub-leaf clustered)."""
        return self.num_sorted_tris // self.leaf_size


jax.tree_util.register_pytree_node(
    LBVH,
    lambda b: ((b.nodes_box, b.nodes_child, b.nodes_first, b.nodes_last,
                b.tri_v0, b.tri_e1, b.tri_e2, b.tri_sorted, b.tri_id,
                b.root_min, b.root_max, b.leaf_block, b.leaf_min,
                b.leaf_max), (b.leaf_size,)),
    lambda aux, c: LBVH(*c[:11], leaf_size=aux[0], leaf_block=c[11],
                        leaf_min=c[12], leaf_max=c[13]),
)


# ---------------------------------------------------------------------------
# Karras topology
# ---------------------------------------------------------------------------

def _make_delta(codes):
    """delta(i, j): common-prefix length of 60-bit leaf keys (two uint32
    words), index-augmented so all keys are distinct (Karras 2012 §4);
    -1 outside [0, n-1]. Range: [0, 64+32].

    Single-word specialization: when the low word is all zeros (30-bit
    Morton, the default), the lo gather is skipped entirely — the Karras
    searches are gather-op-bound on TPU (~0.3 ms of op overhead per
    sequential gather), so halving the gathers nearly halves topology
    time."""
    hi, lo = codes
    n = hi.shape[0]
    hi = hi.astype(jnp.uint32)
    single = lo is None
    if not single:
        lo = lo.astype(jnp.uint32)

    def delta(i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
        valid = (j >= 0) & (j <= n - 1)
        jc = jnp.clip(j, 0, n - 1)
        xh = hi[i] ^ hi[jc]
        ii = i.astype(jnp.int32)
        jj = jc.astype(jnp.int32)
        tie = 64 + jax.lax.clz((ii ^ jj).astype(jnp.uint32)).astype(jnp.int32)
        if single:
            d_lo = tie
        else:
            xl = lo[i] ^ lo[jc]
            d_lo = jnp.where(xl == 0, tie,
                             32 + jax.lax.clz(xl).astype(jnp.int32))
        d = jnp.where(xh == 0, d_lo, jax.lax.clz(xh).astype(jnp.int32))
        return jnp.where(valid, d, jnp.int32(-1))

    return delta


def karras_topology(leaf_codes) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Internal-node topology from sorted leaf keys (tuple of hi/lo words).

    Returns (child i32[Ni, 2], first i32[Ni], last i32[Ni]) with leaves
    encoded as -(leaf_id + 1). Fully vectorized: every loop is a
    log2(n)-bounded masked sweep (SURVEY.md §3.3).
    """
    if not isinstance(leaf_codes, tuple):
        leaf_codes = (leaf_codes, None)
    n = int(leaf_codes[0].shape[0])
    assert n >= 2, "need at least two leaves"
    ni = n - 1
    # Sweep counts scale with the actual leaf count: ranges can never exceed
    # n, so log2(n)+1 masked steps suffice (a fixed 31/32 would re-gather the
    # code array ~3x more than needed; the gathers dominate build time).
    log_n = max((n - 1).bit_length(), 1)
    delta = _make_delta(leaf_codes)
    i = jnp.arange(ni, dtype=jnp.int32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Binary search for the exact range length l, directly over the full
    # [0, 2^log_n] span. Sorted keys make delta(i, j) the MIN of adjacent
    # deltas over [i, j), hence monotone non-increasing in |j - i|, so no
    # doubling pre-search for an upper bound is needed — Karras 2012 uses
    # one for GPU memory locality, but on TPU each delta evaluation is a
    # sequential gather op (~0.3 ms of op overhead), and dropping the
    # doubling loop halves the search's gather count.
    l = jnp.zeros((ni,), jnp.int32)
    for k in range(log_n, -1, -1):
        t = jnp.int32(1 << k)
        ok = delta(i, i + (l + t) * d) > delta_min
        l = jnp.where(ok, l + t, l)

    j = i + l * d
    delta_node = delta(i, j)

    # Split search (ceil-halving do-while, masked to log2(n)+2 steps).
    s = jnp.zeros((ni,), jnp.int32)
    t = l
    done = l == 0
    for _ in range(log_n + 2):
        t = (t + 1) >> 1
        ok = (~done) & (delta(i, i + (s + t) * d) > delta_node)
        s = jnp.where(ok, s + t, s)
        done = done | (t <= 1)

    gamma = i + s * d + jnp.minimum(d, 0)
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)
    left_leaf = first == gamma
    right_leaf = last == gamma + 1
    child_l = jnp.where(left_leaf, -(gamma + 1), gamma)
    child_r = jnp.where(right_leaf, -(gamma + 2), gamma + 1)
    child = jnp.stack([child_l, child_r], axis=1).astype(jnp.int32)
    return child, first.astype(jnp.int32), last.astype(jnp.int32)


def adjacent_deltas(leaf_codes) -> jnp.ndarray:
    """D[g] = delta(g, g+1) for sorted leaf keys — the adjacent-delta array
    that fully determines the Karras radix tree (no gathers: pure shifted
    xors + clz). Same augmentation rules as _make_delta."""
    if not isinstance(leaf_codes, tuple):
        leaf_codes = (leaf_codes, None)
    hi, lo = leaf_codes
    hi = hi.astype(jnp.uint32)
    n = hi.shape[0]
    g = jnp.arange(n - 1, dtype=jnp.int32)
    xh = hi[:-1] ^ hi[1:]
    tie = 64 + jax.lax.clz((g ^ (g + 1)).astype(jnp.uint32)).astype(jnp.int32)
    if lo is None:
        d_lo = tie
    else:
        lo = lo.astype(jnp.uint32)
        xl = lo[:-1] ^ lo[1:]
        d_lo = jnp.where(xl == 0, tie,
                         32 + jax.lax.clz(xl).astype(jnp.int32))
    return jnp.where(xh == 0, d_lo, jax.lax.clz(xh).astype(jnp.int32))


def karras_topology_scan(leaf_codes, d_override=None,
                         d_max: int = 96) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                   jnp.ndarray]:
    """Karras topology via the Cartesian-tree / all-nearest-smaller-values
    formulation — same contract as karras_topology, different cost shape.

    The binary searches in karras_topology are GATHER-BOUND on TPU: ~30
    sequential dependent gathers at ~0.3 ms of op overhead each. This
    formulation uses only (a) one adjacent-delta computation, (b) two
    prefix scans over a [n, 98] threshold table (delta values are small
    integers <= 96, so "nearest index with delta < v" is a running
    max/min per threshold — lax.associative_scan, log2(n) slice/concat
    steps, no gathers), (c) one-hot row selects, and (d) two scatters to
    invert parent pointers into child arrays.

    Derivation: internal node g of the Karras radix tree corresponds to
    the GAP between sorted leaves g and g+1, keyed by D[g] = delta(g,g+1);
    the tree is the min-Cartesian tree over D with ties broken toward the
    lower index (D'[g] = (D[g], g) lexicographic). Then with
      L[g] = nearest j < g with D[j] <= D[g]   (tie -> left is smaller)
      R[g] = nearest j > g with D[j] <  D[g]   (strict)
    node g covers leaves [L[g]+1, R[g]]; its parent is R[g] unless
    D'[L[g]] > D'[R[g]] i.e. D[L[g]] > D[R[g]] (ties -> R, since the
    right gap has the higher index); leaf l's parent is gap l-1 if
    D[l-1] > D[l] else gap l (boundaries clamp). Node ids are gap ids
    except the root is renumbered to 0 (the LBVH layout's entry point).
    """
    if not isinstance(leaf_codes, tuple):
        leaf_codes = (leaf_codes, None)
    n = int(leaf_codes[0].shape[0])
    assert n >= 2, "need at least two leaves"
    ni = n - 1
    g = jnp.arange(ni, dtype=jnp.int32)
    if d_override is not None:
        # Priority-steered topology (e.g. kernels.build
        # sweep_sah_priorities): the min-Cartesian tree over ANY priority
        # array is a valid contiguous-range tree; d_max must bound the
        # override's values.
        d = d_override.astype(jnp.int32)
    else:
        delta = _make_delta(leaf_codes)
        d = delta(g, g + 1)                 # D[g] in [0, 96]
    nv = d_max + 2

    # L[g]: running max of g where D <= v, per threshold v.
    le = d[:, None] <= jnp.arange(nv, dtype=jnp.int32)[None, :]
    pmax = jax.lax.associative_scan(
        jnp.maximum, jnp.where(le, g[:, None], -1), axis=0)
    # R[g]: reverse running min of g where D < v.
    lt = d[:, None] < jnp.arange(nv, dtype=jnp.int32)[None, :]
    pmin = jax.lax.associative_scan(
        jnp.minimum, jnp.where(lt, g[:, None], ni), axis=0, reverse=True)
    onehot = jax.nn.one_hot(d, nv, dtype=jnp.int32)
    # shift by one row so the scan result excludes g itself
    pmax_prev = jnp.concatenate([jnp.full((1, nv), -1, jnp.int32),
                                 pmax[:-1]])
    pmin_next = jnp.concatenate([pmin[1:],
                                 jnp.full((1, nv), ni, jnp.int32)])
    L = jnp.sum(pmax_prev * onehot, axis=1)          # -1 = none
    R = jnp.sum(pmin_next * onehot, axis=1)          # ni = none

    first = L + 1
    last = R                                          # leaf range inclusive
    # Parent of internal gap g: the nearer (deeper) of L, R. Ties and
    # boundaries: no L -> R; no R -> L; D[L] > D[R] -> L else R.
    dL = d[jnp.clip(L, 0, ni - 1)]
    dR = d[jnp.clip(R, 0, ni - 1)]
    parent = jnp.where(L < 0, R,
                       jnp.where(R >= ni, L,
                                 jnp.where(dL > dR, L, R)))
    # Leaf l's parent gap: l-1 if D[l-1] > D[l] else l (ends clamp).
    l = jnp.arange(n, dtype=jnp.int32)
    dprev = d[jnp.clip(l - 1, 0, ni - 1)]
    dcur = d[jnp.clip(l, 0, ni - 1)]
    lparent = jnp.where(l == 0, 0,
                        jnp.where(l == n - 1, ni - 1,
                                  jnp.where(dprev > dcur, l - 1, l)))

    # Renumber so the root (the gap with no smaller neighbour on either
    # side) is node 0: swap ids 0 <-> root everywhere.
    root = jnp.argmin(jnp.where((L < 0) & (R >= ni), 0, 1)).astype(jnp.int32)

    def renum(x):
        return jnp.where(x == root, 0,
                         jnp.where(x == 0, root, x))

    node_of_gap = renum(g)
    parent = renum(parent)
    lparent = renum(lparent)

    child = jnp.zeros((ni, 2), jnp.int32)
    # Internal children: gap c (node id node_of_gap[c]) hangs under parent
    # p; left child iff c < p AS GAPS (parent splits its range at its own
    # gap). Compare gap positions, not renumbered ids.
    gap_of_parent = jnp.where(parent == 0, root,
                              jnp.where(parent == root, 0, parent))
    is_left = g < gap_of_parent
    side = jnp.where(is_left, 0, 1)
    mask = node_of_gap != 0                           # root has no parent
    # The root row must not write anywhere: route it out of bounds and let
    # mode="drop" discard it.
    parent_safe = jnp.where(mask, parent, ni)
    child = child.at[parent_safe, side].set(node_of_gap, mode="drop")
    lgap = jnp.where(lparent == 0, root,
                     jnp.where(lparent == root, 0, lparent))
    lside = jnp.where(l <= lgap, 0, 1)
    child = child.at[lparent, lside].set(-(l + 1))

    # child was scattered into RENUMBERED node-id rows already; first/last
    # are per-GAP and must be permuted into node order (row node id =
    # renum(gap)): only rows 0 and root swap.
    def swap_rows(a):
        a0 = a[0]
        ar = a[root]
        return a.at[0].set(ar).at[root].set(a0)

    first = swap_rows(first)
    last = swap_rows(last)
    return child, first.astype(jnp.int32), last.astype(jnp.int32)


# ---------------------------------------------------------------------------
# RMQ sparse table over leaf boxes -> node boxes (build AND refit path)
# ---------------------------------------------------------------------------

def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    return 31 - jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


# Sparse-table construction strategy for range_boxes:
#   "gather" — per-level clipped-index gathers (two tables, min and max)
#   "packed" — ONE min-only table over [leaf_min, -leaf_max] built with
#              static shift-slices instead of gathers (fewer + cheaper ops;
#              the build is op-overhead bound, probe r3s)
RMQ_VARIANT = "packed"


def range_boxes(leaf_min: jnp.ndarray, leaf_max: jnp.ndarray,
                first: jnp.ndarray, last: jnp.ndarray,
                variant: str = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB over each inclusive leaf range [first, last] via a sparse table.

    leaf_min/max: f32[n, 3]; first/last: i32[Q]. Returns (f32[Q,3], f32[Q,3]).
    Build: log2(n) vectorized sweeps; query: two gathers per range.
    """
    if (variant or RMQ_VARIANT) == "packed":
        return _range_boxes_packed(leaf_min, leaf_max, first, last)
    n = int(leaf_min.shape[0])
    levels = max(1, n.bit_length())  # 2^(levels-1) <= n
    tmins = [leaf_min]
    tmaxs = [leaf_max]
    for k in range(1, levels):
        shift = 1 << (k - 1)
        idx = jnp.minimum(jnp.arange(n) + shift, n - 1)
        tmins.append(jnp.minimum(tmins[-1], tmins[-1][idx]))
        tmaxs.append(jnp.maximum(tmaxs[-1], tmaxs[-1][idx]))
    tmin = jnp.stack(tmins)  # [levels, n, 3]
    tmax = jnp.stack(tmaxs)

    length = last - first + 1
    k = jnp.clip(_floor_log2(length), 0, levels - 1)
    p2 = (jnp.int32(1) << k)
    a = first
    b = jnp.maximum(last - p2 + 1, 0)
    out_min = jnp.minimum(tmin[k, a], tmin[k, b])
    out_max = jnp.maximum(tmax[k, a], tmax[k, b])
    return out_min, out_max


def _range_boxes_packed(leaf_min, leaf_max, first, last):
    """range_boxes via a single min-only table over [leaf_min, -leaf_max]
    (negating max turns both reductions into one jnp.minimum) built with
    static shift-slices: row i of level k is min over rows [i, i+2^k), with
    out-of-range rows clamped to the last row — exactly the clipped-index
    gather the "gather" variant uses, as a slice+concat instead."""
    n = int(leaf_min.shape[0])
    levels = max(1, n.bit_length())
    t = jnp.concatenate([leaf_min, -leaf_max], axis=1)       # [n, 6]
    tabs = [t]
    for k in range(1, levels):
        s = 1 << (k - 1)
        t = tabs[-1]
        shifted = jnp.concatenate(
            [t[s:], jnp.broadcast_to(t[n - 1:n], (s, 6))])
        tabs.append(jnp.minimum(t, shifted))
    tab = jnp.stack(tabs)                                    # [levels, n, 6]

    length = last - first + 1
    k = jnp.clip(_floor_log2(length), 0, levels - 1)
    p2 = (jnp.int32(1) << k)
    a = first
    b = jnp.maximum(last - p2 + 1, 0)
    r = jnp.minimum(tab[k, a], tab[k, b])                    # [Q, 6]
    return r[:, 0:3], -r[:, 3:6]


def _assemble_node_boxes(leaf_min, leaf_max, child, first, last):
    """Per-node [Lmin Lmax Rmin Rmax] rows from leaf boxes + topology."""
    node_min, node_max = range_boxes(leaf_min, leaf_max, first, last)
    ni = child.shape[0]

    def child_box(c):
        is_leaf = c < 0
        leaf_id = jnp.clip(-c - 1, 0, leaf_min.shape[0] - 1)
        node_id = jnp.clip(c, 0, ni - 1)
        bmin = jnp.where(is_leaf[:, None], leaf_min[leaf_id], node_min[node_id])
        bmax = jnp.where(is_leaf[:, None], leaf_max[leaf_id], node_max[node_id])
        return bmin, bmax

    lmin, lmax = child_box(child[:, 0])
    rmin, rmax = child_box(child[:, 1])
    nodes_box = jnp.concatenate([lmin, lmax, rmin, rmax], axis=1)
    return nodes_box, node_min[0], node_max[0]


# ---------------------------------------------------------------------------
# Build + refit
# ---------------------------------------------------------------------------

def _sorted_tri_data(vertices, tri_sorted):
    v0 = vertices[tri_sorted[:, 0]]
    v1 = vertices[tri_sorted[:, 1]]
    v2 = vertices[tri_sorted[:, 2]]
    return v0, v1 - v0, v2 - v0


def _leaf_boxes(v0, e1, e2, leaf_size: int):
    v1 = v0 + e1
    v2 = v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    n_leaves = v0.shape[0] // leaf_size
    lmin = tmin.reshape(n_leaves, leaf_size, 3).min(axis=1)
    lmax = tmax.reshape(n_leaves, leaf_size, 3).max(axis=1)
    return lmin, lmax, tmin, tmax


def _subleaf_split(chs, tmin_s, tmax_s, k: int, m: int):
    """Sub-leaf clustering pass (config-2 rebuilt-tree quality, round 5).

    The fixed k-chop leaves of the Morton order are the rebuilt tree's
    quality ceiling: a chop that straddles a big spatial jump gets a huge
    box and eats traversal visits (probe r4f: leaf CONTENT is the
    remaining ~2.5x trace gap vs SBVH; topology steering plateaued).
    This pass splits the top-``m`` blocks (ranked by their largest
    internal adjacent-code XOR — the Morton-jump magnitude) at that
    boundary, emitting TWO tree-leaves with tight boxes that both
    reference the same triangle block — so the triangle arrays never
    move (no [L*k] re-gather; see the LBVH docstring). Probe r5c:
    shadow pops/packet 11.1 -> 6.4, closest 33.6 -> 22.1 (SBVH 3.1/15.7).

    chs: u32[Tpad] sorted codes; tmin_s/tmax_s: f32[Tpad, 3] sorted
    per-triangle boxes. Returns (leaf_block i32[L], sub_codes u32[L],
    sub_min f32[L,3], sub_max f32[L,3]) with L = Tpad//k + m exactly.
    """
    tpad = chs.shape[0]
    nb = tpad // k
    assert 0 < m <= nb, (m, nb)
    big = jnp.float32(3.4e38)

    # Boundary scores: XOR of adjacent sorted codes, remapped to a
    # signed view that preserves unsigned order (msb flip).
    x = chs[:-1] ^ chs[1:]
    xi = (x ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    xi = jnp.concatenate(
        [xi, jnp.full((1,), jnp.iinfo(jnp.int32).min, jnp.int32)])
    sc = xi.reshape(nb, k)[:, :k - 1]       # col c-1 scores a cut at c
    best_c = jnp.argmax(sc, axis=1).astype(jnp.int32) + 1
    best_s = jnp.max(sc, axis=1)

    # Exact top-m split set (sort is over nb blocks, not Tpad tris).
    blk = jnp.arange(nb, dtype=jnp.int32)
    _, ordb = jax.lax.sort((-best_s, blk), num_keys=1)
    split = jnp.zeros((nb,), jnp.bool_).at[ordb[:m]].set(True)

    # Side boxes as two masked reduces over packed [tmin, -tmax] (cheaper
    # than prefix/suffix tables + gathers: only the split row's prefix
    # and suffix are ever read).
    t6 = jnp.concatenate([tmin_s, -tmax_s], axis=1).reshape(nb, k, 6)
    end_a = jnp.where(split, best_c, k)     # A covers rows [0, end_a)
    slot = jnp.arange(k, dtype=jnp.int32)[None, :, None]
    box_a = jnp.min(jnp.where(slot < end_a[:, None, None], t6, big), axis=1)
    box_b = jnp.min(jnp.where(slot >= best_c[:, None, None], t6, big),
                    axis=1)

    # Sub-leaf stream u = 2b (A, always) / 2b+1 (B, iff split), compacted
    # to exactly L = nb + m tree-leaves in Morton order.
    ones = jnp.ones((nb,), jnp.bool_)
    emit = jnp.stack([ones, split], axis=1).reshape(-1)
    offs = jnp.stack([jnp.zeros((nb,), jnp.int32), best_c],
                     axis=1).reshape(-1)
    boxes = jnp.stack([box_a, box_b], axis=1).reshape(2 * nb, 6)
    n_leaves = nb + m
    lid = jnp.cumsum(emit.astype(jnp.int32)) - 1
    u = jnp.arange(2 * nb, dtype=jnp.int32)
    compact_src = jnp.zeros((n_leaves,), jnp.int32).at[
        jnp.where(emit, lid, n_leaves)].set(u, mode="drop")
    leaf_block = compact_src >> 1
    sub_codes = chs[leaf_block * k + offs[compact_src]]
    b6 = boxes[compact_src]
    return leaf_block, sub_codes, b6[:, :3], -b6[:, 3:]


def auto_split_blocks(num_tris: int, leaf_size: int) -> int:
    """Default sub-leaf split count M for RenderConfig.rebuild_splits=-1:
    a quarter of the blocks — probe r5e (Sponza 1080p, v5e, area
    collapse): M=nb/4.7 traces the same as M=nb/2 (12.00 vs 12.30 ms
    shadow) at 2 ms less build, so smaller M wins the same-tree total
    (29.51 vs 31.83 ms). Capped so the leaf count stays under the SMEM
    topology kernel's ~30k gate."""
    tpad = _round_up(max(int(num_tris), 2 * leaf_size), leaf_size)
    nb = tpad // leaf_size
    return max(0, min(nb // 4, 30_000 - nb - 8))


def build_lbvh(vertices: jnp.ndarray, indices: jnp.ndarray,
               leaf_size: int = 4, morton_bits: int = 30,
               builder: str = "auto", boxes: str = "full",
               extra_payload: tuple = (), want_depth: bool = False,
               top_sah: bool = False, split_blocks: int = 0) -> LBVH:
    """Full on-device build: sort + topology + boxes. jit-able; all shapes
    depend only on (num_triangles, leaf_size).

    morton_bits: 30 (single-word sort, fastest build, bench default) or 60
    (two-word keys; restores spatial ordering where 30-bit codes collide —
    ~68% duplicate codes on Sponza-class density — at ~+30% build time;
    traversal quality on the benchmark scenes measured equal, so 30 is the
    default, but 60 is the safer choice for very dense or thin-feature
    meshes).

    extra_payload: additional per-triangle [T] columns to co-sort with
    the Morton keys (~+0.1 ms each vs ~ms-scale post-sort gathers that
    would serialize after the build — probe r3ac measured the tri_id-
    keyed attr-table gathers at ~16 ms on Sponza). When non-empty the
    return becomes (LBVH, tuple-of-sorted-columns).

    builder: "search" = Karras binary searches + RMQ boxes in XLA;
    "kernel" = the Pallas Cartesian-stack build kernel
    (kernels/build.py — topology + boxes as ONE program; the XLA
    formulation is op-overhead bound at ~11 ms of the Sponza rebuild);
    "auto" = kernel on compiled TPU backends, search elsewhere (the
    interpret-mode kernel is a slow serial emulation).

    boxes: "full" materializes the per-node child boxes (``nodes_box``) —
    required for binary traversal, refits, and the chunked/wide-plan
    paths. "defer" leaves ``nodes_box = None``: the fused per-frame
    rebuild (build + 8-wide collapse in one program) only ever reads the
    ~Ni/7 wide nodes' boxes, which widen_lbvh then queries straight from
    the RMQ sparse table — skipping the all-nodes box assembly (probe
    r3s: ~1.9 ms of the Sponza rebuild).

    top_sah: re-choose the top ~log2(n_leaves/64) levels of the topology
    by a sweep-SAH over the Morton order (kernels/build.py
    sweep_sah_priorities) — higher-quality trees for per-frame rebuilds
    at ~1 ms extra; Morton structure below the cut is unchanged.

    want_depth: append per-node depths (i32[Ni], root = 0) to the return
    tuple — free from the kernel builder's finalize sweep, None from the
    search builder (callers fall back to wide.node_depths). The fused
    rebuild feeds this to widen_lbvh so the fixed-frontier wide mask
    skips the XLA pointer-doubling depth pass. Return value: LBVH, plus
    sorted extras when extra_payload is non-empty, plus depth when
    want_depth — in that order.

    split_blocks: M > 0 enables sub-leaf clustering (config-2 rebuilt-
    tree quality): the top-M triangle blocks by internal Morton-jump are
    split at their best boundary into two tight-boxed tree-leaves that
    share the block's triangle rows (see _subleaf_split / the LBVH
    docstring). Leaf count becomes Tpad//leaf_size + M. 30-bit codes
    only; incompatible with top_sah (retired) and refit paths."""
    # EAGER calls on compiled TPU backends are routed through an internal
    # jit: the eager dispatch path (each of the ~30 build ops compiled
    # and launched separately over the remote tunnel) has crashed the
    # DEVICE into FailedPrecondition twice this round (probes r4a/r4b,
    # each followed by a multi-hour tunnel wedge), and is pathologically
    # slow even when it works. Inside jit (Tracer inputs) this is a
    # no-op; CPU eager keeps the direct path (interpret-mode tests).
    if not isinstance(vertices, jax.core.Tracer):
        from ..kernels.traverse import _compiled_backend
        if _compiled_backend():
            return _build_lbvh_jitted(
                vertices, indices, extra_payload, leaf_size=leaf_size,
                morton_bits=morton_bits, builder=builder, boxes=boxes,
                want_depth=want_depth, top_sah=top_sah,
                split_blocks=split_blocks)
    if split_blocks:
        assert morton_bits == 30, "sub-leaf clustering needs 30-bit codes"
        assert not top_sah, "split_blocks and top_sah are exclusive"
    num_tris = int(indices.shape[0])
    tpad = _round_up(max(num_tris, 2 * leaf_size), leaf_size)
    pad = tpad - num_tris
    # Pad by repeating the last triangle: duplicates are harmless for both
    # any-hit and closest-hit queries and keep every box tight.
    idx = jnp.concatenate(
        [indices, jnp.broadcast_to(indices[-1:], (pad, 3))]) if pad else indices

    tri = idx.astype(jnp.int32)
    # ONE flat row gather for all three corners (the gathers are op-latency
    # bound on TPU; three separate [T]-row gathers cost ~3x one [3T] one).
    v = vertices[tri.reshape(-1)].reshape(tpad, 3, 3)
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (tmin + tmax) * 0.5
    # Packed scene-bounds reduction: one min over [tmin, -tmax].
    pb = jnp.concatenate([tmin, -tmax], axis=1).min(axis=0)
    scene_min, scene_max = pb[:3], -pb[3:]

    # ONE key sort carrying ALL downstream per-triangle data as payload
    # operands: v0/e1/e2 (Möller–Trumbore), the vertex-id triple (refit)
    # and the original index. Probe r3i: each payload operand costs
    # ~+0.1 ms in the sort, while a single post-sort row gather costs
    # ~2.8-6 ms — co-sorting removed ~6 ms from the Sponza rebuild.
    e1 = v1 - v0
    e2 = v2 - v0
    payload = (jnp.arange(tpad, dtype=jnp.int32),
               v0[:, 0], v0[:, 1], v0[:, 2],
               e1[:, 0], e1[:, 1], e1[:, 2],
               e2[:, 0], e2[:, 1], e2[:, 2],
               tri[:, 0], tri[:, 1], tri[:, 2])
    n_extra = len(extra_payload)
    if n_extra:
        # Pad like idx: repeat the last triangle's values.
        payload += tuple(
            jnp.concatenate([c, jnp.broadcast_to(c[-1:], (pad,))])
            if pad else c for c in extra_payload)
    if builder == "auto":
        from ..kernels.traverse import _compiled_backend
        builder = "kernel" if _compiled_backend() else "search"
        # The Cartesian-stack topology kernel keeps ~8 i32 arrays of
        # n_leaves entries in SMEM (outputs + stack scratch); past ~30k
        # leaves that exceeds the 1 MB SMEM capacity (measured: 82k
        # leaves wants 2.5 MB). Auto falls back to the XLA search builder
        # for big scenes; an EXPLICIT builder="kernel" is honored (the
        # Mosaic compile will fail loudly) so A/B probes never silently
        # measure the wrong builder.
        if builder == "kernel" and \
                tpad // leaf_size + split_blocks > 30_000:
            builder = "search"
    if morton_bits == 60:
        if builder == "kernel":
            from ..kernels.build import morton_codes60_pallas
            chi, clo = morton_codes60_pallas(centroid, scene_min, scene_max)
        else:
            chi, clo = morton_of_points_60(centroid, scene_min, scene_max)
        s = jax.lax.sort((chi, clo) + payload, num_keys=2)
        chs, cls, s = s[0], s[1], s[2:]
        leaf_codes = (chs[::leaf_size], cls[::leaf_size])
    else:
        if builder == "kernel":
            # One-program quantize+interleave (bit-exact vs the XLA
            # formulation; probe r3s measured the XLA chain at ~3.8 ms of
            # pure op overhead for 287k tris).
            from ..kernels.build import morton_codes_pallas
            chi = morton_codes_pallas(centroid, scene_min, scene_max)
        else:
            chi = morton_of_points(centroid, scene_min, scene_max)
        s = jax.lax.sort((chi,) + payload, num_keys=1)
        chs, s = s[0], s[1:]
        leaf_codes = (chs[::leaf_size], None)
    order = s[0]
    # Padded rows are literal copies of triangle T-1, so clamping their ids
    # keeps shading lookups (albedo/normals by original id) in range while
    # refit gathers identical geometry.
    tri_id = jnp.minimum(order, num_tris - 1).astype(jnp.int32)
    sv0 = jnp.stack(s[1:4], axis=1)
    se1 = jnp.stack(s[4:7], axis=1)
    se2 = jnp.stack(s[7:10], axis=1)
    tri_sorted = jnp.stack(s[10:13], axis=1)
    sorted_extras = tuple(s[13:13 + n_extra])
    leaf_block = None
    if split_blocks:
        _, _, tmin_s, tmax_s = _leaf_boxes(sv0, se1, se2, leaf_size)
        leaf_block, sub_codes, lmin, lmax = _subleaf_split(
            chs, tmin_s, tmax_s, leaf_size, int(split_blocks))
        leaf_codes = (sub_codes, None)
    else:
        lmin, lmax, _, _ = _leaf_boxes(sv0, se1, se2, leaf_size)

    depth = None
    d = None
    if top_sah:
        # Config-2 rebuilt-tree quality: re-choose the TOP splits by a
        # sweep-SAH over the Morton order (kernels/build.py
        # sweep_sah_priorities — the Cartesian-tree priorities steer the
        # unchanged topology kernel; leaf ranges stay contiguous).
        # top_sah may be True (defaults) or a (block, maxd, min_blocks)
        # tuple for deeper/coarser sweeps.
        from ..kernels.build import sweep_sah_priorities
        kw = {}
        if isinstance(top_sah, tuple):
            kw = dict(zip(("block", "maxd", "min_blocks"), top_sah))
        d = sweep_sah_priorities(adjacent_deltas(leaf_codes), lmin, lmax,
                                 **kw)
    if builder == "kernel":
        # Scalar-core Cartesian-stack topology (kernels/build.py) + XLA
        # RMQ boxes — the measured-fastest split; the all-in-one kernel
        # (topology_and_boxes_pallas) loses on serial VMEM row access.
        from ..kernels.build import topology_pallas
        r = topology_pallas(d if d is not None
                            else adjacent_deltas(leaf_codes),
                            want_depth=want_depth)
        if want_depth:
            child, first, last, depth = r
        else:
            child, first, last = r
    elif d is not None:
        from ..kernels.build import SWEEP_MAXD
        maxd = top_sah[1] if isinstance(top_sah, tuple) else SWEEP_MAXD
        child, first, last = karras_topology_scan(leaf_codes, d_override=d,
                                                  d_max=96 + maxd)
    else:
        child, first, last = karras_topology(leaf_codes)

    def ret(out):
        r = (out,)
        if n_extra:
            r += (sorted_extras,)
        if want_depth:
            r += (depth,)
        return r if len(r) > 1 else out

    if boxes == "defer":
        # Root box = reduction over the LEAF boxes (not the raw scene
        # bounds: leaf boxes use reconstructed corners v0+e1/v0+e2, which
        # round ~1 ulp from the originals — this keeps the deferred path
        # bit-identical to the full path's RMQ root).
        pb2 = jnp.concatenate([lmin, -lmax], axis=1).min(axis=0)
        out = LBVH(nodes_box=None, nodes_child=child, nodes_first=first,
                   nodes_last=last, tri_v0=sv0, tri_e1=se1, tri_e2=se2,
                   tri_sorted=tri_sorted, tri_id=tri_id,
                   root_min=pb2[:3], root_max=-pb2[3:],
                   leaf_size=leaf_size, leaf_block=leaf_block,
                   leaf_min=lmin if leaf_block is not None else None,
                   leaf_max=lmax if leaf_block is not None else None)
        return ret(out)
    nodes_box, root_min, root_max = _assemble_node_boxes(
        lmin, lmax, child, first, last)

    out = LBVH(nodes_box=nodes_box, nodes_child=child, nodes_first=first,
               nodes_last=last, tri_v0=sv0, tri_e1=se1, tri_e2=se2,
               tri_sorted=tri_sorted, tri_id=tri_id, root_min=root_min,
               root_max=root_max, leaf_size=leaf_size,
               leaf_block=leaf_block,
               leaf_min=lmin if leaf_block is not None else None,
               leaf_max=lmax if leaf_block is not None else None)
    return ret(out)


import functools as _functools


@_functools.partial(jax.jit, static_argnames=(
    "leaf_size", "morton_bits", "builder", "boxes", "want_depth",
    "top_sah", "split_blocks"))
def _build_lbvh_jitted(vertices, indices, extra_payload, *, leaf_size,
                       morton_bits, builder, boxes, want_depth, top_sah,
                       split_blocks=0):
    """Jitted trampoline for eager build_lbvh calls on compiled backends
    (see the guard at the top of build_lbvh)."""
    return build_lbvh(vertices, indices, leaf_size=leaf_size,
                      morton_bits=morton_bits, builder=builder, boxes=boxes,
                      extra_payload=extra_payload, want_depth=want_depth,
                      top_sah=top_sah, split_blocks=split_blocks)


def refit_lbvh(bvh: LBVH, vertices: jnp.ndarray, indices: jnp.ndarray) -> LBVH:
    """Config-4 fast path: same topology + sorted order, new vertex positions.

    Cost: one gather over triangles + log2(n_leaves) reduction sweeps — no
    sort, no topology search. The analogue of the classic bottom-up refit,
    reformulated as RMQ so it is a single fused XLA program.
    """
    del indices  # topology is frozen; sorted vertex ids live in the LBVH
    assert bvh.leaf_block is None, \
        "sub-leaf clustered trees are rebuild-mode only (refit would " \
        "need the stored split offsets; rebuild instead)"
    sv0, se1, se2 = _sorted_tri_data(vertices, bvh.tri_sorted)
    lmin, lmax, _, _ = _leaf_boxes(sv0, se1, se2, bvh.leaf_size)
    nodes_box, root_min, root_max = _assemble_node_boxes(
        lmin, lmax, bvh.nodes_child, bvh.nodes_first, bvh.nodes_last)
    return dataclasses.replace(
        bvh, nodes_box=nodes_box, tri_v0=sv0, tri_e1=se1, tri_e2=se2,
        root_min=root_min, root_max=root_max)


def sah_cost(bvh: LBVH) -> jnp.ndarray:
    """Relative SAH quality metric: sum of child-box surface areas divided by
    root surface area. Drives the rebuild-vs-refit policy (config 4): refits
    inflate boxes over time; rebuild when cost rises past a threshold."""
    def area(bmin, bmax):
        d = jnp.maximum(bmax - bmin, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    box = bvh.nodes_box
    a = area(box[:, 0:3], box[:, 3:6]) + area(box[:, 6:9], box[:, 9:12])
    root = area(bvh.root_min, bvh.root_max)
    return jnp.sum(a) / jnp.maximum(root, 1e-12)
