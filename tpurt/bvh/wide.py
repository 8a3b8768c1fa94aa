"""Binary LBVH -> 8-wide BVH collapse (on-device, vectorized).

Why: the Pallas traversal's while loop is a serial dependency chain (pop ->
load -> test -> push), so per-node latency is ~fixed; an 8-wide tree does the
same cull work in ~1/7th the iterations. This is the standard wide-BVH
transform (cf. CWBVH-style collapses) re-done as pure XLA:

- Every binary internal node's *frontier* — its descendants cut at 3 levels
  or at leaves — is computed for ALL nodes at once by two unrolled masked
  expansions (no recursion).
- The wide-root set (nodes whose frontiers tile the tree: root, then the
  internal refs in any wide root's frontier) is found by a fixed number of
  scatter-OR sweeps (depth/3 <= 21 for our <= 62-deep Karras trees).
- Compaction to dense wide ids uses jnp.nonzero with a static size, so the
  only host sync is reading the wide-node count once per (re)build; refits
  keep the topology and never need it.

Child boxes come from the binary nodes' stored child boxes (internal refs)
or leaf boxes (leaf refs); empty slots get inverted boxes that can never be
hit. Cited against the reference's flat binary BVHNode array
(Source/BVHBuilder.cpp [RECALL]) — same role, widened for a vector machine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .lbvh import LBVH

EMPTY = jnp.iinfo(jnp.int32).min
WIDE_FACTOR = 8


@dataclasses.dataclass
class WideBVH:
    """8-wide BVH in kernel row layout.

    nodes  : f32[Nw, 128] — child c occupies lanes [16c, 16c+16):
             [bmin.xyz, bmax.xyz, ref, 0...]; ref is a float-encoded exact
             int (>= 0: wide node id, < 0: leaf as -(leaf_id+1)); empty
             slots have inverted boxes (+BIG/-BIG) and ref 0.
    tris   : f32[L, 128] — one leaf per row (same layout as PackedBVH).
    tri_id : i32[Tpad] sorted position -> original triangle id.
    root_min/max : f32[3]
    num_wide : static int (actual wide nodes; rows beyond are padding)
    leaf_size : static int
    """

    nodes: Any
    tris: Any
    tri_id: Any
    root_min: Any
    root_max: Any
    num_wide: int
    leaf_size: int


jax.tree_util.register_pytree_node(
    WideBVH,
    lambda b: ((b.nodes, b.tris, b.tri_id, b.root_min, b.root_max),
               (b.num_wide, b.leaf_size)),
    lambda aux, c: WideBVH(*c, num_wide=aux[0], leaf_size=aux[1]),
)


def _expand(child, refs):
    """One masked expansion level: internal refs -> their two children;
    leaves/EMPTY pass through as (ref, EMPTY)."""
    ni = child.shape[0]
    is_int = refs >= 0
    safe = jnp.clip(refs, 0, ni - 1)
    left = jnp.where(is_int, child[safe, 0], refs)
    right = jnp.where(is_int, child[safe, 1], EMPTY)
    return left, right


def frontiers(child: jnp.ndarray) -> jnp.ndarray:
    """i32[Ni, 8]: each internal node's 3-level frontier (refs: internal
    ids >= 0, leaves < 0 as -(leaf+1), EMPTY sentinel)."""
    l1a, l1b = child[:, 0], child[:, 1]
    slots2 = []
    for r in (l1a, l1b):
        slots2.extend(_expand(child, r))
    slots3 = []
    for r in slots2:
        slots3.extend(_expand(child, r))
    return jnp.stack(slots3, axis=1)  # [Ni, 8]


def node_depths(child: jnp.ndarray) -> jnp.ndarray:
    """i32[Ni] depth of every internal node (root = 0), via parent pointers
    + pointer doubling: O(log depth) gathers instead of per-level scatters."""
    ni = child.shape[0]
    parent = jnp.zeros((ni,), jnp.int32)
    for side in range(2):
        ref = child[:, side]
        is_int = ref >= 0
        tgt = jnp.where(is_int, ref, 0)
        parent = parent.at[tgt].max(
            jnp.where(is_int, jnp.arange(ni, dtype=jnp.int32), 0))
    # parent[0] = 0 (root is its own parent) -- max over scatter keeps 0
    # correct because no node claims the root as a child.
    depth = jnp.where(jnp.arange(ni) == 0, 0, 1).astype(jnp.int32)
    jump = parent
    for _ in range(7):  # 2^7 = 128 > max Karras depth (~62)
        depth = depth + depth[jump]
        jump = jump[jump]
    return depth


def wide_roots(child: jnp.ndarray, front: jnp.ndarray = None,
               sweeps: int = 0) -> jnp.ndarray:
    """bool[Ni]: nodes that become wide-BVH nodes.

    Internal refs occur in frontiers at EXACTLY 3 levels below their wide
    root (the cut depth is fixed; only leaves appear early), so the
    reachable wide-root set is precisely the nodes at depth % 3 == 0."""
    return node_depths(child) % 3 == 0


@jax.jit
def _wide_count_fn(child):
    front = frontiers(child)
    return jnp.sum(wide_roots(child, front))


def count_wide(bvh: LBVH) -> int:
    """Host-sync: number of wide nodes (for choosing the padded size).
    Jitted: the 24 scatter sweeps would otherwise run as hundreds of eager
    dispatches (seconds over the remote-TPU tunnel)."""
    return int(_wide_count_fn(bvh.nodes_child))


def _leaf_boxes_from_tris(bvh: LBVH):
    v0, e1, e2 = bvh.tri_v0, bvh.tri_e1, bvh.tri_e2
    v1 = v0 + e1
    v2 = v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    n_leaves = bvh.num_leaves
    k = bvh.leaf_size
    return (tmin.reshape(n_leaves, k, 3).min(axis=1),
            tmax.reshape(n_leaves, k, 3).max(axis=1))


def widen_lbvh(bvh: LBVH, nw_pad: int) -> WideBVH:
    """Collapse to 8-wide. ``nw_pad`` must be >= count_wide(bvh) (static;
    round up to a bucket to avoid recompiles across frames)."""
    child = bvh.nodes_child
    ni = child.shape[0]
    front = frontiers(child)
    wide = wide_roots(child, front)

    # Dense id for every wide binary node (garbage elsewhere).
    ids = jnp.cumsum(wide.astype(jnp.int32)) - 1
    src = jnp.nonzero(wide, size=nw_pad, fill_value=ni - 1)[0]  # wide -> bin
    rows_front = front[src]                                     # [Nw, 8]
    is_pad = jnp.arange(nw_pad) >= jnp.sum(wide)

    leaf_min, leaf_max = _leaf_boxes_from_tris(bvh)

    # Child box per frontier ref: internal -> union of its stored child
    # boxes; leaf -> leaf box; EMPTY/pad -> inverted (unhittable).
    def ref_box(ref):
        is_int = ref >= 0
        is_leaf = (ref < 0) & (ref != EMPTY)
        bidx = jnp.clip(ref, 0, ni - 1)
        box = bvh.nodes_box[bidx]
        int_min = jnp.minimum(box[:, 0:3], box[:, 6:9])
        int_max = jnp.maximum(box[:, 3:6], box[:, 9:12])
        lidx = jnp.clip(-ref - 1, 0, leaf_min.shape[0] - 1)
        bmin = jnp.where(is_int[:, None], int_min,
                         jnp.where(is_leaf[:, None], leaf_min[lidx], 3.4e38))
        bmax = jnp.where(is_int[:, None], int_max,
                         jnp.where(is_leaf[:, None], leaf_max[lidx], -3.4e38))
        return bmin, bmax

    lanes = []
    for c in range(WIDE_FACTOR):
        ref = jnp.where(is_pad, EMPTY, rows_front[:, c])
        bmin, bmax = ref_box(ref)
        # Remap internal refs to dense wide ids; leaves unchanged. EMPTY
        # slots get leaf ref -1 (leaf 0): their inverted box never hits for
        # finite slab products, and if +/-BIG overflows to inf (axis-parallel
        # rays) the worst case is a harmless exact leaf test — an internal
        # ref here (e.g. 0 = root) would create a traversal CYCLE.
        wref = jnp.where(ref >= 0, ids[jnp.clip(ref, 0, ni - 1)],
                         jnp.where(ref == EMPTY, -1, ref))
        lane = jnp.concatenate(
            [bmin, bmax, wref.astype(jnp.float32)[:, None],
             jnp.zeros((nw_pad, 9), jnp.float32)], axis=1)  # [Nw, 16]
        lanes.append(lane)
    nodes = jnp.concatenate(lanes, axis=1)  # [Nw, 128]

    # Leaf/tri rows: same packing as the binary kernel layout.
    k = bvh.leaf_size
    tri9 = jnp.stack([bvh.tri_v0, bvh.tri_e1, bvh.tri_e2], axis=1)
    tri9 = tri9.reshape(bvh.num_leaves, k * 9)
    tris = jnp.pad(tri9, ((0, 0), (0, 128 - k * 9)))

    return WideBVH(nodes=nodes, tris=tris, tri_id=bvh.tri_id,
                   root_min=bvh.root_min, root_max=bvh.root_max,
                   num_wide=nw_pad, leaf_size=k)


def round_up_bucket(n: int, bucket: int = 1024) -> int:
    return -(-n // bucket) * bucket


_widen_jit = jax.jit(widen_lbvh, static_argnames=("nw_pad",))


def build_wide(bvh: LBVH, bucket: int = 1024) -> WideBVH:
    """Convenience: count (host sync) + widen with bucketed padding."""
    nw = count_wide(bvh)
    return _widen_jit(bvh, nw_pad=round_up_bucket(max(nw, 1), bucket))
