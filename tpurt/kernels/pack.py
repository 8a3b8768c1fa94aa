"""Kernel-facing BVH memory layout.

Mosaic stores VMEM arrays in (8, 128) tiles, so any layout whose minor
dimension is not ~128 lanes wastes VMEM 8x. The Pallas traversal kernel
therefore consumes the LBVH re-packed into full-lane rows:

- ``nodes`` f32[Nr, 128]: 8 binary-node records per row, 16 floats each:
  [Lmin.xyz, Lmax.xyz, Rmin.xyz, Rmax.xyz, childL, childR, pad, pad]
  with child refs bitcast int32->f32 (>= 0 internal index, < 0 leaf as
  -(leaf_id + 1), matching tpurt/bvh/lbvh.py).
- ``tris`` f32[L, 128]: one leaf per row: leaf_size triangles x 9 floats
  (v0, e1, e2) back to back, rest zero. Leaf fetch = ONE aligned row load;
  triangle lane offsets are compile-time constants.

This packing replaces the reference's GPU BVH buffer upload
(Source/RayTracedShadows.cpp BVH node buffer [RECALL]) — same role, shaped
for a vector machine instead of a pointer machine. leaf_size <= 14
(14 * 9 = 126 <= 128).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..bvh.lbvh import LBVH

NODES_PER_ROW = 8
NODE_STRIDE = 16
MAX_LEAF_SIZE = 14


@dataclasses.dataclass
class PackedBVH:
    nodes: Any          # f32[Nr, 128]
    tris: Any           # f32[L, 128]
    tri_id: Any         # i32[Tpad] sorted position -> original triangle id
    num_internal: int
    num_leaves: int
    leaf_size: int


jax.tree_util.register_pytree_node(
    PackedBVH,
    lambda p: ((p.nodes, p.tris, p.tri_id),
               (p.num_internal, p.num_leaves, p.leaf_size)),
    lambda aux, c: PackedBVH(*c, num_internal=aux[0], num_leaves=aux[1],
                             leaf_size=aux[2]),
)


def pack_bvh(bvh: LBVH) -> PackedBVH:
    """LBVH -> kernel layout. Pure reshapes/gathers; jit-safe."""
    k = bvh.leaf_size
    if k > MAX_LEAF_SIZE:
        raise ValueError(f"leaf_size {k} > {MAX_LEAF_SIZE} cannot pack into "
                         "one 128-lane row")
    ni = bvh.num_internal
    # Child refs are stored as float VALUES (exact for |idx| < 2^24), NOT
    # bitcasts: small int bit patterns are denormal floats, and the TPU VPU
    # flushes denormals to zero in vector ops (found the hard way — every
    # child ref read back as 0 on hardware while interpret mode passed).
    if ni >= (1 << 24):
        raise ValueError("node index exceeds exact-f32 range")
    child_f = bvh.nodes_child.astype(jnp.float32)
    rec = jnp.concatenate([bvh.nodes_box, child_f,
                           jnp.zeros((ni, 2), jnp.float32)], axis=1)  # [Ni,16]
    nr = -(-ni // NODES_PER_ROW) * NODES_PER_ROW
    rec = jnp.pad(rec, ((0, nr - ni), (0, 0)))
    nodes = rec.reshape(nr // NODES_PER_ROW, 128)

    n_leaves = bvh.num_leaves
    tri9 = jnp.stack([bvh.tri_v0, bvh.tri_e1, bvh.tri_e2], axis=1)  # [T,3,3]
    tri9 = tri9.reshape(n_leaves, k * 9)
    tris = jnp.pad(tri9, ((0, 0), (0, 128 - k * 9)))

    return PackedBVH(nodes=nodes, tris=tris, tri_id=bvh.tri_id,
                     num_internal=ni, num_leaves=n_leaves, leaf_size=k)


def vmem_bytes(packed: PackedBVH) -> int:
    """Scene bytes the kernel keeps VMEM-resident (for fits-in-VMEM checks)."""
    return (packed.nodes.size + packed.tris.size) * 4


def packed_shapes(num_tris: int, leaf_size: int):
    """(num_internal, num_leaves, node_rows) the kernel layout will have for
    a scene of ``num_tris`` — mirrors the padding in lbvh.build_lbvh and
    pack_bvh exactly, so VMEM budgets can be computed without building."""
    tpad = max(num_tris, 2 * leaf_size)
    tpad = -(-tpad // leaf_size) * leaf_size
    n_leaves = tpad // leaf_size
    ni = n_leaves - 1
    node_rows = -(-ni // NODES_PER_ROW)
    return ni, n_leaves, node_rows


ROW_BYTES = 128 * 4


def binary_vmem_bytes(num_tris: int, leaf_size: int) -> int:
    """Exact bytes of the binary packed layout (nodes + tris rows)."""
    _, n_leaves, node_rows = packed_shapes(num_tris, leaf_size)
    return (node_rows + n_leaves) * ROW_BYTES


def wide_vmem_bytes(nw_pad: int, num_tris: int, leaf_size: int) -> int:
    """Exact bytes of the 8-wide layout given the padded wide-node count."""
    _, n_leaves, _ = packed_shapes(num_tris, leaf_size)
    return (nw_pad + n_leaves) * ROW_BYTES
