"""Chunked acceleration structures: scenes past the VMEM budget.

The Pallas traversal kernels keep the whole BVH VMEM-resident, which caps a
single accel at ~350k triangles (leaf 14). The reference streams BVH nodes
from GPU buffer memory with no such ceiling [RECALL; SURVEY.md §3.4]. The
TPU-native unlock chosen here is a *two-level scene split* rather than
per-node HBM streaming:

- Triangles are globally Morton-sorted once, then cut into C equal
  contiguous chunks — each chunk is spatially compact, so chunk AABBs
  overlap little and per-chunk traversals stay cheap.
- Each chunk gets its own LBVH + 8-wide collapse (the existing, measured
  kernels — identical shapes across chunks, so XLA compiles ONE kernel and
  reuses it C times).
- Tracing is a short sequential loop over chunks with cross-chunk carry:
  any-hit masks resolved rays out of later chunks' t_max (their packets
  whole-packet-skip), closest-hit seeds each chunk's per-ray t_max with the
  best-so-far so later chunks cull against it.

This keeps every hot loop inside the proven kernels and scales the scene
axis by C with graceful (sub-linear, because of the carries) cost.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from .lbvh import build_lbvh
from .morton import morton_of_points
from .wide import WideBVH, count_wide, round_up_bucket, widen_lbvh


@dataclasses.dataclass
class ChunkedAccel:
    """A sequence of per-chunk wide BVHs plus chunk-local -> global triangle
    id maps. ``chunks[i].tri_id`` indexes into chunk-local order; composing
    with ``orig_ids[i]`` yields original mesh triangle ids."""

    chunks: Tuple[WideBVH, ...]
    orig_ids: Tuple[Any, ...]          # i32[Tc] per chunk
    leaf_size: int

    @property
    def num_chunks(self) -> int:
        return len(self.chunks)

    # Scene bounds = union over chunks (used e.g. to cap directional
    # shadow rays at the scene-AABB exit, passes/shadow.py).
    @property
    def root_min(self):
        return jnp.min(jnp.stack([c.root_min for c in self.chunks]), axis=0)

    @property
    def root_max(self):
        return jnp.max(jnp.stack([c.root_max for c in self.chunks]), axis=0)


jax.tree_util.register_pytree_node(
    ChunkedAccel,
    lambda a: ((a.chunks, a.orig_ids), (a.leaf_size,)),
    lambda aux, c: ChunkedAccel(chunks=tuple(c[0]), orig_ids=tuple(c[1]),
                                leaf_size=aux[0]),
)


def split_morton(vertices: jnp.ndarray, indices: jnp.ndarray,
                 num_chunks: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global Morton order -> (chunk_indices i32[C, Tc, 3],
    chunk_orig i32[C, Tc]) with the last chunk padded by repeating its last
    triangle (duplicates are harmless for both query kinds)."""
    tri = indices.astype(jnp.int32)
    t = tri.shape[0]
    v0 = vertices[tri[:, 0]]
    v1 = vertices[tri[:, 1]]
    v2 = vertices[tri[:, 2]]
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (lo + hi) * 0.5
    code = morton_of_points(centroid, lo.min(axis=0), hi.max(axis=0))
    order = jnp.argsort(code).astype(jnp.int32)
    tc = -(-t // num_chunks)
    pad = num_chunks * tc - t
    order_pad = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (pad,))]) if pad else order
    chunk_orig = order_pad.reshape(num_chunks, tc)
    return tri[chunk_orig], chunk_orig


def split_sampled(vertices: jnp.ndarray, indices: jnp.ndarray,
                  num_chunks: int, cap: int, samples: int = 1 << 16):
    """Spatially-compact chunks WITHOUT the global rank sort: bucket by
    Morton-code pivots read off a sorted sample, then compact each bucket
    with a static-size ``nonzero``.

    Why not ``split_morton`` at scale: the probe-r5f phase decomposition
    showed the 1M-element argsort PROGRAM costs ~24 min of one-time
    device load per process on this platform (its warm rerun is 0.48 s,
    and 1M-scale gather/elementwise programs load in seconds) — and the
    load cost recurs in every fresh process, so a scene-scale build
    cannot ride on it. Rank precision is also unnecessary: each chunk's
    own ``build_lbvh`` re-sorts its triangles anyway, so all the split
    must deliver is low-overlap chunk AABBs, which value-bucketing at
    sampled quantile pivots gives within sampling error.

    Returns (chunk_tris i32[C, cap, 3], chunk_orig i32[C, cap],
    counts i32[C]). Slots past a bucket's count repeat one of its own
    triangles (duplicates are harmless for both query kinds and keep the
    chunk AABB tight). counts.max() > cap means the sample misjudged a
    quantile; callers fall back to the exact split."""
    tri = indices.astype(jnp.int32)
    t = tri.shape[0]
    v0 = vertices[tri[:, 0]]
    v1 = vertices[tri[:, 1]]
    v2 = vertices[tri[:, 2]]
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (lo + hi) * 0.5
    code = morton_of_points(centroid, lo.min(axis=0), hi.max(axis=0))
    s = min(samples, t)
    stride = max(t // s, 1)
    samp = jnp.sort(code[::stride][:s])          # small-program sort
    n_s = samp.shape[0]
    ranks = [min((c * n_s) // num_chunks, n_s - 1)
             for c in range(1, num_chunks)]
    pivots = samp[jnp.asarray(ranks, jnp.int32)]  # [C-1]
    bucket = jnp.sum(code[:, None] >= pivots[None, :],
                     axis=1).astype(jnp.int32)    # [t] in [0, C)
    chunk_orig = []
    counts = []
    for b in range(num_chunks):
        mask = bucket == b
        counts.append(jnp.sum(mask.astype(jnp.int32)))
        idx = jnp.nonzero(mask, size=cap, fill_value=-1)[0].astype(
            jnp.int32)
        fill = jnp.maximum(idx[0], 0)             # in-bucket filler tri
        chunk_orig.append(jnp.where(idx < 0, fill, idx))
    chunk_orig = jnp.stack(chunk_orig)
    return tri[chunk_orig], chunk_orig, jnp.stack(counts)


# Module-level jitted stages: a fresh jax.jit wrapper per build_chunked
# call would compile-cache-hit but still RE-LOAD each executable onto the
# device — probe r5g measured a repeat 1M build at 133.8 s with per-call
# wrappers vs ~5 s steady-state when the executables are reused.
_split_sampled_jit = jax.jit(split_sampled,
                             static_argnames=("num_chunks", "cap"))
_split_morton_jit = jax.jit(split_morton, static_argnames=("num_chunks",))
_build_jit = jax.jit(lambda v, i, leaf_size: build_lbvh(
    v, i, leaf_size=leaf_size), static_argnames=("leaf_size",))
_widen_chunk_jit = jax.jit(widen_lbvh, static_argnames=("nw_pad",))


def build_chunked(vertices: jnp.ndarray, indices: jnp.ndarray,
                  num_chunks: int, leaf_size: int = 14,
                  bucket: int = 1024, cap_factor: float = 1.12) -> ChunkedAccel:
    """Build the chunked accel (host-level loop; one compile per stage since
    all chunks share shapes). One wide-count host sync total (the max count
    sizes every chunk's pad so the widen program is shared).

    The split takes the sampled-pivot bucketing path (``split_sampled``,
    chunk capacity ``cap_factor`` over the even share) and falls back to
    the exact global sort only if a bucket overflows its capacity — one
    extra host sync (the counts) pays for skipping the scene-scale
    argsort program that probe r5f measured at ~24 min of per-process
    load time at 1M triangles."""
    t = int(indices.shape[0])
    cap = -(-t // num_chunks)
    if num_chunks > 1:
        cap = int(cap * cap_factor)
    chunk_tris, chunk_orig, counts = _split_sampled_jit(
        vertices, indices, num_chunks, cap)
    if int(jnp.max(counts)) > cap:
        chunk_tris, chunk_orig = _split_morton_jit(
            vertices, indices, num_chunks)
    bvhs = [_build_jit(vertices, chunk_tris[c], leaf_size)
            for c in range(num_chunks)]
    nw_pad = round_up_bucket(max(max(count_wide(b) for b in bvhs), 1),
                             bucket)
    chunks = []
    orig_ids = []
    for c in range(num_chunks):
        wide = _widen_chunk_jit(bvhs[c], nw_pad=nw_pad)
        # Compose chunk-local sorted->local-original with local->global.
        chunks.append(dataclasses.replace(
            wide, tri_id=chunk_orig[c][wide.tri_id]))
        orig_ids.append(chunk_orig[c])
    return ChunkedAccel(chunks=tuple(chunks), orig_ids=tuple(orig_ids),
                        leaf_size=leaf_size)


def trace_any_chunked(accel: ChunkedAccel, origins, dirs, t_max,
                      interpret=None) -> jnp.ndarray:
    """Occlusion over all chunks; rays resolved by earlier chunks are
    deactivated (t_max 0) so later chunks' packets whole-packet-skip."""
    from ..kernels.traverse import trace_any_pallas
    occ = None
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                          origins.shape[:-1])
    for ch in accel.chunks:
        h = trace_any_pallas(ch, origins, dirs, tm, interpret=interpret)
        occ = h if occ is None else (occ | h)
        tm = jnp.where(occ, 0.0, tm)
    return occ


def trace_closest_chunked(accel: ChunkedAccel, origins, dirs,
                          t_max=3.4e38, interpret=None):
    """Closest hit over all chunks: each chunk is seeded with the running
    per-ray best t, so its traversal culls everything farther. Returns
    (t, tri_id) with GLOBAL triangle ids; miss = (inf, -1)."""
    from ..kernels.traverse import trace_closest_pallas
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              origins.shape[:-1])
    best_id = jnp.full(origins.shape[:-1], -1, jnp.int32)
    for ch in accel.chunks:
        t, tid = trace_closest_pallas(ch, origins, dirs, t_max=best_t,
                                      interpret=interpret)
        better = tid >= 0          # kernel only reports hits below t_max
        best_t = jnp.where(better, t, best_t)
        best_id = jnp.where(better, tid, best_id)
    t_out = jnp.where(best_id >= 0, best_t, jnp.inf)
    return t_out, best_id


def chunks_needed(num_tris: int, leaf_size: int, budget_bytes: int,
                  overhead: int, cap_factor: float = 1.12) -> int:
    """How many chunks a scene needs to fit each chunk in the VMEM budget.
    Wide nodes are estimated at 0.5/leaf (conservative vs the measured
    0.36, unbucketed — the build's pad bucketing adds at most one bucket of
    slack on top of the real count). ``cap_factor`` mirrors
    ``build_chunked``'s sampled-split chunk capacity."""
    from ..kernels.pack import packed_shapes, ROW_BYTES
    for c in range(1, 4096):
        tc = -(-num_tris // c)
        if c > 1:
            tc = int(tc * cap_factor)
        _, n_leaves, _ = packed_shapes(tc, leaf_size)
        nw = max(1, int(0.5 * n_leaves))
        if (nw + n_leaves) * ROW_BYTES + overhead <= budget_bytes:
            return c
    raise ValueError("scene too large even for 4096 chunks")
