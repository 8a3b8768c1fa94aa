"""Pure-JAX (non-Pallas) LBVH traversal: vmapped per-ray short-stack walk.

This is the portable reference traversal (runs on CPU/TPU via plain XLA) and
the correctness twin of the Pallas packet kernel in tpurt/kernels/traverse.py
— mirroring how the reference keeps a compute-shader fallback next to the
VK_NV_ray_tracing path and cross-checks them (SURVEY.md §3.5, §4).

Semantics match the reference compute shader's ``castShadowRay`` loop
(Source/Shaders/RayTracedShadows.comp [RECALL]): slab test against child
boxes, Möller–Trumbore at leaves (two-sided), any-hit early-out for shadow
rays; closest-hit mode drives the G-buffer pass.

Stack depth 64 is provably sufficient: the Karras delta strictly increases
along any root->leaf path and is bounded by 30 code bits + 32 tiebreak bits
(see tpurt/bvh/lbvh.py docstring).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .lbvh import LBVH

STACK_DEPTH = 128


def ray_box_interval(o, inv_d, bmin, bmax, t_min, t_max):
    """Vectorized slab test -> (enter, hit). NaNs from 0*inf resolved to the
    conservative (hit-permissive) side, matching the oracle."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return enter, enter <= exit_


def moller_trumbore_t(o, d, v0, e1, e2, eps=1e-9):
    """Batched two-sided Möller–Trumbore; returns t (+inf on miss).

    o, d: [..., 3]; v0/e1/e2 broadcastable to [..., 3].
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < eps, 0.0, 1.0 / det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = ((jnp.abs(det) >= eps) & (u >= 0.0) & (u <= 1.0)
          & (v >= 0.0) & (u + v <= 1.0))
    return jnp.where(ok, t, jnp.inf)


def _traverse_one(bvh: LBVH, any_hit: bool, t_min, o, d, t_max):
    """Single-ray stack traversal (vmapped by the caller)."""
    k = bvh.leaf_size
    inv_d = 1.0 / d  # +/-inf on zero components; slab test resolves the NaNs

    def leaf_hits(leaf_id, best_t, best_id):
        if bvh.leaf_block is not None:
            # Sub-leaf clustered tree: the tree-leaf's triangle content
            # is its whole parent block (lbvh.LBVH docstring).
            leaf_id = bvh.leaf_block[leaf_id]
        base = leaf_id * k
        v0 = jax.lax.dynamic_slice(bvh.tri_v0, (base, 0), (k, 3))
        e1 = jax.lax.dynamic_slice(bvh.tri_e1, (base, 0), (k, 3))
        e2 = jax.lax.dynamic_slice(bvh.tri_e2, (base, 0), (k, 3))
        ids = jax.lax.dynamic_slice(bvh.tri_id, (base,), (k,))
        t = moller_trumbore_t(o[None, :], d[None, :], v0, e1, e2)
        t = jnp.where((t > t_min) & (t < best_t), t, jnp.inf)
        j = jnp.argmin(t)
        better = t[j] < best_t
        return (jnp.where(better, t[j], best_t),
                jnp.where(better, ids[j], best_id))

    def body(state):
        stack, sp, best_t, best_id = state
        sp = sp - 1
        node = stack[sp]
        row = bvh.nodes_box[node]
        children = bvh.nodes_child[node]

        def visit_child(c, bmin, bmax, carry):
            stack, sp, best_t, best_id = carry
            _, hit = ray_box_interval(o, inv_d, bmin, bmax, t_min, best_t)
            is_leaf = c < 0
            leaf_id = jnp.maximum(-c - 1, 0)
            lt, lid = leaf_hits(leaf_id, best_t, best_id)
            take_leaf = hit & is_leaf
            best_t = jnp.where(take_leaf, lt, best_t)
            best_id = jnp.where(take_leaf, lid, best_id)
            push = hit & ~is_leaf
            stack = stack.at[sp].set(jnp.where(push, c, stack[sp]))
            sp = sp + push.astype(jnp.int32)
            return stack, sp, best_t, best_id

        carry = (stack, sp, best_t, best_id)
        carry = visit_child(children[0], row[0:3], row[3:6], carry)
        carry = visit_child(children[1], row[6:9], row[9:12], carry)
        return carry

    def cond(state):
        _, sp, _, best_id = state
        alive = sp > 0
        if any_hit:
            alive = alive & (best_id < 0)
        return alive

    # Derive while-carry inits from the ray so they inherit its sharding
    # varying-ness: under shard_map(check_vma=True) a replicated-constant
    # init would mismatch the varying carry the body produces.
    zf = o[0] * 0.0
    zi = zf.astype(jnp.int32)
    stack0 = jnp.zeros((STACK_DEPTH,), jnp.int32) + zi
    init = (stack0, jnp.int32(1) + zi,
            jnp.asarray(t_max, jnp.float32) + zf, jnp.int32(-1) + zi)
    _, _, best_t, best_id = jax.lax.while_loop(cond, body, init)
    best_t = jnp.where(best_id >= 0, best_t, jnp.inf)
    return best_t, best_id


@partial(jax.jit, static_argnames=("any_hit", "chunk"))
def traverse(bvh: LBVH, origins: jnp.ndarray, dirs: jnp.ndarray,
             t_min: float = 0.0, t_max=jnp.inf, any_hit: bool = False,
             chunk: int = 16384) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace rays against the LBVH.

    origins/dirs: f32[..., 3]; t_max: scalar or [...] per-ray.
    Returns (t f32[...], tri_id i32[...]); misses are (inf, -1). With
    any_hit=True the t is *a* hit, not necessarily the closest — all the
    shadow pass needs (reference any-hit early-out semantics).

    Rays are processed in ``chunk``-sized blocks via lax.map so live memory
    stays O(chunk * stack) regardless of resolution — the long-axis blocking
    strategy from SURVEY.md §5 (long-context analogue).
    """
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)

    npad = ((n + chunk - 1) // chunk) * chunk
    if npad != n:
        o = jnp.concatenate([o, jnp.zeros((npad - n, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((npad - n, 3), d.dtype)])
        tmax_arr = jnp.concatenate([tmax_arr, jnp.zeros(npad - n, jnp.float32)])

    one = jax.vmap(partial(_traverse_one, bvh, any_hit, t_min))

    if npad == chunk:
        t, tid = one(o, d, tmax_arr)
    else:
        o = o.reshape(-1, chunk, 3)
        d = d.reshape(-1, chunk, 3)
        tm = tmax_arr.reshape(-1, chunk)
        t, tid = jax.lax.map(lambda args: one(*args), (o, d, tm))
        t = t.reshape(-1)
        tid = tid.reshape(-1)

    return t[:n].reshape(shape), tid[:n].reshape(shape)
