"""Pallas TPU tile-rasterization kernel.

The back end of the G-buffer rasterizer (see tpurt/raster/setup.py for the
design and the reference-parity rationale). One grid step = one 32x32-pixel
tile = one (8, 128) VPU register set:

- The tile's (triangle, tile) pair records are a CONTIGUOUS run of rows in
  HBM (binning sorted them); the kernel streams them through a
  double-buffered VMEM scratch with async DMA, 8 rows (64 triangles) per
  chunk, overlapping fetch with the edge-function math.
- Per record: three edge evaluations d_i = E_i . (sx, sy, 1) (two fused
  multiply-adds each), a two-sided sign-coverage test, interpolated
  1/w = (d0+d1+d2) * Dinv as the depth key, and a masked z-fight update of
  the per-pixel (best 1/w, d1, d2, sum, tri) state held entirely in vector
  registers — no memory traffic in the inner loop, no vector->scalar syncs
  at all (unlike BVH traversal, rasterization has no data-dependent control
  flow: the whole tile is pure streaming VPU work).
- A small "big triangle" list (huge screen coverage or eye-plane crossers)
  lives VMEM-resident and is tested by every tile, bounded by the actual
  count.

Outputs per pixel: tri_id (i32, -1 = background), perspective-correct
barycentrics (u, v), and 1/w (depth key; 0 = background).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raster.setup import RECS_PER_ROW, TILE

CHUNK_ROWS = 8      # pair rows per DMA chunk (8 rows = 64 records = 4 KB)
N_BUF = 2           # double buffering


def _compiled_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _eval_records(row, nrec_mask_fn, sx, sy, state):
    """Test the RECS_PER_ROW setup records of one (1, 128) row against the
    tile's pixels. nrec_mask_fn(slot) -> scalar bool (record validity)."""
    best, bd1, bd2, bsum, btri = state
    for r in range(RECS_PER_ROW):
        b = 16 * r
        d0 = row[0, b + 0] * sx + row[0, b + 1] * sy + row[0, b + 2]
        d1 = row[0, b + 3] * sx + row[0, b + 4] * sy + row[0, b + 5]
        d2 = row[0, b + 6] * sx + row[0, b + 7] * sy + row[0, b + 8]
        dinv = row[0, b + 9]
        tid = row[0, b + 10].astype(jnp.int32)
        dsum = d0 + d1 + d2
        cov = ((d0 >= 0.0) & (d1 >= 0.0) & (d2 >= 0.0)) | \
              ((d0 <= 0.0) & (d1 <= 0.0) & (d2 <= 0.0))
        invw = dsum * dinv
        ok = cov & (invw > best) & nrec_mask_fn(r)
        best = jnp.where(ok, invw, best)
        bd1 = jnp.where(ok, d1, bd1)
        bd2 = jnp.where(ok, d2, bd2)
        bsum = jnp.where(ok, dsum, bsum)
        btri = jnp.where(ok, tid, btri)
    return best, bd1, bd2, bsum, btri


def _raster_kernel(wt: int, starts_ref, counts_ref, bigcnt_ref,
                   pair_hbm_ref, big_ref,
                   tri_ref, u_ref, v_ref, invw_ref,
                   scratch_ref, sem_ref):
    i = pl.program_id(0)
    ty = i // wt
    tx = i % wt
    # Pixel coordinates of this tile's (8, 128) lanes under the to_packets
    # layout: flat p = sublane*128 + lane; in-tile y = p // 32, x = p % 32.
    pidx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    sx = (tx * TILE + pidx % TILE).astype(jnp.float32)
    sy = (ty * TILE + pidx // TILE).astype(jnp.float32)

    best0 = jnp.zeros((8, 128), jnp.float32)     # 1/w > 0 <=> in front
    bd10 = jnp.zeros((8, 128), jnp.float32)
    bd20 = jnp.zeros((8, 128), jnp.float32)
    bsum0 = jnp.ones((8, 128), jnp.float32)
    btri0 = jnp.full((8, 128), -1, jnp.int32)
    state = (best0, bd10, bd20, bsum0, btri0)

    # ---- big list (VMEM-resident, bounded by the live count) -------------
    nbig_rows = (bigcnt_ref[0] + RECS_PER_ROW - 1) // RECS_PER_ROW

    def big_body(r, st):
        row = big_ref[pl.ds(r, 1), :]
        # Dead records carry tri_id -1.
        return _eval_records(
            row, lambda s: row[0, 16 * s + 10] >= 0.0, sx, sy, st)

    state = jax.lax.fori_loop(0, nbig_rows, big_body, state)

    # ---- streamed pair run (double-buffered DMA from HBM) ----------------
    start = starts_ref[i]
    end = start + counts_ref[i]
    row_lo = start // RECS_PER_ROW
    row_hi = (end + RECS_PER_ROW - 1) // RECS_PER_ROW
    nchunks = (row_hi - row_lo + CHUNK_ROWS - 1) // CHUNK_ROWS

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            pair_hbm_ref.at[pl.ds(row_lo + ci * CHUNK_ROWS, CHUNK_ROWS)],
            scratch_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, st):
        slot = jax.lax.rem(ci, N_BUF)

        @pl.when(ci + 1 < nchunks)
        def _():
            get_dma(jax.lax.rem(ci + 1, N_BUF), ci + 1).start()

        get_dma(slot, ci).wait()
        for rr in range(CHUNK_ROWS):
            g_row = row_lo + ci * CHUNK_ROWS + rr
            row = scratch_ref[slot, pl.ds(rr, 1), :]
            base = g_row * RECS_PER_ROW
            st = _eval_records(
                row, lambda s: (base + s >= start) & (base + s < end),
                sx, sy, st)
        return st

    state = jax.lax.fori_loop(0, nchunks, chunk_body, state)

    best, bd1, bd2, bsum, btri = state
    hit = btri >= 0
    safe = jnp.where(jnp.abs(bsum) > 1e-30, bsum, 1.0)
    tri_ref[0] = btri
    u_ref[0] = jnp.where(hit, bd1 / safe, 0.0)
    v_ref[0] = jnp.where(hit, bd2 / safe, 0.0)
    invw_ref[0] = jnp.where(hit, best, 0.0)


def rasterize_tiles(bins, width: int, height: int,
                    interpret=None) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray, jnp.ndarray]:
    """Run the tile kernel. Returns per-pixel (tri_id i32[H, W],
    u f32[H, W], v f32[H, W], invw f32[H, W])."""
    from .traverse import from_packets
    wt = -(-width // TILE)
    ht = -(-height // TILE)
    ntiles = wt * ht
    if interpret is None:
        interpret = not _compiled_backend()

    # Pad the pair rows so the last chunk's fixed-size DMA stays in bounds.
    pair_rows = jnp.pad(bins.pair_rows, ((0, CHUNK_ROWS), (0, 0)))

    vma = getattr(jax.typeof(pair_rows), "vma", None)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # pair rows (HBM)
            pl.BlockSpec(bins.big_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),      # big list
        ],
        out_specs=tuple(out_spec for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_raster_kernel, wt),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((ntiles, 8, 128), dt, vma=vma)
            for dt in (jnp.int32, jnp.float32, jnp.float32, jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    bigcnt = jnp.reshape(bins.big_count.astype(jnp.int32), (1,))
    tri, u, v, invw = fn(bins.starts, bins.counts, bigcnt,
                         pair_rows, bins.big_rows)
    return (from_packets(tri, height, width),
            from_packets(u, height, width),
            from_packets(v, height, width),
            from_packets(invw, height, width))
