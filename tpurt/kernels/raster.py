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


def _eval_records(read, nrec_mask_fn, sx, sy, state):
    """Test RECS_PER_ROW setup records against the tile's pixels.

    read(k) -> scalar: lane k of the current 128-float row. The rows live
    in SMEM, so every coefficient is a genuine scalar load feeding a cheap
    scalar->vector broadcast — the first (VMEM) version extracted each of
    the ~11 coefficients from a vector register, and those vreg->sreg
    transfers dominated the whole kernel (measured 3x slower than the ray
    caster; with SMEM rows the rasterizer is pure streaming VPU work).
    nrec_mask_fn(slot) -> scalar bool (record validity)."""
    best, bd1, bd2, bsum, btri = state
    for r in range(RECS_PER_ROW):
        b = 16 * r
        d0 = read(b + 0) * sx + read(b + 1) * sy + read(b + 2)
        d1 = read(b + 3) * sx + read(b + 4) * sy + read(b + 5)
        d2 = read(b + 6) * sx + read(b + 7) * sy + read(b + 8)
        dinv = read(b + 9)
        tid = read(b + 10).astype(jnp.int32)
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
                   pair_hbm_ref, big_hbm_ref,
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

    def stream(src_hbm, row_lo, start, end, state):
        """Double-buffered HBM -> SMEM chunk loop over records
        [start, end) of src_hbm, folding _eval_records into state."""
        row_hi = (end + RECS_PER_ROW - 1) // RECS_PER_ROW
        nchunks = (row_hi - row_lo + CHUNK_ROWS - 1) // CHUNK_ROWS

        def get_dma(slot, ci):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(row_lo + ci * CHUNK_ROWS, CHUNK_ROWS)],
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
                base = g_row * RECS_PER_ROW

                def read(k, slot=slot, rr=rr):
                    return scratch_ref[slot, rr, k]

                st = _eval_records(
                    read, lambda s: (base + s >= start) & (base + s < end),
                    sx, sy, st)
            return st

        return jax.lax.fori_loop(0, nchunks, chunk_body, state)

    # Big/eye-crossing triangles: every tile streams the (short) list.
    state = stream(big_hbm_ref, 0, 0, bigcnt_ref[0], state)
    # This tile's pair run.
    start = starts_ref[i]
    end = start + counts_ref[i]
    state = stream(pair_hbm_ref, start // RECS_PER_ROW, start, end, state)

    best, bd1, bd2, bsum, btri = state
    hit = btri >= 0
    safe = jnp.where(jnp.abs(bsum) > 1e-30, bsum, 1.0)
    tri_ref[0] = btri
    u_ref[0] = jnp.where(hit, bd1 / safe, 0.0)
    v_ref[0] = jnp.where(hit, bd2 / safe, 0.0)
    invw_ref[0] = jnp.where(hit, best, 0.0)


# ---------------------------------------------------------------------------
# v2: self-shading records, B_TILES tiles per grid step
# ---------------------------------------------------------------------------

B_TILES = 8         # tiles per grid step (amortizes per-step machinery)
CHUNK32 = 16        # v2 pair rows per DMA chunk (16 rows = 64 records)
# Interpret mode pays per-traced-op Python overhead, so the static unroll
# factors shrink (results identical; only the step/chunk shape changes).
B_TILES_INTERP = 2
CHUNK32_INTERP = 4


def _eval_records32(read, row_ok, sx, sy, state, cull=None):
    """Test the 4 records of one 128-float v2 row (raster/setup.py layout).

    read(k) -> scalar lane k (SMEM). row_ok: scalar bool for the whole row.
    cull: None, or (tx, ty) for per-record tile-rect culling (big list) —
    records whose stored rect misses the tile skip the vector work via cond.
    """
    from ..raster.setup import REC32, RECS32_PER_ROW

    def eval_rec(b, st):
        best, bd1, bd2, bsum, btri, nwx, nwy, nwz, gx, gy, gz, ar, ag, ab = st
        d0 = read(b + 0) * sx + read(b + 1) * sy + read(b + 2)
        d1 = read(b + 3) * sx + read(b + 4) * sy + read(b + 5)
        d2 = read(b + 6) * sx + read(b + 7) * sy + read(b + 8)
        dinv = read(b + 9)
        tid_f = read(b + 10)
        dsum = d0 + d1 + d2
        cov = ((d0 >= 0.0) & (d1 >= 0.0) & (d2 >= 0.0)) | \
              ((d0 <= 0.0) & (d1 <= 0.0) & (d2 <= 0.0))
        invw = dsum * dinv
        ok = cov & (invw > best) & (tid_f >= 0.0) & row_ok
        nx = d0 * read(b + 12) + d1 * read(b + 15) + d2 * read(b + 18)
        ny = d0 * read(b + 13) + d1 * read(b + 16) + d2 * read(b + 19)
        nz = d0 * read(b + 14) + d1 * read(b + 17) + d2 * read(b + 20)
        return (jnp.where(ok, invw, best), jnp.where(ok, d1, bd1),
                jnp.where(ok, d2, bd2), jnp.where(ok, dsum, bsum),
                jnp.where(ok, tid_f.astype(jnp.int32), btri),
                jnp.where(ok, nx, nwx), jnp.where(ok, ny, nwy),
                jnp.where(ok, nz, nwz),
                jnp.where(ok, read(b + 21), gx),
                jnp.where(ok, read(b + 22), gy),
                jnp.where(ok, read(b + 23), gz),
                jnp.where(ok, read(b + 24), ar),
                jnp.where(ok, read(b + 25), ag),
                jnp.where(ok, read(b + 26), ab))

    for r in range(RECS32_PER_ROW):
        b = REC32 * r
        if cull is None:
            state = eval_rec(b, state)
        else:
            tx, ty = cull
            txf = tx.astype(jnp.float32)
            tyf = ty.astype(jnp.float32)
            hitrect = ((read(b + 27) <= txf) & (txf <= read(b + 29))
                       & (read(b + 28) <= tyf) & (tyf <= read(b + 30)))
            state = jax.lax.cond(hitrect & row_ok,
                                 lambda st, bb=b: eval_rec(bb, st),
                                 lambda st: st, state)
    return state


def _raster_kernel32(wt: int, ntiles: int, width: int, height: int,
                     b_tiles: int, chunk: int,
                     starts_ref, counts_ref,
                     meta_ref, pair_hbm_ref, big_hbm_ref,
                     tri_ref, attr_ref, scratch_ref, sem_ref):
    # meta_ref: [big_nrows, ty_off]. ty_off is the first GLOBAL tile row of
    # this viewport (sort-middle sharded rasterization renders a band of
    # tile rows per chip; width/height stay the full-frame dims so the
    # centered coordinate mapping is identical). It rides in the scalar
    # prefetch because shard_map passes it as a traced axis-index value.
    i = pl.program_id(0)

    for b in range(b_tiles):
        tile = i * b_tiles + b
        tile = jnp.minimum(tile, ntiles - 1)   # pad tiles re-render the last
        ty = tile // wt + meta_ref[1]
        tx = tile % wt
        pidx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
        # Centered/unit-scaled coords — must match _setup_records32.
        sx = ((tx * TILE + pidx % TILE).astype(jnp.float32)
              - 0.5 * width) * (1.0 / width)
        sy = ((ty * TILE + pidx // TILE).astype(jnp.float32)
              - 0.5 * height) * (1.0 / height)

        state = (jnp.zeros((8, 128), jnp.float32),   # best 1/w
                 jnp.zeros((8, 128), jnp.float32),   # d1
                 jnp.zeros((8, 128), jnp.float32),   # d2
                 jnp.ones((8, 128), jnp.float32),    # dsum
                 jnp.full((8, 128), -1, jnp.int32),  # tri
                 ) + tuple(jnp.zeros((8, 128), jnp.float32)
                           for _ in range(9))        # nw, gn, albedo

        def stream(src_hbm, row_lo, row_hi, state, cull):
            nchunks = (row_hi - row_lo + chunk - 1) // chunk

            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    src_hbm.at[pl.ds(row_lo + ci * chunk, chunk)],
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
                for rr in range(chunk):
                    g_row = row_lo + ci * chunk + rr

                    def read(k, slot=slot, rr=rr):
                        return scratch_ref[slot, rr, k]

                    st = _eval_records32(read, g_row < row_hi, sx, sy, st,
                                         cull=cull)
                return st

            return jax.lax.fori_loop(0, nchunks, chunk_body, state)

        state = stream(big_hbm_ref, 0, meta_ref[0], state, (tx, ty))
        start = starts_ref[tile]
        state = stream(pair_hbm_ref, start, start + counts_ref[tile],
                       state, None)

        best, bd1, bd2, bsum, btri, nwx, nwy, nwz, gx, gy, gz, ar, ag, ab \
            = state
        hit = btri >= 0
        safe = jnp.where(jnp.abs(bsum) > 1e-30, bsum, 1.0)
        # d0*n0+d1*n1+d2*n2 is the interpolated normal times dsum, whose
        # sign is negative for backfacing (two-sided) coverage — fold
        # sign(dsum) into the normalization so the normal matches the
        # clipped-barycentric interpolation of the ray-cast G-buffer.
        rn = jax.lax.rsqrt(jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz,
                                       1e-30))
        rn = rn * jnp.where(bsum < 0.0, -1.0, 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        tri_ref[b] = btri
        attr_ref[b, 0] = jnp.where(hit, bd1 / safe, z)
        attr_ref[b, 1] = jnp.where(hit, bd2 / safe, z)
        attr_ref[b, 2] = jnp.where(hit, best, z)
        attr_ref[b, 3] = jnp.where(hit, nwx * rn, z)
        attr_ref[b, 4] = jnp.where(hit, nwy * rn, z)
        attr_ref[b, 5] = jnp.where(hit, nwz * rn, z)
        attr_ref[b, 6] = jnp.where(hit, gx, z)
        attr_ref[b, 7] = jnp.where(hit, gy, z)
        attr_ref[b, 8] = jnp.where(hit, gz, z)
        attr_ref[b, 9] = jnp.where(hit, ar, z)
        attr_ref[b, 10] = jnp.where(hit, ag, z)
        attr_ref[b, 11] = jnp.where(hit, ab, z)


# ---------------------------------------------------------------------------
# v3: z-only 16-float records (deferred shading via the packed shade table)
# ---------------------------------------------------------------------------

def _eval_records16(read, row_ok, sx, sy, state, cull=None):
    """Test the 8 z-only records of one 128-float v3 row
    (raster/setup.py::_setup_records16 layout). 11 SMEM lane reads per
    record vs the self-shading row's 27 — shading attributes are fetched
    AFTER the kernel by one per-pixel shade-table gather, so the z-fight
    carries only (1/w, d1, d2, dsum, tri)."""
    from ..raster.setup import REC16, RECS16_PER_ROW

    def eval_rec(b, st):
        best, bd1, bd2, bsum, btri = st
        d0 = read(b + 0) * sx + read(b + 1) * sy + read(b + 2)
        d1 = read(b + 3) * sx + read(b + 4) * sy + read(b + 5)
        d2 = read(b + 6) * sx + read(b + 7) * sy + read(b + 8)
        dinv = read(b + 9)
        tid_f = read(b + 10)
        dsum = d0 + d1 + d2
        cov = ((d0 >= 0.0) & (d1 >= 0.0) & (d2 >= 0.0)) | \
              ((d0 <= 0.0) & (d1 <= 0.0) & (d2 <= 0.0))
        invw = dsum * dinv
        ok = cov & (invw > best) & (tid_f >= 0.0) & row_ok
        return (jnp.where(ok, invw, best), jnp.where(ok, d1, bd1),
                jnp.where(ok, d2, bd2), jnp.where(ok, dsum, bsum),
                jnp.where(ok, tid_f.astype(jnp.int32), btri))

    for r in range(RECS16_PER_ROW):
        b = REC16 * r
        if cull is None:
            state = eval_rec(b, state)
        else:
            tx, ty = cull
            txf = tx.astype(jnp.float32)
            tyf = ty.astype(jnp.float32)
            hitrect = ((read(b + 12) <= txf) & (txf <= read(b + 14))
                       & (read(b + 13) <= tyf) & (tyf <= read(b + 15)))
            state = jax.lax.cond(hitrect & row_ok,
                                 lambda st, bb=b: eval_rec(bb, st),
                                 lambda st: st, state)
    return state


def _raster_kernel16(wt: int, ntiles: int, width: int, height: int,
                     b_tiles: int, chunk: int,
                     starts_ref, counts_ref,
                     meta_ref, pair_hbm_ref, big_hbm_ref,
                     tri_ref, attr_ref, scratch_ref, sem_ref):
    """z-only variant of _raster_kernel32: same streaming/binning machinery,
    outputs per pixel (tri, u, v, 1/w) only."""
    i = pl.program_id(0)

    for b in range(b_tiles):
        tile = i * b_tiles + b
        tile = jnp.minimum(tile, ntiles - 1)
        ty = tile // wt + meta_ref[1]
        tx = tile % wt
        pidx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
        sx = ((tx * TILE + pidx % TILE).astype(jnp.float32)
              - 0.5 * width) * (1.0 / width)
        sy = ((ty * TILE + pidx // TILE).astype(jnp.float32)
              - 0.5 * height) * (1.0 / height)

        state = (jnp.zeros((8, 128), jnp.float32),   # best 1/w
                 jnp.zeros((8, 128), jnp.float32),   # d1
                 jnp.zeros((8, 128), jnp.float32),   # d2
                 jnp.ones((8, 128), jnp.float32),    # dsum
                 jnp.full((8, 128), -1, jnp.int32))  # tri

        def stream(src_hbm, row_lo, row_hi, state, cull):
            nchunks = (row_hi - row_lo + chunk - 1) // chunk

            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    src_hbm.at[pl.ds(row_lo + ci * chunk, chunk)],
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
                for rr in range(chunk):
                    g_row = row_lo + ci * chunk + rr

                    def read(k, slot=slot, rr=rr):
                        return scratch_ref[slot, rr, k]

                    st = _eval_records16(read, g_row < row_hi, sx, sy, st,
                                         cull=cull)
                return st

            return jax.lax.fori_loop(0, nchunks, chunk_body, state)

        state = stream(big_hbm_ref, 0, meta_ref[0], state, (tx, ty))
        start = starts_ref[tile]
        state = stream(pair_hbm_ref, start, start + counts_ref[tile],
                       state, None)

        best, bd1, bd2, bsum, btri = state
        hit = btri >= 0
        safe = jnp.where(jnp.abs(bsum) > 1e-30, bsum, 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        tri_ref[b] = btri
        attr_ref[b, 0] = jnp.where(hit, bd1 / safe, z)
        attr_ref[b, 1] = jnp.where(hit, bd2 / safe, z)
        attr_ref[b, 2] = jnp.where(hit, best, z)


def rasterize_rows16(bins, width: int, height: int, interpret=None,
                     ty_off: int = 0, full_height: int | None = None):
    """Run the v3 z-only kernel over RasterRows bins (fmt="z16"). Returns
    per-pixel (tri_id i32[H,W], u, v, invw f32[H,W]) — shading comes from
    the packed shade table afterwards (passes/gbuffer.py deferred path)."""
    from .traverse import from_packets
    wt = -(-width // TILE)
    ht = -(-height // TILE)
    ntiles = wt * ht
    fh = height if full_height is None else full_height
    if interpret is None:
        interpret = not _compiled_backend()
    b_tiles = B_TILES_INTERP if interpret else B_TILES
    chunk = CHUNK32_INTERP if interpret else CHUNK32
    ngrid = -(-ntiles // b_tiles)
    tpad = ngrid * b_tiles

    def pad_rows(rows):
        pad = jnp.zeros((chunk, 128), jnp.float32)
        pad = pad.at[:, 10::16].set(-1.0)            # dead tri slots
        return jnp.concatenate([rows, pad])

    pair_rows = pad_rows(bins.pair_rows)
    big_rows = pad_rows(bins.big_rows)
    starts = jnp.pad(bins.row_starts, (0, tpad - ntiles))
    counts = jnp.pad(bins.row_counts, (0, tpad - ntiles))

    vma = getattr(jax.typeof(pair_rows), "vma", None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ngrid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # pair rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # big rows (HBM)
        ],
        out_specs=(
            pl.BlockSpec((b_tiles, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tiles, 3, 8, 128), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((N_BUF, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_raster_kernel16, wt, ntiles, width, fh,
                          b_tiles, chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tpad, 8, 128), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((tpad, 3, 8, 128), jnp.float32, vma=vma),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    meta = jnp.stack([bins.big_nrows.astype(jnp.int32),
                      jnp.asarray(ty_off, jnp.int32)])
    tri, attr = fn(starts, counts, meta, pair_rows, big_rows)
    tri_img = from_packets(tri[:ntiles], height, width)
    u = from_packets(attr[:ntiles, 0], height, width)
    v = from_packets(attr[:ntiles, 1], height, width)
    invw = from_packets(attr[:ntiles, 2], height, width)
    return tri_img, u, v, invw


def rasterize_rows(bins, width: int, height: int, interpret=None,
                   ty_off: int = 0, full_height: int | None = None):
    """Run the v2 kernel over RasterRows bins. Returns per-pixel
    (tri_id i32[H,W], attrs f32[12,H,W]) with attr channels
    [u, v, invw, nx, ny, nz, gnx, gny, gnz, ar, ag, ab].

    For a sharded viewport, ``height`` is the LOCAL band height (multiple
    of TILE), ``ty_off`` its first global tile row, and ``full_height``
    the full-frame height (the coordinate mapping must match the setup's
    full-frame centering)."""
    from .traverse import from_packets
    wt = -(-width // TILE)
    ht = -(-height // TILE)
    ntiles = wt * ht
    fh = height if full_height is None else full_height
    if interpret is None:
        interpret = not _compiled_backend()
    b_tiles = B_TILES_INTERP if interpret else B_TILES
    chunk = CHUNK32_INTERP if interpret else CHUNK32
    ngrid = -(-ntiles // b_tiles)
    tpad = ngrid * b_tiles

    def pad_rows(rows):
        pad = jnp.zeros((chunk, 128), jnp.float32)
        pad = pad.at[:, 10::32].set(-1.0)            # dead tri slots
        return jnp.concatenate([rows, pad])

    pair_rows = pad_rows(bins.pair_rows)
    big_rows = pad_rows(bins.big_rows)
    starts = jnp.pad(bins.row_starts, (0, tpad - ntiles))
    counts = jnp.pad(bins.row_counts, (0, tpad - ntiles))

    vma = getattr(jax.typeof(pair_rows), "vma", None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ngrid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # pair rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # big rows (HBM)
        ],
        out_specs=(
            pl.BlockSpec((b_tiles, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tiles, 12, 8, 128), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((N_BUF, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_raster_kernel32, wt, ntiles, width, fh,
                          b_tiles, chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tpad, 8, 128), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((tpad, 12, 8, 128), jnp.float32, vma=vma),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    meta = jnp.stack([bins.big_nrows.astype(jnp.int32),
                      jnp.asarray(ty_off, jnp.int32)])
    tri, attr = fn(starts, counts, meta, pair_rows, big_rows)
    tri_img = from_packets(tri[:ntiles], height, width)
    attrs = jnp.stack([from_packets(attr[:ntiles, c], height, width)
                       for c in range(12)])
    return tri_img, attrs


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

    # Pad both row arrays so the last chunk's fixed-size DMA stays in bounds.
    pair_rows = jnp.pad(bins.pair_rows, ((0, CHUNK_ROWS), (0, 0)))
    big_rows = jnp.pad(bins.big_rows, ((0, CHUNK_ROWS), (0, 0)))

    vma = getattr(jax.typeof(pair_rows), "vma", None)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # pair rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),          # big rows (HBM)
        ],
        out_specs=tuple(out_spec for _ in range(4)),
        scratch_shapes=[
            # SMEM: record coefficients are consumed as SCALARS; see
            # _eval_records for why VMEM rows were 3x slower.
            pltpu.SMEM((N_BUF, CHUNK_ROWS, 128), jnp.float32),
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
                         pair_rows, big_rows)
    return (from_packets(tri, height, width),
            from_packets(u, height, width),
            from_packets(v, height, width),
            from_packets(invw, height, width))
