"""Rasterizer front end: vertex transform, triangle setup, tile binning.

The reference renders its G-buffer by RASTERIZING the mesh (Model.vert /
Model.frag [RECALL]); round 1 replaced that with a closest-hit ray cast,
which measured ~150 ms at 1080p on a v5e — the single largest frame cost.
This module + kernels/raster.py bring back the rasterizer, designed for the
TPU rather than translated from the GPU pipeline:

- **2D-homogeneous (Olano–Greer style) rasterization**: edge functions are
  cross products of CLIP-space (x, y, w) vertex coordinates, so no near-plane
  clipping pass is ever needed; triangles crossing or behind the eye plane
  resolve through the same sign tests plus an interpolated 1/w > 0 guard.
  The three edge values d_i at a pixel ARE the perspective-correct
  barycentric weights (lambda_i = d_i / sum d), so attribute interpolation
  needs no extra per-vertex data.
- **Sort-based binning under static shapes**: each triangle's pixel bbox maps
  to a span of 32x32 tiles; (triangle, tile) pairs are emitted into a static
  capacity by masked index arithmetic (no dynamic shapes), sorted by tile,
  and the per-pair setup rows gathered into pair order so every tile's work
  is one CONTIGUOUS run of HBM rows — the layout the kernel's double-buffered
  DMA wants. Triangles spanning more than BIG_SPAN tiles (huge or
  eye-plane-crossing) go to a small "big list" that every tile also tests.
- All passes here are pure XLA (sorts, cumsums, gathers) — the per-pixel
  z-fight happens in the Pallas kernel (kernels/raster.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..camera import camera_basis
from ..types import Camera, Mesh

TILE = 32          # pixels per tile side (matches kernels/traverse.py TILE)
REC = 16           # floats per setup record
RECS_PER_ROW = 8   # setup records per 128-lane row
BIG_SPAN = 64      # tiles; triangles covering more go to the big list
W_EPS = 1e-6       # clip-w threshold for "crosses the eye plane"


def clip_transform(cam: Camera, width: int, height: int,
                   vertices: jnp.ndarray) -> jnp.ndarray:
    """World vertices -> 2DH clip coords (x, y, w), where (x/w, y/w) are
    SCREEN coordinates in pixels such that integer coordinates hit pixel
    centers (exactly the pixel grid camera.generate_rays shoots through),
    and w is camera-space depth along the forward axis."""
    right, up, forward = camera_basis(cam)
    q = vertices - cam.position
    xc = q @ right
    yc = q @ up
    z = q @ forward
    thx = jnp.tan(cam.fov_y * 0.5) * (width / height)
    thy = jnp.tan(cam.fov_y * 0.5)
    cx = (width / (2.0 * thx)) * xc + ((width - 1) / 2.0) * z
    cy = -(height / (2.0 * thy)) * yc + ((height - 1) / 2.0) * z
    return jnp.stack([cx, cy, z], axis=-1)


class RasterBins(NamedTuple):
    """Kernel-ready binning output (all shapes static).

    pair_rows  : f32[CAP/8, 128] setup records in SORTED pair order
    starts     : i32[ntiles] first pair index of each tile
    counts     : i32[ntiles] pairs per tile
    big_rows   : f32[BIGCAP/8, 128] big-list setup records
    big_count  : i32[] number of valid big records
    overflow   : bool[] True if pair capacity was exceeded (pairs dropped)
    """

    pair_rows: jnp.ndarray
    starts: jnp.ndarray
    counts: jnp.ndarray
    big_rows: jnp.ndarray
    big_count: jnp.ndarray
    overflow: jnp.ndarray


def _setup_records(clip: jnp.ndarray, tri: jnp.ndarray,
                   tri_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle setup record f32[T, 16]:
    [E0(3), E1(3), E2(3), Dinv, tri_id, 0...].

    E_i = cross(c_j, c_k) over clip (x, y, w); d_i(p) = E_i . (sx, sy, 1).
    D = det(c0, c1, c2); 1/w(p) = (d0+d1+d2) * Dinv. Records are built so
    d-signs match D's sign inside the triangle (two-sided)."""
    c0 = clip[tri[:, 0]]
    c1 = clip[tri[:, 1]]
    c2 = clip[tri[:, 2]]
    e0 = jnp.cross(c1, c2)
    e1 = jnp.cross(c2, c0)
    e2 = jnp.cross(c0, c1)
    d = jnp.sum(e0 * c0, axis=-1)                     # det(c0, c1, c2)
    dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)
    rec = jnp.concatenate([
        e0, e1, e2, dinv[:, None],
        tri_ids.astype(jnp.float32)[:, None],
        jnp.zeros((tri.shape[0], 5), jnp.float32),
    ], axis=1)
    return rec


def _pack_rows(rec: jnp.ndarray) -> jnp.ndarray:
    """f32[N, 16] -> f32[ceil(N/8), 128] (8 records per 128-lane row)."""
    n = rec.shape[0]
    npad = -(-n // RECS_PER_ROW) * RECS_PER_ROW
    rec = jnp.pad(rec, ((0, npad - n), (0, 0)))
    return rec.reshape(npad // RECS_PER_ROW, 128)


def bin_triangles(cam: Camera, mesh: Mesh, width: int, height: int,
                  cap_pairs: int, cap_big: int = 4096) -> RasterBins:
    """Bin all triangles into 32x32-pixel tiles (static shapes; jit-safe).

    cap_pairs: static (tri, tile)-pair capacity. Exceeding it sets
    ``overflow`` and drops trailing pairs — callers treat that like the
    wide-BVH pad overflow (re-plan with a bigger cap)."""
    wt = -(-width // TILE)
    ht = -(-height // TILE)
    ntiles = wt * ht
    tri = mesh.indices.astype(jnp.int32)
    t_count = tri.shape[0]
    clip = clip_transform(cam, width, height, mesh.vertices)
    rec = _setup_records(clip, tri, jnp.arange(t_count, dtype=jnp.int32))

    # Screen bbox per triangle (valid only when all w > eps; otherwise the
    # projected bbox is unbounded -> big list).
    c = clip[tri]                                    # [T, 3, 3]
    w_ok = jnp.all(c[:, :, 2] > W_EPS, axis=1)
    w_safe = jnp.maximum(c[:, :, 2:3], W_EPS)
    sxy = c[:, :, 0:2] / w_safe                      # [T, 3, 2] pixels
    mn = jnp.min(sxy, axis=1) - 0.5
    mx = jnp.max(sxy, axis=1) + 0.5
    tx0 = jnp.clip(jnp.floor(mn[:, 0] / TILE), 0, wt - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(mn[:, 1] / TILE), 0, ht - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(mx[:, 0] / TILE), 0, wt - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(mx[:, 1] / TILE), 0, ht - 1).astype(jnp.int32)
    onscreen = (mx[:, 0] >= 0) & (mx[:, 1] >= 0) & \
               (mn[:, 0] <= width - 1) & (mn[:, 1] <= height - 1)
    degenerate = jnp.abs(rec[:, 9]) == 0.0           # Dinv == 0
    all_behind = jnp.all(c[:, :, 2] < W_EPS, axis=1)  # fully behind the eye
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    span = span_x * span_y
    small = w_ok & onscreen & (span <= BIG_SPAN) & ~degenerate
    big = (~w_ok | (w_ok & onscreen & (span > BIG_SPAN))) \
        & ~degenerate & ~all_behind

    # ---- small-triangle pair expansion (static capacity) -----------------
    counts = jnp.where(small, span, 0)
    starts = jnp.cumsum(counts) - counts             # exclusive prefix sum
    total = starts[-1] + counts[-1]
    # pair p belongs to triangle upper_bound(starts, p) - 1
    p = jnp.arange(cap_pairs, dtype=jnp.int32)
    pair_tri = jnp.searchsorted(starts + counts, p, side="right"
                                ).astype(jnp.int32)
    pair_tri = jnp.clip(pair_tri, 0, t_count - 1)
    k = p - starts[pair_tri]
    alive = (p < total) & (k >= 0) & (k < counts[pair_tri])
    tx = tx0[pair_tri] + k % jnp.maximum(span_x[pair_tri], 1)
    ty = ty0[pair_tri] + k // jnp.maximum(span_x[pair_tri], 1)
    tile_id = jnp.where(alive, ty * wt + tx, jnp.int32(ntiles))

    order = jnp.argsort(tile_id)
    tile_sorted = tile_id[order]
    tri_sorted = pair_tri[order]
    pair_rows = _pack_rows(rec[tri_sorted])

    tile_range = jnp.arange(ntiles, dtype=jnp.int32)
    t_starts = jnp.searchsorted(tile_sorted, tile_range, side="left"
                                ).astype(jnp.int32)
    t_ends = jnp.searchsorted(tile_sorted, tile_range, side="right"
                              ).astype(jnp.int32)

    # ---- big list --------------------------------------------------------
    big_idx = jnp.nonzero(big, size=cap_big, fill_value=0)[0]
    n_big = jnp.sum(big.astype(jnp.int32))
    big_rec = rec[big_idx]
    # Dead rows (beyond n_big) get tri_id -1 so the kernel masks them.
    dead = jnp.arange(cap_big) >= n_big
    big_rec = big_rec.at[:, 10].set(jnp.where(dead, -1.0, big_rec[:, 10]))
    big_rows = _pack_rows(big_rec)

    overflow = (total > cap_pairs) | (n_big > cap_big)
    return RasterBins(pair_rows=pair_rows, starts=t_starts,
                      counts=t_ends - t_starts, big_rows=big_rows,
                      big_count=jnp.minimum(n_big, cap_big),
                      overflow=overflow)


def default_cap_pairs(num_tris: int) -> int:
    """Static pair capacity: ~6 tiles per small triangle covers typical
    scenes with large headroom (most tris span 1-4 tiles); bucketed to
    limit recompiles if callers grow it."""
    return max(1 << 17, -(-6 * num_tris // (1 << 16)) * (1 << 16))


# ---------------------------------------------------------------------------
# v2: self-shading 32-float records binned at table-ROW granularity
# ---------------------------------------------------------------------------
#
# The v1 binner emitted (triangle, tile) pairs and gathered 16-float setup
# records into sorted pair order — measured on a v5e: the argsort is cheap
# (~10-30 ms) but the XLA row GATHER is catastrophic (~400 ms/1M rows) and
# the searchsorted pair expansion costs ~100+ ms. v2 exploits mesh locality
# (consecutive OBJ faces raster to the same tiles; measured on Sponza: ROW
# granularity cuts pair count 4x for only ~5% extra record evals):
#
# - Records are 32 floats and carry EVERYTHING shading needs (vertex
#   normals, geometric normal, albedo), so the kernel's z-fight selects
#   shading attributes directly and the G-buffer needs NO per-pixel row
#   gather afterwards (position reconstructs from 1/w and the view ray).
# - The pair unit is one 128-lane table row (4 records): the pair list
#   is ~4x smaller, and the gather into sorted pair order moves full
#   aligned rows.
# - Pair expansion is scatter-add + cumsum + tiny gathers (no searchsorted
#   over the pair capacity).

REC32 = 32          # floats per v2 record
RECS32_PER_ROW = 4  # records per 128-lane row

# v3 "z16" records: the deferred-shading variant. The kernel's z-fight only
# needs edges + Dinv + id (11 floats); shading attributes move to the packed
# per-triangle shade table (passes/shading.py make_shade_table_orig) fetched
# by ONE per-pixel row gather after the kernel — the same merged-gather
# design the ray-cast G-buffer uses. Half-width records double the records
# per 128-lane row, so the eval loop reads ~2.5x fewer SMEM lanes per
# incidence and the (row, tile) pair list shrinks.
REC16 = 16          # floats per v3 record
RECS16_PER_ROW = 8  # records per 128-lane row


class RasterRows(NamedTuple):
    """v2 kernel-ready binning (all shapes static).

    pair_rows  : f32[CAP, 128] 4-record rows in SORTED (tile-major) order
    row_starts : i32[ntiles] first pair-row of each tile
    row_counts : i32[ntiles] pair-rows per tile
    big_rows   : f32[BIGCAP/4, 128] big-list rows (streamed by every tile)
    big_nrows  : i32[] valid big rows
    overflow   : bool[] pair or big capacity exceeded
    """

    pair_rows: jnp.ndarray
    row_starts: jnp.ndarray
    row_counts: jnp.ndarray
    big_rows: jnp.ndarray
    big_nrows: jnp.ndarray
    overflow: jnp.ndarray


def _edges_centered(clip: jnp.ndarray, tri: jnp.ndarray, width: int,
                    height: int):
    """2DH edge vectors over CENTERED/unit-scaled screen coordinates:
    pixel-scale coords make the cross products cancel catastrophically
    (measured ~2e-3 relative depth error at 96x64); the d-ratios that
    yield coverage, u/v and 1/w are invariant to this affine rescale.
    Must match the (sx, sy) mapping in kernels/raster.py::_raster_kernel32
    and ::_raster_kernel16. Returns (e0, e1, e2, dinv)."""
    scale = jnp.asarray([1.0 / width, 1.0 / height, 1.0], jnp.float32)
    off = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    cs = jnp.stack([(clip[:, 0] - off[0] * clip[:, 2]) * scale[0],
                    (clip[:, 1] - off[1] * clip[:, 2]) * scale[1],
                    clip[:, 2]], axis=-1)
    c0 = cs[tri[:, 0]]
    c1 = cs[tri[:, 1]]
    c2 = cs[tri[:, 2]]
    e0 = jnp.cross(c1, c2)
    e1 = jnp.cross(c2, c0)
    e2 = jnp.cross(c0, c1)
    d = jnp.sum(e0 * c0, axis=-1)
    dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)
    return e0, e1, e2, dinv


def _setup_records16(clip: jnp.ndarray, mesh: Mesh, width: int, height: int,
                     tri_ids: jnp.ndarray, rect) -> jnp.ndarray:
    """Deferred-shading (z-only) setup record f32[T, 16]:

    [0:9]   E0, E1, E2 (2DH edge vectors, centered/unit-scaled coords)
    [9]     Dinv
    [10]    tri_id (-1 = dead slot)
    [11]    pad
    [12:16] tile-rect x0, y0, x1, y1 (f32; big-list per-tile culling)
    """
    tri = mesh.indices.astype(jnp.int32)
    e0, e1, e2, dinv = _edges_centered(clip, tri, width, height)
    tx0, ty0, tx1, ty1 = rect
    return jnp.concatenate([
        e0, e1, e2, dinv[:, None],
        tri_ids.astype(jnp.float32)[:, None],
        jnp.zeros((tri.shape[0], 1), jnp.float32),
        tx0.astype(jnp.float32)[:, None], ty0.astype(jnp.float32)[:, None],
        tx1.astype(jnp.float32)[:, None], ty1.astype(jnp.float32)[:, None],
    ], axis=1)


def _setup_records32(clip: jnp.ndarray, mesh: Mesh, width: int, height: int,
                     tri_ids: jnp.ndarray, rect) -> jnp.ndarray:
    """Self-shading setup record f32[T, 32]:

    [0:9]   E0, E1, E2 (2DH edge vectors; see _setup_records)
    [9]     Dinv
    [10]    tri_id (-1 = dead slot; kernels skip via the coverage test)
    [11]    pad
    [12:21] n0, n1, n2 (vertex normals; z-fight carries d0*n0+d1*n1+d2*n2)
    [21:24] geometric normal
    [24:27] albedo
    [27:31] tile-rect x0, y0, x1, y1 (f32; big-list per-tile culling)
    [31]    pad
    """
    tri = mesh.indices.astype(jnp.int32)
    e0, e1, e2, dinv = _edges_centered(clip, tri, width, height)
    n0 = mesh.normals[tri[:, 0]]
    n1 = mesh.normals[tri[:, 1]]
    n2 = mesh.normals[tri[:, 2]]
    v0w = mesh.vertices[tri[:, 0]]
    gve1 = mesh.vertices[tri[:, 1]] - v0w
    gve2 = mesh.vertices[tri[:, 2]] - v0w
    gn = jnp.cross(gve1, gve2)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    tx0, ty0, tx1, ty1 = rect
    rec = jnp.concatenate([
        e0, e1, e2, dinv[:, None],
        tri_ids.astype(jnp.float32)[:, None],
        jnp.zeros((tri.shape[0], 1), jnp.float32),
        n0, n1, n2, gn, mesh.albedo,
        tx0.astype(jnp.float32)[:, None], ty0.astype(jnp.float32)[:, None],
        tx1.astype(jnp.float32)[:, None], ty1.astype(jnp.float32)[:, None],
        jnp.zeros((tri.shape[0], 1), jnp.float32),
    ], axis=1)
    return rec


def _pack_rows32(rec: jnp.ndarray) -> jnp.ndarray:
    n, w = rec.shape
    rpr = 128 // w
    npad = -(-n // rpr) * rpr
    if npad != n:
        pad = jnp.zeros((npad - n, w), jnp.float32)
        pad = pad.at[:, 10].set(-1.0)                 # dead slots
        rec = jnp.concatenate([rec, pad])
    return rec.reshape(npad // rpr, 128)


def bin_rows(cam: Camera, mesh: Mesh, width: int, height: int,
             cap_pairs: int, cap_big: int = 2048,
             tile_rows: Tuple[int, int] | None = None,
             fmt: str = "full") -> RasterRows:
    """v2 binning: (table-row, tile) pairs, tile-sorted, rows gathered whole.

    cap_pairs: static (row, tile)-pair capacity (see default_cap_rows).
    tile_rows: optional (tr0, band) — bin only the ``band`` (static int)
    tile rows starting at global tile row ``tr0`` (may be traced, e.g. a
    shard_map axis index): the per-shard viewport for sort-middle parallel
    rasterization (geometry replicated, each chip bins + rasters its own
    rows; SURVEY.md §2.4). Projection stays full-frame; tile ids are
    local to the band.
    fmt: "full" = 32-float self-shading records (4/row, kernels/raster.py
    rasterize_rows); "z16" = 16-float z-only records (8/row,
    rasterize_rows16 + deferred shade-table shading)."""
    setup_fn = {"full": _setup_records32, "z16": _setup_records16}[fmt]
    rpr = {"full": RECS32_PER_ROW, "z16": RECS16_PER_ROW}[fmt]
    wt = -(-width // TILE)
    ht = -(-height // TILE)
    if tile_rows is None:
        tr0, tr1 = 0, ht
        ntiles = wt * ht
    else:
        tr0, band = tile_rows
        tr1 = tr0 + band
        ntiles = wt * int(band)
    tri = mesh.indices.astype(jnp.int32)
    t_count = tri.shape[0]
    clip = clip_transform(cam, width, height, mesh.vertices)

    # Per-triangle screen rects (same math as v1).
    c = clip[tri]
    w_ok = jnp.all(c[:, :, 2] > W_EPS, axis=1)
    w_safe = jnp.maximum(c[:, :, 2:3], W_EPS)
    sxy = c[:, :, 0:2] / w_safe
    mn = jnp.min(sxy, axis=1) - 0.5
    mx = jnp.max(sxy, axis=1) + 0.5
    tx0 = jnp.clip(jnp.floor(mn[:, 0] / TILE), 0, wt - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(mn[:, 1] / TILE), 0, ht - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(mx[:, 0] / TILE), 0, wt - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(mx[:, 1] / TILE), 0, ht - 1).astype(jnp.int32)
    onscreen = (mx[:, 0] >= 0) & (mx[:, 1] >= 0) & \
               (mn[:, 0] <= width - 1) & (mn[:, 1] <= height - 1)
    rec = setup_fn(clip, mesh, width, height,
                   jnp.arange(t_count, dtype=jnp.int32),
                   (jnp.where(w_ok, tx0, 0),
                            jnp.where(w_ok, ty0, 0),
                            jnp.where(w_ok, tx1, wt - 1),
                            jnp.where(w_ok, ty1, ht - 1)))
    degenerate = jnp.abs(rec[:, 9]) == 0.0
    all_behind = jnp.all(c[:, :, 2] < W_EPS, axis=1)
    # Only eye-plane CROSSERS go to the big list (every tile pays a cull
    # test per big record — with span-based big classification Sponza put
    # ~244 records there, costing ~15 ms of per-tile cull conds in the
    # kernel). Huge-span but well-projected triangles bin normally: their
    # tile spans are bounded by the grid and the overflow-retry covers
    # pathological viewpoints.
    small = w_ok & onscreen & ~degenerate
    big = (~w_ok) & ~degenerate & ~all_behind
    if tile_rows is not None:
        # Viewport cull + clip to the shard's tile rows (records keep the
        # GLOBAL rect; only binning coordinates go local).
        small = small & (ty1 >= tr0) & (ty0 <= tr1 - 1)
        ty0 = jnp.clip(ty0, tr0, tr1 - 1)
        ty1 = jnp.clip(ty1, tr0, tr1 - 1)

    # Kill dead slots in the packed table (offscreen/degenerate/big tris
    # must not rasterize from the small path).
    rec = rec.at[:, 10].set(jnp.where(small, rec[:, 10], -1.0))
    table = _pack_rows32(rec)                         # [nrows, 128]
    nrows = table.shape[0]

    # Per-ROW tile rects: union over live (small) member triangles.
    def row_reduce(a, fill, op):
        n = a.shape[0]
        npad = -(-n // rpr) * rpr
        aa = jnp.full((npad,), fill, a.dtype)
        aa = aa.at[:n].set(jnp.where(small, a, fill))
        return op(aa.reshape(-1, rpr), axis=1)

    rx0 = row_reduce(tx0, jnp.int32(10 ** 6), jnp.min)
    ry0 = row_reduce(ty0, jnp.int32(10 ** 6), jnp.min)
    rx1 = row_reduce(tx1, jnp.int32(-1), jnp.max)
    ry1 = row_reduce(ty1, jnp.int32(-1), jnp.max)
    live = rx1 >= rx0
    span_x = jnp.where(live, rx1 - rx0 + 1, 0)
    span_y = jnp.where(live, ry1 - ry0 + 1, 0)
    rspan = span_x * span_y

    # Pair expansion WITHOUT searchsorted: scatter-max each live row's id at
    # its segment start, then a running max recovers every pair's row id
    # (zero-count rows never scatter, so the max carries across them).
    counts = rspan
    starts = jnp.cumsum(counts) - counts
    total = starts[-1] + counts[-1]
    p = jnp.arange(cap_pairs, dtype=jnp.int32)
    row_ids = jnp.arange(nrows, dtype=jnp.int32)
    seg = jnp.full((cap_pairs,), -1, jnp.int32).at[
        jnp.where(counts > 0, starts, cap_pairs)].max(row_ids, mode="drop")
    pair_row = jax.lax.cummax(seg)
    pair_row = jnp.clip(pair_row, 0, nrows - 1)
    k = p - starts[pair_row]
    alive = (p < total) & (k >= 0) & (k < counts[pair_row])
    sx = jnp.maximum(span_x[pair_row], 1)
    tx = rx0[pair_row] + k % sx
    ty = ry0[pair_row] + k // sx
    tile_id = jnp.where(alive, (ty - tr0) * wt + tx, jnp.int32(ntiles))

    order = jnp.argsort(tile_id)
    tile_sorted = tile_id[order]
    pair_rows = table[pair_row[order]]                # [cap, 128] row gather

    tile_range = jnp.arange(ntiles, dtype=jnp.int32)
    t_starts = jnp.searchsorted(tile_sorted, tile_range, side="left"
                                ).astype(jnp.int32)
    t_ends = jnp.searchsorted(tile_sorted, tile_range, side="right"
                              ).astype(jnp.int32)

    # Big list: whole rows again, dead slots pre-killed.
    big_rec = rec.at[:, 10].set(
        jnp.where(big, jnp.arange(t_count, dtype=jnp.float32), -1.0))
    big_idx = jnp.nonzero(big, size=cap_big, fill_value=t_count)[0]
    n_big = jnp.sum(big.astype(jnp.int32))
    dead = jnp.zeros((1, rec.shape[1]), jnp.float32).at[0, 10].set(-1.0)
    big_all = jnp.concatenate([big_rec, dead])
    big_rows = _pack_rows32(big_all[big_idx])

    overflow = (total > cap_pairs) | (n_big > cap_big)
    return RasterRows(
        pair_rows=pair_rows, row_starts=t_starts,
        row_counts=t_ends - t_starts, big_rows=big_rows,
        big_nrows=-(-jnp.minimum(n_big, cap_big) // rpr),
        overflow=overflow)


def default_cap_rows(num_tris: int) -> int:
    """Static (row, tile)-pair capacity for bin_rows: ~1.8 tiles per
    4-triangle row (measured ~1.5 on Sponza 1080p), bucketed. The argsort
    and expansion arrays scale with the cap, so it stays tight; the
    Renderer's overflow-retry doubles it for pathological viewpoints."""
    rows = -(-num_tris // RECS32_PER_ROW)
    return max(1 << 15, -(-18 * rows // 10 // (1 << 14)) * (1 << 14))
