"""Bilinear/trilinear sampling and resize primitives.

These reimplement torch's ``F.grid_sample`` (align_corners=True, zeros /
border padding) and ``F.interpolate(mode='bilinear', align_corners=True)``
bit-faithfully — every stage of the ENeRF pipeline depends on them
(reference lib/networks/enerf/utils.py:88-90, :457, :706 and the many
``F.interpolate`` call sites). Tested against torch CPU in
tests/test_sampling.py.

Layouts are channels-last: images (H, W, C), volumes (D, H, W, C).
Batched variants take a leading batch axis via vmap.

TPU notes: the inner loop is a 4-way (2D) / 8-way (3D) gather over a
flattened spatial axis — XLA lowers this to dynamic-gather. The resize
functions instead build static interpolation matrices and run on the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_rows(n_rows: int, flat: jnp.ndarray, idx: jnp.ndarray):
    # all callers clip idx into range; promise_in_bounds skips the 3 ms
    # clamping select_n the default mode emits at render shapes
    return flat.at[idx].get(mode="promise_in_bounds")


def _take_rows_fwd(n_rows, flat, idx):
    proto = jnp.zeros((0,) + flat.shape[1:], flat.dtype)
    return flat.at[idx].get(mode="promise_in_bounds"), (idx, proto)


def _take_rows_bwd(n_rows, res, g):
    idx, proto = res
    # The scatter-add itself is fast on TPU (2.6M rows ~0.04 ms measured in
    # isolation) — what kills it in the train program is fusion/layout
    # context: fused with its value producer and assigned a row-minormost
    # layout, it degrades ~25,000x. The barriers force materialized,
    # default-layout operands/results so the fast scatter emitter applies.
    # Accumulate in f32 regardless of table dtype (bf16 tables would
    # otherwise round every partial sum — ~24 hits/row at render
    # shapes); one final rounding to the table dtype.
    acc_dtype = jnp.float32 if proto.dtype == jnp.bfloat16 else proto.dtype
    gf = jax.lax.optimization_barrier(
        g.reshape(-1, g.shape[-1]).astype(acc_dtype))
    dflat = jnp.zeros((n_rows, gf.shape[-1]), acc_dtype) \
        .at[idx.ravel()].add(gf)
    dflat = jax.lax.optimization_barrier(dflat).astype(proto.dtype)
    return dflat, np.zeros(idx.shape, jax.dtypes.float0)


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _take_rows_pinseg(n_rows: int, K: int, flat: jnp.ndarray,
                      idx: jnp.ndarray):
    return _pinseg_impl(n_rows, K, flat, idx)


def _pinseg_impl(n_rows, K, flat, idx):
    """Segmented VMEM-pinned row gather: split ``flat`` into K row
    segments that individually fit the pin threshold, gather ALL rows
    from each with clamped local indices, merge by in-range select —
    the pinned-emitter rate on tables too big to pin whole (measured
    3.6 ms vs 20.9 ms for the 512×640 render gather; see
    corner_gather_perview)."""
    seg = -(-n_rows // K)
    table = flat
    if K * seg != n_rows:
        table = jnp.pad(flat, ((0, K * seg - n_rows), (0, 0)))
    table = table.reshape(K, seg, flat.shape[-1])
    merged = None
    for k in range(K):
        lo = k * seg
        g = table[k].at[jnp.clip(idx - lo, 0, seg - 1)].get(
            mode="promise_in_bounds")
        # ascending segments: the LAST in-range segment wins = the
        # segment containing idx
        merged = g if merged is None else jnp.where((idx >= lo)[:, None],
                                                    g, merged)
    return merged


def _pinseg_fwd(n_rows, K, flat, idx):
    proto = jnp.zeros((0,) + flat.shape[1:], flat.dtype)
    return _pinseg_impl(n_rows, K, flat, idx), (idx, proto)


def _pinseg_bwd(n_rows, K, res, g):
    # The forward's segmentation is a gather-SPEED detail; the honest
    # cotangent is one scatter-add at the global indices. Differentiating
    # through the segment merge instead would emit K scatter-adds (every
    # row scattered into every segment, masked) — K x the backward cost
    # for identical values. Same barrier/f32-accumulation rationale as
    # _take_rows_bwd.
    idx, proto = res
    acc_dtype = jnp.float32 if proto.dtype == jnp.bfloat16 else proto.dtype
    gf = jax.lax.optimization_barrier(
        g.reshape(-1, g.shape[-1]).astype(acc_dtype))
    dflat = jnp.zeros((n_rows, gf.shape[-1]), acc_dtype) \
        .at[idx.ravel()].add(gf)
    dflat = jax.lax.optimization_barrier(dflat).astype(proto.dtype)
    return dflat, np.zeros(idx.shape, jax.dtypes.float0)


_take_rows_pinseg.defvjp(_pinseg_fwd, _pinseg_bwd)


def take_rows_segmented(flat: jnp.ndarray, idx: jnp.ndarray,
                        segments: int) -> jnp.ndarray:
    """``flat[idx]`` via ``segments`` pinnable sub-gathers (forward) and
    ONE global scatter-add (backward) — the differentiable counterpart
    of corner_gather_perview's segmented eval path, for gather tables
    past ``_GATHER_PIN_LIMIT_BYTES`` in the TRAIN program (the 512×640
    level-1 render table: 42 MB bf16 → K=2)."""
    if segments <= 1:
        return take_rows(flat, idx)
    return _take_rows_pinseg(flat.shape[0], segments, flat, idx)


def take_rows(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``flat[idx]`` row gather with a pinned-lowering backward.

    The autodiff transpose of a gather is an unsorted scatter-add.
    Inside the full train program XLA fuses the scatter with its
    cotangent producer and assigns it a row-minormost layout, a far
    slower lowering than the standalone op gets. This custom VJP pins
    the standalone lowering: ``optimization_barrier`` on the cotangent
    and on the scatter result forces materialized, default-layout
    operands so the plain scatter emitter applies. Forward lowering is
    identical to ``jnp.take``.

    Layout note: when a downstream consumer prefers a row-minormost
    layout, layout assignment propagates it INTO the gather fusion
    (optimization_barrier does not stop layout propagation), whose
    emitter then writes the result element-by-element — measured
    105.4 ms vs ~15 ms for the 2M-row render-stage gather at 512x640.
    Callers must instead ORDER idx so the natural row-major result is
    what consumers want (see ``bilinear_sample_2d_view_last``).
    """
    return _take_rows(flat.shape[0], flat, idx)


def _gather_2d(img_flat: jnp.ndarray, xi, yi, W: int, H: int, zero_pad: bool):
    """Gather img_flat[(yi*W + xi)] with clamped indices; optionally zero
    out-of-bounds corners (torch zeros padding validates each corner)."""
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    v = take_rows(img_flat, yc * W + xc)
    if zero_pad:
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = v * inb[..., None].astype(v.dtype)
    return v


# ---------------------------------------------------------------------------
# Block-packed gathers
#
# The TPU gather emitter costs ~constant time PER ROW plus a modest
# per-byte term (measured on-device with a fori_loop harness: ~6 ns/row
# at 44 B/row, ~11 ns/row at 512 B/row) — so a bilinear sample lowered
# as 4 corner gathers pays the per-row cost 4x. Packing the image into
# a dense stride-1 "all blocks" table — row (y, x) holds the 2x2 pixel
# block [y..y+1, x..x+1] for EVERY base coord of the 1-zero-padded
# frame — turns the 4 gathers into ONE gather of 4C-lane rows: ~3x
# faster at these shapes, same total bytes as the input (each pixel
# appears in 4 block rows but rows are 1/4 as many as pixel quads).
# The table builds as 4 unit-stride shifted slices + one lane concat
# (one fused elementwise pass; an earlier 4-parity-copy formulation
# built from 16 stride-2 slices cost ~6 ms/frame in relayout copies at
# 512×640). Same trick in 3D with 2x2x2 blocks: 8 gathers -> 1.
# ---------------------------------------------------------------------------


def _pack_blocks_2d(img: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    """(H, W, C) -> ((H+1)*(W+1), 4C) where row ``y*(W+1) + x`` holds the
    2x2 pixel block [y..y+1, x..x+1] of the 1-zero-padded frame, lanes
    in (dy, dx)-major order. Returns (packed, H+1, W+1)."""
    H, W, C = img.shape
    Ht, Wt = H + 1, W + 1
    P = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    tbl = jnp.concatenate([
        jax.lax.slice(P, (dy, dx, 0), (dy + Ht, dx + Wt, C))
        for dy in (0, 1) for dx in (0, 1)], axis=-1)
    return tbl.reshape(Ht * Wt, 4 * C), Ht, Wt


def _packed_corners_2d(packed: jnp.ndarray, Ht: int, Wt: int,
                       x0i, y0i, W: int, H: int):
    """One row-gather returning the 4 bilinear corners (..., 2, 2, C)
    for integer base coords (x0i, y0i); out-of-range bases are clamped
    into the padded frame (callers mask by weight/validity)."""
    row = packed_row_index(x0i, y0i, W, H, Ht, Wt)
    v = take_rows(packed, row)
    C4 = packed.shape[-1]
    return v.reshape(v.shape[:-1] + (2, 2, C4 // 4))


def bilinear_sample_2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                       padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``img (H, W, C)`` at float pixel coords ``x, y (...)``.

    Matches torch grid_sample(align_corners=True) semantics once the
    normalized grid has been converted to pixel coordinates:
    ``pix = (g + 1) / 2 * (size - 1)``.
    """
    H, W, C = img.shape
    if padding_mode == "border":
        # torch clips the *coordinate* for border mode
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # bf16 row-gathers lower to a serial per-channel while-loop on TPU
    # when XLA sinks converts into the gather fusion; gather + lerp in
    # f32 (barrier materializes the converted copy) and cast back
    out_dtype = img.dtype
    if img.dtype == jnp.bfloat16:
        img = jax.lax.optimization_barrier(img.astype(jnp.float32))
        tx = tx.astype(jnp.float32)
        ty = ty.astype(jnp.float32)

    packed, H2, W2 = _pack_blocks_2d(img)
    v = _packed_corners_2d(packed, H2, W2, x0i, y0i, W, H)
    v00 = v[..., 0, 0, :]
    v01 = v[..., 0, 1, :]
    v10 = v[..., 1, 0, :]
    v11 = v[..., 1, 1, :]
    if zero_pad:
        # torch zeros padding validates each corner against the TRUE
        # (unclamped) indices; the packed frame's 1-pixel zero ring
        # covers one-off corners, masks cover far-out-of-range bases
        def m(xi, yi):
            inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            return inb[..., None].astype(v00.dtype)

        v00 = v00 * m(x0i, y0i)
        v01 = v01 * m(x0i + 1, y0i)
        v10 = v10 * m(x0i, y0i + 1)
        v11 = v11 * m(x0i + 1, y0i + 1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return (top * (1 - ty) + bot * ty).astype(out_dtype)


def corner_rows_2d(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   padding_mode: str, view_last: bool,
                   table_bf16: bool = False, keep_bf16: bool = False,
                   segments: int = 1):
    """Multi-view bilinear corner fetch: ONE flat row gather over
    per-view packed 2x2-block tables.

    imgs: (V, H, W, C); coords (..., V) if view_last else (V, ...).
    Returns ``(v, (w00, w01, w10, w11), Cp)``: v (M, 4*Cp) f32 corner
    rows in (dy, dx)-major lane order and the four corner weights (lerp
    x zero-pad validity, coord-shaped) — callers blend (see
    ``_sample_2d_packed``) or feed a fused kernel. M iterates the coord
    elements in C order (V minor when view_last).

    table_bf16: quantize the packed TABLE to bf16 — halves the gather's
    HBM bytes (the gather is per-row-cost + per-byte bound on TPU); the
    gathered rows are upconverted to f32 AFTER the gather (barriered so
    the convert can't sink into the gather fusion — the serial-lowering
    hazard). Features lose bf16 precision; lerp stays exact f32.

    keep_bf16: with table_bf16, return the corner rows still in bf16 —
    for consumers that convert in-VMEM (the fused Pallas kernels), which
    skips materializing the f32 copy of the corner tensor in HBM
    entirely (~1 GB at the 512×640 render shape).
    """
    V, H, W, C = imgs.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    tx = tx.astype(jnp.float32)
    ty = ty.astype(jnp.float32)

    flat, Cp, Ht, Wt, rows_per_view = pack_gather_table_2d(imgs, table_bf16)

    row = packed_row_index(x0i, y0i, W, H, Ht, Wt)
    if view_last:
        voff = jnp.arange(V, dtype=jnp.int32) * rows_per_view  # V-minor
    else:
        voff = jnp.arange(V, dtype=jnp.int32).reshape(
            (V,) + (1,) * (row.ndim - 1)) * rows_per_view
    idx = (row + voff).reshape(-1)

    if segments > 1:
        # per-view callers only: the segment plan assumes one table
        assert V == 1, "segmented corner_rows_2d requires V == 1"
        v = take_rows_segmented(flat, idx, segments)
    else:
        v = take_rows(flat, idx)  # (M, 4*Cp), corner-major lanes
    if v.dtype == jnp.bfloat16 and not keep_bf16:
        v = jax.lax.optimization_barrier(v).astype(jnp.float32)

    ux0, ux1 = 1.0 - tx, tx
    uy0, uy1 = 1.0 - ty, ty
    if zero_pad:
        # torch zeros padding validates each corner against the TRUE
        # (unclamped) indices; the packed frame's 1-pixel zero ring
        # covers one-off corners, weight masks cover far-out-of-range.
        # Corner validity factors per axis: valid(x0+dx) & valid(y0+dy).
        ux0 = ux0 * ((x0i >= 0) & (x0i <= W - 1))
        ux1 = ux1 * ((x0i + 1 >= 0) & (x0i + 1 <= W - 1))
        uy0 = uy0 * ((y0i >= 0) & (y0i <= H - 1))
        uy1 = uy1 * ((y0i + 1 >= 0) & (y0i + 1 <= H - 1))
    return v, (uy0 * ux0, uy0 * ux1, uy1 * ux0, uy1 * ux1), Cp


def pack_gather_table_2d(imgs: jnp.ndarray, table_bf16: bool = False):
    """Pack multi-view images into the flat 2x2-block gather table.

    imgs: (V, H, W, C). Returns ``(flat, Cp, Ht, Wt, rows_per_view)``
    with flat (V * rows_per_view, 4*Cp); row ``v*rows_per_view +
    (y+1)*Wt + (x+1)`` holds the 2x2 corner block at integer base
    (x, y) of view v, lanes in (dy, dx)-major order [v00, v01, v10,
    v11]; Ht, Wt = H+1, W+1.

    table_bf16 quantizes the table to bf16 (halves gather HBM bytes);
    a bf16 input without it is upconverted to f32 behind a barrier (the
    serial-lowering hazard, see ``bilinear_sample_2d``).
    """
    V, H, W, _ = imgs.shape
    if table_bf16:
        imgs = imgs.astype(jnp.bfloat16)
    elif imgs.dtype == jnp.bfloat16:
        imgs = jax.lax.optimization_barrier(imgs.astype(jnp.float32))
    imgs = _pad_channels(imgs)
    Cp = imgs.shape[-1]
    Ht, Wt = H + 1, W + 1
    # ONE 0/1 patch-extraction conv builds the whole table: the 4-slice
    # lane concat lowers as one materialized (128-lane-padded) copy PER
    # PIECE (measured ~2.2 ms/frame at the 512×640 level-1 shape); the
    # conv writes the (V, Ht, Wt, 4Cp) table in one pass. Exact: bf16
    # data x 0/1 kernel is exact at DEFAULT; f32 uses HIGHEST.
    kern = _patch_kernel_np(Cp)
    pad = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jax.lax.conv_general_dilated(
        pad, jnp.asarray(kern, imgs.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(None if imgs.dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST))
    rows_per_view = Ht * Wt
    return packed.reshape(V * rows_per_view, 4 * Cp), Cp, Ht, Wt, rows_per_view


@functools.lru_cache(maxsize=None)
def _patch_kernel_np(Cp: int):
    """(2, 2, Cp, 4*Cp) 0/1 kernel extracting 2x2 pixel blocks into
    (dy, dx)-major lane chunks — the conv formulation of
    ``_pack_blocks_2d``'s slice+concat."""
    k = np.zeros((2, 2, Cp, 4 * Cp), np.float32)
    for dy in range(2):
        for dx in range(2):
            for c in range(Cp):
                k[dy, dx, c, (dy * 2 + dx) * Cp + c] = 1.0
    return k


def packed_row_index(x0i: jnp.ndarray, y0i: jnp.ndarray, W: int, H: int,
                     Ht: int, Wt: int) -> jnp.ndarray:
    """Row index into a ``pack_gather_table_2d`` table (one view) for
    integer base coords; out-of-range bases clamp into the padded frame
    (callers mask by weight/validity)."""
    xp = jnp.clip(x0i, -1, W - 1) + 1
    yp = jnp.clip(y0i, -1, H - 1) + 1
    return yp * Wt + xp


def corner_gather_perview(imgs: jnp.ndarray, x: jnp.ndarray,
                          y: jnp.ndarray, padding_mode: str,
                          table_bf16: bool = False):
    """Per-view corner-row gathers + lane-native weights for the fused
    Pallas kernels.

    imgs: (V, H, W, C); x, y: (M, V) pixel coords with the sample dim M
    in SUBLANES and views in lanes (the layout the single-matmul
    projection produces — see ops/ibr.py get_img_feat_packed).

    ONE gather per view instead of one fused gather over a concatenated
    table — when the per-view packed table is small enough for XLA to
    pin into scoped VMEM, where the TPU gather emitter runs ~5-18x
    faster than against HBM-resident tables (measured 2.3 vs 11.2
    ns/row at the 512×640 level-1 cost-volume shape; 0.61 ns/row for
    clamped segment gathers at the render shape — fori-differenced on
    the real chip). SIZE-GATED: past the pinning threshold the naive
    per-view lowering falls off a cliff (measured 192 ns/row at a 33 MB
    table — pin/evict thrash), so oversized tables are split into up to
    ``_GATHER_MAX_SEGMENTS`` pinnable row segments, each gathered over
    ALL rows with clamped local indices and merged by in-range select
    (measured 3.6 ms vs 20.9 ms for the 512×640 render gather). Truly
    huge tables fall back to a single fused-table gather (~11 ns/row,
    never pathological), whose stacked output feeds the fused kernels
    as one blocked operand.

    Returns ``(vs, w12, Cp)``: vs the corner rows (bf16 when table_bf16
    — consumers convert in-VMEM) as a V-tuple of (M, 4*Cp) when the
    per-view pinned gathers run, or ONE stacked (V, M, 4*Cp) array from
    the fused-table gather otherwise — the stacked form feeds the fused
    kernels as a single blocked operand; slicing it per view would
    materialize V full copies (~6 ms at the 512×640 render shape). w12
    is (M, 4*V) f32 corner weights (lerp × zero-pad validity), lanes
    corner-major / view-minor.
    """
    V, H, W, _ = imgs.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    ux0, ux1 = 1.0 - tx, tx
    uy0, uy1 = 1.0 - ty, ty
    if zero_pad:
        # torch zeros padding validates each corner against the TRUE
        # (unclamped) indices (packed frame's zero ring covers one-off
        # corners; weight masks cover far-out-of-range bases)
        ux0 = ux0 * ((x0i >= 0) & (x0i <= W - 1))
        ux1 = ux1 * ((x0i + 1 >= 0) & (x0i + 1 <= W - 1))
        uy0 = uy0 * ((y0i >= 0) & (y0i <= H - 1))
        uy1 = uy1 * ((y0i + 1 >= 0) & (y0i + 1 <= H - 1))
    w12 = jnp.concatenate([uy0 * ux0, uy0 * ux1, uy1 * ux0, uy1 * ux1],
                          axis=-1)  # (M, 4V)

    flat, Cp, Ht, Wt, rows = pack_gather_table_2d(imgs, table_bf16)
    row = packed_row_index(x0i, y0i, W, H, Ht, Wt)  # (M, V)
    M = row.shape[0]
    table_bytes = rows * 4 * Cp * flat.dtype.itemsize
    if table_bytes <= _GATHER_PIN_LIMIT_BYTES:
        tables = flat.reshape(V, rows, 4 * Cp)
        vs = tuple(take_rows(tables[s], row[:, s]) for s in range(V))
    else:
        K = -(-table_bytes // _GATHER_PIN_LIMIT_BYTES)
        if K <= _GATHER_MAX_SEGMENTS:
            # SEGMENTED pinned gathers: split each view's table into K
            # row-segments that individually fit the VMEM-pin threshold,
            # gather ALL M rows from every segment with clamped local
            # indices, and merge by in-range select. K× the gathered
            # rows, but each runs at the pinned-emitter rate — measured
            # 3.6 ms vs 20.9 ms for the 512×640 render-stage gather
            # (3 views × 42.5 MB bf16 tables, 3 segments, real chip);
            # the select chain fuses into one elementwise pass.
            seg = -(-rows // K)
            tables = jnp.pad(flat.reshape(V, rows, 4 * Cp),
                             ((0, 0), (0, K * seg - rows), (0, 0)))
            tables = tables.reshape(V, K, seg, 4 * Cp)
            vs = []
            for s in range(V):
                merged = None
                for k in range(K):
                    lo = k * seg
                    g = take_rows(tables[s, k],
                                  jnp.clip(row[:, s] - lo, 0, seg - 1))
                    if merged is None:
                        merged = g
                    else:
                        inb = (row[:, s] >= lo)[:, None]
                        merged = jnp.where(inb, g, merged)
                vs.append(merged)
            vs = tuple(vs)
        else:
            # one fused-table gather (never pathological): stacked output
            # feeds the fused kernels as a single blocked operand
            idx = row.T + (jnp.arange(V, dtype=jnp.int32) * rows)[:, None]
            vs = take_rows(flat, idx.reshape(-1)).reshape(V, M, 4 * Cp)
    return vs, w12, Cp


# Per-view gather tables at or below this size get pinned into scoped
# VMEM by the compiler (fast emitter); larger ones don't, and a band
# around ~33 MB lowers pathologically (192 ns/row — pin/evict thrash) —
# those go through one fused HBM-resident table instead, which is never
# pathological. Measured on v5e (96 MB scoped limit, 3 views): 10.8 and
# 16.6 MB/view pin (2.3 ns/row); 25.6 MB/view doesn't (11.5 ns/row);
# 33.3 MB/view is the cliff; ≥38 MB/view is neutral (~11 ns/row).
# 21.5 MB: a 21.1 MB segment still pins (1.79 ns/row in-program,
# 2026-08-20) — splits the 42.2 MB bf16 render table into K=2 segments
# instead of 3 (6 gathers/frame instead of 9, −3.3 ms at 512×640).
_GATHER_PIN_LIMIT_BYTES = int(21.5 * 2 ** 20)


# ---------------------------------------------------------------------------
# Wide-block gather tables + in-fusion corner blending
#
# The 2x2 block table's 4*Cp = 64-lane rows tile to 128 physical lanes on
# TPU (minor dims pad to the 128-lane vreg width), so every gather and
# every downstream elementwise pass moves 2x the logical bytes. The WIDE
# table packs a 2x4-pixel window per row — row (y, q) holds pixels
# [y..y+1] x [2q..2q+3] of the padded frame — exactly 128 lanes at
# Cp = 16: physical == logical, half the table bytes and half the rows
# of the 2x2 format. The 2x2 corner block at base (x0, y0) sits at
# in-row offset p = xp & 1 (xp = padded x), so the consumer blends on
# parity-selected static lane chunks; with bilinear weights folded in,
# the gather -> segment-merge -> parity-select -> corner-blend chain is
# ONE XLA fusion per view that writes only the blended (M, Cp) feature.
# ---------------------------------------------------------------------------


def _wide_super_image(imgs: jnp.ndarray, table_bf16: bool = False):
    """The padded 2-pixel "super-pixel" image behind the wide gather
    table: (V, H+2, nq, 2*Cp). Wide-table row (yp, q) of view v =
    concat of SI[v, yp+dy, q+dq] for (dy, dq) in {0,1}² — callers build
    the whole table (``pack_gather_table_wide``) or just a horizontal
    BAND of rows (``corner_gather_segments``: each VMEM-pinnable
    segment materializes directly from its band, skipping the
    monolithic-table pad + (V, K, seg, ·) reshape copies — measured
    ~1.3 ms/frame at 512×640)."""
    V, H, W, _ = imgs.shape
    if table_bf16:
        imgs = imgs.astype(jnp.bfloat16)
    elif imgs.dtype == jnp.bfloat16:
        imgs = jax.lax.optimization_barrier(imgs.astype(jnp.float32))
    imgs = _pad_channels(imgs)
    Cp = imgs.shape[-1]
    Ht = H + 1
    # super-pixel columns: q = xp >> 1 with xp in [0, W+1]; a row reads
    # super blocks q and q+1, so nq >= (W+1)//2 + 2 columns of padding
    nq = (W + 1) // 2 + 2
    Wpad = 2 * nq
    P = jnp.pad(imgs, ((0, 0), (1, 1), (1, Wpad - W - 1), (0, 0)))
    SI = P.reshape(V, H + 2, nq, 2 * Cp)
    Wq = nq - 1
    return SI, Cp, Ht, Wq


def pack_gather_table_wide(imgs: jnp.ndarray, table_bf16: bool = False):
    """Pack multi-view images into the flat 2x4-pixel-window gather table.

    imgs: (V, H, W, C). Returns ``(flat, Cp, Ht, Wq, rows_per_view)``
    with flat (V * rows_per_view, 8 * Cp); row ``v*rows_per_view +
    yp*Wq + (xp >> 1)`` covers padded pixels [yp..yp+1] x [2q..2q+3]
    (1-zero-padded frame coords: xp = x + 1, yp = y + 1), lanes ordered
    (dy, dx)-major: chunk ``dy*4 + u`` holds pixel (yp + dy, 2q + u).

    The build is the 2x2 block pack over a 2-pixel "super-pixel" image
    (unit-stride shifted slices + one lane concat — one fused pass).
    """
    V = imgs.shape[0]
    SI, Cp, Ht, Wq = _wide_super_image(imgs, table_bf16)
    tbl = jnp.concatenate([
        jax.lax.slice(SI, (0, dy, dq, 0), (V, dy + Ht, dq + Wq, 2 * Cp))
        for dy in (0, 1) for dq in (0, 1)], axis=-1)
    rows_per_view = Ht * Wq
    return tbl.reshape(V * rows_per_view, 8 * Cp), Cp, Ht, Wq, rows_per_view


def corner_blend_wide(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      padding_mode: str, table_bf16: bool = False):
    """Per-view bilinear sampling through the wide (2x4-window) table:
    ONE gather per (view, VMEM-pinnable table segment), with segment
    merge, parity select, and the 4-corner bilinear blend fused into a
    single XLA elementwise pass per view.

    imgs: (V, H, W, C); x, y: (M, V) pixel coords (view in lanes, the
    layout the single-matmul projection emits). Returns
    ``(blended, Cp)``: blended a V-list of (M, Cp) float32 blended
    features (channels zero-padded to Cp).

    This replaces the corner-ROW hand-off to the fused kernels: feeding
    blended features instead of 4 corner rows quarters the inter-stage
    HBM bytes, and the 128-lane physical rows halve the gather traffic
    vs the 64-lane 2x2 tables (which pad to 128 physical lanes).
    """
    V, H, W, _ = imgs.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    ux0, ux1 = 1.0 - tx, tx
    uy0, uy1 = 1.0 - ty, ty
    if zero_pad:
        # per-axis corner validity against the TRUE (unclamped) indices;
        # the padded frame's zero ring covers one-off corners
        ux0 = ux0 * ((x0i >= 0) & (x0i <= W - 1))
        ux1 = ux1 * ((x0i + 1 >= 0) & (x0i + 1 <= W - 1))
        uy0 = uy0 * ((y0i >= 0) & (y0i <= H - 1))
        uy1 = uy1 * ((y0i + 1 >= 0) & (y0i + 1 <= H - 1))

    flat, Cp, Ht, Wq, rows = pack_gather_table_wide(imgs, table_bf16)
    xp = jnp.clip(x0i, -1, W - 1) + 1
    yp = jnp.clip(y0i, -1, H - 1) + 1
    q = xp >> 1
    par = (xp & 1)[..., None]          # (M, V, 1) in-row parity
    row = yp * Wq + q                  # (M, V)

    table_bytes = rows * 8 * Cp * flat.dtype.itemsize
    K = max(1, -(-table_bytes // _GATHER_PIN_LIMIT_BYTES))
    if K > _GATHER_MAX_SEGMENTS:
        K = 1  # whole-table HBM gather (~11 ns/row, never pathological)
    tables = flat.reshape(V, rows, 8 * Cp)

    out = []
    for s in range(V):
        # take_rows_segmented: same pinned-segment merge as before, but
        # with a custom VJP whose backward is ONE global scatter-add per
        # view instead of K per-segment scatters — this path is now on
        # the differentiable train render route (packed head)
        merged = take_rows_segmented(tables[s], row[:, s], K)
        mf = merged.astype(jnp.float32)

        def chunk(dy, u):
            return _lane_chunk(mf, dy * 4 + u, Cp)

        a0 = ux0[:, s:s + 1]
        a1 = ux1[:, s:s + 1]
        p1 = par[:, s]                 # (M, 1) int
        top = jnp.where(p1 == 1,
                        chunk(0, 1) * a0 + chunk(0, 2) * a1,
                        chunk(0, 0) * a0 + chunk(0, 1) * a1)
        bot = jnp.where(p1 == 1,
                        chunk(1, 1) * a0 + chunk(1, 2) * a1,
                        chunk(1, 0) * a0 + chunk(1, 1) * a1)
        out.append(top * uy0[:, s:s + 1] + bot * uy1[:, s:s + 1])
    return out, Cp


def wide_table_segments(H: int, W: int, C: int, table_bf16: bool):
    """Static segmentation plan of the wide gather table for an
    (H, W, C) view: returns ``(K, seg, Cp, rows)`` — how
    ``corner_gather_segments`` will split it (same arithmetic as
    ``corner_blend_wide``). Lets callers budget the fused-kernel tile
    BEFORE tracing the gathers."""
    Cp = -(-C // 16) * 16
    Ht = H + 1
    Wq = (W + 1) // 2 + 1
    rows = Ht * Wq
    itemsize = 2 if table_bf16 else 4
    table_bytes = rows * 8 * Cp * itemsize
    K = max(1, -(-table_bytes // _GATHER_PIN_LIMIT_BYTES))
    if K > _GATHER_MAX_SEGMENTS:
        K = 1
    # segments align to whole table-row BANDS (seg a multiple of Wq) so
    # each segment builds directly from its image band (see
    # corner_gather_segments); bump K if the rounding pushes a segment
    # past the pin limit
    while True:
        seg = (-(-Ht // K)) * Wq
        if (seg * 8 * Cp * itemsize <= _GATHER_PIN_LIMIT_BYTES or K == 1
                or K >= _GATHER_MAX_SEGMENTS):
            break
        K += 1
    return K, seg, Cp, rows


def corner_gather_segments(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                           padding_mode: str, table_bf16: bool = False):
    """The gather HALF of ``corner_blend_wide``: per-view segmented
    VMEM-pinned gathers of the wide (2x4-window) table, with the
    segment merge, parity select, and bilinear blend LEFT TO THE
    CONSUMER — the fused render kernel does them on VMEM-resident
    blocks (ops/pallas/render.py v3 path), replacing the measured-slow
    XLA elementwise chain (select_convert 1.3 ms + blend 3.3 ms +
    slice 1.0 ms per view at 512×640).

    imgs: (V, H, W, C); x, y: (M, V) pixel coords. Returns
    ``(segs, blendw, K, seg, Cp)``:

    - segs: V*K arrays of (M, 8*Cp) gathered rows (table dtype),
      ordered view-major (view s segment k at index s*K + k)
    - blendw: (M, 4*V) f32 blend lanes, FIELD-major: tx lanes [0, V),
      ty [V, 2V), parity [2V, 3V) (0/1), row index [3V, 4V) (exact in
      f32 — rows < 2^24). In "zeros" mode four per-corner-axis validity
      fields append (0/1 from the UNCLAMPED integer corners, the torch
      zeros-padding contract): vx0 [4V, 5V), vx1, vy0, vy1 — (M, 8*V);
      consumers fold them into the blend weights (the table's zero ring
      only covers one-off corners)
    - K, seg: segment count / rows per segment; Cp: padded channels
    """
    V, H, W, _ = imgs.shape
    zero_pad = padding_mode == "zeros"
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    elif not zero_pad:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    SI, Cp, Ht, Wq = _wide_super_image(imgs, table_bf16)
    rows = Ht * Wq
    xp = jnp.clip(x0i, -1, W - 1) + 1
    yp = jnp.clip(y0i, -1, H - 1) + 1
    q = xp >> 1
    par = (xp & 1).astype(jnp.float32)
    row = yp * Wq + q                  # (M, V)

    K, seg, Cp2, rows2 = wide_table_segments(H, W, imgs.shape[-1],
                                             table_bf16)
    assert (Cp2, rows2) == (Cp, rows), "segmentation plan out of sync"
    Hseg = seg // Wq  # segments are whole table-row bands

    def band_table(s: int, a: int) -> jnp.ndarray:
        """Wide-table rows [a*Wq, (a+h)*Wq) of view s, built directly
        from the image band — each segment materializes ONCE at its
        natural (pinnable) size; the former monolithic-table pad +
        (V, K, seg, ·) reshape wrote the full ~50 MB table twice more
        (measured 1.3 ms/frame at 512×640)."""
        h = min(Hseg, Ht - a)
        t = jnp.concatenate([
            jax.lax.slice(SI, (s, a + dy, dq, 0),
                          (s + 1, a + dy + h, dq + Wq, 2 * Cp))
            for dy in (0, 1) for dq in (0, 1)], axis=-1)
        t = t.reshape(h * Wq, 8 * Cp)
        if h < Hseg:  # last band: pad to the static segment row count
            t = jnp.pad(t, ((0, (Hseg - h) * Wq), (0, 0)))
        return t

    segs = []
    for s in range(V):
        for k in range(K):
            if K == 1:
                segs.append(take_rows(band_table(s, 0), row[:, s]))
            else:
                segs.append(take_rows(
                    band_table(s, k * Hseg),
                    jnp.clip(row[:, s] - k * seg, 0, seg - 1)))
    fields = [tx, ty, par, row.astype(jnp.float32)]
    if zero_pad:
        fields += [
            ((x0i >= 0) & (x0i <= W - 1)).astype(jnp.float32),
            ((x0i + 1 >= 0) & (x0i + 1 <= W - 1)).astype(jnp.float32),
            ((y0i >= 0) & (y0i <= H - 1)).astype(jnp.float32),
            ((y0i + 1 >= 0) & (y0i + 1 <= H - 1)).astype(jnp.float32)]
    blendw = jnp.concatenate(fields, axis=-1)
    return segs, blendw, K, seg, Cp

# Tables too big to pin are split into up to this many pinnable row
# segments (each gathered over all rows with clamped indices, merged by
# in-range select — see corner_gather_perview). Each added segment costs
# one more full-M pinned gather (~0.6 ns/row measured), so past a few
# segments the single fused-table gather (~11 ns/row) wins again; the
# crossover is ~K=16, 8 leaves margin for less-coherent coords.
_GATHER_MAX_SEGMENTS = 8



def _blend_dot3(v: jnp.ndarray, w4: jnp.ndarray, Cp: int) -> jnp.ndarray:
    """Corner blend as two exact split-dot matmuls: out = Σ_c v_chunk_c ·
    w_c for v (M, 4*Cp) corner rows and w4 (M, 4) corner weights.

    The lane-chunk formulation (4 slices + mul-add) materializes every
    (M, Cp<=16) chunk at 128-lane physical width — measured 12 ms of
    4-tuple slice fusions + 9 ms of narrow multiply chains per train
    step at 512×640. Two dots against 0/1 constants (weights expanded
    to chunk lanes, weighted chunks summed) move the work to the MXU:
    exact via the 3-way bf16 split (every partial product against a 0/1
    weight is exact), and the dots' transposes keep the backward on the
    MXU too."""
    CEXP, SUMC = _blend_dot_consts(Cp)

    def dot3(x, P):
        hi = x.astype(jnp.bfloat16)
        r = x - hi.astype(jnp.float32)
        mid = r.astype(jnp.bfloat16)
        lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        Pb = P.astype(jnp.bfloat16)
        out = None
        for t in (hi, mid, lo):
            d = jax.lax.dot_general(t, Pb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = d if out is None else out + d
        return out

    wfull = dot3(w4, CEXP)                   # (M, 4*Cp)
    return dot3(v.astype(jnp.float32) * wfull, SUMC)


@functools.lru_cache(maxsize=None)
def _blend_dot_consts_np(Cp: int):
    CEXP = np.zeros((4, 4 * Cp), np.float32)
    SUMC = np.zeros((4 * Cp, Cp), np.float32)
    eye = np.eye(Cp, dtype=np.float32)
    for c in range(4):
        CEXP[c, c * Cp:(c + 1) * Cp] = 1.0
        SUMC[c * Cp:(c + 1) * Cp, :] = eye
    return CEXP, SUMC


def _blend_dot_consts(Cp: int):
    a, b = _blend_dot_consts_np(Cp)
    return jnp.asarray(a), jnp.asarray(b)


def _sample_2d_packed(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      padding_mode: str, view_last: bool,
                      table_bf16: bool = False) -> jnp.ndarray:
    """Shared core of the multi-view bilinear samplers: ONE flat row
    gather over per-view packed 2x2-block tables, corners blended on
    static lane slices of the flat (M, 4Cp) gather output.

    Folding the view axis into the row index (operand (V*rows, 4Cp),
    indices 1-D) matters on TPU: a vmapped ``take_rows`` becomes a
    *batched* gather, and the layout assigner gives its output a
    row-minormost layout (f32[rows,lanes]{0,1}) — measured 105.9 ms vs
    ~20 ms flat for the 2M-row render-stage gather at 512×640. Channels
    are padded so packed rows are 64-lane multiples (a 44-lane table was
    assigned a column-major {0,1} layout, degrading the gather emitter
    ~5x; the 64-lane one bitcasts to a natural row-major layout). The
    flat blend keeps 5-D corner-unpack views (≈25 ms of relayout copies
    at render shapes) out of the program, and the dot pins row-major
    layouts on the gather result.

    view_last: coords (..., V) → (..., V, C) — index order makes the
    gather's natural row-major result exactly the IBR head's layout.
    Else coords (V, ...) → (V, ..., C).
    """
    out_dtype = imgs.dtype
    V, H, W, C = imgs.shape
    Cp_probe = -(-C // 16) * 16
    itemsize = 2 if table_bf16 else 4
    table_bytes = (H + 1) * (W + 1) * 4 * Cp_probe * itemsize
    if V > 1 and table_bytes > _GATHER_PIN_LIMIT_BYTES:
        # oversized per-view tables: SEGMENTED pinned gathers with a
        # single-scatter backward (take_rows_segmented) — the train
        # program's 512×640 level-1 render gather (42 MB bf16 table)
        # measured 21.1 ms against the fused 3-view table vs ~6 ms
        # segmented; the backward stays one scatter-add per view
        K = int(-(-table_bytes // _GATHER_PIN_LIMIT_BYTES))
        if K <= _GATHER_MAX_SEGMENTS:
            return _sample_2d_perview(imgs, x, y, padding_mode, view_last,
                                      table_bf16, out_dtype, segments=K)
    if V > 1 and table_bytes <= _GATHER_PIN_LIMIT_BYTES:
        # PER-VIEW pinned gathers (static loop, like the fused kernels'
        # corner_gather_perview): each view's packed table fits the
        # scoped-VMEM pin threshold where the gather emitter runs
        # ~5-10x faster than against one fused HBM-resident table
        # (measured 10 ns/row fused vs ~2 ns pinned at the 512×640
        # train shapes — and the backward scatter-adds split per view
        # the same way). Each view blends IMMEDIATELY on its own
        # natural-layout gather output (lane chunks), and only the
        # narrow blended (Mv, Cp) results are stacked — the interleave
        # stack of raw corner rows would invite the row-minormost
        # layout pathology (105 ms, see docstring).
        return _sample_2d_perview(imgs, x, y, padding_mode, view_last,
                                  table_bf16, out_dtype)
    v, (w00, w01, w10, w11), Cp = corner_rows_2d(imgs, x, y, padding_mode,
                                                 view_last, table_bf16)
    w4 = jnp.stack([w00.reshape(-1), w01.reshape(-1),
                    w10.reshape(-1), w11.reshape(-1)], axis=-1)
    out = _blend_dot3(v, w4, Cp)
    if Cp != C:
        out = jax.lax.slice_in_dim(out, 0, C, axis=1)
    return out.reshape(x.shape + (C,)).astype(out_dtype)


def _sample_2d_perview(imgs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                       padding_mode: str, view_last: bool,
                       table_bf16: bool, out_dtype,
                       segments: int = 1) -> jnp.ndarray:
    """Per-view pinned-gather variant of ``_sample_2d_packed`` (see the
    size gate there). Identical math — the blend runs on the same lane
    chunks with the same weights, just view-by-view. ``segments > 1``:
    the per-view table exceeds the pin threshold; gather it as K
    pinnable row segments (take_rows_segmented)."""
    V, H, W, C = imgs.shape
    outs = []
    for s in range(V):
        if view_last:
            xs, ys = x[..., s], y[..., s]
        else:
            xs, ys = x[s], y[s]
        v, (w00, w01, w10, w11), Cp = corner_rows_2d(
            imgs[s:s + 1], xs[None], ys[None], padding_mode,
            view_last=False, table_bf16=table_bf16, segments=segments)
        w4 = jnp.stack([w00.reshape(-1), w01.reshape(-1),
                        w10.reshape(-1), w11.reshape(-1)], axis=-1)
        out = _blend_dot3(v, w4, Cp)
        if Cp != C:
            out = jax.lax.slice_in_dim(out, 0, C, axis=1)
        outs.append(out)
    stacked = jnp.stack(outs, axis=1 if view_last else 0)
    return stacked.reshape(x.shape + (C,)).astype(out_dtype)


def bilinear_sample_2d_multi(imgs: jnp.ndarray, x: jnp.ndarray,
                             y: jnp.ndarray,
                             padding_mode: str = "zeros",
                             table_bf16: bool = False) -> jnp.ndarray:
    """Batched bilinear sampling with ONE flat row gather.

    imgs: (V, H, W, C); x, y: (V, ...) pixel coords → (V, ..., C).
    See ``_sample_2d_packed``.
    """
    return _sample_2d_packed(imgs, x, y, padding_mode, view_last=False,
                             table_bf16=table_bf16)


def bilinear_sample_2d_view_last(imgs: jnp.ndarray, x: jnp.ndarray,
                                 y: jnp.ndarray,
                                 padding_mode: str = "zeros",
                                 table_bf16: bool = False) -> jnp.ndarray:
    """Like ``bilinear_sample_2d_multi`` but coords are (..., V) with the
    image/view axis LAST, returning (..., V, C) — the IBR-head layout.
    See ``_sample_2d_packed``.
    """
    return _sample_2d_packed(imgs, x, y, padding_mode, view_last=True,
                             table_bf16=table_bf16)


# ---------------------------------------------------------------------------
# Flat corner blending
# ---------------------------------------------------------------------------


def _lane_chunk(v2d: jnp.ndarray, k: int, Cp: int) -> jnp.ndarray:
    """Static lane slice [k*Cp, (k+1)*Cp) of the flat (M, K*Cp) gather
    output — layout-preserving ({1,0} T(8,128)), unlike a reshape to
    (M, K, Cp) whose corner views get hostile tilings (measured ~25 ms
    of relayout copies + a 64-step serial while-loop at render shapes
    when blended via reshape or a selection matmul)."""
    return jax.lax.slice_in_dim(v2d, k * Cp, (k + 1) * Cp, axis=1)


def _pad_channels(a: jnp.ndarray, mult: int = 16) -> jnp.ndarray:
    C = a.shape[-1]
    Cp = -(-C // mult) * mult
    if Cp == C:
        return a
    return jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, Cp - C),))


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """torch-compatible grid_sample, align_corners=True.

    img: (H, W, C); grid: (..., 2) normalized coords in [-1, 1],
    grid[..., 0] indexes W, grid[..., 1] indexes H. Returns (..., C).
    """
    H, W, _ = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    return bilinear_sample_2d(img, x, y, padding_mode)


def _gather_3d(vol_flat, xi, yi, zi, W, H, D, zero_pad):
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    zc = jnp.clip(zi, 0, D - 1)
    v = take_rows(vol_flat, (zc * H + yc) * W + xc)
    if zero_pad:
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
               & (zi >= 0) & (zi <= D - 1))
        v = v * inb[..., None].astype(v.dtype)
    return v


def _pack_blocks_3d(vol: jnp.ndarray):
    """(D, H, W, C) -> ((D+1)*(H+1)*(W+1), 8C): dense stride-1 2x2x2
    block table of the 1-zero-padded volume, lanes (dz, dy, dx)-major
    (see _pack_blocks_2d)."""
    D, H, W, C = vol.shape
    Dt, Ht, Wt = D + 1, H + 1, W + 1
    P = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    tbl = jnp.concatenate([
        jax.lax.slice(P, (dz, dy, dx, 0), (dz + Dt, dy + Ht, dx + Wt, C))
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], axis=-1)
    return tbl.reshape(Dt * Ht * Wt, 8 * C), Dt, Ht, Wt


def _packed_corners_3d(packed, Dt, Ht, Wt, x0i, y0i, z0i, W, H, D):
    xp = jnp.clip(x0i, -1, W - 1) + 1
    yp = jnp.clip(y0i, -1, H - 1) + 1
    zp = jnp.clip(z0i, -1, D - 1) + 1
    row = (zp * Ht + yp) * Wt + xp
    v = take_rows(packed, row)
    C8 = packed.shape[-1]
    return v.reshape(v.shape[:-1] + (2, 2, 2, C8 // 8))


def trilinear_sample_3d(vol: jnp.ndarray, x, y, z,
                        padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``vol (D, H, W, C)`` at float coords x (W-axis), y (H-axis),
    z (D-axis), torch grid_sample-3D align_corners=True semantics."""
    D, H, W, C = vol.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        z = jnp.clip(z, 0.0, D - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    tx = (x - x0)[..., None]; ty = (y - y0)[..., None]; tz = (z - z0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)

    # bf16 row-gathers: same serial-lowering hazard as 2D — gather in f32
    out_dtype = vol.dtype
    if vol.dtype == jnp.bfloat16:
        vol = jax.lax.optimization_barrier(vol.astype(jnp.float32))
        tx = tx.astype(jnp.float32)
        ty = ty.astype(jnp.float32)
        tz = tz.astype(jnp.float32)

    packed, D2, H2, W2 = _pack_blocks_3d(vol)
    v = _packed_corners_3d(packed, D2, H2, W2, x0i, y0i, z0i, W, H, D)
    corners = {(dz, dy, dx): v[..., dz, dy, dx, :]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)}
    if zero_pad:
        def m(xi, yi, zi):
            inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                   & (zi >= 0) & (zi <= D - 1))
            return inb[..., None].astype(v.dtype)

        corners = {(dz, dy, dx): c * m(x0i + dx, y0i + dy, z0i + dz)
                   for (dz, dy, dx), c in corners.items()}

    c00 = corners[0, 0, 0] * (1 - tx) + corners[0, 0, 1] * tx
    c01 = corners[0, 1, 0] * (1 - tx) + corners[0, 1, 1] * tx
    c10 = corners[1, 0, 0] * (1 - tx) + corners[1, 0, 1] * tx
    c11 = corners[1, 1, 0] * (1 - tx) + corners[1, 1, 1] * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return (c0 * (1 - tz) + c1 * tz).astype(out_dtype)


def trilinear_sample_3d_multi(vols: jnp.ndarray, x, y, z,
                              padding_mode: str = "zeros") -> jnp.ndarray:
    """Batched trilinear sampling with ONE flat row gather.

    vols: (V, D, H, W, C); x, y, z: (V, ...) → (V, ..., C). Same
    flat-gather rationale as ``bilinear_sample_2d_multi``.
    """
    V, D, H, W, C = vols.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        z = jnp.clip(z, 0.0, D - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    tx = x - x0; ty = y - y0; tz = z - z0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)

    out_dtype = vols.dtype
    if vols.dtype == jnp.bfloat16:
        vols = jax.lax.optimization_barrier(vols.astype(jnp.float32))
        tx = tx.astype(jnp.float32)
        ty = ty.astype(jnp.float32)
        tz = tz.astype(jnp.float32)

    vols = _pad_channels(vols, mult=8)  # 8*Cp-lane packed rows
    Cp = vols.shape[-1]
    Dt, Ht, Wt = D + 1, H + 1, W + 1
    packed = jax.vmap(lambda vv: _pack_blocks_3d(vv)[0])(vols)
    rows_per_vol = packed.shape[1]  # Dt*Ht*Wt
    flat = packed.reshape(V * rows_per_vol, 8 * Cp)

    xp = jnp.clip(x0i, -1, W - 1) + 1
    yp = jnp.clip(y0i, -1, H - 1) + 1
    zp = jnp.clip(z0i, -1, D - 1) + 1
    row = (zp * Ht + yp) * Wt + xp
    voff = jnp.arange(V, dtype=jnp.int32).reshape(
        (V,) + (1,) * (row.ndim - 1)) * rows_per_vol
    idx = (row + voff).reshape(-1)

    v = take_rows(flat, idx)  # (M, 8*Cp), corner-major lanes

    # per-axis lerp weights x zero-pad validity on static lane slices
    # (see _lane_chunk); packed corner order (dz, dy, dx) = 000..111
    ux0, ux1 = 1.0 - tx, tx
    uy0, uy1 = 1.0 - ty, ty
    uz0, uz1 = 1.0 - tz, tz
    if zero_pad:
        ux0 = ux0 * ((x0i >= 0) & (x0i <= W - 1))
        ux1 = ux1 * ((x0i + 1 >= 0) & (x0i + 1 <= W - 1))
        uy0 = uy0 * ((y0i >= 0) & (y0i <= H - 1))
        uy1 = uy1 * ((y0i + 1 >= 0) & (y0i + 1 <= H - 1))
        uz0 = uz0 * ((z0i >= 0) & (z0i <= D - 1))
        uz1 = uz1 * ((z0i + 1 >= 0) & (z0i + 1 <= D - 1))
    ux0 = ux0.reshape(-1, 1); ux1 = ux1.reshape(-1, 1)
    uy0 = uy0.reshape(-1, 1); uy1 = uy1.reshape(-1, 1)
    uz0 = uz0.reshape(-1, 1); uz1 = uz1.reshape(-1, 1)

    c00 = _lane_chunk(v, 0, Cp) * ux0 + _lane_chunk(v, 1, Cp) * ux1
    c01 = _lane_chunk(v, 2, Cp) * ux0 + _lane_chunk(v, 3, Cp) * ux1
    c10 = _lane_chunk(v, 4, Cp) * ux0 + _lane_chunk(v, 5, Cp) * ux1
    c11 = _lane_chunk(v, 6, Cp) * ux0 + _lane_chunk(v, 7, Cp) * ux1
    c0 = c00 * uy0 + c01 * uy1
    c1 = c10 * uy0 + c11 * uy1
    out = c0 * uz0 + c1 * uz1
    if Cp != C:
        out = jax.lax.slice_in_dim(out, 0, C, axis=1)
    return out.reshape(x.shape + (C,)).astype(out_dtype)


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """torch grid_sample 3D, align_corners=True. vol (D, H, W, C);
    grid (..., 3) normalized, [x (W), y (H), z (D)]. Returns (..., C)."""
    D, H, W, _ = vol.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    z = (grid[..., 2] + 1.0) * 0.5 * (D - 1)
    return trilinear_sample_3d(vol, x, y, z, padding_mode)


# ---------------------------------------------------------------------------
# Resize (F.interpolate parity) — static interpolation matrices on the MXU
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) bilinear matrix, align_corners=True."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        A[0, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        t = src - i0
        A[o, i0] += 1.0 - t
        A[o, i1] += t
    return A


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') index map (floor(o * in/out))."""
    return np.minimum((np.arange(out_size) * (in_size / out_size)).astype(np.int64),
                      in_size - 1)


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (F.interpolate parity).

    img: (..., H, W, C) → (..., H_out, W_out, C). Runs as two small dense
    matmuls (MXU-friendly) instead of gathers.
    """
    H_out, W_out = out_hw
    H_in, W_in = img.shape[-3], img.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return img
    Ah = jnp.asarray(_interp_matrix(H_in, H_out), dtype=img.dtype)
    Aw = jnp.asarray(_interp_matrix(W_in, W_out), dtype=img.dtype)
    # HIGHEST precision: these matmuls are tiny, and depth/std resampling
    # feeds the cascade — bf16 default matmul precision costs PSNR.
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,...hwc->...owc", Ah, img, precision=hp)
    out = jnp.einsum("pw,...owc->...opc", Aw, out, precision=hp)
    return out


def resize_trilinear(vol: jnp.ndarray, out_dhw: Tuple[int, int, int]
                     ) -> jnp.ndarray:
    """Trilinear resize with align_corners=True (F.interpolate
    mode='trilinear' parity; used by the alt MinCostRegNet,
    reference cost_reg_net_.py:85-87).

    vol: (..., D, H, W, C) → (..., D_out, H_out, W_out, C).
    """
    D_out, H_out, W_out = out_dhw
    D_in, H_in, W_in = vol.shape[-4], vol.shape[-3], vol.shape[-2]
    if (D_in, H_in, W_in) == (D_out, H_out, W_out):
        return vol
    Ad = jnp.asarray(_interp_matrix(D_in, D_out), dtype=vol.dtype)
    Ah = jnp.asarray(_interp_matrix(H_in, H_out), dtype=vol.dtype)
    Aw = jnp.asarray(_interp_matrix(W_in, W_out), dtype=vol.dtype)
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("od,...dhwc->...ohwc", Ad, vol, precision=hp)
    out = jnp.einsum("ph,...ohwc->...opwc", Ah, out, precision=hp)
    out = jnp.einsum("qw,...opwc->...opqc", Aw, out, precision=hp)
    return out


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize (cv2.INTER_NEAREST / F.interpolate nearest)."""
    H_out, W_out = out_hw
    H_in, W_in = img.shape[-3], img.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return img
    iy = jnp.asarray(_nearest_index(H_in, H_out))
    ix = jnp.asarray(_nearest_index(W_in, W_out))
    return img[..., iy, :, :][..., :, ix, :]


def scale_size(size: int, scale: float) -> int:
    """torch recompute_scale_factor output-size rule: floor(in * scale)."""
    return int(np.floor(size * scale))
