"""Pallas TPU kernel: fused corner blend + masked cross-view variance.

The plane-sweep warp (reference lib/networks/enerf/utils.py:57-95
homo_warp + :322-349 build_feature_volume) lowers here to one corner-row
gather PER VIEW (ops/sampling.py corner_gather_perview — per-view packed
tables pin into scoped VMEM, ~5x faster than one fused-table gather)
followed by this kernel: bilinear corner blending and the Σ/Σ² variance
accumulation over source views happen in a single VMEM-resident pass
over the gather output.

Why: as separate XLA ops the post-gather stage reads/writes the
(S, D·H·W, 4·Cp) corner tensor and the (S, D, H, W, C) warped volume
through HBM several times in hostile layouts (~6+ ms at the 512×640
level-1 shape); this kernel reads the corner rows once — in bf16 when
the gather table is bf16-quantized (gather_bf16), converting in-VMEM so
no materialized f32 copy exists — and writes only the (D, H, W, C)
variance volume.

Eval-only (no autodiff rule); train mode keeps the differentiable jnp
path (ops/warp.py). Numerics match `_masked_variance` over the jnp
corner blend to fp-reassociation tolerance (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _variance_kernel_fast(*refs, S: int, Cp: int, stacked: bool = False):
    """fast_const variant: the corner blend and the masked cross-view
    Σ/Σ² run as single-pass bf16 MXU matmuls on full-width rows instead
    of ~45 lane-starved VPU ops per row (a VPU op on (T, 16) costs the
    same T/8 cycles as one on (T, 128) — measured 3.6 ms at the 512×640
    level-1 shape for the VPU path). Rounds blend weights and blended
    features to bf16 (the tables already are at the bf16 rungs)."""
    from enerf_tpu.ops.pallas.render import _mm1

    if stacked:
        v_all, refs = refs[0], refs[1:]
        vb = jnp.concatenate([v_all[s] for s in range(S)], axis=1)
    else:
        v_refs, refs = refs[:S], refs[S:]
        vb = jnp.concatenate([r[:] for r in v_refs], axis=1)  # (T, S*4Cp)
    w_ref, m_ref, CEXP, SUMCORN, SELM, out_ref = refs
    cnt = m_ref[0]
    for s in range(1, S):
        cnt = cnt + m_ref[s]
    cnt = jnp.maximum(cnt, 1.0)

    # lane (c*S+s) of w -> chunk (s*4+c) of vb; blend = Σ_c w_c · corner_c
    wfull = _mm1(w_ref[:], CEXP[:])                 # (T, S*4Cp)
    f_all = _mm1(vb.astype(jnp.float32) * wfull, SUMCORN[:])  # (T, S*Cp)
    acc = _mm1(f_all, SELM[:])                      # masked Σ over views
    acc2 = _mm1(f_all * f_all, SELM[:])
    mean = acc / cnt
    out_ref[:] = (acc2 / cnt - mean * mean).astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _corner_consts_np(S: int, Cp: int):
    CEXP = np.zeros((4 * S, S * 4 * Cp), np.float32)
    SUMCORN = np.zeros((S * 4 * Cp, S * Cp), np.float32)
    eye = np.eye(Cp, dtype=np.float32)
    for s in range(S):
        for c in range(4):
            chunk = s * 4 + c
            CEXP[c * S + s, chunk * Cp:(chunk + 1) * Cp] = 1.0
            SUMCORN[chunk * Cp:(chunk + 1) * Cp,
                    s * Cp:(s + 1) * Cp] = eye
    return CEXP, SUMCORN


def _variance_kernel(*refs, S: int, Cp: int, stacked: bool = False):
    # corner rows: ONE stacked (S, T, 4Cp) operand (fused-table gather,
    # read in place) or S per-view (T, 4Cp) operands (pinned tables)
    if stacked:
        v_all = refs[0]
        refs = refs[1:]

        def vrow(s):
            return v_all[s]
    else:
        v_refs = refs[:S]
        refs = refs[S:]

        def vrow(s):
            return v_refs[s][:]
    w_ref, m_ref, out_ref = refs
    # m_ref lives in SMEM and is read as true scalars: a (1, 1) VMEM
    # slice broadcast against a (T, C) vector needs a both-axis vector
    # broadcast, which newer Mosaic versions reject ("Broadcast in both
    # sublanes and lanes"); scalar * vector splats are always supported
    cnt = m_ref[0]
    for s in range(1, S):
        cnt = cnt + m_ref[s]
    cnt = jnp.maximum(cnt, 1.0)

    acc = None
    acc2 = None
    for s in range(S):
        vb = vrow(s).astype(jnp.float32)          # (T, 4*Cp)
        # corner weights: lanes corner-major / view-minor (T, 4S)
        f = (vb[:, 0:Cp] * w_ref[:, s:s + 1]
             + vb[:, Cp:2 * Cp] * w_ref[:, S + s:S + s + 1]
             + vb[:, 2 * Cp:3 * Cp] * w_ref[:, 2 * S + s:2 * S + s + 1]
             + vb[:, 3 * Cp:4 * Cp] * w_ref[:, 3 * S + s:3 * S + s + 1])
        ms = m_ref[s]                             # scalar splat
        acc = f * ms if acc is None else acc + f * ms
        ff = f * f
        acc2 = ff * ms if acc2 is None else acc2 + ff * ms

    mean = acc / cnt
    out_ref[:] = (acc2 / cnt - mean * mean).astype(out_ref.dtype)


def fused_corner_variance(vs, w12: jnp.ndarray,
                          vmask: jnp.ndarray, out_dtype,
                          tile: int = 2048,
                          fast_const: bool = False) -> jnp.ndarray:
    """Variance volume from corner rows, one batch item.

    vs: corner rows (f32 or bf16 — converted in-VMEM): an S-tuple of
    per-view (P, 4*Cp) arrays (separate operands keep the upstream
    gathers per-view so their tables pin into scoped VMEM) or ONE
    stacked (S, P, 4*Cp) array (fused-table gather output, read in
    place — per-view XLA slices would materialize S full copies);
    w12: (P, 4*S) f32 corner weights (lerp × zero-pad validity), lanes
    corner-major / view-minor; vmask: (S, 1) f32 — 1 for valid views, 0
    for padding (scalars, SMEM). Returns (P, Cp) variance in
    ``out_dtype``. P must divide by ``tile`` (callers pick a divisor or
    fall back to the jnp path).
    """
    stacked = not isinstance(vs, tuple)
    if stacked:
        S, P, C4 = vs.shape
        v_args = (vs,)
        v_specs = [pl.BlockSpec((S, tile, C4), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]
    else:
        S = len(vs)
        P, C4 = vs[0].shape
        v_args = tuple(vs)
        v_specs = [pl.BlockSpec((tile, C4), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(S)]
    Cp = C4 // 4
    assert P % tile == 0, (P, tile)

    extra_args = ()
    extra_specs = []
    if fast_const:
        kern = functools.partial(_variance_kernel_fast, S=S, Cp=Cp,
                                 stacked=stacked)
        CEXP, SUMCORN = _corner_consts_np(S, Cp)
        # masked view-sum selection (0/1 — the mask is 0/1): bf16-exact
        m = vmask.reshape(S).astype(jnp.float32)
        eye = jnp.eye(Cp, dtype=jnp.float32)
        SELM = jnp.concatenate([eye * m[s] for s in range(S)], axis=0)
        extra_args = (jnp.asarray(CEXP), jnp.asarray(SUMCORN), SELM)
        extra_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM) for a in extra_args]
    else:
        kern = functools.partial(_variance_kernel, S=S, Cp=Cp,
                                 stacked=stacked)
    return pl.pallas_call(
        kern,
        grid=(P // tile,),
        in_specs=v_specs + [
            pl.BlockSpec((tile, 4 * S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((tile, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, Cp), out_dtype),
    )(*v_args, w12, vmask.reshape(S), *extra_args)


def volume_tile(n: int, *, S: int, C: int, v_bytes: int,
                out_bytes: int = 4, fast_const: bool = False) -> int:
    """Tile size for the fused variance kernel, chosen from the scoped-
    VMEM budget (0 = no fit — caller falls back to the jnp path). See
    ops/pallas/__init__.py ``fused_vmem_tile`` for the budget model."""
    from enerf_tpu.ops.pallas import fused_vmem_tile

    Cp = -(-C // 16) * 16
    per_row = S * 4 * Cp * v_bytes + S * 4 * 4 + Cp * out_bytes
    if fast_const:
        # full-width temps: vb concat (S*4Cp bf16) + wfull/prod f32 +
        # f_all/f_all² (S*Cp f32)
        interm = S * 4 * Cp * (2 + 4 + 4) + 2 * S * Cp * 4
    else:
        # ~6 live (T, Cp) f32 temps per view pass; far below the render
        # kernel's 20 KB/row
        interm = 8 * max(Cp, 32) * 4
    return fused_vmem_tile(
        n, out_lanes=Cp * out_bytes // 4,
        block_bytes_per_row=per_row,
        interm_bytes_per_row=interm)


# ---------------------------------------------------------------------------
# Wide-table (2x4-window) variant: the warp gathers run against the
# HALF-SIZE wide tables (128 logical lanes/row at Cp=16 — physical ==
# logical, vs the 2x2 format's 64-of-128 padding) and the segment merge
# + parity select + bilinear blend + variance all run in THIS kernel on
# VMEM-resident rows — the same v3/v5 design the render stage uses
# (ops/pallas/render.py). Replaces ~2.2 ms of 2x2-table build copies +
# the separate w12 concat at the 512×640 level-1 shape. Zeros padding
# via the per-corner-axis validity lanes corner_gather_segments appends
# in "zeros" mode.
# ---------------------------------------------------------------------------


def _variance_kernel_wide(*refs, S: int, Cp: int, K: int, seg_rows: int,
                          fast_const: bool):
    from enerf_tpu.ops.pallas.render import _mmc

    _mm = _mmc(fast_const)
    seg_refs = refs[:S * K]
    w_ref, m_ref, C6S, SUMC_S, SELM, out_ref = refs[S * K:]

    cnt = m_ref[0]
    for s in range(1, S):
        cnt = cnt + m_ref[s]
    cnt = jnp.maximum(cnt, 1.0)

    w = w_ref[:]
    tx = w[:, 0:S]
    ty = w[:, S:2 * S]
    par = w[:, 2 * S:3 * S]
    rowf = w[:, 3 * S:4 * S]
    vx0 = w[:, 4 * S:5 * S]
    vx1 = w[:, 5 * S:6 * S]
    vy0 = w[:, 6 * S:7 * S]
    vy1 = w[:, 7 * S:8 * S]

    merged = []
    for s in range(S):
        g = seg_refs[s * K][:]
        if K > 1:
            rf = rowf[:, s:s + 1]
            for kk in range(1, K):
                g = jnp.where(rf >= kk * seg_rows, seg_refs[s * K + kk][:], g)
        merged.append(g)
    mf = jnp.concatenate(merged, axis=1).astype(jnp.float32)  # (T, S*8Cp)

    # blend weights with zeros-padding validity folded per corner axis
    # (chunk u holds pixel 2q+u; x0 at u=par, x0+1 at par+1)
    a0v = (1.0 - tx) * vx0
    txv = tx * vx1
    wx0 = (1.0 - par) * a0v
    wx1 = par * a0v + (1.0 - par) * txv
    wx2 = par * txv
    u0 = (1.0 - ty) * vy0
    u1 = ty * vy1
    w6 = jnp.concatenate(
        [u0 * wx0, u0 * wx1, u0 * wx2,
         u1 * wx0, u1 * wx1, u1 * wx2], axis=1)       # (T, 6S)
    wfull = _mm(w6, C6S[:])                           # (T, S*8Cp)
    f_all = _mm(mf * wfull, SUMC_S[:])                # (T, S*Cp)
    acc = _mm(f_all, SELM[:])                         # masked view sums
    acc2 = _mm(f_all * f_all, SELM[:])
    mean = acc / cnt
    out_ref[:] = (acc2 / cnt - mean * mean).astype(out_ref.dtype)


def fused_wide_variance(segs, blendw: jnp.ndarray, vmask: jnp.ndarray,
                        out_dtype, *, S: int, Cp: int, K: int,
                        seg_rows: int, tile: int,
                        fast_const: bool = False) -> jnp.ndarray:
    """Variance volume from WIDE-table gather rows, one batch item.

    segs: S*K arrays (M, 8*Cp) (view-major, from
    ``corner_gather_segments(..., padding_mode="zeros")``); blendw:
    (M, 8*S) f32 blend + validity lanes (field-major, see
    corner_gather_segments); vmask: (S,) 0/1. Returns (M, Cp) variance.
    """
    from enerf_tpu.ops.pallas.render import blend_consts

    M = segs[0].shape[0]
    assert M % tile == 0, (M, tile)
    C6S, SUMC_S = blend_consts(S, Cp)
    m = vmask.reshape(S).astype(jnp.float32)
    eye = jnp.eye(Cp, dtype=jnp.float32)
    SELM = jnp.concatenate([eye * m[s] for s in range(S)], axis=0)

    kern = functools.partial(_variance_kernel_wide, S=S, Cp=Cp, K=K,
                             seg_rows=seg_rows, fast_const=fast_const)
    seg_specs = [pl.BlockSpec((tile, 8 * Cp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for _ in segs]
    const_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for a in (C6S, SUMC_S, SELM)]
    return pl.pallas_call(
        kern,
        grid=(M // tile,),
        in_specs=seg_specs + [
            pl.BlockSpec((tile, 8 * S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((tile, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Cp), out_dtype),
    )(*segs, blendw, vmask.reshape(S), C6S, SUMC_S, SELM)


def volume_tile_wide(n: int, *, S: int, C: int, K: int, v_bytes: int,
                     out_bytes: int = 4) -> int:
    """Tile size for ``fused_wide_variance`` from the scoped-VMEM budget
    (0 = no fit)."""
    from enerf_tpu.ops.pallas import fused_vmem_tile

    Cp = -(-C // 16) * 16
    per_row = S * K * 8 * Cp * v_bytes + 8 * S * 4 + Cp * out_bytes
    # temps: mf concat (S*8Cp f32) + wfull + products + f_all
    interm = S * 8 * Cp * (4 + 4 + 4) + 2 * S * Cp * 4
    return fused_vmem_tile(
        n, out_lanes=Cp * out_bytes // 4,
        block_bytes_per_row=per_row,
        interm_bytes_per_row=interm)
