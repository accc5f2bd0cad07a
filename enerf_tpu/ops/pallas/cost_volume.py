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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
                          tile: int = 2048) -> jnp.ndarray:
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
        ],
        out_specs=pl.BlockSpec((tile, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, Cp), out_dtype),
    )(*v_args, w12, vmask.reshape(S))


def volume_tile(n: int, *, S: int, C: int, v_bytes: int,
                out_bytes: int = 4) -> int:
    """Tile size for the fused variance kernel, chosen from the scoped-
    VMEM budget (0 = no fit — caller falls back to the jnp path). See
    ops/pallas/__init__.py ``fused_vmem_tile`` for the budget model."""
    from enerf_tpu.ops.pallas import fused_vmem_tile

    Cp = -(-C // 16) * 16
    per_row = S * 4 * Cp * v_bytes + S * 4 * 4 + Cp * out_bytes
    return fused_vmem_tile(
        n, out_lanes=Cp * out_bytes // 4,
        block_bytes_per_row=per_row,
        # ~6 live (T, Cp) f32 temps per view pass; far below the render
        # kernel's 20 KB/row
        interm_bytes_per_row=8 * max(Cp, 32) * 4)
