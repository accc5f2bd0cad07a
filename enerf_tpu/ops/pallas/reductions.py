"""Pallas TPU kernel: fused depth-regression moments (softmax +
expectation + central moment over the plane axis in one VMEM-resident
pass). Measured 2.6× faster than the XLA lowering on a v5e at the
level-0 bench shape (18 µs vs 46 µs); numerics match ops/depth.py
exactly (tested).

Negative results, measured and documented (SURVEY.md §7 step 9 asked for
a fused warp+variance kernel):
- plane-sweep warp: TPU has no hardware gather; XLA already fuses the
  bilinear gather into the variance accumulation without materializing
  the (S, D, H, W, C) intermediate (cost-volume stage = 0.17 ms at bench
  shape, below the 0.23 ms HBM cost of materializing it). A Pallas warp
  would need per-pixel serial reads or one-hot MXU matmuls — both lose.
- standalone cross-view variance: a Pallas version measured 3.4 ms vs
  0.68 ms for the XLA lowering at (4, 7.9M, 32) — and has no call site,
  since the in-model variance is consumed fused. Removed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# depth regression: logits (D, P), values (D, P) → (depth (P,), std (P,))
# fused softmax + expectation + central moment (jnp path ops/depth.py:94)
# ---------------------------------------------------------------------------

def _depth_reg_kernel(logits_ref, values_ref, depth_ref, std_ref, *,
                      depth_inv: bool):
    # moments in f32 regardless of the network dtype: bf16 softmax +
    # central moments lose the depth-interval precision the cascade's
    # level-1 volume is built from
    logits = logits_ref[:].astype(jnp.float32)   # (D, TP)
    values = values_ref[:].astype(jnp.float32)
    if depth_inv:
        values = 1.0 / jnp.maximum(values, 1e-6)
    mx = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - mx)
    z = jnp.sum(e, axis=0, keepdims=True)
    prob = e / z
    depth = jnp.sum(prob * values, axis=0, keepdims=True)  # (1, TP)
    var = jnp.sum(prob * (values - depth) ** 2, axis=0, keepdims=True)
    depth_ref[:] = depth.astype(depth_ref.dtype)
    std_ref[:] = jnp.sqrt(jnp.maximum(var, 1e-10)).astype(std_ref.dtype)


def depth_regression_pallas(depth_logits: jnp.ndarray,
                            depth_values: jnp.ndarray, depth_inv: bool,
                            tile_p: int = 2048
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, D, H, W) logits/values → (B, H, W) depth + std, one fused pass.

    Numerics identical to ``enerf_tpu.ops.depth.depth_regression``.
    """
    B, D, H, W = depth_logits.shape
    P = H * W
    logits = _pad_to(depth_logits.reshape(B, D, P), 2, tile_p)
    values = _pad_to(depth_values.reshape(B, D, P), 2, tile_p)
    Pp = logits.shape[2]

    kern = functools.partial(_depth_reg_kernel, depth_inv=depth_inv)

    def one(logits_b, values_b):
        return pl.pallas_call(
            kern,
            grid=(Pp // tile_p,),
            in_specs=[
                pl.BlockSpec((D, tile_p), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, tile_p), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile_p), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((1, Pp), depth_logits.dtype),
                       jax.ShapeDtypeStruct((1, Pp), depth_logits.dtype)),
        )(logits_b, values_b)

    depth, std = jax.vmap(one)(logits, values)
    return (depth.reshape(B, Pp)[:, :P].reshape(B, H, W),
            std.reshape(B, Pp)[:, :P].reshape(B, H, W))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depth_regression_fused(depth_logits, depth_values, depth_inv: bool):
    """Differentiable wrapper: Pallas kernel forward, jnp backward.

    Pallas kernels have no autodiff rule; the backward pass runs jax.vjp
    over the jnp reference implementation (recompute — the same
    rematerialization XLA's autodiff would do), so training gradients are
    identical to the non-Pallas path."""
    return depth_regression_pallas(depth_logits, depth_values, depth_inv)


def _fused_fwd(depth_logits, depth_values, depth_inv):
    out = depth_regression_pallas(depth_logits, depth_values, depth_inv)
    return out, (depth_logits, depth_values)


def _fused_bwd(depth_inv, res, g):
    from enerf_tpu.ops.depth import depth_regression

    depth_logits, depth_values = res
    _, vjp = jax.vjp(
        lambda l, v: depth_regression(l, v, depth_inv, use_pallas=False),
        depth_logits, depth_values)
    return vjp(g)


depth_regression_fused.defvjp(_fused_fwd, _fused_bwd)
