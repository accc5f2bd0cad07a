"""3D cost-volume regularization U-Nets
(reference lib/networks/enerf/cost_reg_net.py:4-86).

NDHWC layout: input variance volume (B, D, H, W, C). Encoder 8→16→32(→64),
transposed-conv decoder with skip adds; heads: feat_conv (8ch feature
volume) and depth_conv (1ch depth logits). MinCostRegNet drops the deepest
stage and is used at cascade level 0 (reference network.py:16-19).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.models.layers import (
    ConvBnReLU3D,
    ConvTransposeBn,
    torch_conv_kernel_init,
)


class _ConvKernel(nn.Module):
    """Bare 3x3x3 conv kernel parameter at the same tree path / layout /
    init as ``nn.Conv(features, (3,3,3), name=...)`` would create — the
    heads below fetch both kernels and run ONE conv."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int) -> jnp.ndarray:
        return self.param("kernel", torch_conv_kernel_init,
                          (3, 3, 3, in_ch, self.features), jnp.float32)


def _dual_head(x, kf: jnp.ndarray, kd: jnp.ndarray, dtype):
    """feat_conv (8ch) + depth_conv (1ch) heads (reference
    cost_reg_net.py:30-33) as ONE lane-concatenated conv: a Cout=1 3D
    conv lowers terribly on the TPU (measured 4.06 ms vs 0.74 ms for the
    Cout=8 twin at the 512x640 level-1 shape); merged, both heads cost
    one Cout=9 conv. The kernels are declared per-net via ``_ConvKernel``
    at the exact nn.Conv tree paths, so checkpoints/conversion are
    unaffected."""
    k = jnp.concatenate([kf, kd], axis=-1)
    x, k = nn.dtypes.promote_dtype(x, k, dtype=dtype)
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out[..., :8], out[..., 8]  # (B,D,H,W,8), (B,D,H,W)


class CostRegNet(nn.Module):
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        conv0 = ConvBnReLU3D(8, name="conv0", **kw)(x)
        conv2 = ConvBnReLU3D(16, name="conv2", **kw)(
            ConvBnReLU3D(16, stride=2, name="conv1", **kw)(conv0))
        conv4 = ConvBnReLU3D(32, name="conv4", **kw)(
            ConvBnReLU3D(32, stride=2, name="conv3", **kw)(conv2))
        x = ConvBnReLU3D(64, name="conv6", **kw)(
            ConvBnReLU3D(64, stride=2, name="conv5", **kw)(conv4))
        x = conv4 + ConvTransposeBn(32, name="conv7", **kw)(x)
        x = conv2 + ConvTransposeBn(16, name="conv9", **kw)(x)
        x = conv0 + ConvTransposeBn(8, name="conv11", **kw)(x)
        kf = _ConvKernel(8, name="feat_conv")(x.shape[-1])
        kd = _ConvKernel(1, name="depth_conv")(x.shape[-1])
        return _dual_head(x, kf, kd, self.dtype)


class MinCostRegNetTri(nn.Module):
    """Alternative MinCostRegNet with trilinear-interp upsampling instead
    of transposed convs (reference cost_reg_net_.py:52-95; unused by the
    stock path, kept for zoo parity)."""

    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from enerf_tpu.ops.sampling import resize_trilinear

        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        conv0 = ConvBnReLU3D(8, name="conv0", **kw)(x)
        conv2 = ConvBnReLU3D(16, name="conv2", **kw)(
            ConvBnReLU3D(16, stride=2, name="conv1", **kw)(conv0))
        conv4 = ConvBnReLU3D(32, name="conv4", **kw)(
            ConvBnReLU3D(32, stride=2, name="conv3", **kw)(conv2))

        def up2(v):
            D, H, W = v.shape[1:4]
            return resize_trilinear(v, (2 * D, 2 * H, 2 * W))

        x = conv2 + ConvBnReLU3D(16, name="conv9", **kw)(up2(conv4))
        x = conv0 + ConvBnReLU3D(8, name="conv11", **kw)(up2(x))
        kf = _ConvKernel(8, name="feat_conv")(x.shape[-1])
        kd = _ConvKernel(1, name="depth_conv")(x.shape[-1])
        return _dual_head(x, kf, kd, self.dtype)


class MinCostRegNet(nn.Module):
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        conv0 = ConvBnReLU3D(8, name="conv0", **kw)(x)
        conv2 = ConvBnReLU3D(16, name="conv2", **kw)(
            ConvBnReLU3D(16, stride=2, name="conv1", **kw)(conv0))
        conv4 = ConvBnReLU3D(32, name="conv4", **kw)(
            ConvBnReLU3D(32, stride=2, name="conv3", **kw)(conv2))
        x = conv2 + ConvTransposeBn(16, name="conv9", **kw)(conv4)
        x = conv0 + ConvTransposeBn(8, name="conv11", **kw)(x)
        kf = _ConvKernel(8, name="feat_conv")(x.shape[-1])
        kd = _ConvKernel(1, name="depth_conv")(x.shape[-1])
        return _dual_head(x, kf, kd, self.dtype)
