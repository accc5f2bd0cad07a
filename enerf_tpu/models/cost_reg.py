"""3D cost-volume regularization U-Nets
(reference lib/networks/enerf/cost_reg_net.py:4-86).

NDHWC layout: input variance volume (B, D, H, W, C). Encoder 8→16→32(→64),
transposed-conv decoder with skip adds; heads: feat_conv (8ch feature
volume) and depth_conv (1ch depth logits). MinCostRegNet drops the deepest
stage and is used at cascade level 0 (reference network.py:16-19).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.models.layers import (
    ConvBnReLU3D,
    ConvTransposeBn,
    torch_conv_kernel_init,
)


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
        feat = nn.Conv(8, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                       kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                       name="feat_conv")(x)
        depth = nn.Conv(1, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                        name="depth_conv")(x)
        return feat, depth[..., 0]  # (B,D,H,W,8), (B,D,H,W)


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
        feat = nn.Conv(8, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                       kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                       name="feat_conv")(x)
        depth = nn.Conv(1, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                        name="depth_conv")(x)
        return feat, depth[..., 0]


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
        feat = nn.Conv(8, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                       kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                       name="feat_conv")(x)
        depth = nn.Conv(1, (3,) * 3, padding=[(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                        name="depth_conv")(x)
        return feat, depth[..., 0]
