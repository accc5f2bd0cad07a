"""ResUnet alternative feature extractor
(reference lib/networks/enerf/res_unet.py:40-99; not wired into the stock
forward path upstream either — part of the model zoo for parity).
Returns a single 32-ch feature map at 1/4 resolution, NHWC."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.models.layers import BatchNorm, torch_conv_kernel_init
from enerf_tpu.ops.sampling import resize_bilinear


class ResidualConv(nn.Module):
    """conv_block(bn→relu→conv→bn→relu→conv) + 1×1 skip
    (reference res_unet.py:4-24)."""

    out_ch: int
    stride: int = 1
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: BatchNorm(use_running_average=not self.train,
                                    axis_name=self.axis_name,
                                    dtype=self.dtype, name=name)
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=[(1, 1)] * 2,
            kernel_init=torch_conv_kernel_init, dtype=self.dtype, name=name)
        h = bn("bn0")(x)
        h = nn.relu(h)
        h = conv(self.out_ch, 3, self.stride, "conv0")(h)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = conv(self.out_ch, 3, 1, "conv1")(h)
        skip = nn.Conv(self.out_ch, (3, 3), strides=(self.stride,) * 2,
                       padding=[(1, 1)] * 2,
                       kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                       name="skip")(x)
        return h + skip


class ResUnet(nn.Module):
    filters: Sequence[int] = (16, 32, 64, 128)
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B·S, H, W, C) → (B·S, H/4, W/4, 32)."""
        f = self.filters
        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        conv = lambda ch, k, name, **kws: nn.Conv(
            ch, (k, k), padding=[(k // 2, k // 2)] * 2,
            kernel_init=torch_conv_kernel_init, dtype=self.dtype,
            name=name, **kws)

        inp = conv(f[0], 3, "in_conv0")(x)
        inp = BatchNorm(use_running_average=not self.train,
                        axis_name=self.axis_name, dtype=self.dtype,
                        name="in_bn")(inp)
        inp = nn.relu(inp)
        inp = conv(f[0], 3, "in_conv1")(inp)
        x1 = inp + conv(f[0], 3, "in_skip")(x)

        x2 = ResidualConv(f[1], stride=2, name="res1", **kw)(x1)
        x3 = ResidualConv(f[2], stride=2, name="res2", **kw)(x2)
        x4 = ResidualConv(f[3], stride=2, name="bridge", **kw)(x3)

        # Upsample block (reference res_unet.py:27-37: ConvTranspose k2 s2)
        x4 = nn.ConvTranspose(f[3], (2, 2), strides=(2, 2),
                              kernel_init=torch_conv_kernel_init,
                              dtype=self.dtype, name="up1")(x4)
        x5 = jnp.concatenate([x4, x3], axis=-1)
        return conv(32, 1, "out")(x5)
