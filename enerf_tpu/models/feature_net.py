"""2D FPN feature extractor (reference lib/networks/enerf/feature_net.py:4-36).

conv0 8ch@1x → conv1 16ch@1/2 → conv2 32ch@1/4; 1x1 laterals to 32ch;
top-down upsample-add (bilinear align_corners); smooth convs.
Returns (feat2 32ch@1/4, feat1 16ch@1/2, feat0 8ch@1x). NHWC layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.models.layers import ConvBnReLU, torch_conv_kernel_init
from enerf_tpu.ops.sampling import resize_bilinear


def _upsample_add(x, y):
    H, W = y.shape[-3], y.shape[-2]
    return resize_bilinear(x, (H, W)) + y


class FeatureNet(nn.Module):
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        conv0 = ConvBnReLU(8, 3, 1, 1, name="conv0_0", **kw)(x)
        conv0 = ConvBnReLU(8, 3, 1, 1, name="conv0_1", **kw)(conv0)
        conv1 = ConvBnReLU(16, 5, 2, 2, name="conv1_0", **kw)(conv0)
        conv1 = ConvBnReLU(16, 3, 1, 1, name="conv1_1", **kw)(conv1)
        conv2 = ConvBnReLU(32, 5, 2, 2, name="conv2_0", **kw)(conv1)
        conv2 = ConvBnReLU(32, 3, 1, 1, name="conv2_1", **kw)(conv2)

        ck = dict(kernel_init=torch_conv_kernel_init, dtype=self.dtype)
        feat2 = nn.Conv(32, (1, 1), name="toplayer", **ck)(conv2)
        lat1 = nn.Conv(32, (1, 1), name="lat1", **ck)(conv1)
        lat0 = nn.Conv(32, (1, 1), name="lat0", **ck)(conv0)

        feat1 = _upsample_add(feat2, lat1)
        feat0 = _upsample_add(feat1, lat0)
        feat1 = nn.Conv(16, (3, 3), padding=[(1, 1)] * 2, name="smooth1", **ck)(feat1)
        feat0 = nn.Conv(8, (3, 3), padding=[(1, 1)] * 2, name="smooth0", **ck)(feat0)
        return feat2, feat1, feat0


class CNNRender(nn.Module):
    """Residual 2D refinement head (reference feature_net.py:38-54; unused
    by the stock forward path but part of the component inventory)."""

    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype)
        ck = dict(kernel_init=torch_conv_kernel_init, dtype=self.dtype)
        conv0 = ConvBnReLU(8, 3, 1, 1, name="conv0", **kw)(x)
        conv1 = ConvBnReLU(16, 5, 2, 2, name="conv1", **kw)(conv0)
        conv2 = _upsample_add(conv1, nn.Conv(16, (1, 1), name="conv2", **ck)(conv0))
        conv3 = nn.Conv(3, (1, 1), name="conv3", **ck)(conv2)
        return jnp.clip(conv3 + x, 0.0, 1.0)
