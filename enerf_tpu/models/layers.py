"""Building-block layers with torch-compatible numerics
(reference lib/networks/enerf/utils.py:10-33 ConvBnReLU/ConvBnReLU3D and
the ConvTranspose+BN decoder stages of cost_reg_net.py).

Weight-layout contract for checkpoint conversion (enerf_tpu/utils/convert.py):
- Conv kernel  (k..., in, out)  = torch (out, in, k...) transposed
- ConvTranspose kernel (k..., out, in) = torch (in, out, k...) transposed,
  used with lax.conv_transpose(transpose_kernel=True) and padding
  (k-1-p, k-1-p+output_padding) — verified vs torch to ~4e-6.
- BatchNorm: eps 1e-5, running-stat update new = 0.9*old + 0.1*batch
  (torch momentum 0.1 == flax momentum 0.9). Cross-replica stat sync via
  ``axis_name`` replaces SyncBatchNorm (reference trainer.py:16).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv default init: kaiming_uniform(a=sqrt(5)) on (out,in,k...),
    i.e. U(-b, b) with b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)."""
    fan_in = shape[-2] * math.prod(shape[:-2])  # in_ch * kernel volume
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """kaiming_normal_ on torch (out,in) layout == fan_in over shape[0] in
    flax (in,out) layout (reference nerf.py:130-135 weights_init)."""
    fan_in = shape[0] if len(shape) == 2 else shape[-2] * math.prod(shape[:-2])
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)



def _bn_fold(module, conv_name: str = "conv", bn_name: str = "bn_wrap",
             epsilon: float = 1e-5):
    """Eval-mode BN folding: returns ``(w_scale, bias)`` f32 from the
    module's conv/BN variables, or None while initializing (variables
    don't exist yet — the normal path must run once to create them).

    Folding turns conv -> BN(running stats) -> relu into
    conv(W·s) + b -> relu: BN at eval is affine, so the scale rides the
    conv WEIGHTS (a few-KB elementwise op) and the bias+relu fuse into
    the conv epilogue. Measured: the unfolded chain kept ~2 ms/frame of
    separate relu/scale passes at 512×640 even with matching dtypes.
    Identical math to fp rounding (scale applied to weights instead of
    outputs)."""
    if not module.has_variable("params", bn_name):
        return None
    pb = module.get_variable("params", bn_name)["bn"]
    st = module.get_variable("batch_stats", bn_name)["bn"]
    inv = (pb["scale"].astype(jnp.float32)
           * jax.lax.rsqrt(st["var"].astype(jnp.float32) + epsilon))
    bias = (pb["bias"].astype(jnp.float32)
            - st["mean"].astype(jnp.float32) * inv)
    return inv, bias


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm over the channel-last axis.

    ``use_running_average`` switches train/eval behavior; ``axis_name``
    (when bound inside shard_map/pmap) averages batch stats across the data
    axis — the SyncBatchNorm equivalent."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )
        return bn(x)


class ConvBnReLU(nn.Module):
    """Conv2d(bias=False) + BN + ReLU (reference utils.py:10-20)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fold = None if self.train else _bn_fold(self)
        if fold is not None:
            inv, bias = fold
            w = (self.get_variable("params", "conv")["kernel"]
                 .astype(jnp.float32) * inv).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w,
                (self.stride, self.stride),
                [(self.pad, self.pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return nn.relu(y + bias.astype(self.dtype))
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad)] * 2, use_bias=False,
                    kernel_init=torch_conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train,
                      axis_name=self.axis_name, name="bn_wrap")(x)
        return nn.relu(x)


class ConvBnReLU3D(nn.Module):
    """Conv3d(bias=False) + BN + ReLU (reference utils.py:22-33)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fold = None if self.train else _bn_fold(self)
        if fold is not None:
            inv, bias = fold
            w = (self.get_variable("params", "conv")["kernel"]
                 .astype(jnp.float32) * inv).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w,
                (self.stride,) * 3,
                [(self.pad, self.pad)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return nn.relu(y + bias.astype(self.dtype))
        x = nn.Conv(self.out_ch, (self.kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[(self.pad, self.pad)] * 3, use_bias=False,
                    kernel_init=torch_conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train,
                      axis_name=self.axis_name, name="bn_wrap")(x)
        return nn.relu(x)


class ConvTranspose3dTorch(nn.Module):
    """torch-parity ConvTranspose3d(kernel 3, stride 2, padding 1,
    output_padding 1, bias=False): exactly doubles each spatial dim."""

    out_ch: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_pad: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("kernel", torch_convtranspose_kernel_init,
                       (k, k, k, self.out_ch, in_ch))
        lo = k - 1 - self.pad
        hi = k - 1 - self.pad + self.output_pad
        return jax.lax.conv_transpose(
            x.astype(self.dtype), w.astype(self.dtype),
            strides=(self.stride,) * 3,
            padding=((lo, hi),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True)


def torch_convtranspose_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose default init on (in,out,k...): fan_in uses the
    *first* dim (in_ch) times kernel volume. Our layout is (k..,out,in)."""
    fan_in = shape[-1] * math.prod(shape[:-2])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ConvTransposeBn(nn.Module):
    """ConvTranspose3d + BN (decoder stage, reference cost_reg_net.py:24-37)."""

    out_ch: int
    train: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fold = None if self.train else _bn_fold(self)
        if fold is not None:
            inv, bias = fold
            # ConvTranspose3dTorch kernel layout (k, k, k, out, in):
            # the BN scale rides the OUT dim (axis -2)
            w = (self.get_variable("params", "conv")["kernel"]
                 .astype(jnp.float32) * inv[:, None]).astype(self.dtype)
            k = 3
            lo, hi = k - 1 - 1, k - 1 - 1 + 1
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), w, strides=(2,) * 3,
                padding=((lo, hi),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                transpose_kernel=True)
            return y + bias.astype(self.dtype)
        x = ConvTranspose3dTorch(self.out_ch, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train,
                      axis_name=self.axis_name, name="bn_wrap")(x)
        return x


class LinearReLU(nn.Module):
    """Linear + ReLU with kaiming-normal init (reference nerf.py heads)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_ch, kernel_init=kaiming_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="linear")(x)
        return nn.relu(x)
