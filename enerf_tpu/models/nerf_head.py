"""IBR shading heads (reference lib/networks/enerf/nerf.py).

NeRFHead: Agg pools per-view features (optional view-direction gating, var
+ mean across views, softmax attention); sigma from [vox_feat ‖ agg_feat];
color = softmax-weighted blend of *source-view RGBs* (nerf.py:38-43 — the
rgb channels live at [..., -7:-4] of img_feat_rgb_dir).

Padded-view support (TPU static-S contract): ``view_mask`` (B, S) drives
masked mean/var and masked softmaxes; with all views valid the numerics
equal the reference exactly (torch.var uses the unbiased estimator).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.models.layers import LinearReLU, kaiming_normal_init

_NEG_INF = -1e9


def _masked_softmax(logits, mask, axis):
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    return jax.nn.softmax(logits, axis=axis)


def _mean_var_views(x, mask):
    """Mean and unbiased variance over the view axis (-2), masked.

    torch.var defaults to correction=1 (reference nerf.py:82)."""
    if mask is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=-2, keepdims=True) / (x.shape[-2] - 1)
        return mean, var
    m = mask.astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * m, axis=-2, keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
    return mean, var


class Agg(nn.Module):
    """Per-view feature aggregation (reference nerf.py:47-89)."""

    feat_ch: int
    viewdir_agg: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feat_rgb_dir, view_mask=None):
        # img_feat_rgb_dir: (B, P, S, feat_ch + 4); view_mask: (B, 1, S, 1)
        S = img_feat_rgb_dir.shape[-2]
        if self.viewdir_agg:
            view_feat = LinearReLU(self.feat_ch, name="view_fc",
                                   dtype=self.dtype)(img_feat_rgb_dir[..., -4:])
            img_feat_rgb = img_feat_rgb_dir[..., :-4] + view_feat
        else:
            img_feat_rgb = img_feat_rgb_dir[..., :-4]

        mean, var = _mean_var_views(img_feat_rgb, view_mask)
        feat = jnp.concatenate(
            [img_feat_rgb,
             jnp.broadcast_to(var, img_feat_rgb.shape),
             jnp.broadcast_to(mean, img_feat_rgb.shape)], axis=-1)
        global_feat = LinearReLU(32, name="global_fc", dtype=self.dtype)(feat)
        w_logit = LinearReLU(1, name="agg_w_fc", dtype=self.dtype)(global_feat)
        agg_w = _masked_softmax(w_logit, view_mask, axis=-2)
        im_feat = jnp.sum(global_feat * agg_w, axis=-2)
        return LinearReLU(16, name="fc", dtype=self.dtype)(im_feat)


class NeRFHead(nn.Module):
    """Density + IBR color head (reference nerf.py:6-44)."""

    feat_ch: int  # nerf_model_feat_ch[level] + 3
    hid_n: int = 64
    viewdir_agg: bool = True
    # False = the nerf_.py variant (reference nerf_.py:33-34): sigma input
    # is the 16-ch aggregated feature only, vox_feat ignored (used by
    # network_composite.py:9)
    use_vox_feat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vox_feat, img_feat_rgb_dir, view_mask=None):
        # vox_feat: (B, P, 8); img_feat_rgb_dir: (B, P, S, feat_ch + 4)
        # view_mask: optional (B, S) bool
        B, P, S = img_feat_rgb_dir.shape[:3]
        vm = None
        if view_mask is not None:
            vm = view_mask[:, None, :, None].astype(bool)

        img_feat = Agg(self.feat_ch, viewdir_agg=self.viewdir_agg,
                       name="agg", dtype=self.dtype)(img_feat_rgb_dir, vm)
        if self.use_vox_feat:
            vox_img_feat = jnp.concatenate([vox_feat, img_feat], axis=-1)
        else:
            vox_img_feat = img_feat

        x = LinearReLU(self.hid_n, name="lr0", dtype=self.dtype)(vox_img_feat)
        sigma = nn.softplus(
            nn.Dense(1, kernel_init=kaiming_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="sigma")(x))

        x = jnp.concatenate([x, vox_img_feat], axis=-1)  # (B, P, 64+24)
        x = jnp.broadcast_to(x[:, :, None], (B, P, S, x.shape[-1]))
        x = jnp.concatenate([x, img_feat_rgb_dir], axis=-1)
        h = LinearReLU(self.hid_n, name="color_0", dtype=self.dtype)(x)
        logit = nn.relu(
            nn.Dense(1, kernel_init=kaiming_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="color_1")(h))
        color_weight = _masked_softmax(logit, vm, axis=-2)
        color = jnp.sum(img_feat_rgb_dir[..., -7:-4] * color_weight, axis=-2)
        return jnp.concatenate([color, sigma], axis=-1)


class MVSNeRFHead(nn.Module):
    """MVSNeRF-style baseline head (reference nerf.py:91-126): concatenated
    per-view features, sigmoid color MLP (no IBR blending)."""

    feat_ch: int
    hid_n: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vox_feat, img_feat_rgb_dir, view_mask=None):
        B, P, S, C = img_feat_rgb_dir.shape
        # (B, P, S*(C-4)) view-major concatenation (reference nerf.py:115)
        img_feat = img_feat_rgb_dir[..., :-4].reshape(B, P, S * (C - 4))
        vox_img_feat = jnp.concatenate([vox_feat, img_feat], axis=-1)
        x = LinearReLU(self.hid_n, name="lr0", dtype=self.dtype)(vox_img_feat)
        sigma = nn.softplus(
            nn.Dense(1, kernel_init=kaiming_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="sigma")(x))
        h = LinearReLU(self.hid_n, name="color_0", dtype=self.dtype)(x)
        color = jax.nn.sigmoid(
            nn.Dense(3, kernel_init=kaiming_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="color_1")(h))
        return jnp.concatenate([color, sigma], axis=-1)
