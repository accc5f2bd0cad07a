"""Loss wrapper (reference lib/train/losses/enerf.py:16-56 NetworkWrapper).

Per cascade level: MSE on rgb weighted by ``loss_weight``; plus
0.01 × VGG16 perceptual loss on the full rendered image when
``train_img[level]``, or on sampled patches when ``num_patchs > 0``.
Pure function of (model outputs, batch) so it lives inside the jitted
train step.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from enerf_tpu.config import ENeRFConfig
from enerf_tpu.train.vgg import vgg_perceptual_loss

_LN10 = float(np.log(10.0))


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / _LN10


def compute_loss(output: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 cfg: ENeRFConfig, src_hw: Tuple[int, int],
                 vgg_params: Optional[Dict] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (scalar loss, scalar_stats). ``src_hw`` is the static source
    image (H, W) used to reshape full-image renders for the perceptual
    term."""
    cas = cfg.cas_config
    H_O, W_O = src_hw
    loss = jnp.asarray(0.0, jnp.float32)
    stats: Dict[str, jnp.ndarray] = {}
    for i in range(cas.num):
        if not cas.render_if[i]:
            continue
        pred = output[f"rgb_level{i}"]
        gt = batch[f"rgb_{i}"]
        color_loss = jnp.mean((pred - gt) ** 2)
        stats[f"color_mse_{i}"] = color_loss
        stats[f"psnr_{i}"] = mse2psnr(color_loss)
        loss = loss + cas.loss_weight[i] * color_loss

        if vgg_params is not None:
            if cas.train_img[i]:
                s = cas.render_scale[i]
                H, W = int(H_O * s), int(W_O * s)
                B = pred.shape[0]
                p = vgg_perceptual_loss(pred.reshape(B, H, W, 3),
                                        gt.reshape(B, H, W, 3), vgg_params)
                loss = loss + 0.01 * cas.loss_weight[i] * p
                stats[f"perceptual_loss_{i}"] = p
            elif cas.num_patchs[i] > 0:
                ps = cas.patch_size[i]
                nr = cas.num_rays[i]
                npc = cas.num_patchs[i]
                B = pred.shape[0]
                # patch rays are appended after the random rays
                # (reference losses/enerf.py:39-51)
                inp = pred[:, nr:nr + npc * ps * ps].reshape(B * npc, ps, ps, 3)
                tar = gt[:, nr:nr + npc * ps * ps].reshape(B * npc, ps, ps, 3)
                p = vgg_perceptual_loss(inp, tar, vgg_params)
                loss = loss + 0.01 * cas.loss_weight[i] * p
                stats[f"perceptual_loss_{i}"] = p

    stats["loss"] = loss
    return loss, stats
