"""VGG16 perceptual feature extractor in flax
(reference lib/train/losses/vgg_perceptual_loss.py:4-44).

Four frozen feature blocks of torchvision's vgg16 (conv indices
features[:4], [4:9], [9:16], [16:23]), ImageNet normalization, L1 feature
distance. torchvision is not available in this image, so weights load from
an .npz exported elsewhere (``export_torchvision_npz``); without weights
the perceptual term is disabled (loss falls back to MSE-only, flagged in
the trainer log).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# vgg16.features conv layers: (out_ch, torchvision layer index)
_BLOCK_DEFS: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((64, 0), (64, 2)),                      # features[:4]   (block ends pre-pool)
    ((128, 5), (128, 7)),                    # features[4:9]  (starts with pool)
    ((256, 10), (256, 12), (256, 14)),       # features[9:16]
    ((512, 17), (512, 19), (512, 21)),       # features[16:23]
)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

DEFAULT_WEIGHTS = "data/vgg16_features.npz"


def load_vgg16_params(path: str = DEFAULT_WEIGHTS) -> Optional[Dict[str, np.ndarray]]:
    """Load {'features.N.weight'/'bias'} arrays (torchvision layout) from
    an npz; returns None when the file is absent."""
    if not os.path.exists(path):
        return None
    raw = dict(np.load(path))
    params = {}
    for block in _BLOCK_DEFS:
        for _, idx in block:
            w = raw[f"features.{idx}.weight"]  # (out,in,kh,kw)
            params[f"w{idx}"] = w.transpose(2, 3, 1, 0)
            params[f"b{idx}"] = raw[f"features.{idx}.bias"]
    return params


def export_torchvision_npz(out_path: str = DEFAULT_WEIGHTS):  # pragma: no cover
    """Helper to run on a machine with torchvision: dump vgg16 features."""
    import torchvision

    sd = torchvision.models.vgg16(pretrained=True).features.state_dict()
    np.savez(out_path, **{k: v.numpy() for k, v in sd.items()})


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_block_features(x: jnp.ndarray, params: Dict[str, jnp.ndarray]
                         ) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) in [0,1]. Returns the four block outputs."""
    x = (x - _MEAN) / _STD
    feats = []
    for bi, block in enumerate(_BLOCK_DEFS):
        if bi > 0:
            x = _maxpool(x)
        for _, idx in block:
            x = _conv(x, params[f"w{idx}"], params[f"b{idx}"])
        feats.append(x)
    return feats


def vgg_perceptual_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """L1 distance over the four blocks (reference
    vgg_perceptual_loss.py:22-44, feature_layers=[0,1,2,3])."""
    fp = vgg16_block_features(pred, params)
    ft = vgg16_block_features(target, params)
    loss = 0.0
    for a, b in zip(fp, ft):
        loss = loss + jnp.mean(jnp.abs(a - b))
    return loss
