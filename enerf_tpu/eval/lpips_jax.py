"""LPIPS (VGG) in JAX (reference uses the ``lpips`` pip package with
net='vgg', lib/evaluators/enerf.py:25).

Architecture: scale inputs by LPIPS's shift/scale constants, run the five
VGG16 feature stages (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3),
unit-normalize along channels, apply the learned 1×1 ``lin`` weights,
average spatially, sum over stages.

Weights load from ``data/lpips_vgg.npz`` (torchvision vgg16 features +
lpips lin weights, exported with ``export_lpips_npz`` on a machine that
has them). Without the file, LPIPS evaluation is unavailable (evaluator
reports None) — parity metric, not a training dependency.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WEIGHTS = "data/lpips_vgg.npz"

# vgg16.features conv layer indices per LPIPS stage
_STAGES = (
    (0, 2),
    (5, 7),
    (10, 12, 14),
    (17, 19, 21),
    (24, 26, 28),
)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_skip_notice() -> None:
    """Loud degradation notice: the reference evaluator always reports
    LPIPS (lib/evaluators/enerf.py:71-87); a silently missing weights
    file must never make a metric table look complete."""
    print(f"LPIPS=skipped (weights missing: {DEFAULT_WEIGHTS} — export "
          "with eval/lpips_jax.py on a machine with the `lpips` package)")


def load_lpips_params(path: str = DEFAULT_WEIGHTS) -> Optional[Dict[str, np.ndarray]]:
    if not os.path.exists(path):
        return None
    raw = dict(np.load(path))
    params: Dict[str, np.ndarray] = {}
    for stage in _STAGES:
        for idx in stage:
            params[f"w{idx}"] = raw[f"features.{idx}.weight"].transpose(2, 3, 1, 0)
            params[f"b{idx}"] = raw[f"features.{idx}.bias"]
    for i in range(len(_STAGES)):
        # lin layers: (1, C, 1, 1) torch conv weights
        params[f"lin{i}"] = raw[f"lin{i}.model.1.weight"][:, :, 0, 0][0]  # (C,)
    return params


def export_lpips_npz(out_path: str = DEFAULT_WEIGHTS):  # pragma: no cover
    """Run where torchvision+lpips exist: dump vgg16 features + lin weights."""
    import lpips as lpips_pkg
    import torchvision

    arrs = {}
    vgg_sd = torchvision.models.vgg16(pretrained=True).features.state_dict()
    arrs.update({f"features.{k}": v.numpy() for k, v in vgg_sd.items()})
    m = lpips_pkg.LPIPS(net="vgg")
    for i in range(5):
        arrs[f"lin{i}.model.1.weight"] = (
            getattr(m, f"lin{i}").model[1].weight.detach().numpy())
    np.savez(out_path, **arrs)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _stages(x, params):
    outs = []
    for si, stage in enumerate(_STAGES):
        if si > 0:
            x = _maxpool(x)
        for idx in stage:
            x = _conv(x, params[f"w{idx}"], params[f"b{idx}"])
        outs.append(x)
    return outs


def lpips(pred: jnp.ndarray, gt: jnp.ndarray,
          params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """pred, gt: (B, H, W, 3) in [-1, 1] (LPIPS convention — the reference
    maps [0,1] → [-1,1] before calling, enerf.py:85)."""
    xs = (pred - _SHIFT) / _SCALE
    ys = (gt - _SHIFT) / _SCALE
    fx = _stages(xs, params)
    fy = _stages(ys, params)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = params[f"lin{i}"]  # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total  # (B,)
