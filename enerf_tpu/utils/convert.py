"""PyTorch ↔ JAX checkpoint conversion for ENeRF weights.

The reference checkpoints are torch pickle dicts with state-dict keys like
``feature_net.conv0.0.conv.weight``, ``cost_reg_0.conv9.0.weight``,
``nerf_0.agg.view_fc.0.weight`` (reference lib/utils/net_utils.py:415-447
load_network; SURVEY.md §5 naming contract). This module maps those to the
flax param/batch_stats pytree of ``enerf_tpu.models.enerf.ENeRF`` with the
required layout transposes:

- Conv2d   (out,in,kh,kw)      → kernel (kh,kw,in,out)
- Conv3d   (out,in,kd,kh,kw)   → kernel (kd,kh,kw,in,out)
- ConvT3d  (in,out,kd,kh,kw)   → kernel (kd,kh,kw,out,in)  (transpose_kernel)
- Linear   (out,in)            → kernel (in,out)
- BN       weight/bias/running_mean/running_var → scale/bias/mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


# flax leaf name → (torch suffix, transform id)
_BN_LEAVES = {"scale": "weight", "bias": "bias", "mean": "running_mean",
              "var": "running_var"}


def _seq_name(seg: str) -> str:
    """conv0_0 → conv0.0 (torch Sequential index)."""
    if "_" in seg and seg.rsplit("_", 1)[-1].isdigit():
        base, idx = seg.rsplit("_", 1)
        return f"{base}.{idx}"
    return seg


def _torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax tree path (module names + leaf) to a torch state-dict key
    and a transform tag ('conv2d'|'conv3d'|'convT3d'|'linear'|'bn'|'raw')."""
    parts = list(path)
    leaf = parts.pop()
    out: list = []
    transform = None
    i = 0
    while i < len(parts):
        seg = parts[i]
        if seg == "bn_wrap":
            # bn_wrap/bn → bn  (plain ConvBnReLU) or .1 (ConvTransposeBn seq)
            assert parts[i + 1] == "bn"
            prev = out[-1] if out else ""
            if prev in _CONVT_STAGES:
                out[-1] = f"{prev}.1"
            else:
                out.append("bn")
            transform = "bn"
            i += 2
            continue
        if seg == "conv" and i + 1 == len(parts):
            prev = out[-1] if out else ""
            if prev in _CONVT_STAGES:
                out[-1] = f"{prev}.0"
                transform = "convT3d"
            else:
                out.append("conv")
            i += 1
            continue
        if seg == "linear" and i + 1 == len(parts):
            # LinearReLU: torch Sequential(Linear, ReLU) → .0 — unless the
            # previous segment already carries an explicit Sequential index
            # (sigma.0, color.0, color.2)
            prev = out[-1]
            if "." not in prev:
                out[-1] = f"{prev}.0"
            transform = "linear"
            i += 1
            continue
        if seg in ("feature_net",) or seg.startswith(("cost_reg_", "nerf_")):
            out.append(seg)
        elif seg == "agg":
            out.append("agg")
        elif seg in ("sigma",):
            out.append("sigma.0")
            transform = "linear"
        elif seg == "color_0":
            out.append("color.0")
            transform = "linear"
        elif seg == "color_1":
            out.append("color.2")
            transform = "linear"
        elif seg in ("feat_conv", "depth_conv"):
            out.append(f"{seg}.0")
        else:
            out.append(_seq_name(seg))
        i += 1

    if transform is None:
        # bare flax Conv/Dense leaves
        transform = "linear" if leaf in ("kernel", "bias") and _is_dense(path) else None

    key = ".".join(out)
    if transform == "bn":
        return f"{key}.{_BN_LEAVES[leaf]}", "bn"
    if leaf == "kernel":
        return f"{key}.weight", transform or "conv"
    if leaf == "bias":
        return f"{key}.bias", "bias"
    return f"{key}.{leaf}", "raw"


_CONVT_STAGES = {"conv7", "conv9", "conv11"}

# bare Dense modules inside the nerf head (kernel is 2-D)
_DENSE_NAMES = {"sigma.0", "color.0", "color.2"}


def _is_dense(path) -> bool:
    return any(p in ("sigma", "color_0", "color_1", "linear") for p in path)


def _convert_leaf(arr: np.ndarray, transform: str, flax_shape) -> np.ndarray:
    nd = arr.ndim
    if transform == "convT3d":
        return arr.transpose(2, 3, 4, 1, 0)
    if nd == 4:   # conv2d weight
        return arr.transpose(2, 3, 1, 0)
    if nd == 5:   # conv3d weight
        return arr.transpose(2, 3, 4, 1, 0)
    if nd == 2:   # linear weight
        return arr.T
    return arr


def torch_to_flax(state_dict: Dict[str, Any], variables: Dict) -> Dict:
    """Fill a flax variables pytree (from ``ENeRF.init``) with converted
    torch weights. Raises on missing/shape-mismatched keys."""
    import jax

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    new_leaves = {}
    missing = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath)
        # drop the collection name ('params'/'batch_stats')
        tkey, transform = _torch_key(path[1:])
        if tkey not in sd:
            missing.append((path, tkey))
            continue
        arr = _convert_leaf(sd[tkey], transform, leaf.shape)
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tkey} → {path}: {arr.shape} vs {leaf.shape}")
        new_leaves[path] = arr.astype(np.asarray(leaf).dtype)
    if missing:
        raise KeyError(f"missing torch keys for: {missing[:8]}"
                       f" (+{max(0, len(missing) - 8)} more)")

    def rebuild(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return new_leaves[path]

    return jax.tree_util.tree_map_with_path(rebuild, variables)


def flax_to_torch(variables: Dict) -> Dict[str, np.ndarray]:
    """Export flax ENeRF variables as a torch-style state dict (inverse
    transposes), for round-tripping back to the reference."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        tkey, transform = _torch_key(path[1:])
        arr = np.asarray(leaf)
        if transform == "convT3d":
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 5:
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif arr.ndim == 2:
            arr = arr.T
        out[tkey] = arr
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` file ({'net': state_dict, ...} or a bare
    state dict) into numpy arrays (reference net_utils.py:415-447)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("net", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _to_np(v) for k, v in sd.items()}
