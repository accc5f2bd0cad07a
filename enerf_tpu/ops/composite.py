"""Alpha compositing of per-sample radiance
(reference lib/networks/enerf/utils.py:571-603 raw2outputs and variants).

Note the ENeRF peculiarity: alpha = 1 - exp(-sigma) with **no dists term**
— samples are depth-guided so the spacing is implicit. The depth map uses a
softmax over the compositing weights (utils.py:593-595).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """cumprod shifted right by one with a leading 1 (transmittance)."""
    cp = jnp.cumprod(x, axis=-1)[..., :-1]
    ones = jnp.ones_like(x[..., :1])
    return jnp.concatenate([ones, cp], axis=-1)


def raw2outputs(raw: jnp.ndarray, z_vals: Optional[jnp.ndarray],
                white_bkgd: bool = False) -> Dict[str, jnp.ndarray]:
    """raw: (B, N, n_samples, 4) = rgb(3)‖sigma(1); z_vals: (B, N, n_samples).

    Returns {'rgb' (B,N,3), 'depth' (B,N), 'weights' (B,N,n)}.
    Reference utils.py:571-603.
    """
    alpha = 1.0 - jnp.exp(-raw[..., 3])
    rgb = raw[..., :3]
    T = _exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    if z_vals is not None:
        w = jax.nn.softmax(weights, axis=-1)
        depth_map = jnp.sum(w * jax.lax.stop_gradient(z_vals), axis=-1)
    else:
        depth_map = None
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    out = {"rgb": rgb_map, "weights": weights}
    if depth_map is not None:
        out["depth"] = depth_map
    return out


def raw2outputs_ngp(raw: jnp.ndarray, z_vals: jnp.ndarray, raydir: jnp.ndarray,
                    white_bkgd: bool = False, n_samples: int = 32
                    ) -> Dict[str, jnp.ndarray]:
    """Variant with dists term (reference utils.py:488-525)."""
    dists_z = z_vals * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    dists = dists_z[..., 1:] - dists_z[..., :-1]
    dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    total = dists.shape[-1]
    if total > n_samples:
        mask = jnp.arange(total) < total - n_samples
        dists = jnp.where(mask, 1.0, dists)
    alpha = 1.0 - jnp.exp(-raw[..., 3] * dists)
    rgb = raw[..., :3]
    T = _exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * jax.lax.stop_gradient(z_vals), axis=-1)
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return {"rgb": rgb_map, "depth": depth_map, "weights": weights}


def raw2outputs_layer(net_outputs, z_vals_list, white_bkgd: bool = False
                      ) -> Dict[str, jnp.ndarray]:
    """Multi-layer z-sorted compositing (reference utils.py:527-568).

    net_outputs: list of (B, N, n_i, 4); z_vals_list: list of (B, N, n_i).
    Samples from all layers are merged, sorted by z, then composited.
    """
    raw = jnp.concatenate(net_outputs, axis=-2)
    z = jnp.concatenate(z_vals_list, axis=-1)
    idx = jnp.argsort(z, axis=-1)
    z_sorted = jnp.take_along_axis(z, idx, axis=-1)
    raw_sorted = jnp.take_along_axis(raw, idx[..., None], axis=-2)

    alpha = 1.0 - jnp.exp(-raw_sorted[..., 3])
    rgb = raw_sorted[..., :3]
    T = _exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * jax.lax.stop_gradient(z_sorted), axis=-1)
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return {"rgb": rgb_map, "depth": depth_map, "weights": weights,
            "idx": idx, "net_output": raw, "z_vals": z}
