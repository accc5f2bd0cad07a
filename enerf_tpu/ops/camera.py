"""Camera / projection math (reference lib/networks/enerf/utils.py:35-55).

Conventions match the reference: extrinsics are world→camera 4x4,
intrinsics 3x3; the plane-sweep projection matrix maps *target volume*
pixel+depth to *source feature* pixels:

    proj = [K_src * s_src | 0] @ E_src @ inv([K_tar * s_tar | 0] @ E_tar)

All functions are batched and pure.
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_intrinsics(ixt: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Scale the first two rows of (..., 3, 3) intrinsics by ``scale``."""
    s = jnp.array([scale, scale, 1.0], dtype=ixt.dtype).reshape(
        (1,) * (ixt.ndim - 2) + (3, 1))
    return ixt * s


def get_proj_mats(src_exts: jnp.ndarray, src_ixts: jnp.ndarray,
                  tar_ext: jnp.ndarray, tar_ixt: jnp.ndarray,
                  src_scale: float, tar_scale: float) -> jnp.ndarray:
    """Per-(batch, view) 3x4 src-from-target projection matrices.

    src_exts: (B, S, 4, 4), src_ixts: (B, S, 3, 3),
    tar_ext: (B, 4, 4), tar_ixt: (B, 3, 3). Returns (B, S, 3, 4).
    Reference: utils.py:35-55 (get_proj_mats).
    """
    B, S = src_exts.shape[:2]
    src_ixt = scale_intrinsics(src_ixts, src_scale)
    src_projs = src_ixt @ src_exts[:, :, :3]  # (B, S, 3, 4)

    tar_ixt_s = scale_intrinsics(tar_ixt, tar_scale)
    tar_projs = tar_ixt_s @ tar_ext[:, :3]  # (B, 3, 4)
    bottom = jnp.tile(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=tar_projs.dtype), (B, 1, 1))
    tar_projs4 = jnp.concatenate([tar_projs, bottom], axis=1)  # (B, 4, 4)
    tar_inv = jnp.linalg.inv(tar_projs4)  # (B, 4, 4)

    return src_projs @ tar_inv[:, None]  # (B, S, 3, 4)


def cam_centers(exts: jnp.ndarray) -> jnp.ndarray:
    """Camera centers in world space from world→camera extrinsics.

    exts (..., 4, 4) → (..., 3). c = -R^T t (cheaper than inverting,
    reference uses ext.inverse()[:3, 3], utils.py:707-708)."""
    R = exts[..., :3, :3]
    t = exts[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)
