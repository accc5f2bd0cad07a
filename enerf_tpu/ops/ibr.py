"""Image-based-rendering feature gathering
(reference lib/networks/enerf/utils.py:456-458 get_vox_feat,
:689-722 get_img_feat, :605-612 unpreprocess).

The reference loops over source views in Python; here views are vmapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from enerf_tpu.ops.camera import cam_centers, scale_intrinsics
from enerf_tpu.ops.sampling import (
    bilinear_sample_2d,
    resize_bilinear,
    scale_size,
    trilinear_sample_3d,
)


def get_vox_feat(uvd: jnp.ndarray, feature_volume: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of the regularized feature volume.

    uvd: (B, N, 3) in [0, 1] (u, v, d); feature_volume: (B, D, H, W, C).
    align_corners=True: pixel coord = ndc * (size - 1)
    (reference utils.py:456-458 uses grid_sample(ndc*2-1)).
    """
    def one(vol, pts):
        D, H, W, _ = vol.shape
        x = pts[..., 0] * (W - 1)
        y = pts[..., 1] * (H - 1)
        z = pts[..., 2] * (D - 1)
        return trilinear_sample_3d(vol, x, y, z, padding_mode="zeros")

    return jax.vmap(one)(feature_volume, uvd)


def get_img_feat(world_xyz: jnp.ndarray, img_feat_rgb: jnp.ndarray,
                 src_exts: jnp.ndarray, src_ixts: jnp.ndarray,
                 tar_ext: jnp.ndarray, render_scale: float) -> jnp.ndarray:
    """Per-source-view projected features + ray-difference geometry.

    world_xyz: (B, N, n_samples, 3); img_feat_rgb: (B, S, H, W, C)
    (features ‖ rgb, channels last); src_exts: (B, S, 4, 4);
    src_ixts: (B, S, 3, 3); tar_ext: (B, 4, 4).
    Returns (B, N*n_samples, S, C+4): per view [feat‖rgb, ray_diff(3), dot(1)].
    Reference utils.py:689-722.
    """
    B, N, n, _ = world_xyz.shape
    H, W = img_feat_rgb.shape[2:4]
    xyz = world_xyz.reshape(B, N * n, 3)

    tar_cam = cam_centers(tar_ext)  # (B, 3)
    src_cam = cam_centers(src_exts)  # (B, S, 3)

    ixt = scale_intrinsics(src_ixts, render_scale)  # (B, S, 3, 3)

    def per_view(feat_s, ext_s, ixt_s, src_cam_s, xyz_b, tar_cam_b):
        # feat_s (H, W, C), ext_s (4,4), ixt_s (3,3), xyz_b (P, 3)
        cam_pts = xyz_b @ ext_s[:3, :3].T + ext_s[:3, 3]  # (P, 3)
        img_pts = cam_pts @ ixt_s.T
        z = jnp.maximum(img_pts[..., 2:], 1e-6)
        grid = img_pts[..., :2] / z  # pixel coords
        feat = bilinear_sample_2d(feat_s, grid[..., 0], grid[..., 1],
                                  padding_mode="border")  # (P, C)

        tar_diff = xyz_b - tar_cam_b[None]
        src_diff = xyz_b - src_cam_s[None]
        tar_diff = tar_diff / (jnp.linalg.norm(tar_diff, axis=-1, keepdims=True) + 1e-6)
        src_diff = src_diff / (jnp.linalg.norm(src_diff, axis=-1, keepdims=True) + 1e-6)
        ray_diff = tar_diff - src_diff
        ray_diff_norm = jnp.linalg.norm(ray_diff, axis=-1, keepdims=True)
        ray_diff_dot = jnp.sum(tar_diff * src_diff, axis=-1, keepdims=True)
        ray_diff_dir = ray_diff / jnp.maximum(ray_diff_norm, 1e-6)
        return jnp.concatenate([feat, ray_diff_dir, ray_diff_dot], axis=-1)

    over_views = jax.vmap(per_view, in_axes=(0, 0, 0, 0, None, None))
    over_batch = jax.vmap(over_views, in_axes=(0, 0, 0, 0, 0, 0))
    out = over_batch(img_feat_rgb, src_exts, ixt, src_cam, xyz, tar_cam)
    return jnp.moveaxis(out, 1, 2)  # (B, P, S, C+4)


def unpreprocess(src_inps: jnp.ndarray, render_scale: float = 1.0) -> jnp.ndarray:
    """Source images stored in [-1, 1] → [0, 1], optionally rescaled.

    src_inps: (B, S, H, W, 3). Reference utils.py:605-612.
    """
    img = src_inps * 0.5 + 0.5
    if render_scale != 1.0:
        H, W = img.shape[2:4]
        img = resize_bilinear(
            img, (scale_size(H, render_scale), scale_size(W, render_scale)))
    return img
