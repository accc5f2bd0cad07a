"""Depth-guided ray construction and sampling
(reference lib/networks/enerf/utils.py:390-441).

Ray layout (12 channels, reference network.py:94 comment):
    ray_o(3) | ray_d(3) | uv(2) | ray_near, ray_far(2) | vol_near, vol_far(2)

The reference gathers per-ray bounds with a Python list comprehension over
the batch (utils.py:417-418 — a CPU-sync hot spot); here it is a vectorized
vmap gather, fully on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from enerf_tpu.ops.sampling import resize_bilinear, scale_size


def _upsample_depth_std_nf(depth, std, near_far, up_scale):
    if up_scale != 1.0:
        h, w = depth.shape[-2:]
        H, W = scale_size(h, up_scale), scale_size(w, up_scale)
        depth = resize_bilinear(depth[..., None], (H, W))[..., 0]
        std = resize_bilinear(std[..., None], (H, W))[..., 0]
        near_far = jnp.moveaxis(
            resize_bilinear(jnp.moveaxis(near_far, 1, -1), (H, W)), -1, 1)
    return depth, std, near_far


def gather_ray_bounds(depth: jnp.ndarray, std: jnp.ndarray,
                      near_far: jnp.ndarray, uv: jnp.ndarray,
                      depth_inv: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [near, far] interval from the depth pdf, gathered at uv.

    depth, std: (B, H, W) already at render scale; near_far: (B, 2, H, W);
    uv: (B, N, 2) integer pixel coords (x, y). Returns
    (ray_near_far (B, N, 2), vol_near_far (B, N, 2)).
    Reference utils.py:402-418.
    """
    if depth_inv:
        nf0 = jnp.minimum(depth + std, near_far[:, 0])
        nf1 = jnp.maximum(depth - std, near_far[:, 1])
    else:
        nf0 = jnp.maximum(depth - std, near_far[:, 0])
        nf1 = jnp.minimum(depth + std, near_far[:, 1])
    ray_nf = jnp.stack([nf0, nf1], axis=-1)          # (B, H, W, 2)
    vol_nf = jnp.moveaxis(near_far, 1, -1)           # (B, H, W, 2)

    def gather_one(img, uv_b):
        return img[uv_b[:, 1], uv_b[:, 0]]           # (N, 2)

    uv_i = uv.astype(jnp.int32)
    ray_nf_r = jax.vmap(gather_one)(ray_nf, uv_i)
    vol_nf_r = jax.vmap(gather_one)(vol_nf, uv_i)
    return ray_nf_r, vol_nf_r


def build_rays(rays8: jnp.ndarray, depth: jnp.ndarray, std: jnp.ndarray,
               near_far: jnp.ndarray, depth_inv: bool,
               up_scale: float, grid: bool = False) -> jnp.ndarray:
    """Append per-ray depth-guided bounds to host-built 8-ch rays.

    rays8: (B, N, 8) = o(3)|dir(3)|u|v at render scale; depth/std/near_far
    at volume scale (upsampled here by ``up_scale`` =
    render_scale/volume_scale). Returns (B, N, 12).
    Reference utils.py:390-420.

    ``grid``: the rays are the full raster grid in raster order
    (cfg.enerf.grid_rays eval contract) — the uv gather is a reshape.
    """
    depth, std, near_far = _upsample_depth_std_nf(depth, std, near_far, up_scale)
    if grid:
        if depth_inv:
            nf0 = jnp.minimum(depth + std, near_far[:, 0])
            nf1 = jnp.maximum(depth - std, near_far[:, 1])
        else:
            nf0 = jnp.maximum(depth - std, near_far[:, 0])
            nf1 = jnp.minimum(depth + std, near_far[:, 1])
        B = depth.shape[0]
        ray_nf = jnp.stack([nf0, nf1], axis=-1).reshape(B, -1, 2)
        vol_nf = jnp.moveaxis(near_far, 1, -1).reshape(B, -1, 2)
    else:
        ray_nf, vol_nf = gather_ray_bounds(depth, std, near_far,
                                           rays8[..., 6:8], depth_inv)
    return jnp.concatenate([rays8, ray_nf, vol_nf], axis=-1)


def sample_points_on_plane(rays: jnp.ndarray, n_samples: int = 32,
                           bounds=((-4.0, -4.0, -0.2), (4.0, 4.0, 0.2))
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab sampling between two z-planes (reference utils.py:730-745;
    unused by the stock path, kept for op-library parity). Returns
    (normalized points (..., n, 3), z_vals (..., n))."""
    bounds = jnp.asarray(bounds, rays.dtype)
    ray_o_z = rays[..., 2]
    ray_d_z = rays[..., 5]
    ray_d_z = jnp.where((ray_d_z > -1e-5) & (ray_d_z < 1e-10), -1e-5, ray_d_z)
    ray_d_z = jnp.where((ray_d_z < 1e-5) & (ray_d_z > -1e-10), 1e-5, ray_d_z)
    near = (bounds[1, 2] - ray_o_z) / ray_d_z
    far = (bounds[0, 2] - ray_o_z) / ray_d_z
    lin = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
    z_vals = near[..., None] + (far - near)[..., None] * lin
    pts = rays[..., None, :3] + rays[..., None, 3:6] * z_vals[..., None]
    pts = (pts - bounds[0]) / (bounds[1] - bounds[0])
    return pts, z_vals


def sample_points_along_sphere(rays: jnp.ndarray, n_samples: int = 32,
                               r1: float = 3.0, r2: float = 4.0
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cylindrical-shell sampling (reference utils.py:765-794; unused by
    the stock path). Returns ((theta, radial, z) coords, z_vals)."""
    o = rays[..., :2]
    d = rays[..., 3:5]
    d_norm = jnp.linalg.norm(d, axis=-1)
    d_n = d / d_norm[..., None]
    x1 = -jnp.sum(o * d_n, axis=-1)
    x2_2 = jnp.clip(jnp.sum(o * o, axis=-1) - x1 * x1, 1e-6, r1 ** 2 - 1e-4)
    x3 = jnp.sqrt(r1 ** 2 - x2_2)
    x4 = jnp.sqrt(r2 ** 2 - x2_2)
    near = (x1 + x3) / d_norm
    far = (x1 + x4) / d_norm
    lin = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
    z_vals = near[..., None] + (far - near)[..., None] * lin
    pts = rays[..., None, :3] + rays[..., None, 3:6] * z_vals[..., None]
    xy = pts[..., :2]
    xy_n = xy / jnp.linalg.norm(xy, axis=-1, keepdims=True)
    theta = jnp.where(xy_n[..., 1] >= 0,
                      jnp.arcsin(xy_n[..., 0]),
                      jnp.pi - jnp.arcsin(xy_n[..., 0]))
    theta = (theta + jnp.pi / 2.0) / (2 * jnp.pi)
    yy = (jnp.linalg.norm(pts[..., :2], axis=-1) - r1 + 0.1) / (r2 - r1 + 0.2)
    zz = (pts[..., 2] + 0.2) / 2.4
    return jnp.stack([theta, yy, zz], axis=-1), z_vals


def sample_along_depth(rays: jnp.ndarray, n_samples: int,
                       depth_inv: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Place n_samples points inside each ray's [near, far] interval.

    rays: (B, N, 12). Returns (world_xyz (B, N, n, 3), uvd (B, N, n, 3),
    z_vals (B, N, n)). With ``depth_inv`` the interval is in disparity and
    the world point uses 1/z (reference utils.py:422-441).
    uvd's d channel is the normalized position inside the *volume* bounds.
    """
    ray_o = rays[..., 0:3]
    ray_d = rays[..., 3:6]
    uv = rays[..., 6:8]
    ray_near = rays[..., 8:9]
    ray_far = rays[..., 9:10]
    vol_near = rays[..., 10:11]
    vol_far = rays[..., 11:12]

    if n_samples == 1:
        z_vals = ray_near + (ray_far - ray_near) * 0.5
    else:
        lin = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
        z_vals = ray_near + (ray_far - ray_near) * lin[None, None]

    if depth_inv:
        t = 1.0 / jnp.maximum(z_vals[..., None], 1e-6)
    else:
        t = z_vals[..., None]
    world_xyz = ray_o[..., None, :] + ray_d[..., None, :] * t

    if depth_inv:
        d = (vol_near - z_vals) / jnp.maximum(vol_near - vol_far, 1e-6)
    else:
        d = (z_vals - vol_near) / jnp.maximum(vol_far - vol_near, 1e-6)
    uvd = jnp.concatenate(
        [jnp.broadcast_to(uv[..., None, :], world_xyz.shape[:-1] + (2,)),
         d[..., None]], axis=-1)
    return world_xyz, uvd, z_vals
