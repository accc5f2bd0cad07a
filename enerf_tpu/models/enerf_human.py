"""Human-capture variant: cascade ENeRF with eval-time sparse rendering
inside the 3D-bbox ray mask (reference lib/networks/enerf/network_human.py).

The reference gathers a dynamic-shape ray subset ``rays[mask_at_box]`` and
scatters the shaded colors back into a zero image
(network_human.py:90-107). XLA needs static shapes, so this rebuild
renders a fixed-capacity tile instead (SURVEY.md §7 redesign #2):

- ``mask_ray_capacity == 1.0`` (default): render every ray, multiply the
  color by the mask — numerically identical to gather+scatter.
- ``mask_ray_capacity < 1.0``: argsort the mask so masked rays come
  first, render the first ``K = capacity · H·W`` rays, scatter back into
  zeros. Same result whenever the mask fits in K; static shapes either way.

The cascade loop itself (cost volume → 3D CNN → depth regression → ray
build) is the parent's ``__call__`` — only the final-level render hook
(``_render_stage``) differs, so the fused Pallas eval kernels and
gather_bf16 apply to this model too.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.ops.rays import build_rays


class ENeRFHuman(ENeRF):
    def _render_stage(self, level: int, depth, std, near_far, feat_volume,
                      feats, batch, view_mask) -> Dict[str, jnp.ndarray]:
        cas = self.cfg.cas_config
        masked = ("mask_at_box" in batch and not self.train_mode
                  and level == cas.num - 1)
        if not masked:
            return super()._render_stage(level, depth, std, near_far,
                                         feat_volume, feats, batch,
                                         view_mask)
        grid = self.cfg.grid_rays and not self.train_mode
        rays = build_rays(batch[f"rays_{level}"], depth, std, near_far,
                          depth_inv=cas.depth_inv[level],
                          up_scale=(cas.render_scale[level]
                                    / cas.volume_scale[level]),
                          grid=grid)
        return self._render_masked(level, rays, batch["mask_at_box"],
                                   feat_volume, feats, batch, view_mask,
                                   grid=grid)

    def _render_masked(self, level: int, rays: jnp.ndarray,
                       mask: jnp.ndarray, feat_volume, feats, batch,
                       view_mask, grid: bool) -> Dict[str, jnp.ndarray]:
        """Final-level eval rendering restricted to ``mask_at_box`` rays."""
        B, N = rays.shape[:2]
        mask = mask.reshape(B, N)
        cap = self.cfg.mask_ray_capacity
        if cap >= 1.0:
            # full-grid render + mask multiply: raster order is intact,
            # so the grid fast path stays available
            out = self.render_level(level, rays, feat_volume, feats, batch,
                                    view_mask, grid=grid)
            out["rgb"] = out["rgb"] * mask[..., None]
            return out

        K = max(int(N * cap), 1)
        # stable argsort of (1 - mask): masked rays first, original order kept
        order = jnp.argsort(1.0 - mask, axis=-1, stable=True)
        idx = order[:, :K]
        sub_rays = jnp.take_along_axis(rays, idx[..., None], axis=1)
        valid = jnp.take_along_axis(mask, idx, axis=1)

        # sub-rays are NOT in raster order — the grid vox-sampling
        # contract does not hold; render with the gather path
        out = self.render_level(level, sub_rays, feat_volume, feats, batch,
                                view_mask, grid=False)
        scattered = {}
        for k, v in out.items():
            full = jnp.zeros((B, N) + v.shape[2:], v.dtype)
            vm = v * valid.reshape(valid.shape + (1,) * (v.ndim - 2))
            scattered[k] = full.at[jnp.arange(B)[:, None], idx].set(vm)
        return scattered


Network = ENeRFHuman
