"""Human-capture variant: cascade ENeRF with eval-time sparse rendering
inside the 3D-bbox ray mask (reference lib/networks/enerf/network_human.py).

The reference gathers a dynamic-shape ray subset ``rays[mask_at_box]`` and
scatters the shaded colors back into a zero image
(network_human.py:90-107). XLA needs static shapes, so this rebuild
renders with static shapes in one of three modes (SURVEY.md §7
redesign #2):

- ``mask_window_hw`` set (THE fast path): render a fixed (h, w) bbox
  window positioned on the mask each frame — position traced
  (``lax.dynamic_slice``), size static, rays a raster-order sub-grid so
  the gather-free tent-vox sampling and the fused render kernel's
  cheapest layout still apply — then ``dynamic_update_slice`` the window
  back into the frame and zero outside the mask. This is where the
  reference's human-FPS headline comes from (README.md:147: the masked
  render is ~2.3x the full-frame one); the argsort path below forfeits
  raster order and with it the whole grid fast path, roughly cancelling
  the ray reduction.
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

import jax
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
        if self.cfg.mask_window_hw is not None and grid:
            return self._render_masked_window(level, rays, mask,
                                              feat_volume, feats, batch,
                                              view_mask)
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

    def _render_masked_window(self, level: int, rays: jnp.ndarray,
                              mask: jnp.ndarray, feat_volume, feats, batch,
                              view_mask) -> Dict[str, jnp.ndarray]:
        """Static bbox-window sparse render (see module docstring).

        The window origin snaps DOWN to a 16-px boundary (keeps the
        dynamic slices on TPU sublane boundaries for every dtype) and
        clamps so the window stays in frame; rays inside the window are
        the raster sub-grid, so ``render_level(grid=True, window=…)``
        keeps every grid fast path.
        """
        cas = self.cfg.cas_config
        B, N = rays.shape[:2]
        H_O, W_O = batch["src_inps"].shape[2:4]
        H = int(H_O * cas.render_scale[level])
        W = int(W_O * cas.render_scale[level])
        wh, ww = self.cfg.mask_window_hw
        assert N == H * W, "window path needs full-grid rays"
        assert wh <= H and ww <= W, "mask window exceeds the frame"

        mask2d = mask.reshape(B, H, W)
        snap = 16
        # first masked row/col (argmax of the any-reduction); empty mask
        # → origin 0 and the final mask multiply zeroes the output
        y0 = jnp.argmax(jnp.any(mask2d > 0, axis=-1), axis=-1)
        x0 = jnp.argmax(jnp.any(mask2d > 0, axis=-2), axis=-1)
        y0 = jnp.minimum((y0 // snap) * snap, H - wh).astype(jnp.int32)
        x0 = jnp.minimum((x0 // snap) * snap, W - ww).astype(jnp.int32)
        xy0 = jnp.stack([x0, y0], axis=-1)  # (B, 2) [x0, y0]

        rays_img = rays.reshape(B, H, W, rays.shape[-1])
        rays_win = jax.vmap(lambda r, p: jax.lax.dynamic_slice(
            r, (p[1], p[0], 0), (wh, ww, r.shape[-1])))(rays_img, xy0)
        rays_win = rays_win.reshape(B, wh * ww, rays.shape[-1])

        out = self.render_level(level, rays_win, feat_volume, feats, batch,
                                view_mask, grid=True, window=(xy0, wh, ww))
        scattered = {}
        for k, v in out.items():
            tail = v.shape[2:]
            full = jnp.zeros((B, H, W) + tail, v.dtype)
            vw = v.reshape((B, wh, ww) + tail)
            full = jax.vmap(lambda f, c, p: jax.lax.dynamic_update_slice(
                f, c, (p[1], p[0]) + (0,) * len(tail)))(full, vw, xy0)
            m = mask.reshape((B, H, W) + (1,) * len(tail)).astype(v.dtype)
            scattered[k] = (full * m).reshape((B, N) + tail)
        return scattered


Network = ENeRFHuman
