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
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.ops.camera import get_proj_mats
from enerf_tpu.ops.depth import (
    cascade_depth_values,
    depth_regression,
    init_depth_values,
)
from enerf_tpu.ops.rays import build_rays
from enerf_tpu.ops.sampling import scale_size
from enerf_tpu.ops.warp import build_cost_volume


class ENeRFHuman(ENeRF):
    def _render_masked(self, level: int, rays: jnp.ndarray,
                       mask: jnp.ndarray, feat_volume, feats, batch,
                       view_mask) -> Dict[str, jnp.ndarray]:
        """Final-level eval rendering restricted to ``mask_at_box`` rays."""
        B, N = rays.shape[:2]
        mask = mask.reshape(B, N)
        cap = self.cfg.mask_ray_capacity
        if cap >= 1.0:
            out = self.render_level(level, rays, feat_volume, feats, batch,
                                    view_mask)
            out["rgb"] = out["rgb"] * mask[..., None]
            return out

        K = max(int(N * cap), 1)
        # stable argsort of (1 - mask): masked rays first, original order kept
        order = jnp.argsort(1.0 - mask, axis=-1, stable=True)
        idx = order[:, :K]
        sub_rays = jnp.take_along_axis(rays, idx[..., None], axis=1)
        valid = jnp.take_along_axis(mask, idx, axis=1)

        out = self.render_level(level, sub_rays, feat_volume, feats, batch,
                                view_mask)
        scattered = {}
        for k, v in out.items():
            full = jnp.zeros((B, N) + v.shape[2:], v.dtype)
            vm = v * valid.reshape(valid.shape + (1,) * (v.ndim - 2))
            scattered[k] = full.at[jnp.arange(B)[:, None], idx].set(vm)
        return scattered

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cas = self.cfg.cas_config
        feats = self.forward_feat(batch["src_inps"])
        view_mask = batch.get("view_mask")
        H_O, W_O = batch["src_inps"].shape[2:4]

        ret: Dict[str, jnp.ndarray] = {}
        depth = std = near_far = None
        for i in range(cas.num):
            D = cas.volume_planes[i]
            if depth is None:
                Hv = scale_size(H_O, cas.volume_scale[i])
                Wv = scale_size(W_O, cas.volume_scale[i])
                depth_values, near_far = init_depth_values(
                    batch["near_far"], D, Hv, Wv, cas.depth_inv[i])
            else:
                depth_values, near_far = cascade_depth_values(
                    depth, std, near_far, D,
                    depth_inv_prev=cas.depth_inv[i - 1],
                    depth_inv_cur=cas.depth_inv[i],
                    up_scale=cas.volume_scale[i] / cas.volume_scale[i - 1])

            projs = get_proj_mats(batch["src_exts"], batch["src_ixts"],
                                  batch["tar_ext"], batch["tar_ixt"],
                                  src_scale=cas.im_feat_scale[i],
                                  tar_scale=cas.volume_scale[i])
            volume = build_cost_volume(feats[f"level_{i}"], projs,
                                       depth_values, view_mask)
            feat_volume, depth_logits = self.cost_regs[i](volume)
            depth, std = depth_regression(depth_logits, depth_values,
                                          cas.depth_inv[i],
                                          use_pallas=self.cfg.use_pallas)
            if not cas.render_if[i]:
                continue

            rays = build_rays(batch[f"rays_{i}"], depth, std, near_far,
                              depth_inv=cas.depth_inv[i],
                              up_scale=cas.render_scale[i] / cas.volume_scale[i])
            masked = ("mask_at_box" in batch and not self.train_mode
                      and i == cas.num - 1)
            if masked:
                ret_i = self._render_masked(i, rays, batch["mask_at_box"],
                                            feat_volume, feats, batch,
                                            view_mask)
            else:
                ret_i = self.render_level(i, rays, feat_volume, feats, batch,
                                          view_mask)
            ret_i["depth_mvs"] = (1.0 / depth) if cas.depth_inv[i] else depth
            ret_i["std"] = std
            ret.update({f"{k}_level{i}": v for k, v in ret_i.items()})
        return ret


Network = ENeRFHuman
