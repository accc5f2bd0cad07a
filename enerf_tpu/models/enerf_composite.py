"""Compositional ENeRF for layered fg/bg scenes — the ENeRF-Outdoor model
(reference lib/networks/enerf/network_composite.py).

Two FeatureNets (fg/bg). Per cascade level: each foreground layer builds a
bbox-windowed cost volume (warp restricted to the crop), regularizes it
with its own MinCostRegNet, pads depth logits back to the full frame, and
renders raw (net_output, z_vals) inside the crop; a separate background
volume with fewer planes ([16, 4] per level) renders the full frame from
the background plates (``bg_src_inps``). All layers' samples are scattered
into the full frame, fg layers z-sorted, bg appended, and jointly
alpha-composited (reference utils.py:875-942 raw2outputs_composite).

TPU static-shape redesign (SURVEY.md §7 #3): the reference crops to a
per-frame dynamic bbox via ``.item()`` host syncs
(network_composite.py:89-91); here the crop window size is static
(``cfg.fg_bbox_hw``) and only its position is traced, so XLA compiles one
program (``lax.dynamic_slice`` / ``dynamic_update_slice``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.config import ENeRFConfig
from enerf_tpu.models.cost_reg import MinCostRegNet
from enerf_tpu.models.feature_net import FeatureNet
from enerf_tpu.models.nerf_head import NeRFHead
from enerf_tpu.ops.camera import get_proj_mats
from enerf_tpu.ops.composite import _exclusive_cumprod
from enerf_tpu.ops.depth import (
    cascade_depth_values,
    depth_regression,
    init_depth_values,
)
from enerf_tpu.ops.ibr import get_img_feat, get_vox_feat, unpreprocess
from enerf_tpu.ops.rays import build_rays, sample_along_depth
from enerf_tpu.ops.sampling import resize_bilinear, scale_size
from enerf_tpu.ops.warp import build_cost_volume, build_cost_volume_crop


class ENeRFComposite(nn.Module):
    cfg: ENeRFConfig
    train_mode: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        cas = self.cfg.cas_config
        L = self.cfg.num_fg_layers
        self.feature_net = FeatureNet(train=self.train_mode,
                                      axis_name=self.axis_name,
                                      dtype=self.dtype)
        self.feature_net_bg = FeatureNet(train=self.train_mode,
                                         axis_name=self.axis_name,
                                         dtype=self.dtype)
        cost_regs, nerf_heads = [], []
        cost_regs_bg, nerf_heads_bg = [], []
        for i in range(cas.num):
            # every stage uses MinCostRegNet (network_composite.py:17,23)
            cost_regs.append([
                MinCostRegNet(train=self.train_mode, axis_name=self.axis_name,
                              dtype=self.dtype,
                              name=f"cost_reg_{i}_layer{l}")
                for l in range(L)])
            nerf_heads.append([
                NeRFHead(feat_ch=cas.nerf_model_feat_ch[i] + 3,
                         viewdir_agg=self.cfg.viewdir_agg,
                         use_vox_feat=False, dtype=self.dtype,
                         name=f"nerf_{i}_layer{l}")
                for l in range(L)])
            cost_regs_bg.append(
                MinCostRegNet(train=self.train_mode, axis_name=self.axis_name,
                              dtype=self.dtype, name=f"cost_reg_{i}_bg"))
            nerf_heads_bg.append(
                NeRFHead(feat_ch=cas.nerf_model_feat_ch[i] + 3,
                         viewdir_agg=self.cfg.viewdir_agg,
                         use_vox_feat=False, dtype=self.dtype,
                         name=f"nerf_{i}_bg"))
        self.cost_regs = cost_regs
        self.nerf_heads = nerf_heads
        self.cost_regs_bg = cost_regs_bg
        self.nerf_heads_bg = nerf_heads_bg

    def forward_feat(self, src_inps, feature_net) -> Dict[str, jnp.ndarray]:
        B, S, H, W, C = src_inps.shape
        x = src_inps.reshape(B * S, H, W, C)
        feat2, feat1, feat0 = feature_net(x)
        return {
            "level_2": feat0.reshape(B, S, H, W, feat0.shape[-1]),
            "level_1": feat1.reshape(B, S, H // 2, W // 2, feat1.shape[-1]),
            "level_0": feat2.reshape(B, S, H // 4, W // 4, feat2.shape[-1]),
        }

    def render_raw(self, level: int, rays: jnp.ndarray, feat_volume,
                   feats, batch, nerf_head, src_inps, view_mask
                   ) -> Dict[str, jnp.ndarray]:
        """Raw (net_output, z_vals) for one layer — no compositing yet
        (reference network_composite.py:28-51 render_rays). For depth_inv
        levels z_vals is returned as real depth 1/z (:49-50).

        Train-mode full-frame renders tile under jax.checkpoint like the
        base model (train_render_chunk) to bound backward memory."""
        chunk = self.cfg.train_render_chunk
        N = rays.shape[1]
        if (self.train_mode and 0 < chunk < N and N % chunk == 0
                and not self.is_initializing()):
            head_vars = nerf_head.variables

            def tile_fn(rays_tile):
                return self._render_raw_inner(
                    level, rays_tile, feat_volume, feats, batch,
                    lambda *a: nerf_head.apply(head_vars, *a), src_inps,
                    view_mask)

            tiles = rays.reshape(rays.shape[0], N // chunk, chunk,
                                 rays.shape[-1]).swapaxes(0, 1)
            out = jax.lax.map(jax.checkpoint(tile_fn), tiles)
            return {k: v.swapaxes(0, 1).reshape(
                        (rays.shape[0], N) + v.shape[3:])
                    for k, v in out.items()}
        return self._render_raw_inner(level, rays, feat_volume, feats,
                                      batch, nerf_head, src_inps, view_mask)

    @property
    def table_bf16(self) -> bool:
        """Same contract as ENeRF.table_bf16 (models/enerf.py)."""
        if self.train_mode:
            return jnp.dtype(self.dtype) == jnp.bfloat16
        return self.cfg.gather_bf16

    @property
    def _fused_vol(self) -> bool:
        from enerf_tpu.ops.pallas import fused_available

        return (self.cfg.fused_volume and not self.train_mode
                and not self.is_initializing() and fused_available())

    def _render_raw_inner(self, level: int, rays: jnp.ndarray, feat_volume,
                          feats, batch, nerf_head, src_inps, view_mask
                          ) -> Dict[str, jnp.ndarray]:
        cas = self.cfg.cas_config
        world_xyz, uvd, z_vals = sample_along_depth(
            rays, n_samples=cas.num_samples[level],
            depth_inv=cas.depth_inv[level])
        B, N_rays, N_samples = world_xyz.shape[:3]

        rgbs = unpreprocess(src_inps, render_scale=cas.render_scale[level])
        im_feat = feats[f"level_{cas.render_im_feat_level[level]}"]
        up_feat_scale = cas.render_scale[level] / cas.im_ibr_scale[level]
        if up_feat_scale != 1.0:
            h, w = im_feat.shape[2:4]
            im_feat = resize_bilinear(
                im_feat, (scale_size(h, up_feat_scale),
                          scale_size(w, up_feat_scale)))
        img_feat_rgb = jnp.concatenate([im_feat, rgbs], axis=-1)

        H_O, W_O = batch["src_inps"].shape[2:4]
        H = int(H_O * cas.render_scale[level])
        W = int(W_O * cas.render_scale[level])
        norm = jnp.array([1.0 / (W - 1), 1.0 / (H - 1), 1.0], dtype=uvd.dtype)
        uvd = uvd * norm

        if cas.depth_inv[level]:
            z_out = 1.0 / jnp.maximum(z_vals, 1e-6)
        else:
            z_out = z_vals

        if (self.cfg.train_packed_render and not self.is_initializing()
                and not nerf_head.use_vox_feat):
            # lane-packed IBR head (ops/pallas/render.py _render_math) on
            # the fused kernels' packed operand — differentiable XLA, so
            # it serves BOTH train and eval here (the composite model has
            # no Pallas path: its raw per-layer outputs composite across
            # layers afterwards). The per-view jnp head below walks
            # 128-lane-padded (P, S, C<=15) tensors instead — measured
            # ~100 ms/step of relayout traffic on the base model.
            from enerf_tpu.ops.ibr import get_img_feat_packed
            from enerf_tpu.ops.pallas.render import render_rays_packed_xla

            xyz_km = world_xyz.transpose(0, 2, 1, 3)
            z_km = z_vals.transpose(0, 2, 1)
            A, src_cam, tar_cam, Cp = get_img_feat_packed(
                xyz_km, img_feat_rgb, batch["src_exts"],
                batch["src_ixts"], batch["tar_ext"],
                render_scale=cas.render_scale[level],
                z_vals_km=z_km, table_bf16=self.table_bf16)
            S = img_feat_rgb.shape[1]
            if view_mask is None:
                vm = jnp.ones((B, S), jnp.float32)
            else:
                vm = view_mask.astype(jnp.float32).reshape(B, S)
            dummy_vox = jnp.zeros((N_rays, 1), jnp.float32)
            raw = jnp.stack([render_rays_packed_xla(
                A[b], dummy_vox, nerf_head.variables,
                src_cam[b], tar_cam[b], vm[b],
                S=S, n=N_samples, Cp=Cp, Cf=nerf_head.feat_ch, Cv=0,
                white_bkgd=self.cfg.white_bkgd,
                viewdir_agg=self.cfg.viewdir_agg,
                use_vox_feat=False, raw_out=True)
                for b in range(B)])                    # (B, N, 4n)
            # lanes [4k..4k+4) = [rgb(3), sigma] for sample k -> the
            # reference net_output layout (B, N, n, 4)
            net_output = raw.reshape(B, N_rays, N_samples, 4)
            return {"net_output": net_output, "z_vals": z_out}

        vox_feat = get_vox_feat(uvd.reshape(B, -1, 3), feat_volume)
        img_feat_rgb_dir = get_img_feat(
            world_xyz, img_feat_rgb, batch["src_exts"], batch["src_ixts"],
            batch["tar_ext"], render_scale=cas.render_scale[level],
            table_bf16=self.table_bf16)
        net_output = nerf_head(vox_feat, img_feat_rgb_dir, view_mask)
        net_output = net_output.reshape(B, N_rays, N_samples,
                                        net_output.shape[-1])
        return {"net_output": net_output, "z_vals": z_out}

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cas = self.cfg.cas_config
        L = self.cfg.num_fg_layers
        feats = self.forward_feat(batch["src_inps"], self.feature_net)
        feats_bg = self.forward_feat(batch["src_inps"], self.feature_net_bg)
        view_mask = batch.get("view_mask")
        H_O, W_O = batch["src_inps"].shape[2:4]
        bbox = batch["bbox"]  # (B, L, 4) int xywh at full res; w,h static
        fg_h, fg_w = self.cfg.fg_bbox_hw

        ret: Dict[str, jnp.ndarray] = {}
        inter: Dict[str, Any] = {}
        depth_bg = std_bg = nf_bg = None
        for i in range(cas.num):
            vs = cas.volume_scale[i]
            rs = cas.render_scale[i]
            Hv, Wv = scale_size(H_O, vs), scale_size(W_O, vs)
            projs = get_proj_mats(batch["src_exts"], batch["src_ixts"],
                                  batch["tar_ext"], batch["tar_ixt"],
                                  src_scale=cas.im_feat_scale[i],
                                  tar_scale=vs)
            ret_layers = []
            for l in range(L):
                if i == 0:
                    depth_values, near_far = init_depth_values(
                        batch["near_far"][:, l], cas.volume_planes[i],
                        Hv, Wv, cas.depth_inv[i])
                else:
                    depth_values, near_far = cascade_depth_values(
                        inter[f"depth_{i-1}_{l}"], inter[f"std_{i-1}_{l}"],
                        inter[f"near_far_{i-1}_{l}"], cas.volume_planes[i],
                        depth_inv_prev=cas.depth_inv[i - 1],
                        depth_inv_cur=cas.depth_inv[i],
                        up_scale=vs / cas.volume_scale[i - 1])

                hv, wv = int(fg_h * vs), int(fg_w * vs)
                xy0 = (bbox[:, l, :2].astype(jnp.float32) * vs
                       ).astype(jnp.int32)
                volume = build_cost_volume_crop(
                    feats[f"level_{i}"], projs, depth_values, xy0,
                    (hv, wv), view_mask,
                    table_bf16=self.table_bf16,
                    fused=self._fused_vol,
                    fast_const=self.cfg.fused_fast_const)
                feat_vol_c, logits_c = self.cost_regs[i][l](volume)
                # pad back to the full frame (network_composite.py:102-103)
                # (B, D, hv, wv, C) volumes: pad over (H, W) dims
                def pad_vol(crop, xy):
                    full = jnp.zeros(
                        (crop.shape[0], crop.shape[1], Hv, Wv, crop.shape[-1]),
                        crop.dtype)
                    return jax.vmap(lambda f, c, p: jax.lax.dynamic_update_slice(
                        f, c, (0, p[1], p[0], 0)))(full, crop, xy)

                def pad_map(crop, xy):  # (B, D, hv, wv) logits
                    full = jnp.zeros(
                        (crop.shape[0], crop.shape[1], Hv, Wv), crop.dtype)
                    return jax.vmap(lambda f, c, p: jax.lax.dynamic_update_slice(
                        f, c, (0, p[1], p[0])))(full, crop, xy)

                feat_vol = pad_vol(feat_vol_c, xy0)
                logits = pad_map(logits_c, xy0)
                depth, std = depth_regression(logits, depth_values,
                                              cas.depth_inv[i],
                                              use_pallas=self.cfg.use_pallas)
                inter[f"depth_{i}_{l}"] = depth
                inter[f"std_{i}_{l}"] = std
                inter[f"near_far_{i}_{l}"] = near_far
                if not cas.render_if[i]:
                    continue

                rays = build_rays(batch[f"rays_{i}"], depth, std, near_far,
                                  depth_inv=cas.depth_inv[i],
                                  up_scale=rs / vs)
                # crop rays to the fg window at render scale
                # (build_rays_composite, utils.py:219-252)
                Hr, Wr = scale_size(H_O, rs), scale_size(W_O, rs)
                hr, wr = int(fg_h * rs), int(fg_w * rs)
                xyr = (bbox[:, l, :2].astype(jnp.float32) * rs
                       ).astype(jnp.int32)
                rays_img = rays.reshape(rays.shape[0], Hr, Wr, rays.shape[-1])
                rays_crop = jax.vmap(
                    lambda r, p: jax.lax.dynamic_slice(
                        r, (p[1], p[0], 0), (hr, wr, r.shape[-1]))
                )(rays_img, xyr)
                rays_crop = rays_crop.reshape(rays.shape[0], hr * wr,
                                              rays.shape[-1])
                out = self.render_raw(i, rays_crop, feat_vol, feats, batch,
                                      self.nerf_heads[i][l],
                                      batch["src_inps"], view_mask)
                # scatter raw samples into the full frame (parse_layer,
                # utils.py:875-887)
                n = cas.num_samples[i]
                B = out["net_output"].shape[0]

                def scatter(v, p, shape_tail):
                    full = jnp.zeros((B, Hr, Wr) + shape_tail, v.dtype)
                    vv = v.reshape((B, hr, wr) + shape_tail)
                    return jax.vmap(
                        lambda f, c, q: jax.lax.dynamic_update_slice(
                            f, c, (q[1], q[0]) + (0,) * len(shape_tail))
                    )(full, vv, p).reshape((B, Hr * Wr) + shape_tail)

                ret_layers.append({
                    "net_output": scatter(out["net_output"], xyr, (n, 4)),
                    "z_vals": scatter(out["z_vals"], xyr, (n,)),
                })

            # ---- background (network_composite.py:120-139) ---------------
            if depth_bg is None:
                depth_values, nf_bg = init_depth_values(
                    batch["near_far"][:, -1], self.cfg.bg_volume_planes[i],
                    Hv, Wv, cas.depth_inv[i])
            else:
                depth_values, nf_bg = cascade_depth_values(
                    depth_bg, std_bg, nf_bg, self.cfg.bg_volume_planes[i],
                    depth_inv_prev=cas.depth_inv[i - 1],
                    depth_inv_cur=cas.depth_inv[i],
                    up_scale=vs / cas.volume_scale[i - 1])
            volume_bg = build_cost_volume(feats_bg[f"level_{i}"], projs,
                                          depth_values, view_mask,
                                          table_bf16=self.table_bf16,
                                          fused=self._fused_vol,
                                          fast_const=self.cfg.fused_fast_const)
            feat_vol_bg, logits_bg = self.cost_regs_bg[i](volume_bg)
            depth_bg, std_bg = depth_regression(logits_bg, depth_values,
                                                cas.depth_inv[i],
                                                use_pallas=self.cfg.use_pallas)
            if not cas.render_if[i]:
                continue

            rays_bg = build_rays(batch[f"rays_{i}"], depth_bg, std_bg, nf_bg,
                                 depth_inv=cas.depth_inv[i],
                                 up_scale=rs / vs)
            out_bg = self.render_raw(i, rays_bg, feat_vol_bg, feats_bg,
                                     batch, self.nerf_heads_bg[i],
                                     batch["bg_src_inps"], view_mask)
            ret_layers.append(out_bg)

            ret_i = _composite_layers(ret_layers, num_fg_layers=L,
                                      white_bkgd=self.cfg.white_bkgd)
            ret.update({f"{k}_level{i}": v for k, v in ret_i.items()})
        return ret


def _composite_layers(layers, num_fg_layers: int, white_bkgd: bool
                      ) -> Dict[str, jnp.ndarray]:
    """z-sort fg samples, append bg, alpha-composite
    (reference utils.py:889-942 raw2outputs_composite)."""
    net_output = layers[0]["net_output"]
    z_vals = layers[0]["z_vals"]
    for l in range(1, num_fg_layers):
        net_output = jnp.concatenate([net_output, layers[l]["net_output"]],
                                     axis=-2)
        z_vals = jnp.concatenate([z_vals, layers[l]["z_vals"]], axis=-1)
    if num_fg_layers > 1:
        idx = jnp.argsort(z_vals, axis=-1)
        z_vals = jnp.take_along_axis(z_vals, idx, axis=-1)
        net_output = jnp.take_along_axis(net_output, idx[..., None], axis=-2)

    net_output = jnp.concatenate([net_output, layers[-1]["net_output"]],
                                 axis=-2)
    z_vals = jnp.concatenate([z_vals, layers[-1]["z_vals"]], axis=-1)

    alpha = 1.0 - jnp.exp(-net_output[..., 3])
    rgb = net_output[..., :3]
    T = _exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * jax.lax.stop_gradient(z_vals), axis=-1)
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return {"rgb": rgb_map, "depth": depth_map, "weights": weights}


Network = ENeRFComposite
