"""Cascade generalizable ENeRF network
(reference lib/networks/enerf/network.py:11-113).

Per cascade level: variance cost volume (plane-sweep over source features)
→ 3D CNN regularization → softmax depth regression → depth-guided 2-sample
rays → IBR MLP shading → alpha compositing. Two levels in the stock config
(coarse 1/8-res 64-plane, fine 1/2-res 8-plane).

TPU redesign vs the reference:
- one static XLA program: no chunk loop (network.py:45-55), no dynamic
  source-view count — padded S_max views with ``view_mask``
- channels-last layouts; cost volume (B, D, H, W, C)
- batch dict is a flat dict of fixed-shape jnp arrays
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from enerf_tpu.config import ENeRFConfig
from enerf_tpu.models.cost_reg import CostRegNet, MinCostRegNet
from enerf_tpu.models.feature_net import FeatureNet
from enerf_tpu.models.nerf_head import NeRFHead
from enerf_tpu.ops.camera import get_proj_mats
from enerf_tpu.ops.composite import raw2outputs
from enerf_tpu.ops.depth import (
    cascade_depth_values,
    depth_regression,
    init_depth_values,
)
from enerf_tpu.ops.ibr import (
    get_img_feat,
    get_img_feat_packed,
    get_vox_feat,
    get_vox_feat_grid,
    unpreprocess,
)


from enerf_tpu.ops.pallas import fused_available as _fused_available
from enerf_tpu.ops.rays import build_rays, sample_along_depth
from enerf_tpu.ops.sampling import resize_bilinear, scale_size
from enerf_tpu.ops.warp import build_cost_volume


def _fused_tile(n_rays: int, *, S: int, n: int, feat_ch: int,
                vox_lanes: int, v_bytes: int,
                seg_plan=None) -> int:
    """Ray-tile size for the fused render kernel, chosen from a scoped-
    VMEM budget (0 = nothing fits — caller falls back to the jnp path).

    Round 1 shipped a "largest divisor" picker with no budget model; at
    512x640 the kernel wanted 73.64 MB against a 64 MB limit, silently
    fell back, and the headline FPS came from the slow rung. The budget
    model lives in ops/pallas/__init__.py (``fused_vmem_tile``) so the
    tile pickers and the jit compiler options stay in agreement.

    ``seg_plan``: (K, table_itemsize) — the v3 in-kernel-blend path's
    extra operands: V*K per-(view, segment) gather-row blocks of
    n*8*Cp*itemsize bytes per row replace the packed-feature lanes.
    """
    from enerf_tpu.ops.ibr import packed_feat_layout, seg_geom_layout
    from enerf_tpu.ops.pallas import fused_vmem_tile

    Cp = -(-feat_ch // 16) * 16
    if seg_plan is not None:
        K, itemsize = seg_plan
        per_row = (seg_geom_layout(S, n) * 4   # geometry + blend lanes
                   + S * K * n * 8 * Cp * itemsize  # gather-row blocks
                   + vox_lanes * v_bytes
                   + 16 * 4)
        # in-kernel blend temporaries: per (k, s) one (T, 8Cp) f32 merge
        # + weight rows — a few more live vregs than v2
        interm = 14 * 1024
    else:
        _, L = packed_feat_layout(S, n, Cp)
        per_row = (L * 4                  # packed feats + geometry (f32)
                   + vox_lanes * v_bytes  # vox features / volume planes
                   + 16 * 4)              # out block
        # ~12 KB/row of kernel-body temporaries: the lane-packed v2
        # kernel keeps ~20 live (T, <=S*64) f32 vregs vs v1's ~35
        # lane-starved ones
        interm = 12 * 1024
    return fused_vmem_tile(n_rays, out_lanes=16,
                           block_bytes_per_row=per_row,
                           interm_bytes_per_row=interm)


class ENeRF(nn.Module):
    cfg: ENeRFConfig
    train_mode: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        cas = self.cfg.cas_config
        self.feature_net = FeatureNet(train=self.train_mode,
                                      axis_name=self.axis_name,
                                      dtype=self.dtype)
        cost_regs = []
        nerf_heads = []
        for i in range(cas.num):
            reg_cls = MinCostRegNet if i == 0 else CostRegNet
            cost_regs.append(reg_cls(train=self.train_mode,
                                     axis_name=self.axis_name,
                                     dtype=self.dtype,
                                     name=f"cost_reg_{i}"))
            nerf_heads.append(NeRFHead(feat_ch=cas.nerf_model_feat_ch[i] + 3,
                                       viewdir_agg=self.cfg.viewdir_agg,
                                       dtype=self.dtype,
                                       name=f"nerf_{i}"))
        self.cost_regs = cost_regs
        self.nerf_heads = nerf_heads

    @property
    def table_bf16(self) -> bool:
        """Eval: bf16 gather tables follow ``cfg.gather_bf16`` (a speed/
        precision trade). Train: tables are bf16 iff the compute dtype
        is bf16 — the features feeding them are ALREADY bf16 conv
        outputs, so the f32 table upconvert adds bytes but no
        information (lossless; the only numerics change is the VJP
        scatter's single final rounding to bf16, standard
        mixed-precision practice). f32-compute training keeps f32
        tables, so ``cfg.gather_bf16`` never changes f32 pretraining."""
        if self.train_mode:
            return jnp.dtype(self.dtype) == jnp.bfloat16
        return self.cfg.gather_bf16

    def forward_feat(self, src_inps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """FPN features for all source views (reference network.py:58-67)."""
        B, S, H, W, C = src_inps.shape
        x = src_inps.reshape(B * S, H, W, C)
        feat2, feat1, feat0 = self.feature_net(x)
        return {
            "level_2": feat0.reshape(B, S, H, W, feat0.shape[-1]),
            "level_1": feat1.reshape(B, S, H // 2, W // 2, feat1.shape[-1]),
            "level_0": feat2.reshape(B, S, H // 4, W // 4, feat2.shape[-1]),
        }

    def render_level(self, level: int, rays: jnp.ndarray,
                     feat_volume: jnp.ndarray, feats: Dict[str, jnp.ndarray],
                     batch: Dict[str, jnp.ndarray],
                     view_mask: Optional[jnp.ndarray],
                     grid: Optional[bool] = None,
                     window=None) -> Dict[str, jnp.ndarray]:
        """Depth-guided sampling + IBR shading (reference network.py:24-43).

        ``grid``: the rays are the full raster grid in raster order
        (enables the gather-free vox sampling + in-kernel tent blend);
        None = follow ``cfg.grid_rays`` in eval. Callers rendering a ray
        SUBSET (the human model's masked path) must pass False — unless
        the subset is a raster-order WINDOW of the grid, passed via
        ``window=(xy0 (B, 2) int [x0, y0] at render scale, wh, ww)``
        with grid=True: the grid fast paths then apply to the window
        (the vox volume is dynamic-sliced after its static resize).

        In train mode with ``train_render_chunk`` set, rays render in
        fixed tiles under jax.checkpoint (remat) via lax.map: backward
        activations of the per-ray MLP are bounded by the tile size —
        full-image training at 512×640 needs this to fit 16GB HBM."""
        chunk = self.cfg.train_render_chunk
        N = rays.shape[1]
        if (self.train_mode and 0 < chunk < N and N % chunk == 0
                and not self.is_initializing()):
            head = self.nerf_heads[level]
            head_vars = head.variables  # Dense-only head: no mutable state

            def tile_fn(rays_tile):
                # barrier the captured maps: without it, layout
                # assignment propagates the scan carry's channel-major
                # layout into the IBR gathers and the body lowers with
                # serial emitters (unrolling instead fixes the speed
                # but overflows HBM)
                fv, fts, bt = jax.lax.optimization_barrier(
                    (feat_volume, feats, batch))
                return self._render_rays(level, rays_tile, fv,
                                         fts, bt, view_mask,
                                         head_apply=lambda *a: head.apply(
                                             head_vars, *a),
                                         grid=grid)

            tiles = rays.reshape(rays.shape[0], N // chunk, chunk,
                                 rays.shape[-1]).swapaxes(0, 1)
            out = jax.lax.map(jax.checkpoint(tile_fn), tiles)
            return {k: v.swapaxes(0, 1).reshape((rays.shape[0], N)
                                                + v.shape[3:])
                    for k, v in out.items()}
        return self._render_rays(level, rays, feat_volume, feats, batch,
                                 view_mask,
                                 head_apply=self.nerf_heads[level],
                                 grid=grid, window=window,
                                 packed_ok=True)

    def _render_rays(self, level: int, rays: jnp.ndarray,
                     feat_volume: jnp.ndarray, feats: Dict[str, jnp.ndarray],
                     batch: Dict[str, jnp.ndarray],
                     view_mask: Optional[jnp.ndarray],
                     head_apply,
                     grid: Optional[bool] = None,
                     window=None, packed_ok: bool = False
                     ) -> Dict[str, jnp.ndarray]:
        cas = self.cfg.cas_config
        world_xyz, uvd, z_vals = sample_along_depth(
            rays, n_samples=cas.num_samples[level], depth_inv=cas.depth_inv[level])
        B, N_rays, N_samples = world_xyz.shape[:3]

        rgbs = unpreprocess(batch["src_inps"], render_scale=cas.render_scale[level])
        im_feat = feats[f"level_{cas.render_im_feat_level[level]}"]
        up_feat_scale = cas.render_scale[level] / cas.im_ibr_scale[level]
        if up_feat_scale != 1.0:
            h, w = im_feat.shape[2:4]
            im_feat = resize_bilinear(
                im_feat, (scale_size(h, up_feat_scale), scale_size(w, up_feat_scale)))
        img_feat_rgb = jnp.concatenate([im_feat, rgbs], axis=-1)

        H_O, W_O = batch["src_inps"].shape[2:4]
        H = int(H_O * cas.render_scale[level])
        W = int(W_O * cas.render_scale[level])
        norm = jnp.array([1.0 / (W - 1), 1.0 / (H - 1), 1.0], dtype=uvd.dtype)
        uvd = uvd * norm

        grid_mode = (self.cfg.grid_rays and not self.train_mode
                     if grid is None else grid)
        Dv, Cv = feat_volume.shape[1], feat_volume.shape[-1]
        seg_plan = None
        if self.cfg.fused_gather_blend:
            from enerf_tpu.ops.sampling import wide_table_segments
            Hs, Ws = img_feat_rgb.shape[2:4]
            K_seg = wide_table_segments(Hs, Ws, img_feat_rgb.shape[-1],
                                        self.table_bf16)[0]
            seg_plan = (K_seg, 2 if self.table_bf16 else 4)
        fused_tile = _fused_tile(
            N_rays, S=img_feat_rgb.shape[1], n=N_samples,
            feat_ch=img_feat_rgb.shape[-1],
            vox_lanes=(Dv if grid_mode else N_samples) * Cv,
            v_bytes=jnp.dtype(feat_volume.dtype).itemsize,
            seg_plan=seg_plan,
        ) if (self.cfg.fused_render and not self.train_mode
              and not self.is_initializing() and _fused_available()) else 0

        # TRAIN on the lane-packed layout (render_rays_packed_xla): the
        # eval kernels' packed operands + the same math as plain
        # differentiable XLA — kills the per-view narrow-lane jnp head's
        # ~100 ms/step of 128-pad relayout traffic at 512×640. Unchunked
        # renders only (the remat tile path keeps the jnp head).
        packed_train = (self.train_mode and packed_ok
                        and self.cfg.train_packed_render
                        and not self.is_initializing())
        if packed_train and grid_mode:
            vol = feat_volume.transpose(0, 2, 3, 1, 4).reshape(
                B, feat_volume.shape[2], feat_volume.shape[3], Dv * Cv)
            vol = resize_bilinear(vol, (H, W))
            vol = vol.reshape(B, N_rays, Dv * Cv)
            return self._render_rays_fused(level, world_xyz, z_vals,
                                           vol, img_feat_rgb, batch,
                                           view_mask, 0, cv=Cv,
                                           z01=uvd[..., 2], tent=True,
                                           use_kernel=False)
        if packed_train:
            vox_feat = get_vox_feat(uvd.reshape(B, -1, 3), feat_volume)
            return self._render_rays_fused(
                level, world_xyz, z_vals,
                vox_feat.reshape(B, N_rays, N_samples * Cv),
                img_feat_rgb, batch, view_mask, 0, cv=Cv,
                use_kernel=False)

        if fused_tile and grid_mode:
            # grid rays + fused kernel: the trilinear depth blend happens
            # IN the render kernel (tent_vox) — only the static spatial
            # resize of the feature volume runs in XLA (MXU matmuls).
            # Plane-major lane packing (B, N, Dv*Cv): transpose the
            # SMALL pre-resize volume, then resize over rows so the big
            # tensor is born in the kernel's layout
            vol = feat_volume.transpose(0, 2, 3, 1, 4).reshape(
                B, feat_volume.shape[2], feat_volume.shape[3], Dv * Cv)
            vol = resize_bilinear(vol, (H, W))
            if window is not None:
                xy0, wh, ww = window
                vol = jax.vmap(lambda v, p: jax.lax.dynamic_slice(
                    v, (p[1], p[0], 0), (wh, ww, Dv * Cv)))(vol, xy0)
            vol = vol.reshape(B, N_rays, Dv * Cv)
            return self._render_rays_fused(level, world_xyz, z_vals,
                                           vol, img_feat_rgb, batch,
                                           view_mask, fused_tile, cv=Cv,
                                           z01=uvd[..., 2], tent=True)

        if grid_mode:
            vox_feat = get_vox_feat_grid(
                feat_volume, uvd.reshape(B, -1, 3)[..., 2], (H, W),
                window=window)
        else:
            vox_feat = get_vox_feat(uvd.reshape(B, -1, 3), feat_volume)

        if fused_tile:
            # per-sample vox rows are ray-major: (B, N*n, Cv) -> the
            # kernel's (B, N, n*Cv) lane packing is a row-split reshape
            return self._render_rays_fused(
                level, world_xyz, z_vals,
                vox_feat.reshape(B, N_rays, N_samples * Cv),
                img_feat_rgb, batch, view_mask, fused_tile, cv=Cv)

        img_feat_rgb_dir = get_img_feat(
            world_xyz, img_feat_rgb, batch["src_exts"], batch["src_ixts"],
            batch["tar_ext"], render_scale=cas.render_scale[level],
            table_bf16=self.table_bf16)
        net_output = head_apply(vox_feat, img_feat_rgb_dir, view_mask)
        net_output = net_output.reshape(B, N_rays, N_samples, net_output.shape[-1])
        return raw2outputs(net_output, z_vals, self.cfg.white_bkgd)

    def _render_rays_fused(self, level: int, world_xyz, z_vals, vox_packed,
                           img_feat_rgb, batch, view_mask, tile: int,
                           cv: int = 8, z01=None, tent: bool = False,
                           use_kernel: bool = True):
        """Eval fast path: wide-table gathers + bilinear blend in XLA
        emit ONE lane-packed operand; everything after — ray-diff
        features, IBR head MLPs (block-diagonal over views), softmax
        view blending, alpha compositing — runs in ONE Pallas kernel
        (ops/pallas/render.py). Numerics match the jnp path
        (fp-reassociation tolerance).

        vox_packed: (B, N, D*Cv) spatially-resized volume (tent; the
        kernel does the depth blend from z01 (B, N, n)) or (B, N, n*Cv)
        per-sample trilinear features."""
        from enerf_tpu.ops.ibr import get_img_feat_segments
        from enerf_tpu.ops.pallas.render import fused_render_rays

        cas = self.cfg.cas_config
        B, N_rays, n = world_xyz.shape[:3]
        S = img_feat_rgb.shape[1]

        xyz_km = world_xyz.transpose(0, 2, 1, 3)        # (B, n, N, 3)
        z_km = z_vals.transpose(0, 2, 1)                # (B, n, N)
        z01_km = z01.transpose(0, 2, 1) if tent else None
        segs = [None] * B
        seg_rows = 0
        if self.cfg.fused_gather_blend and use_kernel:
            # v3: gather rows go straight to the kernel; merge + parity
            # + corner blend happen in VMEM (ops/pallas/render.py)
            segs, A, src_cam, tar_cam, Cp, seg_rows = get_img_feat_segments(
                xyz_km, img_feat_rgb, batch["src_exts"],
                batch["src_ixts"], batch["tar_ext"],
                render_scale=cas.render_scale[level],
                z_vals_km=z_km, z01_km=z01_km,
                table_bf16=self.table_bf16)
        else:
            A, src_cam, tar_cam, Cp = get_img_feat_packed(
                xyz_km, img_feat_rgb, batch["src_exts"], batch["src_ixts"],
                batch["tar_ext"], render_scale=cas.render_scale[level],
                z_vals_km=z_km, z01_km=z01_km,
                table_bf16=self.table_bf16)

        head = self.nerf_heads[level]
        if view_mask is None:
            vm = jnp.ones((B, S), jnp.float32)
        else:
            vm = view_mask.astype(jnp.float32).reshape(B, S)
        Cv = cv if head.use_vox_feat else 0
        if not use_kernel:
            # differentiable XLA twin (train path): same packed operands
            # and math, no Pallas, no tile constraint
            from enerf_tpu.ops.pallas.render import render_rays_packed_xla

            outs = [render_rays_packed_xla(
                A[b], vox_packed[b], head.variables,
                src_cam[b], tar_cam[b], vm[b],
                S=S, n=n, Cp=Cp, Cf=head.feat_ch, Cv=Cv,
                white_bkgd=self.cfg.white_bkgd,
                viewdir_agg=self.cfg.viewdir_agg,
                use_vox_feat=head.use_vox_feat, tent_vox=tent)
                for b in range(B)]
            out = jnp.stack(outs)
            return {"rgb": out[..., 0:3], "depth": out[..., 3],
                    "weights": out[..., 4:4 + n]}
        outs = [fused_render_rays(
            A[b], vox_packed[b], head.variables,
            src_cam[b], tar_cam[b], vm[b],
            S=S, n=n, Cp=Cp, Cf=head.feat_ch, Cv=Cv,
            white_bkgd=self.cfg.white_bkgd,
            viewdir_agg=self.cfg.viewdir_agg,
            use_vox_feat=head.use_vox_feat, tent_vox=tent, tile=tile,
            segs=segs[b], seg_rows=seg_rows,
            fast_const=self.cfg.fused_fast_const)
            for b in range(B)]
        out = jnp.stack(outs)
        return {"rgb": out[..., 0:3], "depth": out[..., 3],
                "weights": out[..., 4:4 + n]}

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
                                       depth_values, view_mask,
                                       table_bf16=self.table_bf16,
                                       fused=(self.cfg.fused_volume
                                              and not self.train_mode
                                              and not self.is_initializing()
                                              and _fused_available()),
                                       fast_const=self.cfg.fused_fast_const)
            feat_volume, depth_logits = self.cost_regs[i](volume)
            depth, std = depth_regression(depth_logits, depth_values,
                                          cas.depth_inv[i],
                                          use_pallas=self.cfg.use_pallas)
            if not cas.render_if[i]:
                continue

            ret_i = self._render_stage(i, depth, std, near_far,
                                       feat_volume, feats, batch, view_mask)
            ret_i["depth_mvs"] = (1.0 / depth) if cas.depth_inv[i] else depth
            ret_i["std"] = std
            ret.update({f"{k}_level{i}": v for k, v in ret_i.items()})
        return ret

    def _render_stage(self, level: int, depth, std, near_far, feat_volume,
                      feats, batch, view_mask) -> Dict[str, jnp.ndarray]:
        """Build depth-guided rays and render one cascade level — the
        variant hook (the human model overrides this with masked sparse
        rendering, reference network_human.py:90-107)."""
        cas = self.cfg.cas_config
        grid = self.cfg.grid_rays and not self.train_mode
        if self.cfg.grid_rays and self.train_mode and cas.train_img[level]:
            # full-image training (train_img): the host ray builder
            # emits the FULL raster grid in raster order, so the eval
            # grid fast paths (gather-free ray bounds + tent-vox
            # sampling; all differentiable XLA) apply in train too —
            # measured ~45 ms/step of build_rays/vox gathers plus their
            # backward scatters at 512×640. Remat tiles break the
            # raster-order contract (a 65536-ray tile is not a whole
            # row block at W=640), so only the unchunked path qualifies.
            N = batch[f"rays_{level}"].shape[1]
            chunk = self.cfg.train_render_chunk
            if not (0 < chunk < N and N % chunk == 0):
                grid = True
        rays = build_rays(batch[f"rays_{level}"], depth, std, near_far,
                          depth_inv=cas.depth_inv[level],
                          up_scale=(cas.render_scale[level]
                                    / cas.volume_scale[level]),
                          grid=grid)
        return self.render_level(level, rays, feat_volume, feats, batch,
                                 view_mask, grid=grid)


# factory alias (each network module exposes ``Network``, mirroring the
# reference's per-module Network classes; see enerf_tpu.factory)
Network = ENeRF
