"""Plane-sweep homography warp + variance cost volume — the hottest op
(reference lib/networks/enerf/utils.py:57-95 homo_warp, :322-349
build_feature_volume).

TPU-first design notes:
- channels-last: features (B, S, H_s, W_s, C), volume (B, D, H_t, W_t, C)
- the per-view loop of the reference is replaced by a vmap over S; the
  sum / sum-of-squares accumulation is fused into one pass
- padded (invalid) source views are handled with a per-view mask using
  masked mean/variance — the reference instead re-traces for each S
  (samplers.py:19-26 samples S in {2,3,4}); fixed S_max keeps one XLA
  program
- the gather inside bilinear sampling is the bandwidth-critical part; a
  Pallas kernel can replace `bilinear_sample_2d` later without touching
  callers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from enerf_tpu.ops.sampling import (
    bilinear_sample_2d,
    bilinear_sample_2d_multi,
)


def _warp_coords(proj_mat: jnp.ndarray, depth_values: jnp.ndarray,
                 W_s: int, H_s: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Source-view pixel coords for every (d, y, x) of the target volume.

    proj_mat: (3, 4); depth_values: (D, H_t, W_t).
    Returns (x_src, y_src) each (D, H_t, W_t), in *pixel* units.
    Reference: utils.py:62-86 (homo_warp grid computation).
    """
    D, H_t, W_t = depth_values.shape
    R = proj_mat[:, :3]  # (3, 3)
    T = proj_mat[:, 3]   # (3,)

    ys = jnp.arange(H_t, dtype=depth_values.dtype)
    xs = jnp.arange(W_t, dtype=depth_values.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H_t, W_t)

    # R @ [x, y, 1]^T  — per-pixel, depth-independent part
    base = (R[:, 0][:, None, None] * grid_x[None]
            + R[:, 1][:, None, None] * grid_y[None]
            + R[:, 2][:, None, None])  # (3, H_t, W_t)

    # + T / d — depth-dependent part
    pts = base[None] + T[None, :, None, None] / depth_values[:, None]  # (D,3,H,W)

    z = jnp.maximum(pts[:, 2], 1e-6)  # clamp_min like reference utils.py:81
    x_src = pts[:, 0] / z
    y_src = pts[:, 1] / z
    return x_src, y_src


def _warp_coords_crop(proj_mat: jnp.ndarray, depth_values: jnp.ndarray,
                      x0, y0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Like ``_warp_coords`` but the target grid starts at traced offset
    (x0, y0) — the windowed warp of the composite model (reference
    utils.py:288-320 homo_warp_composite). ``depth_values`` is already the
    cropped (D, h, w) window."""
    D, h, w = depth_values.shape
    R = proj_mat[:, :3]
    T = proj_mat[:, 3]

    ys = jnp.arange(h, dtype=depth_values.dtype) + y0
    xs = jnp.arange(w, dtype=depth_values.dtype) + x0
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")

    base = (R[:, 0][:, None, None] * grid_x[None]
            + R[:, 1][:, None, None] * grid_y[None]
            + R[:, 2][:, None, None])
    pts = base[None] + T[None, :, None, None] / depth_values[:, None]
    z = jnp.maximum(pts[:, 2], 1e-6)
    return pts[:, 0] / z, pts[:, 1] / z


def homo_warp(src_feat: jnp.ndarray, proj_mat: jnp.ndarray,
              depth_values: jnp.ndarray) -> jnp.ndarray:
    """Warp one source view's features onto target depth planes.

    src_feat: (H_s, W_s, C); proj_mat: (3, 4); depth_values: (D, H_t, W_t).
    Returns (D, H_t, W_t, C). Zero padding outside the source image
    (reference utils.py:88-90 grid_sample padding_mode='zeros').
    """
    H_s, W_s, _ = src_feat.shape
    x_src, y_src = _warp_coords(proj_mat, depth_values, W_s, H_s)
    return bilinear_sample_2d(src_feat, x_src, y_src, padding_mode="zeros")


def build_cost_volume(feats: jnp.ndarray, proj_mats: jnp.ndarray,
                      depth_values: jnp.ndarray,
                      view_mask: Optional[jnp.ndarray] = None,
                      table_bf16: bool = False,
                      fused: bool = False,
                      fast_const: bool = False) -> jnp.ndarray:
    """Variance cost volume across source views.

    feats: (B, S, H_s, W_s, C); proj_mats: (B, S, 3, 4);
    depth_values: (B, D, H_t, W_t); view_mask: optional (B, S) float/bool —
    1 for real views, 0 for padding (static-S TPU contract).
    Returns variance volume (B, D, H_t, W_t, C).

    Reference: utils.py:322-349 — Σ and Σ² accumulated over the view loop,
    variance = Σ²/S − (Σ/S)². With a mask, S becomes the per-batch count of
    valid views (identical numerics when all views valid).

    fused: eval fast path — corner blend + variance in ONE Pallas kernel
    over the gather output (ops/pallas/cost_volume.py) instead of the
    XLA elementwise chain. Requires a TPU backend or interpret mode; no
    autodiff (train keeps the jnp path).
    """
    B, S, H_s, W_s, C = feats.shape
    D, H_t, W_t = depth_values.shape[1:]
    P = D * H_t * W_t

    if fused:
        from enerf_tpu.ops.pallas.cost_volume import (
            fused_corner_variance,
            volume_tile,
        )
        from enerf_tpu.ops.sampling import corner_gather_perview

        tile = volume_tile(P, S=S, C=C,
                           v_bytes=2 if table_bf16 else 4,
                           out_bytes=jnp.dtype(feats.dtype).itemsize,
                           fast_const=fast_const)
        if tile:
            # the plane-sweep warp is AFFINE in [x, y, 1, 1/d]: pts =
            # R·[x,y,1] + T/d (utils.py:62-86) — so coords for ALL views
            # come from ONE (P, 4)×(4, 3S) contraction whose output
            # keeps the voxel dim P in SUBLANES and views in lanes.
            # Downstream (z-divide, floor, corner weights) are then
            # full-width vector ops in the fused kernel's operand
            # layout, and the gathers run per-view (VMEM-pinnable
            # tables — see corner_gather_perview).
            dt = depth_values.dtype
            gx = jnp.broadcast_to(jnp.arange(W_t, dtype=dt), (D, H_t, W_t))
            gy = jnp.broadcast_to(jnp.arange(H_t, dtype=dt)[:, None],
                                  (D, H_t, W_t))
            ones = jnp.ones((D, H_t, W_t), dt)
            G = jnp.stack([
                jnp.broadcast_to(gx, (B, D, H_t, W_t)).reshape(B, P),
                jnp.broadcast_to(gy, (B, D, H_t, W_t)).reshape(B, P),
                jnp.broadcast_to(ones, (B, D, H_t, W_t)).reshape(B, P),
                (1.0 / depth_values).reshape(B, P)], axis=-1)  # (B, P, 4)
            rhs = proj_mats.transpose(0, 3, 2, 1).reshape(B, 4, 3 * S)
            img = jnp.einsum("bmd,bde->bme", G, rhs,
                             precision=jax.lax.Precision.HIGHEST)
            z = jnp.maximum(img[..., 2 * S:3 * S], 1e-6)  # utils.py:81
            x = img[..., 0:S] / z
            y = img[..., S:2 * S] / z

            if view_mask is None:
                vm = jnp.ones((B, S, 1), jnp.float32)
            else:
                vm = view_mask.astype(jnp.float32).reshape(B, S, 1)
            # WIDE-table path (2x4-window rows): ONLY when the 2x2
            # per-view table exceeds the VMEM pin limit — the wide
            # table is half the physical bytes so it keeps pinning at
            # frame sizes where 2x2 would fall off the pinned-gather
            # cliff. At shapes where BOTH pin, 2x2 wins: its 64-lane
            # logical rows cost half the in-kernel vreg work (measured
            # +1.5 ms/frame running wide everywhere at 512×640, worst
            # at level 0 where Cp=32 doubles the gathered bytes).
            from enerf_tpu.ops.pallas.cost_volume import (
                fused_wide_variance,
                volume_tile_wide,
            )
            from enerf_tpu.ops.sampling import (
                _GATHER_MAX_SEGMENTS,
                _GATHER_PIN_LIMIT_BYTES,
                corner_gather_segments,
                wide_table_segments,
            )

            Cp_ = -(-C // 16) * 16
            item = 2 if table_bf16 else 4
            bytes_2x2 = (H_s + 1) * (W_s + 1) * 4 * Cp_ * item
            K_w = wide_table_segments(H_s, W_s, C, table_bf16)[0]
            tile_w = volume_tile_wide(
                P, S=S, C=C, K=K_w, v_bytes=item,
                out_bytes=jnp.dtype(feats.dtype).itemsize
            ) if (bytes_2x2 > _GATHER_PIN_LIMIT_BYTES
                  and K_w <= _GATHER_MAX_SEGMENTS) else 0
            vols = []
            for b in range(B):
                if tile_w:
                    segs, blendw, K, seg_rows, Cp = corner_gather_segments(
                        feats[b], x[b], y[b], padding_mode="zeros",
                        table_bf16=table_bf16)
                    vols.append(fused_wide_variance(
                        segs, blendw, vm[b], feats.dtype, S=S, Cp=Cp,
                        K=K, seg_rows=seg_rows, tile=tile_w,
                        fast_const=fast_const))
                else:
                    vs, w12, Cp = corner_gather_perview(
                        feats[b], x[b], y[b], padding_mode="zeros",
                        table_bf16=table_bf16)
                    vols.append(fused_corner_variance(
                        vs, w12, vm[b], feats.dtype, tile=tile,
                        fast_const=fast_const))
            vol = jnp.stack(vols)[..., :C]
            return vol.reshape(B, D, H_t, W_t, C)

    # coords per (B, S) via vmap (cheap elementwise math), then ONE flat
    # gather across all views — a vmapped per-view sample lowers as a
    # batched gather with a row-minor output layout, ~5x slower on TPU
    coords = jax.vmap(  # over B
        jax.vmap(lambda pm, dv: _warp_coords(pm, dv, W_s, H_s),
                 in_axes=(0, None)),  # over S
        in_axes=(0, 0))(proj_mats, depth_values)  # 2x (B,S,D,H_t,W_t)
    x_src, y_src = coords

    warped = bilinear_sample_2d_multi(
        feats.reshape(B * S, H_s, W_s, C),
        x_src.reshape(B * S, P),
        y_src.reshape(B * S, P),
        padding_mode="zeros",
        table_bf16=table_bf16).reshape(B, S, D, H_t, W_t, C)

    return _masked_variance(warped, view_mask)


def _masked_variance(warped: jnp.ndarray,
                     view_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if view_mask is None:
        mean = jnp.mean(warped, axis=1)
        sq_mean = jnp.mean(warped * warped, axis=1)
    else:
        m = view_mask.astype(warped.dtype)[:, :, None, None, None, None]
        count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(warped * m, axis=1) / count
        sq_mean = jnp.sum(warped * warped * m, axis=1) / count
    return sq_mean - mean * mean


def build_cost_volume_crop(feats: jnp.ndarray, proj_mats: jnp.ndarray,
                           depth_values: jnp.ndarray, xy0: jnp.ndarray,
                           crop_hw: Tuple[int, int],
                           view_mask: Optional[jnp.ndarray] = None,
                           table_bf16: bool = False,
                           fused: bool = False,
                           fast_const: bool = False) -> jnp.ndarray:
    """Windowed variance cost volume — the composite model's fg-layer crop
    (reference utils.py:260-320 build_feature_volume_composite +
    homo_warp_composite). The window size ``crop_hw`` = (h, w) is static;
    the position ``xy0`` (B, 2) = (x, y) at volume scale is traced.

    feats: (B, S, H_s, W_s, C); depth_values: full (B, D, H_t, W_t).
    Returns variance volume (B, D, h, w, C).

    ``fused``: eval fast path — same fused corner-blend+variance Pallas
    kernel as ``build_cost_volume`` (the window is static-SIZE, so the
    kernel tiles identically; only the gather coords carry the traced
    position). Composite-model feature maps stay under the per-view
    VMEM-pin threshold at production shapes, so the plain 2x2 per-view
    tables apply (no wide-table branch needed here).
    """
    h, w = crop_hw
    B, S = feats.shape[:2]
    D = depth_values.shape[1]

    def crop_depth(dv, xy):
        return jax.lax.dynamic_slice(dv, (0, xy[1], xy[0]), (D, h, w))

    dv_crop = jax.vmap(crop_depth)(depth_values, xy0.astype(jnp.int32))

    H_s, W_s, C = feats.shape[2:]

    def coords_one(proj_s, dv, xy):
        return _warp_coords_crop(
            proj_s, dv, xy[0].astype(dv.dtype), xy[1].astype(dv.dtype))

    coords = jax.vmap(jax.vmap(coords_one, in_axes=(0, None, None)),
                      in_axes=(0, 0, 0))(proj_mats, dv_crop, xy0)
    x_src, y_src = coords  # (B, S, D, h, w)
    P = D * h * w

    if fused:
        from enerf_tpu.ops.pallas.cost_volume import (
            fused_corner_variance,
            volume_tile,
        )
        from enerf_tpu.ops.sampling import corner_gather_perview

        tile = volume_tile(P, S=S, C=C,
                           v_bytes=2 if table_bf16 else 4,
                           out_bytes=jnp.dtype(feats.dtype).itemsize,
                           fast_const=fast_const)
        if tile:
            if view_mask is None:
                vm = jnp.ones((B, S, 1), jnp.float32)
            else:
                vm = view_mask.astype(jnp.float32).reshape(B, S, 1)
            xs = x_src.reshape(B, S, P).transpose(0, 2, 1)  # (B, P, S)
            ys = y_src.reshape(B, S, P).transpose(0, 2, 1)
            vols = []
            for b in range(B):
                vs, w12, Cp = corner_gather_perview(
                    feats[b], xs[b], ys[b], padding_mode="zeros",
                    table_bf16=table_bf16)
                vols.append(fused_corner_variance(
                    vs, w12, vm[b], feats.dtype, tile=tile,
                    fast_const=fast_const))
            vol = jnp.stack(vols)[..., :C]
            return vol.reshape(B, D, h, w, C)

    warped = bilinear_sample_2d_multi(
        feats.reshape(B * S, H_s, W_s, C),
        x_src.reshape(B * S, P),
        y_src.reshape(B * S, P),
        padding_mode="zeros",
        table_bf16=table_bf16).reshape(B, S, D, h, w, C)
    return _masked_variance(warped, view_mask)
