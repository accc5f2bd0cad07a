"""Image-based-rendering feature gathering
(reference lib/networks/enerf/utils.py:456-458 get_vox_feat,
:689-722 get_img_feat, :605-612 unpreprocess).

The reference loops over source views in Python; here views are vmapped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from enerf_tpu.ops.camera import cam_centers, scale_intrinsics
from enerf_tpu.ops.sampling import (
    bilinear_sample_2d_view_last,
    corner_blend_wide,
    corner_gather_segments,
    resize_bilinear,
    scale_size,
    trilinear_sample_3d_multi,
)


def get_vox_feat(uvd: jnp.ndarray, feature_volume: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of the regularized feature volume.

    uvd: (B, N, 3) in [0, 1] (u, v, d); feature_volume: (B, D, H, W, C).
    align_corners=True: pixel coord = ndc * (size - 1)
    (reference utils.py:456-458 uses grid_sample(ndc*2-1)).
    """
    D, H, W = feature_volume.shape[1:4]
    x = uvd[..., 0] * (W - 1)
    y = uvd[..., 1] * (H - 1)
    z = uvd[..., 2] * (D - 1)
    return trilinear_sample_3d_multi(feature_volume, x, y, z,
                                     padding_mode="zeros")


def get_vox_feat_grid(feat_volume: jnp.ndarray, d: jnp.ndarray,
                      out_hw, window=None) -> jnp.ndarray:
    """Trilinear volume sampling when the rays are the FULL raster grid.

    feat_volume: (B, D, Hv, Wv, C); d: (B, N) volume-normalized depth in
    [0, 1], N = H*W*n_samples in ray-major order. The spatial (u, v)
    coordinates of a grid ray are static, so trilinear factorizes into a
    static align-corners spatial resize (MXU matmuls, see
    ``resize_bilinear``) + a tent-weighted contraction over the D planes
    — exact trilinear grid_sample-3D(zeros) numerics with no gather (the
    TPU gather emitter is per-row bound; this path removes ~8 corner
    gathers per sample). Matches ``get_vox_feat`` on grid rays.

    ``window``: ``(xy0, wh, ww)`` — rays are the raster sub-grid of a
    (wh, ww) window at per-batch origin xy0 (B, 2) int [x0, y0], in
    out_hw pixel units (the human model's masked bbox render); the
    resized volume is dynamic-sliced to the window, N = wh*ww*n.
    """
    B, D, Hv, Wv, C = feat_volume.shape
    H, W = out_hw
    vol = resize_bilinear(feat_volume, (H, W))  # (B, D, H, W, C)
    if window is not None:
        xy0, wh, ww = window
        vol = jax.vmap(lambda v, p: jax.lax.dynamic_slice(
            v, (0, p[1], p[0], 0), (D, wh, ww, C)))(vol, xy0)
        H, W = wh, ww
    n = d.shape[1] // (H * W)
    vol = vol.reshape(B, D, H * W, C)
    z = d.reshape(B, H * W, n) * (D - 1)
    # tent weight == the two-corner lerp of grid_sample, and == 0 outside
    # [k-1, k+1] (zeros padding comes out automatically); one fused
    # multiply-reduce over D (a python accumulation loop lowers as D
    # dynamic-slice fusions, measured 5.7 ms vs ~0.5 ms at 512x640)
    ks = jnp.arange(D, dtype=z.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(z[..., None] - ks)).astype(vol.dtype)
    out = jnp.einsum("bpnd,bdpc->bpnc", w, vol,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, H * W * n, C)


def get_img_feat(world_xyz: jnp.ndarray, img_feat_rgb: jnp.ndarray,
                 src_exts: jnp.ndarray, src_ixts: jnp.ndarray,
                 tar_ext: jnp.ndarray, render_scale: float,
                 table_bf16: bool = False) -> jnp.ndarray:
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

    S = img_feat_rgb.shape[1]
    C = img_feat_rgb.shape[-1]
    P = N * n

    # P-major (pixel-major, view-LAST) end to end: every tensor here is
    # (B, P, S, ·) — the order the IBR head consumes (it reduces over S
    # on axis -2). The bilinear sample is ONE flat gather with V-minor
    # indices (bilinear_sample_2d_view_last): the gather then produces
    # the consumer's layout natively. Both a per-view vmap and S-major
    # ordering make layout assignment push a row-minor layout into the
    # gather fusion, whose emitter degrades ~7x (measured 105.7 ms vs
    # ~15 ms at 512x640).
    R = src_exts[..., :3, :3]  # (B, S, 3, 3)
    t = src_exts[..., :3, 3]   # (B, S, 3)
    cam_pts = jnp.einsum("bpc,bsdc->bpsd", xyz, R) + t[:, None]
    img_pts = jnp.einsum("bpsd,bsed->bpse", cam_pts, ixt)
    z = jnp.maximum(img_pts[..., 2:], 1e-6)
    grid = img_pts[..., :2] / z  # (B, P, S, 2) pixel coords
    # static loop over B (B is 1 at eval; small in training) — each item
    # is one flat gather, vmap would batch it
    feat = jnp.stack([
        bilinear_sample_2d_view_last(
            img_feat_rgb[b], grid[b, ..., 0], grid[b, ..., 1],
            padding_mode="border", table_bf16=table_bf16)
        for b in range(B)])  # (B, P, S, C)

    tar_diff = xyz - tar_cam[:, None]  # (B, P, 3)
    src_diff = xyz[:, :, None] - src_cam[:, None]  # (B, P, S, 3)
    tar_diff = tar_diff / (jnp.linalg.norm(tar_diff, axis=-1, keepdims=True) + 1e-6)
    src_diff = src_diff / (jnp.linalg.norm(src_diff, axis=-1, keepdims=True) + 1e-6)
    ray_diff = tar_diff[:, :, None] - src_diff
    ray_diff_norm = jnp.linalg.norm(ray_diff, axis=-1, keepdims=True)
    ray_diff_dot = jnp.sum(tar_diff[:, :, None] * src_diff, axis=-1, keepdims=True)
    ray_diff_dir = ray_diff / jnp.maximum(ray_diff_norm, 1e-6)
    return jnp.concatenate([feat, ray_diff_dir, ray_diff_dot], axis=-1)


def packed_feat_layout(S: int, n: int, Cp: int):
    """Lane layout of the fused render kernel's packed operand.

    Per ray: ``n*S`` blended feature groups of Cp lanes — group
    ``(k, s)`` (sample k, view s) at lane ``(k*S + s) * Cp`` — followed
    by n 8-lane geometry groups ``[x, y, z, z_val, z01, 0, 0, 0]`` at
    lane ``n*S*Cp + k*8``; zero-padded to a 128-lane multiple (128 lanes
    == one TPU vreg row: the physical row carries no pad-lane waste,
    unlike the 2x2 corner-row layout whose 64-lane minors tiled to 128
    physical lanes).
    """
    L_feat = n * S * Cp
    L = -(-(L_feat + n * 8) // 128) * 128
    return L_feat, L


def _project_views_packed(world_xyz_km: jnp.ndarray, src_exts: jnp.ndarray,
                          src_ixts: jnp.ndarray, tar_ext: jnp.ndarray,
                          render_scale: float):
    """Projection chain shared by the fused render paths: ONE
    (M, 4)x(4, 3S) contraction with views in lane groups, so every
    downstream op (z-divide, floor, corner weights) is a full-width
    vector op. Returns ``(x, y, src_cam, tar_cam)`` with x, y (B, M, S)
    pixel coords, M = n*N sample-major."""
    B, n, N, _ = world_xyz_km.shape
    S = src_exts.shape[1]
    M = n * N

    tar_cam = cam_centers(tar_ext)
    src_cam = cam_centers(src_exts)
    ixt = scale_intrinsics(src_ixts, render_scale)

    # per-view 3x4 projection ixt_s @ ext_s[:3]; columns grouped
    # coordinate-major / view-minor so x, y, z are contiguous lane slices
    proj = jnp.einsum("bsij,bsjk->bsik", ixt, src_exts[:, :, :3, :])
    rhs = proj.transpose(0, 3, 2, 1).reshape(B, 4, 3 * S)
    xyz = world_xyz_km.reshape(B, M, 3)
    xyzh = jnp.concatenate([xyz, jnp.ones((B, M, 1), xyz.dtype)], axis=-1)
    img = jnp.einsum("bmd,bde->bme", xyzh, rhs,
                     precision=jax.lax.Precision.HIGHEST)  # (B, M, 3S)

    z = jnp.maximum(img[..., 2 * S:3 * S], 1e-6)
    x = img[..., 0:S] / z
    y = img[..., S:2 * S] / z
    return x, y, src_cam, tar_cam


def seg_geom_layout(S: int, n: int) -> int:
    """Row width Lg of the v3 fused render kernel's geometry+blend
    operand: n 8-lane geometry groups then n 4S-lane blend groups,
    zero-padded to a 128-lane multiple."""
    return -(-(n * 8 + n * 4 * S) // 128) * 128


@functools.lru_cache(maxsize=None)
def _g_placement_np(S: int, n: int):
    """0/1 lane-placement matrices assembling the v3 G operand as
    matmuls. A 14-piece lane-interleave ``concatenate`` materializes
    every narrow (N, c) piece at 128-lane-padded physical width first
    (measured: 14 copies x 0.26 ms + a 3.6 ms concat = ~7.7 ms/frame at
    512x640); two 0/1 placement dots per sample write the same rows in
    ~1 ms of MXU passes. Exact f32 at HIGHEST (0/1 weights) — a 3-way
    bf16 split-dot version was tried and measured 0.8 ms SLOWER here
    (the split converts on narrow (N, c<=12) operands don't fuse into
    the dots; each of the 12 resulting dots became its own fusion)."""
    import numpy as np

    Lg = seg_geom_layout(S, n)
    Pg = np.zeros((n, 5, Lg), np.float32)   # [xyz, zval, z01] -> k*8
    Pb = np.zeros((n, 4 * S, Lg), np.float32)
    for k in range(n):
        for c in range(5):
            Pg[k, c, k * 8 + c] = 1.0
        for j in range(4 * S):
            Pb[k, j, n * 8 + k * 4 * S + j] = 1.0
    return Pg, Pb


@functools.lru_cache(maxsize=None)
def _g_placement_all_np(S: int, n: int):
    """ONE 0/1 placement matrix for the whole G operand: rows ordered
    [xyz(3), z_val, z01, blend(4S)] per sample k. The 2n-dot + adds
    formulation above lowered as 3 separate ~0.75 ms (N, 128)-output
    fusions at 512×640 (each HIGHEST dot pays ~8 MXU passes and its own
    output write); a single (N, n*(5+4S)) x (n*(5+4S), Lg) dot writes
    the output once."""
    import numpy as np

    Lg = seg_geom_layout(S, n)
    w = 5 + 4 * S
    P = np.zeros((n * w, Lg), np.float32)
    for k in range(n):
        for c in range(5):
            P[k * w + c, k * 8 + c] = 1.0
        for j in range(4 * S):
            P[k * w + 5 + j, n * 8 + k * 4 * S + j] = 1.0
    return P


def get_img_feat_segments(world_xyz_km: jnp.ndarray,
                          img_feat_rgb: jnp.ndarray,
                          src_exts: jnp.ndarray, src_ixts: jnp.ndarray,
                          tar_ext: jnp.ndarray, render_scale: float,
                          z_vals_km: jnp.ndarray,
                          z01_km: jnp.ndarray = None,
                          table_bf16: bool = False):
    """The v3 fused-render hand-off: per-(view, segment) wide-table
    gather rows + a small geometry/blend-lane operand; the segment
    merge, parity select, and corner blend run INSIDE the render kernel
    (ops/pallas/render.py) instead of as HBM-bound XLA elementwise
    passes (see ``corner_gather_segments``).

    Same arguments as ``get_img_feat_packed``. Returns
    ``(segs, G, src_cam, tar_cam, Cp, seg_rows)``:

    - segs: per-batch list of V*K arrays (n, N, 8*Cp) (table dtype),
      view-major (view s segment k at index s*K + k), sample-split rows
    - G: (B, N, Lg) f32 — n 8-lane geometry groups
      [x, y, z, z_val, z01, 0, 0, 0] at k*8, then n 4S-lane blend
      groups [tx(S) | ty(S) | par(S) | row(S)] at n*8 + k*4S
    - seg_rows: table rows per segment (for the in-kernel merge)
    """
    B, n, N, _ = world_xyz_km.shape
    S = img_feat_rgb.shape[1]

    x, y, src_cam, tar_cam = _project_views_packed(
        world_xyz_km, src_exts, src_ixts, tar_ext, render_scale)
    zv = z_vals_km.astype(jnp.float32)
    z01 = (jnp.zeros_like(zv) if z01_km is None
           else z01_km.astype(jnp.float32))

    P_all = jnp.asarray(_g_placement_all_np(S, n))
    hi = jax.lax.Precision.HIGHEST
    all_segs = []
    gs = []
    seg_rows = Cp = None
    for b in range(B):  # static loop: one gather chain per (batch, view)
        segs, blendw, K, seg_rows, Cp = corner_gather_segments(
            img_feat_rgb[b], x[b], y[b], padding_mode="border",
            table_bf16=table_bf16)
        all_segs.append([s.reshape(n, N, 8 * Cp) for s in segs])
        # geometry + blend lanes placed by ONE 0/1 dot (exact f32; see
        # _g_placement_all_np) instead of a 14-piece narrow concat
        bw = blendw.reshape(n, N, 4 * S)
        X = jnp.concatenate(sum(
            ([world_xyz_km[b, k].astype(jnp.float32),
              zv[b, k, :, None], z01[b, k, :, None], bw[k]]
             for k in range(n)), []), axis=-1)   # (N, n*(5+4S))
        gs.append(jnp.einsum("nc,cl->nl", X, P_all, precision=hi))
    return all_segs, jnp.stack(gs), src_cam, tar_cam, Cp, seg_rows


def get_img_feat_packed(world_xyz_km: jnp.ndarray, img_feat_rgb: jnp.ndarray,
                        src_exts: jnp.ndarray, src_ixts: jnp.ndarray,
                        tar_ext: jnp.ndarray, render_scale: float,
                        z_vals_km: jnp.ndarray,
                        z01_km: jnp.ndarray = None,
                        table_bf16: bool = False):
    """Blended-feature fetch for the fused render kernel
    (ops/pallas/render.py): the projection chain, per-view wide-table
    corner gathers, segment merge, bilinear blend, and the geometry
    lanes all land in ONE lane-packed operand.

    Layout discipline: the projection runs as ONE (M, 4)x(4, 3S)
    contraction with views in lane groups, so every downstream op
    (z-divide, floor, corner weights) is a full-width vector op; the
    per-view gather -> merge -> parity-select -> blend chain is one XLA
    fusion per view (``corner_blend_wide``); and the packed operand
    hands the kernel BLENDED (M, Cp) features — 4x fewer inter-stage
    bytes than the corner-row hand-off, in exactly-128-lane physical
    rows. The kernel then spends no VPU work on corner blending.

    world_xyz_km: (B, n, N, 3) sample-major; z_vals_km (B, n, N);
    z01_km (B, n, N) volume-normalized sample depth (grid/tent mode) or
    None (lane is zero). Returns ``(A, src_cam, tar_cam, Cp)`` with A
    (B, N, L) float32, L from ``packed_feat_layout``.
    """
    B, n, N, _ = world_xyz_km.shape
    S = img_feat_rgb.shape[1]

    x, y, src_cam, tar_cam = _project_views_packed(
        world_xyz_km, src_exts, src_ixts, tar_ext, render_scale)
    zv = z_vals_km.astype(jnp.float32)
    z01 = (jnp.zeros_like(zv) if z01_km is None
           else z01_km.astype(jnp.float32))

    outs = []
    for b in range(B):  # static loop: one gather chain per (batch, view)
        blended, Cp = corner_blend_wide(
            img_feat_rgb[b], x[b], y[b], padding_mode="border",
            table_bf16=table_bf16)
        L_feat, L = packed_feat_layout(S, n, Cp)
        parts = []
        for k in range(n):
            for s in range(S):
                parts.append(jax.lax.slice_in_dim(blended[s], k * N,
                                                  (k + 1) * N, axis=0))
        for k in range(n):
            parts.append(jnp.stack(
                [world_xyz_km[b, k, :, 0], world_xyz_km[b, k, :, 1],
                 world_xyz_km[b, k, :, 2], zv[b, k], z01[b, k]],
                axis=-1).astype(jnp.float32))
            parts.append(jnp.zeros((N, 3), jnp.float32))
        if L > L_feat + n * 8:
            parts.append(jnp.zeros((N, L - L_feat - n * 8), jnp.float32))
        outs.append(jnp.concatenate(parts, axis=-1))
    return jnp.stack(outs), src_cam, tar_cam, Cp


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
