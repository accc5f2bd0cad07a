"""Parity tests for the ENeRF op library vs torch oracles implementing the
reference equations (lib/networks/enerf/utils.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from enerf_tpu.ops.camera import get_proj_mats
from enerf_tpu.ops.composite import raw2outputs, raw2outputs_layer
from enerf_tpu.ops.depth import (
    cascade_depth_values,
    depth_regression,
    init_depth_values,
)
from enerf_tpu.ops.ibr import get_img_feat, get_vox_feat, unpreprocess
from enerf_tpu.ops.rays import build_rays, sample_along_depth
from enerf_tpu.ops.warp import build_cost_volume, homo_warp


def make_cameras(rng, B, S):
    """Random but well-conditioned camera setups looking at the origin."""
    def look_at(eye):
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # world→cam rotation
        t = -R @ eye
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = R
        ext[:3, 3] = t
        return ext

    ixt = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], dtype=np.float32)
    src_exts = np.zeros((B, S, 4, 4), np.float32)
    src_ixts = np.tile(ixt, (B, S, 1, 1)).astype(np.float32)
    tar_ext = np.zeros((B, 4, 4), np.float32)
    tar_ixt = np.tile(ixt, (B, 1, 1)).astype(np.float32)
    for b in range(B):
        for s in range(S):
            ang = 0.3 * s + 0.1 * b
            eye = np.array([4 * np.sin(ang), -4 * np.cos(ang), 1.0 + 0.2 * s])
            src_exts[b, s] = look_at(eye)
        tar_ext[b] = look_at(np.array([0.3 * b, -4.2, 1.2]))
    return src_exts, src_ixts, tar_ext, tar_ixt


def torch_proj_mats(src_exts, src_ixts, tar_ext, tar_ixt, src_scale, tar_scale):
    B, S = src_exts.shape[:2]
    si = torch.from_numpy(src_ixts.copy())
    si[:, :, :2] *= src_scale
    sp = si @ torch.from_numpy(src_exts)[:, :, :3]
    ti = torch.from_numpy(tar_ixt.copy())
    ti[:, :2] *= tar_scale
    tp = ti @ torch.from_numpy(tar_ext)[:, :3]
    ones = torch.zeros(B, 1, 4)
    ones[:, :, 3] = 1
    tp = torch.cat([tp, ones], dim=1).inverse()
    return (sp.view(B, S, 3, 4) @ tp.view(B, 1, 4, 4)).numpy()


def test_proj_mats_parity(rng):
    src_exts, src_ixts, tar_ext, tar_ixt = make_cameras(rng, 2, 3)
    ours = get_proj_mats(jnp.asarray(src_exts), jnp.asarray(src_ixts),
                         jnp.asarray(tar_ext), jnp.asarray(tar_ixt), 0.25, 0.125)
    ref = torch_proj_mats(src_exts, src_ixts, tar_ext, tar_ixt, 0.25, 0.125)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def torch_homo_warp(src_feat_chw, proj, depth_values):
    """Oracle: reference utils.py:57-95 with torch primitives."""
    B, D, H_T, W_T = depth_values.shape
    C, H_S, W_S = src_feat_chw.shape[1:]
    R, T = proj[:, :, :3], proj[:, :, 3:]
    ys, xs = torch.meshgrid(torch.arange(H_T, dtype=torch.float32),
                            torch.arange(W_T, dtype=torch.float32), indexing="ij")
    grid = torch.stack([xs, ys, torch.ones_like(xs)]).reshape(1, 3, -1).expand(B, -1, -1)
    grid_d = grid.repeat(1, 1, D)
    src = R @ grid_d + T / depth_values.reshape(B, 1, -1)
    src2 = src[:, :2] / torch.clamp_min(src[:, 2:], 1e-6)
    gx = src2[:, 0] / ((W_S - 1) / 2) - 1
    gy = src2[:, 1] / ((H_S - 1) / 2) - 1
    g = torch.stack([gx, gy], dim=-1).view(B, D, H_T * W_T, 2)
    out = F.grid_sample(src_feat_chw, g, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out.view(B, C, D, H_T, W_T)


def test_homo_warp_parity(rng):
    B, S = 1, 3
    H_S, W_S, C = 24, 32, 8
    D, H_T, W_T = 6, 12, 16
    src_exts, src_ixts, tar_ext, tar_ixt = make_cameras(rng, B, S)
    feats = rng.randn(B, S, H_S, W_S, C).astype(np.float32)
    depth = np.linspace(2.0, 7.0, D, dtype=np.float32)
    depth_values = np.tile(depth[None, :, None, None], (B, 1, H_T, W_T))

    projs = np.asarray(get_proj_mats(jnp.asarray(src_exts), jnp.asarray(src_ixts),
                                     jnp.asarray(tar_ext), jnp.asarray(tar_ixt),
                                     1.0, 0.5))
    ours = homo_warp(jnp.asarray(feats[0, 0]), jnp.asarray(projs[0, 0]),
                     jnp.asarray(depth_values[0]))
    ref = torch_homo_warp(torch.from_numpy(feats[:, 0].transpose(0, 3, 1, 2)),
                          torch.from_numpy(projs[:, 0]),
                          torch.from_numpy(depth_values))
    ref = ref[0].permute(1, 2, 3, 0).numpy()  # (D, H, W, C)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_cost_volume_variance(rng):
    """Variance volume = Σ²/S − (Σ/S)² over views (utils.py:345); padded
    views with mask must equal unpadded smaller-S result."""
    B, S = 2, 3
    H_S, W_S, C = 16, 20, 4
    D, H_T, W_T = 4, 8, 10
    src_exts, src_ixts, tar_ext, tar_ixt = make_cameras(rng, B, S)
    feats = rng.randn(B, S, H_S, W_S, C).astype(np.float32)
    depth = np.linspace(2.0, 7.0, D, dtype=np.float32)
    depth_values = np.tile(depth[None, :, None, None], (B, 1, H_T, W_T))
    projs = get_proj_mats(jnp.asarray(src_exts), jnp.asarray(src_ixts),
                          jnp.asarray(tar_ext), jnp.asarray(tar_ixt), 1.0, 0.5)

    vol = build_cost_volume(jnp.asarray(feats), projs, jnp.asarray(depth_values))

    # oracle: accumulate per view with torch warp
    vs, vs2 = 0, 0
    for s in range(S):
        w = torch_homo_warp(torch.from_numpy(feats[:, s].transpose(0, 3, 1, 2)),
                            torch.from_numpy(np.asarray(projs[:, s])),
                            torch.from_numpy(depth_values))
        vs = vs + w
        vs2 = vs2 + w ** 2
    ref = (vs2 / S - (vs / S) ** 2).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(vol), ref, rtol=1e-3, atol=1e-5)

    # masked padding: S=3 valid of 4 total == plain S=3
    feats_p = np.concatenate([feats, rng.randn(B, 1, H_S, W_S, C).astype(np.float32)], 1)
    projs_p = jnp.concatenate([projs, projs[:, :1]], axis=1)
    mask = jnp.asarray(np.array([[1, 1, 1, 0]] * B, np.float32))
    vol_m = build_cost_volume(jnp.asarray(feats_p), projs_p,
                              jnp.asarray(depth_values), mask)
    np.testing.assert_allclose(np.asarray(vol_m), np.asarray(vol), rtol=1e-5, atol=1e-6)


def test_init_depth_values_inverse():
    near_far = jnp.asarray(np.array([[425.0, 905.0]], np.float32))
    dv, nf = init_depth_values(near_far, D=8, H=4, W=5, depth_inv=True)
    assert dv.shape == (1, 8, 4, 5)
    # uniform in disparity
    disp = 1.0 / np.asarray(dv)[0, :, 0, 0]
    np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0] * np.ones(7), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv)[0, 0, 0, 0], 425.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dv)[0, -1, 0, 0], 905.0, rtol=1e-5)
    # near_far returned in disparity space
    np.testing.assert_allclose(np.asarray(nf)[0, :, 0, 0],
                               [1 / 425.0, 1 / 905.0], rtol=1e-5)


def test_depth_regression_delta():
    """A delta pdf must regress to the plane value with ~zero std."""
    B, D, H, W = 1, 8, 4, 4
    logits = np.full((B, D, H, W), -50.0, np.float32)
    logits[:, 3] = 50.0
    dv = np.tile(np.linspace(2.0, 9.0, D, dtype=np.float32)[None, :, None, None],
                 (B, 1, H, W))
    depth, std = depth_regression(jnp.asarray(logits), jnp.asarray(dv), False)
    np.testing.assert_allclose(np.asarray(depth), dv[:, 3], rtol=1e-5)
    assert np.all(np.asarray(std) < 1e-3)


def test_depth_regression_inverse_space():
    """With depth_inv, regression happens in disparity (utils.py:659-660)."""
    B, D, H, W = 1, 4, 2, 2
    logits = np.zeros((B, D, H, W), np.float32)  # uniform pdf
    dv = np.tile(np.array([2.0, 4.0, 5.0, 10.0], np.float32)[None, :, None, None],
                 (B, 1, H, W))
    depth, _ = depth_regression(jnp.asarray(logits), jnp.asarray(dv), True)
    expected = np.mean(1.0 / np.array([2.0, 4.0, 5.0, 10.0]))
    np.testing.assert_allclose(np.asarray(depth)[0, 0, 0], expected, rtol=1e-5)


def test_cascade_depth_values():
    """Level-1 planes span [1/(depth+std), 1/(depth-std)] clamped to the
    level-0 volume (utils.py:112-147), uniform in depth when depth_inv=False."""
    B, h, w = 1, 4, 5
    depth = np.full((B, h, w), 1 / 500.0, np.float32)  # disparity
    std = np.full((B, h, w), 1 / 5000.0, np.float32)
    near_far = np.stack([np.full((B, h, w), 1 / 425.0, np.float32),
                         np.full((B, h, w), 1 / 905.0, np.float32)], axis=1)
    dv, nf = cascade_depth_values(jnp.asarray(depth), jnp.asarray(std),
                                  jnp.asarray(near_far), D=4,
                                  depth_inv_prev=True, depth_inv_cur=False,
                                  up_scale=2.0)
    assert dv.shape == (B, 4, 8, 10)
    near_d = 1.0 / (1 / 500.0 + 1 / 5000.0)
    far_d = 1.0 / (1 / 500.0 - 1 / 5000.0)
    np.testing.assert_allclose(np.asarray(dv)[0, 0, 0, 0], near_d, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv)[0, -1, 0, 0], far_d, rtol=1e-4)
    steps = np.diff(np.asarray(dv)[0, :, 0, 0])
    np.testing.assert_allclose(steps, steps[0] * np.ones(3), rtol=1e-4)
    # clamping against the volume bounds
    depth2 = np.full((B, h, w), 1 / 400.0, np.float32)  # nearer than near plane
    dv2, _ = cascade_depth_values(jnp.asarray(depth2), jnp.asarray(std),
                                  jnp.asarray(near_far), D=4,
                                  depth_inv_prev=True, depth_inv_cur=False,
                                  up_scale=1.0)
    np.testing.assert_allclose(np.asarray(dv2)[0, 0, 0, 0], 425.0, rtol=1e-5)


def test_build_rays_and_sampling():
    B, h, w = 1, 4, 4
    H, W = 8, 8  # render scale 2x volume scale
    depth = np.full((B, h, w), 1 / 500.0, np.float32)
    std = np.full((B, h, w), 1 / 5000.0, np.float32)
    near_far = np.stack([np.full((B, h, w), 1 / 425.0, np.float32),
                         np.full((B, h, w), 1 / 905.0, np.float32)], axis=1)
    N = H * W
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rays8 = np.zeros((B, N, 8), np.float32)
    rays8[..., 3:6] = np.array([0, 0, 1.0])
    rays8[..., 6] = xs.reshape(-1)
    rays8[..., 7] = ys.reshape(-1)

    rays = build_rays(jnp.asarray(rays8), jnp.asarray(depth), jnp.asarray(std),
                      jnp.asarray(near_far), depth_inv=True, up_scale=2.0)
    assert rays.shape == (B, N, 12)
    r = np.asarray(rays)
    np.testing.assert_allclose(r[0, 0, 8], 1 / 500.0 + 1 / 5000.0, rtol=1e-5)
    np.testing.assert_allclose(r[0, 0, 9], 1 / 500.0 - 1 / 5000.0, rtol=1e-5)
    np.testing.assert_allclose(r[0, 0, 10:12], [1 / 425.0, 1 / 905.0], rtol=1e-5)

    world, uvd, z = sample_along_depth(rays, n_samples=2, depth_inv=True)
    assert world.shape == (B, N, 2, 3)
    # sample z == disparity endpoints; world z = 1/disp along +z ray
    np.testing.assert_allclose(np.asarray(z)[0, 0], [r[0, 0, 8], r[0, 0, 9]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(world)[0, 0, :, 2],
                               [1 / r[0, 0, 8], 1 / r[0, 0, 9]], rtol=1e-5)
    # uvd d-channel normalized within volume disparity bounds
    d0 = (r[0, 0, 10] - r[0, 0, 8]) / (r[0, 0, 10] - r[0, 0, 11])
    np.testing.assert_allclose(np.asarray(uvd)[0, 0, 0, 2], d0, rtol=1e-4)


def test_raw2outputs_parity(rng):
    B, N, n = 2, 64, 2
    raw = rng.rand(B, N, n, 4).astype(np.float32) * 2
    z = np.sort(rng.rand(B, N, n).astype(np.float32) * 5, axis=-1)

    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), white_bkgd=False)

    t_raw, t_z = torch.from_numpy(raw), torch.from_numpy(z)
    alpha = 1 - torch.exp(-t_raw[..., 3])
    T = torch.cumprod(1 - alpha + 1e-10, dim=-1)[..., :-1]
    T = torch.cat([torch.ones_like(alpha[..., :1]), T], dim=-1)
    weights = alpha * T
    rgb_ref = torch.sum(weights[..., None] * t_raw[..., :3], dim=-2)
    depth_ref = torch.sum(F.softmax(weights, dim=-1) * t_z, dim=-1)

    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_ref.numpy(), rtol=1e-5, atol=1e-6)

    out_w = raw2outputs(jnp.asarray(raw), jnp.asarray(z), white_bkgd=True)
    rgb_w = rgb_ref + (1 - weights.sum(-1)[..., None])
    np.testing.assert_allclose(np.asarray(out_w["rgb"]), rgb_w.numpy(), rtol=1e-5, atol=1e-6)


def test_raw2outputs_layer_sorts(rng):
    B, N = 1, 8
    raw1 = rng.rand(B, N, 2, 4).astype(np.float32)
    raw2 = rng.rand(B, N, 3, 4).astype(np.float32)
    z1 = rng.rand(B, N, 2).astype(np.float32) * 5
    z2 = rng.rand(B, N, 3).astype(np.float32) * 5
    out = raw2outputs_layer([jnp.asarray(raw1), jnp.asarray(raw2)],
                            [jnp.asarray(z1), jnp.asarray(z2)])
    assert out["rgb"].shape == (B, N, 3)
    # merged z must be sorted inside the compositor
    merged = np.sort(np.concatenate([z1, z2], axis=-1), axis=-1)
    idx = np.asarray(out["idx"])
    z_all = np.concatenate([z1, z2], axis=-1)
    np.testing.assert_allclose(np.take_along_axis(z_all, idx, -1), merged)


def test_get_vox_feat_parity(rng):
    B, D, H, W, C = 1, 6, 8, 10, 8
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    uvd = rng.rand(B, 50, 3).astype(np.float32)
    ours = get_vox_feat(jnp.asarray(uvd), jnp.asarray(vol))
    t_vol = torch.from_numpy(vol.transpose(0, 4, 1, 2, 3))
    t_g = torch.from_numpy(uvd)[:, None, None] * 2 - 1
    ref = F.grid_sample(t_vol, t_g, align_corners=True)[:, :, 0, 0].permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_get_img_feat(rng):
    B, S = 1, 3
    H, W, C = 30, 40, 11  # 8 feat + 3 rgb
    src_exts, src_ixts, tar_ext, tar_ixt = make_cameras(rng, B, S)
    feats = rng.randn(B, S, H, W, C).astype(np.float32)
    world = rng.randn(B, 20, 2, 3).astype(np.float32) * 0.5

    out = get_img_feat(jnp.asarray(world), jnp.asarray(feats),
                       jnp.asarray(src_exts), jnp.asarray(src_ixts),
                       jnp.asarray(tar_ext), render_scale=0.25)
    assert out.shape == (B, 40, S, C + 4)

    # oracle for view 0, reference utils.py:698-721
    xyz = torch.from_numpy(world.reshape(B, -1, 3))
    xyz1 = torch.cat([xyz, torch.ones_like(xyz[..., :1])], dim=-1)
    ext = torch.from_numpy(src_exts[:, 0])
    ixt = torch.from_numpy(src_ixts[:, 0].copy())
    ixt[:, :2] *= 0.25
    cam = (xyz1 @ ext.transpose(-1, -2))[..., :3] @ ixt.transpose(-1, -2)
    grid = cam[..., :2] / torch.clamp_min(cam[..., 2:], 1e-6)
    gx = grid[..., 0] / (W - 1) * 2 - 1
    gy = grid[..., 1] / (H - 1) * 2 - 1
    g = torch.stack([gx, gy], -1)[:, None]
    feat_ref = F.grid_sample(torch.from_numpy(feats[:, 0].transpose(0, 3, 1, 2)),
                             g, align_corners=True, mode="bilinear",
                             padding_mode="border")[:, :, 0].permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out)[:, :, 0, :C], feat_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    tar_c = torch.from_numpy(tar_ext).inverse()[:, :3, 3]
    src_c = ext.inverse()[:, :3, 3]
    td = xyz - tar_c[:, None]
    sd = xyz - src_c[:, None]
    td = td / (td.norm(dim=-1, keepdim=True) + 1e-6)
    sd = sd / (sd.norm(dim=-1, keepdim=True) + 1e-6)
    rd = td - sd
    dot = (td * sd).sum(-1, keepdim=True)
    rdir = rd / torch.clamp(rd.norm(dim=-1, keepdim=True), min=1e-6)
    np.testing.assert_allclose(np.asarray(out)[:, :, 0, C:C + 3], rdir.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[:, :, 0, C + 3:], dot.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_unpreprocess(rng):
    x = (rng.rand(1, 2, 8, 10, 3).astype(np.float32) * 2 - 1)
    out = unpreprocess(jnp.asarray(x), render_scale=0.5)
    assert out.shape == (1, 2, 4, 5, 3)
    full = unpreprocess(jnp.asarray(x), render_scale=1.0)
    np.testing.assert_allclose(np.asarray(full), x * 0.5 + 0.5, rtol=1e-6)
