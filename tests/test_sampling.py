"""Bit-parity tests for sampling primitives vs torch CPU
(grid_sample align_corners=True, F.interpolate bilinear align_corners)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from enerf_tpu.ops.sampling import (
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear,
    resize_nearest,
    scale_size,
)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_2d_parity(rng, padding):
    H, W, C = 13, 17, 5
    img = rng.randn(H, W, C).astype(np.float32)
    # include far out-of-bounds and exactly-on-edge coords
    grid = (rng.rand(400, 2).astype(np.float32) * 3.0 - 1.5)
    grid[:8] = [[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 0], [2, 2], [-2, -2], [0.999, -0.999]]

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), padding)

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1,C,H,W)
    t_grid = torch.from_numpy(grid)[None, None]  # (1,1,N,2)
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode=padding,
                        align_corners=True)[0, :, 0].T.numpy()  # (N,C)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_3d_parity(rng, padding):
    D, H, W, C = 7, 9, 11, 4
    vol = rng.randn(D, H, W, C).astype(np.float32)
    grid = (rng.rand(300, 3).astype(np.float32) * 2.6 - 1.3)

    ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), padding)

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1,C,D,H,W)
    t_grid = torch.from_numpy(grid)[None, None, None]  # (1,1,1,N,3)
    ref = F.grid_sample(t_vol, t_grid, mode="bilinear", padding_mode=padding,
                        align_corners=True)[0, :, 0, 0].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,scale", [((16, 20), 2.0), ((16, 20), 4.0),
                                         ((17, 23), 2.0), ((32, 40), 0.5)])
def test_resize_bilinear_parity(rng, in_hw, scale):
    H, W = in_hw
    C = 3
    img = rng.randn(2, H, W, C).astype(np.float32)
    H2, W2 = scale_size(H, scale), scale_size(W, scale)

    ours = resize_bilinear(jnp.asarray(img), (H2, W2))

    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(t, scale_factor=scale, mode="bilinear",
                        align_corners=True, recompute_scale_factor=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_resize_nearest_parity(rng):
    img = rng.randn(1, 10, 14, 2).astype(np.float32)
    ours = resize_nearest(jnp.asarray(img), (20, 28))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(t, scale_factor=2.0, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref)
