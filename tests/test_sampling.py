"""Bit-parity tests for sampling primitives vs torch CPU
(grid_sample align_corners=True, F.interpolate bilinear align_corners)."""

import jax
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


def test_take_rows_grad_matches_builtin(rng):
    """The custom-VJP row gather (TPU scatter-layout workaround) must be
    gradient-identical to plain jnp.take, including repeated indices."""
    import jax

    from enerf_tpu.ops.sampling import take_rows

    flat = jnp.asarray(rng.standard_normal((37, 5)), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 37, size=(4, 11)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((4, 11, 5)), jnp.float32)

    def loss_custom(f):
        return jnp.sum(take_rows(f, idx) * cot)

    def loss_ref(f):
        return jnp.sum(jnp.take(f, idx, axis=0) * cot)

    g_custom = jax.grad(loss_custom)(flat)
    g_ref = jax.grad(loss_ref)(flat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loss_custom(flat)), np.asarray(loss_ref(flat)), rtol=1e-6)


def test_take_rows_grad_bf16_cotangent(rng):
    """bf16 forward values produce bf16 cotangents; the backward must
    accumulate in the gathered array's dtype without shape errors."""
    import jax

    from enerf_tpu.ops.sampling import take_rows

    flat = jnp.asarray(rng.standard_normal((16, 3)), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 16, size=(9,)), jnp.int32)

    g = jax.grad(lambda f: jnp.sum(take_rows(f, idx).astype(jnp.float32)))(flat)
    assert g.dtype == jnp.bfloat16
    counts = np.bincount(np.asarray(idx), minlength=16).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.repeat(counts[:, None], 3, axis=1))


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("segments", [1, 3])
def test_corner_blend_wide_matches_bilinear(rng, padding, segments):
    """corner_blend_wide (2x4-window table, segment merge + parity select
    + blend in one fusion) must equal the plain per-view bilinear
    sampler on every view, including out-of-range coords."""
    import enerf_tpu.ops.sampling as sampling
    from enerf_tpu.ops.sampling import (bilinear_sample_2d,
                                        corner_blend_wide)

    V, H, W, C = 3, 19, 26, 5
    M = 131
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    x = jnp.asarray((rng.random((M, V)) * (W + 4) - 2).astype(np.float32))
    y = jnp.asarray((rng.random((M, V)) * (H + 4) - 2).astype(np.float32))

    orig = sampling._GATHER_PIN_LIMIT_BYTES
    if segments > 1:  # force the segmented path on the tiny table
        table_rows = (H + 1) * ((W + 1) // 2 + 1)
        sampling._GATHER_PIN_LIMIT_BYTES = table_rows * 8 * 16 * 4 // segments
    try:
        blended, Cp = corner_blend_wide(imgs, x, y, padding)
    finally:
        sampling._GATHER_PIN_LIMIT_BYTES = orig
    assert Cp == 16
    for s in range(V):
        ref = bilinear_sample_2d(imgs[s], x[:, s], y[:, s],
                                 padding_mode=padding)
        got = np.asarray(blended[s])[:, :C]
        np.testing.assert_allclose(got, np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(blended[s])[:, C:], 0.0)


@pytest.mark.parametrize("table_bf16", [False, True])
def test_view_last_segmented_train_gather(rng, table_bf16):
    """The segmented pinned-gather branch of _sample_2d_packed (train
    render gathers on tables past the pin limit) must match the
    unsegmented path in forward AND gradients — the backward is a
    custom VJP (one global scatter-add instead of K per-segment
    scatters), so grad parity is the load-bearing check."""
    import enerf_tpu.ops.sampling as sampling
    from enerf_tpu.ops.sampling import bilinear_sample_2d_view_last

    V, H, W, C = 3, 17, 23, 5
    M = 211
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    x = jnp.asarray((rng.random((M, V)) * (W + 4) - 2).astype(np.float32))
    y = jnp.asarray((rng.random((M, V)) * (H + 4) - 2).astype(np.float32))

    def loss(im):
        out = bilinear_sample_2d_view_last(im, x, y, padding_mode="border",
                                           table_bf16=table_bf16)
        return jnp.sum(out * out * 0.5), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(imgs)

    table_bytes = (H + 1) * (W + 1) * 4 * 16 * (2 if table_bf16 else 4)
    orig = sampling._GATHER_PIN_LIMIT_BYTES
    sampling._GATHER_PIN_LIMIT_BYTES = table_bytes // 3 + 1  # K = 3
    try:
        (l_seg, out_seg), g_seg = jax.value_and_grad(loss, has_aux=True)(imgs)
    finally:
        sampling._GATHER_PIN_LIMIT_BYTES = orig

    np.testing.assert_array_equal(np.asarray(out_seg), np.asarray(out_ref))
    np.testing.assert_allclose(float(l_seg), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
