"""Human-variant masked rendering: the fixed-capacity gather/scatter path
must agree with the exact mask-multiply path (reference
network_human.py:90-107 gathers rays[mask_at_box] and scatters into
zeros)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf_human import ENeRFHuman


def _cfg(capacity, **kw):
    return Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        mask_ray_capacity=capacity,
        cas_config=CascadeConfig(num=2, volume_planes=(8, 8),
                                 render_if=(False, True)), **kw))


@pytest.fixture(scope="module")
def human_setup():
    cfg = _cfg(1.0)
    H, W = 32, 32
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")
    # box mask covering the central ~40% of rays
    mask = np.zeros((H, W), np.float32)
    mask[8:24, 8:24] = 1.0
    batch_np["mask_at_box"] = mask.reshape(1, -1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = ENeRFHuman(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, batch, variables


def _apply(cfg, batch, variables):
    model = ENeRFHuman(cfg=cfg.enerf, train_mode=False)
    return jax.jit(lambda v, b: model.apply(v, b))(variables, batch)


def test_mask_multiply_zeros_outside(human_setup):
    cfg, batch, variables = human_setup
    out = _apply(cfg, batch, variables)
    rgb = np.asarray(out["rgb_level1"])[0]
    mask = np.asarray(batch["mask_at_box"])[0]
    assert np.all(rgb[mask == 0] == 0.0)
    assert np.any(rgb[mask == 1] != 0.0)


def test_capacity_path_matches_exact(human_setup):
    cfg, batch, variables = human_setup
    out_full = _apply(cfg, batch, variables)
    # mask covers 256/1024 rays; capacity 0.5 (512 rays) fits it
    cfg_cap = _cfg(0.5)
    out_cap = _apply(cfg_cap, batch, variables)
    np.testing.assert_allclose(np.asarray(out_cap["rgb_level1"]),
                               np.asarray(out_full["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)


def test_capacity_path_matches_grid_fast_path(human_setup):
    """grid_rays=True: capacity 1.0 renders the full raster grid through
    the gather-free vox fast path; capacity 0.5 renders the masked ray
    SUBSET, which must drop back to the gather path (sub-rays are not in
    raster order) and still agree."""
    _, batch, variables = human_setup
    out_full = _apply(_cfg(1.0, grid_rays=True), batch, variables)
    out_cap = _apply(_cfg(0.5, grid_rays=True), batch, variables)
    np.testing.assert_allclose(np.asarray(out_cap["rgb_level1"]),
                               np.asarray(out_full["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)


def test_window_path_matches_exact(human_setup):
    """mask_window_hw: the static bbox-window grid render must agree
    with the exact full-grid mask-multiply path inside the mask and be
    zero outside (window covers the bbox + snap slack)."""
    _, batch, variables = human_setup
    out_full = _apply(_cfg(1.0, grid_rays=True), batch, variables)
    # mask bbox is [8:24, 8:24]; origin snaps down to (0, 0), so the
    # window must reach row/col 24 → 32 (the full frame here)
    out_win = _apply(_cfg(1.0, grid_rays=True, mask_window_hw=(32, 32)),
                     batch, variables)
    np.testing.assert_allclose(np.asarray(out_win["rgb_level1"]),
                               np.asarray(out_full["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)
    rgb = np.asarray(out_win["rgb_level1"])[0]
    mask = np.asarray(batch["mask_at_box"])[0]
    assert np.all(rgb[mask == 0] == 0.0)


def test_window_path_partial_window(human_setup):
    """A window smaller than the frame, positioned on a 16-aligned mask:
    rgb inside the mask matches the exact render, outside is zero."""
    cfg, batch, variables = human_setup
    H = W = 32
    mask = np.zeros((H, W), np.float32)
    mask[16:32, 0:16] = 1.0  # 16-aligned bbox: window (16, 16) covers it
    b2 = dict(batch)
    b2["mask_at_box"] = jnp.asarray(mask.reshape(1, -1))
    out_full = _apply(_cfg(1.0, grid_rays=True), b2, variables)
    out_win = _apply(_cfg(1.0, grid_rays=True, mask_window_hw=(16, 16)),
                     b2, variables)
    np.testing.assert_allclose(np.asarray(out_win["rgb_level1"]),
                               np.asarray(out_full["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)
    rgb = np.asarray(out_win["rgb_level1"])[0]
    assert np.all(rgb[mask.reshape(-1) == 0] == 0.0)


def test_train_mode_ignores_mask(human_setup):
    cfg, batch, variables = human_setup
    model = ENeRFHuman(cfg=cfg.enerf, train_mode=True, axis_name=None)
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    rgb = np.asarray(out["rgb_level1"])[0]
    mask = np.asarray(batch["mask_at_box"])[0]
    # training renders every sampled ray — no zeroing outside the box
    assert np.any(rgb[mask == 0] != 0.0)
