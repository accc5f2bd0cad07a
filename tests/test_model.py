"""End-to-end model tests: init, forward shapes, jit, NaN hygiene,
padded-view invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf import ENeRF


def small_cfg():
    # tiny cascade for CPU tests: H,W must be divisible by 8
    return Config(enerf=ENeRFConfig(
        test_input_views=2,
        train_input_views=(2,),
        cas_config=CascadeConfig(
            num=2,
            volume_planes=(16, 8),
        )))


@pytest.fixture(scope="module")
def model_and_batch():
    cfg = small_cfg()
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, variables, batch, batch_np


def test_forward_shapes(model_and_batch):
    cfg, model, variables, batch, _ = model_and_batch
    out = model.apply(variables, batch)
    H, W = 64, 96
    cas = cfg.enerf.cas_config
    for i in range(cas.num):
        s = cas.render_scale[i]
        n = int(H * s) * int(W * s)
        assert out[f"rgb_level{i}"].shape == (1, n, 3)
        assert out[f"depth_level{i}"].shape == (1, n)
        vs = cas.volume_scale[i]
        assert out[f"depth_mvs_level{i}"].shape == (1, int(H * vs), int(W * vs))
        assert not np.any(np.isnan(np.asarray(out[f"rgb_level{i}"])))
        assert np.all(np.asarray(out[f"rgb_level{i}"]) >= 0.0)


def test_forward_jit(model_and_batch):
    cfg, model, variables, batch, _ = model_and_batch
    fn = jax.jit(lambda v, b: model.apply(v, b))
    out = fn(variables, batch)
    out2 = model.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(out["rgb_level1"]),
                               np.asarray(out2["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)


def test_depth_mvs_in_range(model_and_batch):
    """Regressed depth must lie inside the near/far bracket."""
    cfg, model, variables, batch, _ = model_and_batch
    out = model.apply(variables, batch)
    nf = np.asarray(batch["near_far"])[0]
    d = np.asarray(out["depth_mvs_level0"])
    assert d.min() >= nf[0] - 1e-3 and d.max() <= nf[1] + 1e-3


def test_padded_views_match_unpadded():
    """A batch padded to S_max with view_mask must equal the unpadded
    result (the static-shape contract replacing dynamic S)."""
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    # n_src=2 real views, padded to S_max=3
    b_pad = make_synthetic_batch(cfg, H=64, W=96, n_src=2)
    cfg2 = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    b_exact = make_synthetic_batch(cfg2, H=64, W=96, n_src=2)

    model_pad = ENeRF(cfg=cfg.enerf, train_mode=False)
    model_exact = ENeRF(cfg=cfg2.enerf, train_mode=False)
    jb_pad = {k: jnp.asarray(v) for k, v in b_pad.items() if k != "tar_img"}
    jb_exact = {k: jnp.asarray(v) for k, v in b_exact.items() if k != "tar_img"}

    vars_exact = model_exact.init(jax.random.PRNGKey(0), jb_exact)
    # same param shapes (S only affects activations), reuse directly
    out_pad = model_pad.apply(vars_exact, jb_pad)
    out_exact = model_exact.apply(vars_exact, jb_exact)
    np.testing.assert_allclose(np.asarray(out_pad["rgb_level1"]),
                               np.asarray(out_exact["rgb_level1"]),
                               rtol=1e-4, atol=1e-5)


def test_train_mode_batch_stats(model_and_batch):
    cfg, _, _, batch, _ = model_and_batch
    model = ENeRF(cfg=cfg.enerf, train_mode=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in variables
    out, mutated = model.apply(variables, batch, mutable=["batch_stats"])
    assert "rgb_level1" in out
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_grid_rays_path_matches_gather():
    """cfg.enerf.grid_rays replaces the per-sample trilinear volume
    gather with resize + plane contraction; on full-grid eval rays the
    two paths must agree (exact trilinear, fp-reassociation tolerance)."""
    import dataclasses

    cfg = small_cfg()
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)

    cfg_grid = dataclasses.replace(cfg.enerf, grid_rays=True)
    model_grid = ENeRF(cfg=cfg_grid, train_mode=False)

    out = model.apply(variables, batch)
    out_grid = model_grid.apply(variables, batch)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_grid[k]), np.asarray(out[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_gather_bf16_close_to_f32():
    """cfg.enerf.gather_bf16 quantizes the gather tables to bf16 — the
    rendered frame must stay close to the f32 path (speed knob, small
    feature-precision loss)."""
    import dataclasses

    cfg = small_cfg()
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_q = dataclasses.replace(cfg.enerf, gather_bf16=True)
    out_q = ENeRF(cfg=cfg_q, train_mode=False).apply(variables, batch)
    # bf16 tables: ~3 decimal digits on the features; frame-level error
    # stays small
    np.testing.assert_allclose(np.asarray(out_q["rgb_level1"]),
                               np.asarray(out["rgb_level1"]),
                               rtol=0.1, atol=0.02)
