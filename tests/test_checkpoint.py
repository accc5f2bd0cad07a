"""Checkpoint/resume round-trips (reference lib/utils/net_utils.py:350-512:
numbered epochs + retention 5, weights-only eval load, cross-experiment
warm start, config snapshot)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import Config
from enerf_tpu.train import checkpoint as ckpt
from enerf_tpu.train.state import create_train_state


def _variables(seed: float):
    return {
        "params": {"dense": {"kernel": jnp.full((3, 4), seed),
                             "bias": jnp.zeros((4,))}},
        "batch_stats": {"bn": {"mean": jnp.full((4,), seed * 2.0),
                               "var": jnp.ones((4,))}},
    }


def _state(seed: float = 1.0):
    return create_train_state(Config(), _variables(seed))


def test_save_load_round_trip(tmp_path):
    d = str(tmp_path / "exp")
    state = _state(3.5)
    state = state.replace(step=123)
    ckpt.save_model(d, state, epoch=7)

    fresh = _state(0.0)
    restored, next_epoch = ckpt.load_model(d, fresh)
    assert next_epoch == 8  # reference returns saved epoch + 1
    assert restored.step == 123
    np.testing.assert_array_equal(
        restored.params["dense"]["kernel"], np.full((3, 4), 3.5))
    np.testing.assert_array_equal(
        restored.batch_stats["bn"]["mean"], np.full((4,), 7.0))


def test_resume_false_and_empty_dir(tmp_path):
    state = _state()
    out, ep = ckpt.load_model(str(tmp_path / "nope"), state)
    assert ep == 0 and out is state
    out, ep = ckpt.load_model(str(tmp_path / "nope"), state, resume=False)
    assert ep == 0


def test_retention_keeps_newest_five(tmp_path):
    d = str(tmp_path / "exp")
    state = _state()
    for epoch in range(7):
        ckpt.save_model(d, state.replace(step=epoch), epoch)
    _, next_epoch = ckpt.load_model(d, state)
    assert next_epoch == 7  # latest wins
    kept = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert kept == [2, 3, 4, 5, 6]  # retention = 5 newest


def test_load_network_weights_only(tmp_path):
    d = str(tmp_path / "exp")
    ckpt.save_model(d, _state(2.0).replace(step=11), epoch=4)
    vars_out, step = ckpt.load_network(d, _variables(0.0))
    assert step == 4
    assert set(vars_out) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        vars_out["params"]["dense"]["kernel"], np.full((3, 4), 2.0))
    with pytest.raises(FileNotFoundError):
        ckpt.load_network(str(tmp_path / "empty"), _variables(0.0))


def test_load_pretrain_warm_start(tmp_path):
    cfg = Config(workspace=str(tmp_path), pretrain="donor")
    donor_dir = os.path.join(str(tmp_path), "trained_model", cfg.task,
                             "donor")
    ckpt.save_model(donor_dir, _state(9.0), epoch=1)
    out = ckpt.load_pretrain(cfg, _variables(0.0))
    np.testing.assert_array_equal(
        out["params"]["dense"]["kernel"], np.full((3, 4), 9.0))
    # no pretrain configured -> identity
    cfg2 = Config(workspace=str(tmp_path))
    v = _variables(1.0)
    assert ckpt.load_pretrain(cfg2, v) is v


def test_save_trained_config_snapshot(tmp_path):
    cfg = Config(workspace=str(tmp_path), exp_name="snap")
    ckpt.save_trained_config(cfg)
    cfg_dir = os.path.join(cfg.trained_model_dir, "config")
    assert os.path.exists(os.path.join(cfg_dir, "train_cmd.txt"))
    import yaml

    with open(os.path.join(cfg_dir, "train_config.yaml")) as f:
        tree = yaml.safe_load(f)
    assert tree["exp_name"] == "snap"
