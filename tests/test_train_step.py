"""Sharded train-step tests on the virtual 8-device CPU mesh: the
DDP-equivalent (psum grads + synced BN) must run, update params, and be
invariant to the device count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig, TrainConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.parallel.mesh import make_mesh, shard_batch
from enerf_tpu.train.state import create_train_state
from enerf_tpu.train.step import make_train_step


def tiny_cfg():
    return Config(
        enerf=ENeRFConfig(
            test_input_views=2, train_input_views=(2,),
            cas_config=CascadeConfig(num=2, volume_planes=(16, 8))),
        train=TrainConfig(lr=1e-3),
        ep_iter=10,
    )


@pytest.mark.parametrize("n_dev", [1, 8])
def test_train_step_runs(n_dev):
    cfg = tiny_cfg()
    H, W = 64, 96
    mesh = make_mesh((n_dev,), ("data",), devices=jax.devices()[:n_dev])
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=n_dev, split="train")
    batch_np.pop("tar_img")
    batch = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)

    model = ENeRF(cfg=cfg.enerf, train_mode=True, axis_name="data")
    # init under shard_map semantics is awkward; init with a plain model
    init_model = ENeRF(cfg=cfg.enerf, train_mode=True, axis_name=None)
    one = {k: v[:1] for k, v in batch_np.items()}
    variables = init_model.init(jax.random.PRNGKey(0),
                                {k: jnp.asarray(v) for k, v in one.items()})
    state = create_train_state(cfg, variables)
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    step = make_train_step(cfg, mesh, (H, W))
    state2, stats = step(state, batch)  # donates state
    loss0 = float(stats["loss"])
    assert np.isfinite(loss0)
    state3, stats = step(state2, batch)
    assert np.isfinite(float(stats["loss"]))
    # params moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - np.asarray(b)).max()), params0, state3.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_lr_schedule_exponential():
    from enerf_tpu.train.schedule import make_lr_schedule
    from enerf_tpu.config import SchedulerConfig

    fn = make_lr_schedule(5e-4, SchedulerConfig(type="exponential", gamma=0.5,
                                                decay_epochs=50), ep_iter=1000)
    assert np.isclose(fn(0), 5e-4)
    assert np.isclose(fn(50 * 1000), 2.5e-4)
    assert np.isclose(fn(100 * 1000), 1.25e-4)
    # continuous decay within epochs boundary steps
    assert fn(999) == fn(0)
    assert fn(1000) < fn(999)
