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
from enerf_tpu.train.step import make_train_step, replicate_state


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
    state = replicate_state(create_train_state(cfg, variables), mesh)
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    step = make_train_step(
        cfg, mesh, (H, W), batch_stats_template=variables["batch_stats"])
    state2, stats = step(state, batch)  # donates state
    loss0 = float(stats["loss"])
    assert np.isfinite(loss0)
    state3, stats = step(state2, batch)
    assert np.isfinite(float(stats["loss"]))
    # params moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - np.asarray(b)).max()), params0, state3.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_dp_invariance_1_vs_8_devices():
    """Same global batch → identical loss and updated params whether it
    runs on 1 device or sharded over 8 (psum-mean grads + synced BN must
    reproduce single-device math exactly up to float assoc)."""
    cfg = tiny_cfg()
    H, W = 32, 32
    B = 8
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=B,
                                    split="train")
    batch_np.pop("tar_img")

    init_model = ENeRF(cfg=cfg.enerf, train_mode=True, axis_name=None)
    one = {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}
    variables = init_model.init(jax.random.PRNGKey(0), one)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh((n_dev,), ("data",), devices=jax.devices()[:n_dev])
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()},
                            mesh)
        # the step donates the state, so give each run its own buffers
        fresh = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                       variables)
        state = replicate_state(create_train_state(cfg, fresh), mesh)
        step = make_train_step(
        cfg, mesh, (H, W), batch_stats_template=variables["batch_stats"])
        state, stats = step(state, batch)
        results[n_dev] = (float(stats["loss"]),
                          jax.tree_util.tree_map(np.asarray, state.params),
                          jax.tree_util.tree_map(np.asarray,
                                                 state.batch_stats))

    loss1, p1, bs1 = results[1]
    loss8, p8, bs8 = results[8]
    # the global-batch loss must reproduce single-device math
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    # Adam-normalized updates amplify ULP-level grad differences from the
    # different reduction order (one-device sum vs psum tree); each step
    # moves a param by at most lr=1e-3, so a few 2e-3 outliers are float
    # association, not a sync bug — bound the violation count instead
    diffs = jax.tree_util.tree_map(
        lambda a, b: np.abs(a - b).reshape(-1), p1, p8)
    flat = np.concatenate(jax.tree_util.tree_leaves(diffs))
    lr = cfg.train.lr
    assert np.mean(flat > lr * 0.1) < 0.005, (
        f"{np.mean(flat > lr * 0.1):.4%} of params diverged beyond 10% lr")
    assert flat.max() <= 2 * lr + 1e-6


def test_bn_refresh_matches_flax_update():
    """The decoupled BN refresh at K=1 must equal flax's in-apply mutable
    update, and be device-count invariant (global-batch stats)."""
    from dataclasses import replace

    from enerf_tpu.train.step import make_bn_refresh_step

    cfg = tiny_cfg()
    cfg = replace(cfg, train=replace(cfg.train, bn_update_every=1))
    H, W = 32, 32
    B = 8
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=B,
                                    split="train")
    batch_np.pop("tar_img")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = ENeRF(cfg=cfg.enerf, train_mode=True, axis_name=None)
    variables = model.init(jax.random.PRNGKey(0),
                           {k: v[:1] for k, v in batch.items()})
    params, bs = variables["params"], variables["batch_stats"]

    # flax reference: mutable update inside apply
    _, mut = model.apply({"params": params, "batch_stats": bs}, batch,
                         mutable=["batch_stats"])
    ref = jax.tree_util.tree_map(np.asarray, mut["batch_stats"])

    for n_dev in (1, 8):
        mesh = make_mesh((n_dev,), ("data",), devices=jax.devices()[:n_dev])
        refresh = make_bn_refresh_step(cfg, mesh)
        from enerf_tpu.parallel.mesh import shard_batch as sb

        out = refresh(params, bs, sb(dict(batch), mesh))
        # the refresh recovers batch stats as (one_step - 0.9·old)/0.1,
        # which amplifies rounding ~10× — tolerance reflects that
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), b, rtol=1e-3, atol=1e-5), out, ref)


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
