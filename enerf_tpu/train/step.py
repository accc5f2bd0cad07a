"""Sharded train/eval steps — the DDP replacement
(reference trainer.py:44-93 train loop; SURVEY.md §2.6).

Design: GSPMD — one ``jit`` with ``in_shardings`` that shard the batch
dim over the mesh's ``data`` axis and replicate params. The step is
written on the *global* batch, so BatchNorm batch statistics are the
global-batch statistics by construction (exact SyncBatchNorm semantics,
reference trainer.py:16) and XLA inserts the gradient all-reduces
itself (DDP allreduce equivalent). An explicit ``shard_map`` + ``psum``
formulation was measured ~10,000× slower on this backend with the
remat'd render loop (29 s vs 3 ms per step) and was rejected — see
``make_train_step``'s docstring for the full story.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from enerf_tpu.config import Config
from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.train.loss import compute_loss
from enerf_tpu.train.state import TrainState

DATA = "data"


def make_train_step(cfg: Config, mesh: Mesh, src_hw: Tuple[int, int],
                    vgg_params=None, model_cls=ENeRF,
                    batch_stats_template=None) -> Callable:
    """Returns jitted ``step(state, batch) -> (state, stats)``; batch
    arrays sharded on dim 0 over ``data``, state replicated.

    Parallelism is GSPMD sharding (jit + in_shardings), not shard_map:
    the step is written on the *global* batch, so BatchNorm's batch
    statistics are the global-batch statistics by construction (exact
    SyncBatchNorm semantics) and XLA inserts the gradient all-reduces
    where params are replicated. (A shard_map formulation measured a
    ~10,000× slowdown on this backend with the remat'd render loop —
    29 s vs 3 ms per step; GSPMD compiles the same math cleanly.)

    BN running stats are NOT touched here — neither read (train-mode BN
    normalizes by batch statistics) nor written. Two measured XLA
    pathologies force this (full bisection in the repo history):
    making the EMA'd stats live *outputs* of the grad program, or even
    passing the running stats in as traced *arguments*, flips XLA into
    a serial while-loop lowering of the level-1 cost-volume gather
    (6.4 s vs 2.6 ms per step on a v5e). The step therefore closes over
    a constant batch_stats snapshot (values unused; structure needed by
    flax) and the trainer refreshes the real running stats every
    ``cfg.train.bn_update_every`` steps via ``make_bn_refresh_step``.

    ``batch_stats_template``: concrete arrays matching the model's
    batch_stats collection (e.g. from ``variables['batch_stats']``).
    """
    import numpy as np

    model = model_cls(cfg=cfg.enerf, train_mode=True, axis_name=None,
                      dtype=jnp.dtype(cfg.compute_dtype))
    assert batch_stats_template is not None, (
        "make_train_step needs a batch_stats template "
        "(variables['batch_stats'])")
    const_bs = jax.tree_util.tree_map(np.asarray, batch_stats_template)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            output, _ = model.apply(
                {"params": params, "batch_stats": const_bs},
                batch, mutable=["batch_stats"])
            loss, stats = compute_loss(output, batch, cfg.enerf, src_hw,
                                       vgg_params)
            return loss, stats

        grads, stats = jax.grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, stats  # stats['loss'] carries the primal

    # Plain jit: shardings propagate from the committed inputs (the batch
    # is device_put with P('data') by shard_batch; replicate the state
    # once with ``replicate_state``). Explicit in_/out_shardings measured
    # 4-6× slower on this backend (24-40 s vs 6 s in the bisects) and
    # donation adds nothing for a ~10M-param state.
    return jax.jit(step)


def replicate_state(state, mesh: Mesh):
    """Place a TrainState replicated over the mesh (call once after
    create/restore, before the first sharded step). No-op on a
    single-device mesh — committed shardings there trigger the serial
    SPMD gather lowering (see make_train_step notes)."""
    from enerf_tpu.parallel.mesh import mesh_size

    if mesh_size(mesh) == 1:
        return state
    return jax.device_put(state, NamedSharding(mesh, P()))


def make_bn_refresh_step(cfg: Config, mesh: Mesh,
                         model_cls=ENeRF) -> Callable:
    """Jitted ``refresh(params, batch_stats, batch) -> new_batch_stats``:
    one forward pass whose only outputs are the EMA'd BN running stats
    (the render is dead code and is eliminated). Called every
    ``cfg.train.bn_update_every`` steps with momentum 0.9^K so the EMA
    horizon matches torch's per-step momentum-0.9 update."""
    model = model_cls(cfg=cfg.enerf, train_mode=True, axis_name=None,
                      dtype=jnp.dtype(cfg.compute_dtype))
    K = max(cfg.train.bn_update_every, 1)
    momentum = 0.9 ** K

    def refresh(params, batch_stats, batch):
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            mutable=["batch_stats"])
        # flax applied momentum 0.9 once: new = .9 old + .1 batch.
        # Recover the batch stats and re-apply the adjusted momentum.
        def adjust(old, one_step):
            batch_stat = (one_step - 0.9 * old) / 0.1
            return momentum * old + (1.0 - momentum) * batch_stat

        return jax.tree_util.tree_map(adjust, batch_stats,
                                      mutated["batch_stats"])

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA))
    return jax.jit(refresh, in_shardings=(repl, repl, shard),
                   out_shardings=repl)


def make_eval_step(cfg: Config, mesh: Optional[Mesh] = None,
                   model_cls=ENeRF) -> Callable:
    """Jitted forward-only step (BN running stats). Single-device or
    replicated; rendering one target view is not data-sharded."""
    model = model_cls(cfg=cfg.enerf, train_mode=False,
                      dtype=jnp.dtype(cfg.compute_dtype))

    def fwd(params, batch_stats, batch):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           batch)

    return jax.jit(fwd)


def make_sharded_render_step(cfg: Config, mesh: Mesh,
                             model_cls=ENeRF) -> Callable:
    """Multi-chip rendering of ONE frame: the ray dimension of each
    rendered level shards over the ``data`` axis while the (cheap)
    feature/volume/depth stages run replicated. No reference counterpart —
    the reference is single-GPU at inference; this scales resolution
    across chips with zero collectives (rays are independent).

    Ray counts must be divisible by the mesh size (full images H·W
    usually are).
    """
    model = model_cls(cfg=cfg.enerf, train_mode=False,
                      dtype=jnp.dtype(cfg.compute_dtype))
    cas = cfg.enerf.cas_config
    ray_keys = tuple(f"rays_{i}" for i in range(cas.num) if cas.render_if[i])

    def fwd(params, batch_stats, batch):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           batch)

    repl = NamedSharding(mesh, P())
    ray_shard = NamedSharding(mesh, P(None, DATA))
    jitted: Dict[Tuple[str, ...], Callable] = {}

    def step(params, batch_stats, batch):
        key = tuple(sorted(batch))
        if key not in jitted:  # one jit per batch-key layout
            in_sh = (repl, repl,
                     {k: (ray_shard if k in ray_keys else repl)
                      for k in batch})
            jitted[key] = jax.jit(fwd, in_shardings=in_sh)
        return jitted[key](params, batch_stats, batch)

    return step
