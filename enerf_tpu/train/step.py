"""Sharded train/eval steps — the DDP replacement
(reference trainer.py:44-93 train loop; SURVEY.md §2.6).

Design: ``shard_map`` over the mesh's ``data`` axis. Each shard runs
forward+backward on its slice of the batch; gradients and scalar stats are
``pmean``-reduced over the axis (DDP allreduce equivalent); BatchNorm
batch stats sync across shards via the bound axis name (SyncBatchNorm
equivalent, reference trainer.py:16).
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
                    vgg_params=None, model_cls=ENeRF) -> Callable:
    """Returns jitted ``step(state, batch) -> (state, stats)``; batch
    arrays sharded on dim 0 over ``data``, state replicated.

    Parallelism is GSPMD sharding (jit + in_shardings), not shard_map:
    the step is written on the *global* batch, so BatchNorm's batch
    statistics are the global-batch statistics by construction (exact
    SyncBatchNorm semantics) and XLA inserts the gradient all-reduces
    where params are replicated. (A shard_map formulation measured a
    ~10,000× slowdown on this backend with the remat'd render loop —
    29 s vs 3 ms per step; GSPMD compiles the same math cleanly.)
    """
    model = model_cls(cfg=cfg.enerf, train_mode=True, axis_name=None,
                      dtype=jnp.dtype(cfg.compute_dtype))

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            output, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, mutable=["batch_stats"])
            loss, stats = compute_loss(output, batch, cfg.enerf, src_hw,
                                       vgg_params)
            return loss, (stats, mutated["batch_stats"])

        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return state, stats

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA))
    return jax.jit(step,
                   in_shardings=(repl, shard),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


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
