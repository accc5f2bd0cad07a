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
    arrays sharded on dim 0 over ``data``, state replicated."""
    model = model_cls(cfg=cfg.enerf, train_mode=True, axis_name=DATA,
                      dtype=jnp.dtype(cfg.compute_dtype))

    def shard_body(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            output, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, mutable=["batch_stats"])
            loss, stats = compute_loss(output, batch, cfg.enerf, src_hw,
                                       vgg_params)
            return loss, (stats, mutated["batch_stats"])

        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, DATA)
        stats = jax.lax.pmean(stats, DATA)
        # batch_stats were already cross-shard synced by BN's axis_name;
        # every shard holds identical values.
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return state, stats

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(DATA)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


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

    def specs_for(batch):
        in_spec = {k: (P(None, DATA) if k in ray_keys else P())
                   for k in batch}
        # rgb/depth/weights outputs are per-ray → sharded on dim 1;
        # depth_mvs/std are volume-space maps → replicated
        def out_spec_for(key):
            return P() if key.startswith(("depth_mvs", "std")) \
                else P(None, DATA)
        return in_spec, out_spec_for

    def step(params, batch_stats, batch):
        in_spec, out_spec_for = specs_for(batch)
        shape = jax.eval_shape(fwd, params, batch_stats, batch)
        out_specs = {k: out_spec_for(k) for k in shape}
        mapped = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(), in_spec),
            out_specs=out_specs,
            check_vma=False)
        return mapped(params, batch_stats, batch)

    return jax.jit(step)
