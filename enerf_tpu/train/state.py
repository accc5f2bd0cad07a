"""Train state: params + BN batch_stats + optimizer state
(replaces the reference's {net, optim, scheduler, recorder, epoch} torch
pickle, net_utils.py:390-412)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from enerf_tpu.config import Config
from enerf_tpu.train.schedule import make_lr_schedule


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """adam / radam / sgd with grad-value clip at 40 and torch-Adam-style
    L2 weight decay (reference lib/train/optimizer.py:5-28,
    trainer.py:62)."""
    lr = make_lr_schedule(cfg.train.lr, cfg.train.scheduler, cfg.ep_iter)
    parts = [optax.clip(cfg.train.grad_clip_value)]
    if cfg.train.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.train.weight_decay))
    if cfg.train.optim == "adam":
        parts.append(optax.scale_by_adam(eps=cfg.train.eps))
    elif cfg.train.optim == "radam":
        parts.append(optax.scale_by_radam(eps=cfg.train.eps))
    elif cfg.train.optim == "sgd":
        pass  # plain sgd: just the lr scaling below
    else:
        raise ValueError(f"unknown optimizer {cfg.train.optim}")
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def create_train_state(cfg: Config, variables: Dict, tx=None) -> TrainState:
    tx = tx or make_optimizer(cfg)
    return TrainState.create(
        apply_fn=None,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
