"""LR schedules (reference lib/train/scheduler.py,
lib/utils/optimizer/lr_scheduler.py:55-75).

All schedules are step-indexed (epoch = step // ep_iter) so they live
inside optax and resume exactly with the step counter.
"""

from __future__ import annotations

from bisect import bisect_right

import optax

from enerf_tpu.config import SchedulerConfig


def make_lr_schedule(base_lr: float, sched: SchedulerConfig,
                     ep_iter: int) -> optax.Schedule:
    import jax.numpy as jnp

    if sched.type == "exponential":
        # lr · γ^(epoch / decay_epochs) — continuous exponent, stepped per
        # epoch (ExponentialLR.get_lr, lr_scheduler.py:70-75)
        def fn(step):
            epoch = jnp.asarray(step) // ep_iter
            return base_lr * jnp.power(
                sched.gamma, epoch.astype(jnp.float32) / sched.decay_epochs)
        return fn
    if sched.type == "multi_step":
        milestones = sorted(sched.milestones)

        def fn(step):
            epoch = jnp.asarray(step) // ep_iter
            k = sum(jnp.asarray(epoch >= m, jnp.int32) for m in milestones)
            return base_lr * jnp.power(sched.gamma, k.astype(jnp.float32))
        return fn
    if sched.type == "warmup_multi_step":
        # linear warmup from warmup_factor over warmup_iters epochs, then
        # multi-step decay (reference lr_scheduler.py:7-50)
        milestones = sorted(sched.milestones)
        wf, wi = sched.warmup_factor, sched.warmup_iters

        def fn(step):
            epoch = (jnp.asarray(step) // ep_iter).astype(jnp.float32)
            alpha = jnp.clip(epoch / max(wi, 1), 0.0, 1.0)
            warmup = jnp.where(epoch < wi, wf * (1 - alpha) + alpha, 1.0)
            k = sum(jnp.asarray(epoch >= m, jnp.int32) for m in milestones)
            return base_lr * warmup * jnp.power(
                sched.gamma, k.astype(jnp.float32))
        return fn
    raise ValueError(f"unknown scheduler type {sched.type}")
