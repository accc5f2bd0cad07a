"""LR schedules vs the reference semantics
(reference lib/utils/optimizer/lr_scheduler.py)."""

import numpy as np

from enerf_tpu.config import SchedulerConfig
from enerf_tpu.train.schedule import make_lr_schedule


def test_exponential_continuous_decay():
    # lr · γ^(epoch / decay_epochs) — reference lr_scheduler.py:70-75
    fn = make_lr_schedule(5e-4, SchedulerConfig(
        type="exponential", gamma=0.5, decay_epochs=50), ep_iter=1000)
    np.testing.assert_allclose(float(fn(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(fn(50 * 1000)), 2.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(fn(25 * 1000)),
                               5e-4 * 0.5 ** 0.5, rtol=1e-5)


def test_multi_step():
    fn = make_lr_schedule(1.0, SchedulerConfig(
        type="multi_step", gamma=0.1, milestones=(10, 20)), ep_iter=1)
    assert abs(float(fn(5)) - 1.0) < 1e-6
    assert abs(float(fn(10)) - 0.1) < 1e-6
    assert abs(float(fn(25)) - 0.01) < 1e-7


def test_warmup_multi_step():
    # linear warmup factor (1-α)/3 + α over 5 epochs, then steps
    # (reference lr_scheduler.py:36-49)
    fn = make_lr_schedule(1.0, SchedulerConfig(
        type="warmup_multi_step", gamma=0.1, milestones=(10, 20),
        warmup_factor=1.0 / 3, warmup_iters=5), ep_iter=1)
    assert abs(float(fn(0)) - 1.0 / 3) < 1e-6
    alpha = 2 / 5
    assert abs(float(fn(2)) - ((1 - alpha) / 3 + alpha)) < 1e-6
    assert abs(float(fn(5)) - 1.0) < 1e-6
    assert abs(float(fn(10)) - 0.1) < 1e-6
