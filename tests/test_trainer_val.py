"""Trainer.val must accumulate per-level loss stats alongside evaluator
metrics (reference lib/train/trainers/trainer.py:95-127 accumulates the
NetworkWrapper's loss_stats during val)."""

import types

import numpy as np

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.train.trainer import Trainer


class _Recorder:
    def __init__(self):
        self.step = 0
        self.updates = []
        self.recorded = []

    def update(self, stats):
        self.updates.append(dict(stats))

    def record(self, prefix):
        self.recorded.append(prefix)


class _Evaluator:
    def __init__(self):
        self.n = 0

    def evaluate(self, output, batch):
        self.n += 1

    def summarize(self):
        return {"psnr": 30.0}


def test_val_accumulates_loss_stats():
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        cas_config=CascadeConfig(num=2, render_if=(True, True))))
    rec = _Recorder()
    trainer = Trainer(cfg, train_step=None, mesh=None, recorder=rec)

    N = 16
    rng = np.random.RandomState(0)
    gt = {i: rng.rand(1, N, 3).astype(np.float32) for i in (0, 1)}
    pred = {i: np.clip(gt[i] + 0.1, 0, 1) for i in (0, 1)}

    loader = [{"rgb_0": gt[0], "rgb_1": gt[1]}] * 3

    def eval_step(params, batch_stats, batch):
        return {"rgb_level0": pred[0], "rgb_level1": pred[1]}

    state = types.SimpleNamespace(params={}, batch_stats={})
    ev = _Evaluator()
    result = trainer.val(0, state, loader, eval_step, evaluator=ev)

    assert ev.n == 3
    assert result["psnr"] == 30.0
    for i in (0, 1):
        mse = float(np.mean((pred[i] - gt[i]) ** 2))
        assert abs(result[f"color_mse_{i}"] - mse) < 1e-6
        assert abs(result[f"psnr_{i}"] + 10 * np.log10(mse)) < 1e-4
    # stats were recorded under val
    assert rec.recorded == ["val"]
    assert any("color_mse_0" in u for u in rec.updates)
