"""Metrics recorder (reference lib/train/recorder.py:10-132).

Window-smoothed scalar tracking (20-deque median/avg/global-avg) with an
optional TensorBoard writer (tensorboardX if available, else a JSONL file
under record_dir — same information, no extra dependency)."""

from __future__ import annotations

import json
import os
import shutil
from collections import defaultdict, deque
from typing import Dict

import numpy as np

from enerf_tpu.config import Config


class SmoothedValue:
    """Reference recorder.py:10-37."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        v = float(value)
        self.deque.append(v)
        self.count += 1
        self.total += v

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return f"{self.median:.4f} ({self.global_avg:.4f})"


class Recorder:
    def __init__(self, cfg: Config, resume: bool = True):
        self.cfg = cfg
        self.step = 0
        self.epoch = 0
        self.scalars: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.record_dir = cfg.record_dir
        if not resume and os.path.exists(self.record_dir):
            # reference wipes the log dir on fresh runs (recorder.py:53-55)
            shutil.rmtree(self.record_dir, ignore_errors=True)
        os.makedirs(self.record_dir, exist_ok=True)
        self._writer = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._writer = SummaryWriter(log_dir=self.record_dir)
        except Exception:
            self._jsonl = open(os.path.join(self.record_dir, "scalars.jsonl"), "a")

    def update(self, stats: Dict[str, float]):
        for k, v in stats.items():
            self.scalars[k].update(float(v))

    def record(self, prefix: str = "train"):
        payload = {f"{prefix}/{k}": v.median for k, v in self.scalars.items()}
        if self._writer is not None:
            for k, v in payload.items():
                self._writer.add_scalar(k, v, self.step)
        else:
            self._jsonl.write(json.dumps({"step": self.step, **payload}) + "\n")
            self._jsonl.flush()

    def state_dict(self):
        return {"step": self.step}

    def load_state_dict(self, sd):
        self.step = sd.get("step", 0)

    def __str__(self):
        keys = ["loss", "psnr_1", "color_mse_1", "data_time", "batch_time"]
        parts = [f"{k}: {self.scalars[k]}" for k in keys if k in self.scalars]
        return "  ".join(parts)
