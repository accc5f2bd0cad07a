"""Trainer loop (reference lib/train/trainers/trainer.py:44-127 +
train_net.py:19-68): epoch loop over a data loader, sharded train step,
eta/lr console line, periodic eval through the evaluator."""

from __future__ import annotations

import datetime
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from enerf_tpu.config import Config
from enerf_tpu.datasets.loader import device_batch
from enerf_tpu.parallel.mesh import make_mesh, shard_batch
from enerf_tpu.train.recorder import Recorder
from enerf_tpu.train.schedule import make_lr_schedule


def _mem_str() -> str:
    """Peak device memory for the console line (the reference logs torch
    max_memory_allocated, trainer.py:85). Backends without stats report
    nothing."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return ""
    peak = stats.get("peak_bytes_in_use")
    return f"  max_mem: {peak / 2**20:.0f}MiB" if peak else ""


class Trainer:
    def __init__(self, cfg: Config, train_step: Callable, mesh,
                 recorder: Optional[Recorder] = None,
                 bn_refresh: Optional[Callable] = None):
        self.cfg = cfg
        self.train_step = train_step
        self.mesh = mesh
        self.bn_refresh = bn_refresh
        self.recorder = recorder or Recorder(cfg, resume=cfg.resume)
        self.lr_fn = make_lr_schedule(cfg.train.lr, cfg.train.scheduler, cfg.ep_iter)

    def train_epoch(self, epoch: int, state, loader: Iterable) -> object:
        cfg = self.cfg
        max_iter = cfg.ep_iter
        end = time.time()
        for it, batch_np in enumerate(loader):
            if it >= max_iter:
                break
            data_time = time.time() - end
            batch = shard_batch(device_batch(batch_np), self.mesh)
            state, stats = self.train_step(state, batch)
            if (self.bn_refresh is not None
                    and it % max(cfg.train.bn_update_every, 1) == 0):
                new_bs = self.bn_refresh(state.params, state.batch_stats,
                                         batch)
                state = state.replace(batch_stats=new_bs)
            stats = {k: float(v) for k, v in stats.items()}
            batch_time = time.time() - end
            end = time.time()

            self.recorder.step += 1
            self.recorder.update({**stats,
                                  "data_time": data_time,
                                  "batch_time": batch_time})
            if it % cfg.log_interval == 0 and jax.process_index() == 0:
                step = int(state.step)
                lr = float(self.lr_fn(step))
                remaining = (cfg.train.epoch - epoch) * max_iter - it
                eta = datetime.timedelta(seconds=int(batch_time * remaining))
                print(f"eta: {eta}  epoch: {epoch}  step: {step}  "
                      f"{self.recorder}  lr: {lr:.6f}{_mem_str()}")
            if it % cfg.record_interval == 0 and jax.process_index() == 0:
                self.recorder.record("train")
        return state

    def val(self, epoch: int, state, loader: Iterable, eval_step: Callable,
            evaluator=None) -> Dict[str, float]:
        """Reference trainer.py:95-127: accumulate loss stats + evaluator
        metrics over the test loader."""
        stats_acc: Dict[str, list] = {}
        for batch_np in loader:
            batch = device_batch(batch_np)
            output = eval_step(state.params, state.batch_stats, batch)
            out_np = {k: np.asarray(v) for k, v in output.items()}
            # loss stats alongside evaluator metrics, as the reference
            # accumulates the NetworkWrapper's loss_stats during val
            for i in range(self.cfg.enerf.cas_config.num):
                pred, gt = out_np.get(f"rgb_level{i}"), batch_np.get(f"rgb_{i}")
                if pred is None or gt is None:
                    continue
                mse = float(np.mean((pred - np.asarray(gt)) ** 2))
                stats_acc.setdefault(f"color_mse_{i}", []).append(mse)
                stats_acc.setdefault(f"psnr_{i}", []).append(
                    -10.0 * np.log10(max(mse, 1e-12)))
            if evaluator is not None:
                evaluator.evaluate(out_np, batch_np)
        result = evaluator.summarize() if evaluator is not None else {}
        loss_stats = {k: float(np.mean(v)) for k, v in stats_acc.items()}
        if jax.process_index() == 0 and loss_stats:
            print("val loss stats: " + "  ".join(
                f"{k}: {v:.4f}" for k, v in sorted(loss_stats.items())))
        result = {**loss_stats, **result}
        if jax.process_index() == 0 and result:
            self.recorder.update(result)
            self.recorder.record("val")
        return result
