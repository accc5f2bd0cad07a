"""Checkpoint / resume via Orbax (reference lib/utils/net_utils.py:350-447:
numbered {epoch} checkpoints + rolling latest, retention 5, weights-only
load for eval, cross-experiment warm start).

Directory layout mirrors the reference:
``$workspace/trained_model/{task}/{exp_name}/`` (config.py:129).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from enerf_tpu.config import Config
from enerf_tpu.train.state import TrainState


def _mgr(model_dir: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(model_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_model(model_dir: str, state: TrainState, epoch: int,
               keep: int = 5) -> None:
    """Save {params, batch_stats, opt_state, step, epoch} at ``epoch``
    (reference save_model, net_utils.py:390-412; retention = 5 newest)."""
    mgr = _mgr(model_dir, keep)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def load_model(model_dir: str, state: TrainState,
               resume: bool = True) -> Tuple[TrainState, int]:
    """Full resume; returns (state, next_epoch). Without checkpoints (or
    with resume=False) returns the fresh state and epoch 0
    (reference load_model, net_utils.py:350-387)."""
    if not resume or not os.path.isdir(model_dir):
        return state, 0
    mgr = _mgr(model_dir)
    step = mgr.latest_step()
    if step is None:
        return state, 0
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
    return state, int(restored["epoch"]) + 1


def load_network(model_dir: str, variables: Dict,
                 epoch: int = -1) -> Tuple[Dict, int]:
    """Weights-only load for eval (reference load_network,
    net_utils.py:415-447). Accepts a manager dir; epoch=-1 → latest.
    Also accepts a reference ``.pth`` file via the torch converter."""
    if model_dir.endswith(".pth"):
        from enerf_tpu.utils.convert import load_torch_checkpoint, torch_to_flax

        sd = load_torch_checkpoint(model_dir)
        return torch_to_flax(sd, variables), 0
    mgr = _mgr(model_dir)
    step = mgr.latest_step() if epoch < 0 else epoch
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {model_dir}")
    # restore without a template (raw pytree) — the weights-only loader
    # must not need the optimizer structure
    restored = mgr.restore(step)
    return ({"params": restored["params"],
             "batch_stats": restored["batch_stats"]}, step)


def save_trained_config(cfg: Config) -> None:
    """Snapshot argv + resolved config next to the checkpoints
    (reference save_trained_config, net_utils.py:485-493)."""
    import sys

    import yaml

    from enerf_tpu.config import asdict

    cfg_dir = os.path.join(cfg.trained_model_dir, "config")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, "train_cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv))
    with open(os.path.join(cfg_dir, "train_config.yaml"), "w") as f:
        yaml.safe_dump(asdict(cfg), f)


def load_pretrain(cfg: Config, variables: Dict) -> Dict:
    """Warm start from another experiment's latest checkpoint, keyed by
    task dir (reference load_pretrain, net_utils.py:495-512)."""
    if not cfg.pretrain:
        return variables
    pre_dir = os.path.join(cfg.workspace, "trained_model", cfg.task, cfg.pretrain)
    loaded, _ = load_network(pre_dir, variables)
    return loaded
