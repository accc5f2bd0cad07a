"""Interactive visualizer (reference lib/visualizers/enerf_interactive.py):
reshapes the final-level rgb to an HxW image dict for the GUI texture."""

from __future__ import annotations

from typing import Dict

import numpy as np

from enerf_tpu.config import Config


class Visualizer:
    def __init__(self, cfg: Config):
        self.cfg = cfg

    def visualize(self, output: Dict[str, np.ndarray], batch: Dict) -> Dict:
        H, W = np.asarray(batch["src_inps"]).shape[2:4]
        i = self.cfg.enerf.cas_config.num - 1
        pred = np.asarray(output[f"rgb_level{i}"])[0].reshape(H, W, 3)
        return {"pred": pred}

    def summarize(self) -> None:
        pass
