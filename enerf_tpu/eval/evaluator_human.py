"""Human evaluator (reference lib/evaluators/enerf_human.py): metrics
restricted to ``mask_at_box`` — PSNR over masked pixels, SSIM/LPIPS over
the mask's bounding rectangle."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from enerf_tpu.config import Config
from enerf_tpu.eval import metrics
from enerf_tpu.eval.lpips_jax import load_lpips_params, lpips, lpips_skip_notice


class Evaluator:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self._window_warned = False
        self.psnrs, self.ssims, self.lpips = [], [], []
        self.scene_psnrs: Dict[str, list] = {}
        self.scene_ssims: Dict[str, list] = {}
        self.scene_lpips: Dict[str, list] = {}
        self.lpips_params = load_lpips_params() if cfg.eval_lpips else None
        if cfg.save_result:
            os.makedirs(cfg.result_dir, exist_ok=True)

    def _lpips(self, gt: np.ndarray, pred: np.ndarray) -> Optional[float]:
        if self.lpips_params is None:
            return None
        import jax.numpy as jnp

        v = lpips(jnp.asarray(pred[None]) * 2.0 - 1.0,
                  jnp.asarray(gt[None]) * 2.0 - 1.0, self.lpips_params)
        return float(np.asarray(v)[0])

    def _check_window(self, masks: np.ndarray, h: int, w: int) -> None:
        """Detect an undersized ``mask_window_hw``: the model's static
        bbox-window render (models/enerf_human.py:_render_masked_window)
        leaves masked pixels OUTSIDE the window rendered black, silently
        biasing PSNR/SSIM. Mirrors the model's snap-down-to-16 origin:
        if the mask extent from the snapped origin exceeds the window,
        the frame's metrics are corrupted — say so loudly (once)."""
        if self._window_warned or self.cfg.enerf.mask_window_hw is None:
            return
        wh, ww = self.cfg.enerf.mask_window_hw
        snap = 16
        for m in masks:
            ys, xs = np.nonzero(m > 0)
            if ys.size == 0:
                continue
            ext_h = ys.max() + 1 - (ys.min() // snap) * snap
            ext_w = xs.max() + 1 - (xs.min() // snap) * snap
            if ext_h > wh or ext_w > ww:
                print(f"[evaluator_human] WARNING: mask bbox extent "
                      f"({ext_h}, {ext_w}) exceeds mask_window_hw "
                      f"({wh}, {ww}) — pixels outside the window render "
                      f"black and PSNR/SSIM for such frames are biased. "
                      f"Raise enerf.mask_window_hw.", flush=True)
                self._window_warned = True
                return

    def evaluate(self, output: Dict[str, np.ndarray], batch: Dict) -> None:
        import cv2

        cfg = self.cfg
        cas = cfg.enerf.cas_config
        B, S, H, W = np.asarray(batch["src_inps"]).shape[:4]
        meta = batch.get("meta", {})
        scenes = meta.get("scene", ["scene"] * B)
        for i in range(cas.num):
            if not cas.render_if[i]:
                continue
            rs = cas.render_scale[i]
            h, w = int(H * rs), int(W * rs)
            pred_rgb = np.asarray(output[f"rgb_level{i}"]).reshape(B, h, w, 3)
            gt_rgb = np.asarray(batch[f"rgb_{i}"]).reshape(B, h, w, 3).copy()
            last = i == cas.num - 1
            if last:
                masks = np.asarray(batch["mask_at_box"]).reshape(B, h, w)
                self._check_window(masks, h, w)
            else:
                masks = np.ones((B, h, w), np.float32)

            for b in range(B):
                key = f"{scenes[b]}_level{i}"
                self.scene_psnrs.setdefault(key, [])
                self.scene_ssims.setdefault(key, [])
                self.scene_lpips.setdefault(key, [])

                if cfg.save_result:
                    import imageio.v2 as imageio

                    img = np.concatenate([gt_rgb[b], pred_rgb[b]], axis=1)
                    tv = meta.get("tar_view", [0] * B)[b]
                    fid = meta.get("frame_id", [0] * B)[b]
                    imageio.imwrite(
                        os.path.join(cfg.result_dir, f"{scenes[b]}_{tv}_{fid}.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))

                m = masks[b] == 1
                gt_b, pred_b = gt_rgb[b].copy(), pred_rgb[b].copy()
                gt_b[~m] = 0.0
                pred_b[~m] = 0.0

                p = metrics.psnr(gt_b[m], pred_b[m])
                self.scene_psnrs[key].append(p)
                if last:
                    self.psnrs.append(p)

                x, y, ww, hh = cv2.boundingRect(m.astype(np.uint8))
                s = metrics.ssim(gt_b[y:y + hh, x:x + ww],
                                 pred_b[y:y + hh, x:x + ww])
                self.scene_ssims[key].append(s)
                if last:
                    self.ssims.append(s)

                if cfg.eval_lpips:
                    lp = self._lpips(gt_b[y:y + hh, x:x + ww],
                                     pred_b[y:y + hh, x:x + ww])
                    if lp is not None:
                        self.scene_lpips[key].append(lp)
                        if last:
                            self.lpips.append(lp)

    def summarize(self) -> Dict[str, float]:
        ret = {"psnr": float(np.mean(self.psnrs)) if self.psnrs else float("nan"),
               "ssim": float(np.mean(self.ssims)) if self.ssims else float("nan")}
        if self.cfg.eval_lpips and self.lpips:
            ret["lpips"] = float(np.mean(self.lpips))
        elif self.cfg.eval_lpips:
            lpips_skip_notice()
        print("=" * 30)
        for scene in self.scene_psnrs:
            line = (f"{scene.ljust(16)} psnr: {np.mean(self.scene_psnrs[scene]):.2f} "
                    f"ssim: {np.mean(self.scene_ssims[scene]):.3f}")
            if self.scene_lpips.get(scene):
                line += f" lpips: {np.mean(self.scene_lpips[scene]):.3f}"
            print(line)
        print(ret)
        print("=" * 30)
        self.psnrs, self.ssims, self.lpips = [], [], []
        self.scene_psnrs, self.scene_ssims, self.scene_lpips = {}, {}, {}
        return ret
