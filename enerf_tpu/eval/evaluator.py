"""ENeRF evaluator (reference lib/evaluators/enerf.py:16-140).

Per-level, per-image PSNR/SSIM/LPIPS with mask-zeroed eval (DTU depth>0
mask), optional 10% border crop (LLFF ``eval_center``), per-scene
breakdown, and depth metrics on the 5 MVSNeRF scenes."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from enerf_tpu.config import Config
from enerf_tpu.eval import metrics
from enerf_tpu.eval.lpips_jax import load_lpips_params, lpips, lpips_skip_notice

EVAL_DEPTH_SCENES = ("scan1", "scan8", "scan21", "scan103", "scan110")


class Evaluator:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.psnrs, self.ssims, self.lpips = [], [], []
        self.scene_psnrs: Dict[str, list] = {}
        self.scene_ssims: Dict[str, list] = {}
        self.scene_lpips: Dict[str, list] = {}
        self.lpips_params = load_lpips_params() if cfg.eval_lpips else None
        if cfg.enerf.eval_depth:
            self.abs, self.acc_2, self.acc_10 = [], [], []
            self.mvs_abs, self.mvs_acc_2, self.mvs_acc_10 = [], [], []
        if cfg.save_result:
            os.makedirs(cfg.result_dir, exist_ok=True)

    def _lpips(self, gt: np.ndarray, pred: np.ndarray) -> Optional[float]:
        if self.lpips_params is None:
            return None
        import jax.numpy as jnp
        v = lpips(jnp.asarray(pred[None]) * 2.0 - 1.0,
                  jnp.asarray(gt[None]) * 2.0 - 1.0, self.lpips_params)
        return float(np.asarray(v)[0])

    def evaluate(self, output: Dict[str, np.ndarray], batch: Dict) -> None:
        cfg = self.cfg
        cas = cfg.enerf.cas_config
        B, S, H, W = batch["src_inps"].shape[:4]
        meta = batch.get("meta", {})
        scenes = meta.get("scene", ["scene"] * B)
        for i in range(cas.num):
            if not cas.render_if[i]:
                continue
            rs = cas.render_scale[i]
            h, w = int(H * rs), int(W * rs)
            pred_rgb = np.asarray(output[f"rgb_level{i}"]).reshape(B, h, w, 3)
            gt_rgb = np.asarray(batch[f"rgb_{i}"]).reshape(B, h, w, 3)
            masks = (np.asarray(batch[f"msk_{i}"]).reshape(B, h, w) >= 1)

            if cfg.enerf.eval_center:
                hc, wc = int(h * 0.1), int(w * 0.1)
                pred_rgb = pred_rgb[:, hc:-hc, wc:-wc]
                gt_rgb = gt_rgb[:, hc:-hc, wc:-wc]
                masks = masks[:, hc:-hc, wc:-wc]

            last = i == cas.num - 1
            for b in range(B):
                key = f"{scenes[b]}_level{i}"
                self.scene_psnrs.setdefault(key, [])
                self.scene_ssims.setdefault(key, [])
                self.scene_lpips.setdefault(key, [])

                gt_b = gt_rgb[b].copy()
                pred_b = pred_rgb[b].copy()
                m = masks[b]
                gt_b[~m] = 0.0
                pred_b[~m] = 0.0

                if cfg.save_result and last:
                    self._save_image(gt_b, pred_b, scenes[b], meta, b)

                p = metrics.psnr_masked(gt_b, pred_b, m)
                s = metrics.ssim(gt_b, pred_b)
                self.scene_psnrs[key].append(p)
                self.scene_ssims[key].append(s)
                if last:
                    self.psnrs.append(p)
                    self.ssims.append(s)
                lp = self._lpips(gt_b, pred_b) if cfg.eval_lpips else None
                if lp is not None:
                    self.scene_lpips[key].append(lp)
                    if last:
                        self.lpips.append(lp)

                if (cfg.enerf.eval_depth and last
                        and scenes[b] in EVAL_DEPTH_SCENES):
                    self._eval_depth(output, batch, b, h, w, i)

    def _eval_depth(self, output, batch, b, h, w, level):
        import cv2

        nerf_depth = np.asarray(output[f"depth_level{level}"])[b].reshape(h, w)
        mvs_depth = np.asarray(output[f"depth_mvs_level{level}"])[b]
        gt = np.asarray(batch["tar_dpt"])[b].reshape(h, w)
        mvs_gt = cv2.resize(gt, mvs_depth.shape[::-1],
                            interpolation=cv2.INTER_NEAREST)
        d = metrics.depth_metrics(nerf_depth, gt)
        self.abs.append(d["abs"]); self.acc_2.append(d["acc_2"]); self.acc_10.append(d["acc_10"])
        d = metrics.depth_metrics(mvs_depth, mvs_gt)
        self.mvs_abs.append(d["abs"]); self.mvs_acc_2.append(d["acc_2"]); self.mvs_acc_10.append(d["acc_10"])

    def _save_image(self, gt, pred, scene, meta, b):
        import imageio

        img = np.concatenate([gt, pred], axis=1)
        tv = meta.get("tar_view", [0] * (b + 1))[b]
        fid = meta.get("frame_id", [0] * (b + 1))[b]
        path = os.path.join(self.cfg.result_dir, f"{scene}_{tv}_{fid}.png")
        from enerf_tpu import native

        imageio.imwrite(path, native.f32_unit_to_u8(img))

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
        print("=" * 30)
        print(ret)
        if self.cfg.enerf.eval_depth and self.abs:
            print({k: float(np.mean(getattr(self, k)))
                   for k in ("abs", "acc_2", "acc_10")})
            print({k: float(np.mean(getattr(self, "mvs_" + k)))
                   for k in ("abs", "acc_2", "acc_10")})
            for k in ("abs", "acc_2", "acc_10",
                      "mvs_abs", "mvs_acc_2", "mvs_acc_10"):
                setattr(self, k, [])
        self.psnrs, self.ssims, self.lpips = [], [], []
        self.scene_psnrs, self.scene_ssims, self.scene_lpips = {}, {}, {}
        return ret
