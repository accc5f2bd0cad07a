"""Video visualizer (reference lib/visualizers/enerf.py).

Collects rendered frames, crops a 10% border (top rows + left/right
columns, matching the reference's ``[crop_h:, crop_w:-crop_w]`` slicing),
writes ``color.mp4`` and a min-max-normalized ``depth.mp4`` at ``cfg.fps``;
per-frame jpgs when ``save_result``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from enerf_tpu.config import Config


class Visualizer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.imgs = []
        self.depths = []
        os.makedirs(cfg.result_dir, exist_ok=True)
        os.makedirs(os.path.join(cfg.result_dir, "imgs"), exist_ok=True)

    def visualize(self, output: Dict[str, np.ndarray], batch: Dict) -> None:
        cfg = self.cfg
        H, W = np.asarray(batch["src_inps"]).shape[2:4]
        i = cfg.enerf.cas_config.num - 1
        rs = cfg.enerf.cas_config.render_scale[i]
        h, w = int(H * rs), int(W * rs)
        pred_rgb = np.asarray(output[f"rgb_level{i}"]).reshape(h, w, 3)
        depth = np.asarray(output[f"depth_level{i}"]).reshape(h, w)
        ch, cw = int(h * 0.1), int(w * 0.1)
        pred_rgb = pred_rgb[ch:, cw:-cw]
        depth = depth[ch:, cw:-cw]
        self.imgs.append(pred_rgb)
        self.depths.append(depth)
        if cfg.save_result:
            import imageio.v2 as imageio

            fid = batch.get("meta", {}).get("frame_id", [len(self.imgs)])[0]
            from enerf_tpu import native

            imageio.imwrite(
                os.path.join(cfg.result_dir, f"imgs/{fid:06d}_rgb.jpg"),
                native.f32_unit_to_u8(pred_rgb))
            d = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-8)
            imageio.imwrite(
                os.path.join(cfg.result_dir, f"imgs/{fid:06d}_dpt.jpg"),
                native.f32_unit_to_u8(d))

    def summarize(self) -> None:
        cfg = self.cfg
        from enerf_tpu import native

        imgs = [native.f32_unit_to_u8(im) for im in self.imgs]
        _write_video(os.path.join(cfg.result_dir, "color.mp4"), imgs, cfg.fps)
        d_min = min(d.min() for d in self.depths)
        d_max = max(d.max() for d in self.depths)
        depths = [native.f32_unit_to_u8((d - d_min) / max(d_max - d_min, 1e-8))
                  for d in self.depths]
        depths = [np.repeat(d[..., None], 3, axis=-1) for d in depths]
        _write_video(os.path.join(cfg.result_dir, "depth.mp4"), depths, cfg.fps)
        print(f"Save visualization results into {cfg.result_dir}")
        self.imgs, self.depths = [], []


def _write_video(path: str, frames, fps: int) -> None:
    """imageio (ffmpeg) with cv2.VideoWriter fallback — this image ships
    imageio without an mp4 backend."""
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps)
        return
    except Exception:
        pass
    import cv2

    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
