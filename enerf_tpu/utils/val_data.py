"""Epipolar sanity check (reference lib/utils/enerf/val_data_utils.py:7-48):
project near/far segments of target keypoints into the source views to
eyeball camera-convention correctness. Headless version: returns / saves a
figure instead of plt.show(); picks Harris corners (SIFT is not in this
cv2 build)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _keypoints(rgb: np.ndarray, num_points: int,
               rng: np.random.RandomState) -> np.ndarray:
    import cv2

    gray = cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    pts = cv2.goodFeaturesToTrack(gray, maxCorners=num_points * 4,
                                  qualityLevel=0.01, minDistance=5)
    if pts is None or len(pts) < num_points:
        H, W = gray.shape
        return np.stack([rng.randint(0, W, num_points),
                         rng.randint(0, H, num_points)], -1).astype(np.float64)
    pts = pts.reshape(-1, 2)
    sel = rng.permutation(len(pts))[:num_points]
    return pts[sel].astype(np.float64)


def _to_src(points_depth: np.ndarray, tar_ext, tar_ixt, src_ext, src_ixt):
    """Target pixel+depth → source pixel (the reference's ``transform``)."""
    uv, d = points_depth[:, :2], points_depth[:, 2:]
    cam = np.concatenate([uv, np.ones_like(d)], -1) @ np.linalg.inv(tar_ixt).T
    cam = cam * d
    world = (cam - tar_ext[:3, 3]) @ np.linalg.inv(tar_ext[:3, :3]).T
    src_cam = world @ src_ext[:3, :3].T + src_ext[:3, 3]
    pix = src_cam @ src_ixt.T
    return pix[:, :2] / pix[:, 2:]


def vis_prob(std, depth, prob, depth_values, u: int, v: int,
             save_path: Optional[str] = None):
    """Plot the depth pdf at pixel (u, v) over the depth/std maps
    (reference lib/networks/enerf/utils.py:669-687 — interactive upstream;
    headless figure here)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    std, depth = np.asarray(std), np.asarray(depth)
    prob, depth_values = np.asarray(prob), np.asarray(depth_values)
    fig, axes = plt.subplots(1, 3, figsize=(10, 3))
    axes[0].imshow(depth[0])
    axes[0].plot([v], [u], ".")
    axes[1].imshow(std[0])
    axes[1].plot([v], [u], ".")
    axes[2].plot(depth_values[0, :, u, v], prob[0, :, u, v], ".-")
    axes[2].plot([depth[0, u, v] - std[0, u, v],
                  depth[0, u, v] + std[0, u, v]], [0.1, 0.1], "-")
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        return None
    return fig


def validate(batch: Dict, num_points: int = 10, seed: int = 0,
             save_path: Optional[str] = None):
    """For each batch item, draw target keypoints and their projected
    near/far epipolar segments on every source view."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.RandomState(seed)
    B = len(batch["tar_img"])
    figs = []
    for b in range(B):
        rgb = np.asarray(batch["tar_img"][b])
        src_inps = np.asarray(batch["src_inps"][b]) * 0.5 + 0.5
        S = len(src_inps)
        near, far = np.asarray(batch["near_far"][b]).reshape(-1)[:2]
        pts = _keypoints(rgb, num_points, rng)
        pn = np.concatenate([pts, np.full_like(pts[:, :1], near)], -1)
        pf = np.concatenate([pts, np.full_like(pts[:, :1], far)], -1)

        fig, axes = plt.subplots(1, 1 + S, figsize=(3 * (1 + S), 3))
        axes[0].imshow(rgb)
        axes[0].plot(pts[:, 0], pts[:, 1], ".")
        axes[0].axis("off")
        tar_ext = np.asarray(batch["tar_ext"][b])
        tar_ixt = np.asarray(batch["tar_ixt"][b])
        for s in range(S):
            src_ext = np.asarray(batch["src_exts"][b][s])
            src_ixt = np.asarray(batch["src_ixts"][b][s])
            a = _to_src(pn, tar_ext, tar_ixt, src_ext, src_ixt)
            c = _to_src(pf, tar_ext, tar_ixt, src_ext, src_ixt)
            axes[1 + s].imshow(src_inps[s])
            for i in range(len(a)):
                axes[1 + s].plot([a[i, 0], c[i, 0]], [a[i, 1], c[i, 1]])
            axes[1 + s].axis("off")
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path.format(b=b))
            plt.close(fig)
        else:
            figs.append(fig)
    return figs or None
