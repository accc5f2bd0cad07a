"""LLFF forward-facing dataset (reference lib/datasets/llff/enerf.py).

``poses_bounds.npy`` decode (columns: -u, r, -t convention → c2w), images
from ``images_4`` (intrinsics ×0.25) resized to ``input_h_w``, scene-global
near/far = min/max of all per-view bounds, view splits from
``data/mvsnerf/pairs.th``.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from enerf_tpu import native
from enerf_tpu.config import Config, DatasetConfig
from enerf_tpu.datasets.dtu import _load_pairs
from enerf_tpu.datasets.ray_utils import build_rays_host

SCENES = ("fern", "flower", "fortress", "horns", "leaves", "orchids",
          "room", "trex")


class Dataset:
    def __init__(self, cfg: Config, ds_cfg: DatasetConfig):
        self.cfg = cfg
        self.split = ds_cfg.split
        self.data_root = os.path.join(cfg.workspace, ds_cfg.data_root)
        self.input_h_w = tuple(ds_cfg.input_h_w or (640, 960))
        self.scenes = [ds_cfg.scene] if ds_cfg.scene else list(SCENES)
        self.rng = np.random.RandomState(0 if cfg.fix_random else None)
        self.build_metas()

    def build_metas(self):
        pairs = _load_pairs()
        self.scene_infos: Dict[str, Dict] = {}
        self.metas: List = []
        for scene in self.scenes:
            pb = np.load(os.path.join(self.data_root, scene,
                                      "poses_bounds.npy"))
            poses = pb[:, :15].reshape(-1, 3, 5)
            c2ws = np.tile(np.eye(4)[None], (len(poses), 1, 1))
            # column convention: (-u, r, -t) → (r, -u ... ) flip
            # (reference llff/enerf.py:40-43)
            c2ws[:, :3, 0] = poses[:, :3, 1]
            c2ws[:, :3, 1] = poses[:, :3, 0]
            c2ws[:, :3, 2] = -poses[:, :3, 2]
            c2ws[:, :3, 3] = poses[:, :3, 3]
            ixts = np.tile(np.eye(3)[None], (len(poses), 1, 1))
            ixts[:, 0, 0] = ixts[:, 1, 1] = poses[:, 2, 4]
            ixts[:, 0, 2] = poses[:, 1, 4] / 2.0
            ixts[:, 1, 2] = poses[:, 0, 4] / 2.0
            ixts[:, :2] *= 0.25  # images_4 (reference :47)

            names = sorted(n for n in os.listdir(
                os.path.join(self.data_root, scene, "images_4"))
                if ".png" in n)
            info = {"ixts": ixts.astype(np.float32),
                    "c2ws": c2ws.astype(np.float32),
                    "image_names": names,
                    "depth_ranges": pb[:, -2:].astype(np.float32),
                    "scene_name": scene}
            self.scene_infos[scene] = info

            train_ids = pairs[f"{scene}_train"]
            render_ids = train_ids if self.split == "train" \
                else pairs[f"{scene}_val"]
            tc2ws = c2ws[train_ids]
            n_src = (self.cfg.enerf.train_input_views[1] + 1
                     if self.split == "train"
                     else self.cfg.enerf.test_input_views)
            for i in render_ids:
                dist = np.linalg.norm(
                    info["c2ws"][i][:3, 3][None] - tc2ws[:, :3, 3], axis=-1)
                order = dist.argsort()
                order = order[1:] if i in train_ids else order
                src_views = [train_ids[j] for j in order[:n_src]]
                self.metas.append((scene, i, src_views))

    def read_image(self, info, idx):
        import cv2
        import imageio.v2 as imageio

        path = os.path.join(self.data_root, info["scene_name"], "images_4",
                            info["image_names"][idx])
        img = np.asarray(imageio.imread(path)).astype(np.float32)
        orig_size = img.shape[:2][::-1]
        img = cv2.resize(img, self.input_h_w[::-1],
                         interpolation=cv2.INTER_AREA)
        return img, orig_size

    def read_cam(self, info, idx, orig_size):
        ext = np.linalg.inv(info["c2ws"][idx].astype(np.float64))
        ixt = info["ixts"][idx].copy()
        ixt[0] *= self.input_h_w[1] / orig_size[0]
        ixt[1] *= self.input_h_w[0] / orig_size[1]
        return ixt.astype(np.float32), ext.astype(np.float32)

    def __getitem__(self, index_meta):
        index, n_views = index_meta
        scene, tar_view, src_views = self.metas[index]
        if self.split == "train":
            if self.rng.random_sample() < 0.1:
                src_views = src_views + [tar_view]
            sel = self.rng.permutation(len(src_views))[:n_views]
            src_views = [src_views[i] for i in sel]
        info = self.scene_infos[scene]

        tar_img, orig = self.read_image(info, tar_view)
        tar_img = native.u8_to_unit(tar_img)
        tar_ixt, tar_ext = self.read_cam(info, tar_view, orig)
        tar_mask = np.ones_like(tar_img[..., 0]).astype(np.uint8)

        src_inps, src_exts, src_ixts = [], [], []
        for sv in src_views:
            img, orig = self.read_image(info, sv)
            src_inps.append(native.u8_to_pm1(img))
            ixt, ext = self.read_cam(info, sv, orig)
            src_exts.append(ext)
            src_ixts.append(ixt)

        S_max = self.cfg.enerf.max_views
        pad = S_max - len(src_views)
        view_mask = np.concatenate(
            [np.ones(len(src_views)), np.zeros(pad)]).astype(np.float32)
        for _ in range(pad):
            src_inps.append(np.zeros_like(src_inps[0]))
            src_exts.append(np.eye(4, dtype=np.float32))
            src_ixts.append(tar_ixt.copy())

        dr = info["depth_ranges"]
        near_far = np.array([dr[:, 0].min(), dr[:, 1].max()], np.float32)
        ret = {
            "src_inps": np.stack(src_inps),
            "src_exts": np.stack(src_exts),
            "src_ixts": np.stack(src_ixts),
            "tar_ext": tar_ext,
            "tar_ixt": tar_ixt,
            "near_far": near_far,
            "view_mask": view_mask,
            "meta": {"scene": scene, "tar_view": tar_view, "frame_id": 0},
        }
        if self.split != "train":
            ret["tar_img"] = tar_img
            ret["tar_mask"] = tar_mask

        cas = self.cfg.enerf.cas_config
        for i in range(cas.num):
            train_sample = self.split == "train" and not cas.train_img[i]
            rays, rgb, msk = build_rays_host(
                tar_img, tar_ext, tar_ixt, tar_mask, cas.render_scale[i],
                train_sample=train_sample, num_rays=cas.num_rays[i],
                num_patches=cas.num_patchs[i], patch_size=cas.patch_size[i],
                rng=self.rng)
            ret[f"rays_{i}"] = rays
            ret[f"rgb_{i}"] = rgb
            ret[f"msk_{i}"] = msk.astype(np.float32)
        return ret

    def __len__(self):
        return len(self.metas)
