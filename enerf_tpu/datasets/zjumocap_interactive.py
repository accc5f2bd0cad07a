"""Interactive ZJU-MoCap dataset
(reference lib/datasets/zjumocap/enerf_interactive.py).

Not an index-based dataset: ``__getitem__((frame, c2w, w2c))`` builds a
device batch for an arbitrary camera pose. All frames are RAM-cached at
init (reference :138-153); the pixel-grid ray directions K⁻¹·[x,y,1] are
precomputed once on device (:87-99); per-query work is ray rotation, a
ray/AABB ``mask_at_box``, nearest-camera view selection, and the
frame-image device upload. Also exposes the camera-rail B-spline API
(``get_camera_tck``, reference :260-277).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from enerf_tpu import native
from enerf_tpu.config import Config, DatasetConfig
from enerf_tpu.utils.geometry import rays_aabb_mask


class Dataset:
    def __init__(self, cfg: Config, ds_cfg: DatasetConfig):
        import jax.numpy as jnp

        self.cfg = cfg
        self.split = ds_cfg.split
        self.data_root = os.path.join(cfg.workspace, ds_cfg.data_root)
        self.scene = ds_cfg.scene
        self.input_ratio = ds_cfg.input_ratio
        extra = dict(ds_cfg.extra)

        scene_root = os.path.join(self.data_root, self.scene)
        annots = np.load(os.path.join(scene_root, "annots.npy"),
                         allow_pickle=True).item()
        self.annots = annots
        info = {"ixts": [], "exts": [], "Ds": [], "bbox": {}}
        cam_len = len(annots["cams"]["K"])
        for ci in range(cam_len):
            R = np.array(annots["cams"]["R"][ci])
            T = np.array(annots["cams"]["T"][ci]) / 1000.0
            ext = np.eye(4)
            ext[:3, :3], ext[:3, 3:] = R, T.reshape(3, 1)
            info["exts"].append(ext.astype(np.float32))
            info["ixts"].append(np.array(annots["cams"]["K"][ci], np.float32))
            info["Ds"].append(np.array(annots["cams"]["D"][ci], np.float32))

        frame_len = len(annots["ims"])
        b, e, s = ds_cfg.frames
        e = e if e != -1 else frame_len
        self.render_frames = np.arange(frame_len)[b:e:s].tolist()
        for fid in self.render_frames:
            verts = np.load(f"{scene_root}/new_vertices/{fid + 1}.npy")
            mi, ma = verts.min(0) - 0.1, verts.max(0) + 0.1
            info["bbox"][int(fid)] = np.array(
                [[x, y, z] for x in (mi[0], ma[0]) for y in (mi[1], ma[1])
                 for z in (mi[2], ma[2])])
        self.scene_info = info

        self.exts = np.array(info["exts"], np.float32)
        self.ixts = np.array(info["ixts"], np.float32).copy()
        c2ws = np.linalg.inv(self.exts)
        self.cam_points = c2ws[:, :3, 3].astype(np.float32)
        self.ixts[:, :2] *= self.input_ratio
        self.ixt = np.mean(self.ixts, axis=0).astype(np.float32)

        n_known = int(extra.get("n_known_cams", min(21, cam_len)))
        self.known_cams = np.arange(n_known)

        base_hw = extra.get("base_hw", (1024, 1024))
        self.input_h_w = [int(v * self.input_ratio) for v in base_hw]
        H, W = self.input_h_w
        X, Y = np.meshgrid(np.arange(W), np.arange(H))
        XYZ = np.concatenate(
            [X[..., None], Y[..., None], np.ones_like(X[..., None])],
            axis=-1).astype(np.float32)
        # device-resident precomputed grid (reference :87-99)
        self.XY = jnp.asarray(
            np.concatenate([X[..., None], Y[..., None]], -1).astype(np.float32))
        self.XYZ = jnp.asarray(XYZ @ np.linalg.inv(self.ixt).T)
        self.jixt = jnp.asarray(self.ixt)
        self.jixts = jnp.asarray(self.ixts)
        self.jexts = jnp.asarray(self.exts)

        self.cache: Dict[int, Dict] = {}
        for fid in self.render_frames:
            self.cache_data(fid)

    # -- frame caching (reference :138-153) ---------------------------------
    def read_data(self, view: int, frame_id: int):
        import cv2
        import imageio.v2 as imageio

        scene_root = os.path.join(self.data_root, self.scene)
        rel = self.annots["ims"][frame_id]["ims"][view]
        img = native.u8_to_unit(
            np.asarray(imageio.imread(os.path.join(scene_root, rel))))
        mask = np.asarray(imageio.imread(
            os.path.join(scene_root, "mask", rel[:-4] + ".png")))
        mask = (mask != 0).astype(np.uint8)
        mask = cv2.dilate(mask.copy(), np.ones((5, 5), np.uint8))
        ext = self.scene_info["exts"][view]
        ixt = self.scene_info["ixts"][view].copy()
        img = cv2.undistort(img, ixt, self.scene_info["Ds"][view])
        mask = cv2.undistort(mask, ixt, self.scene_info["Ds"][view])
        if self.input_ratio != 1.0:
            img = cv2.resize(img, None, fx=self.input_ratio,
                             fy=self.input_ratio,
                             interpolation=cv2.INTER_AREA)
            mask = cv2.resize(mask, None, fx=self.input_ratio,
                              fy=self.input_ratio,
                              interpolation=cv2.INTER_NEAREST)
            ixt[:2] *= self.input_ratio
        img[mask == 0] = 0.0
        return img

    def cache_data(self, frame: int) -> Dict:
        if frame in self.cache:
            return self.cache[frame]
        inps = native.collate([native.unit_to_pm1(self.read_data(c, frame))
                               for c in self.known_cams])
        verts = self.scene_info["bbox"][frame].astype(np.float32)
        bounds = np.stack([verts.min(0), verts.max(0)]).astype(np.float32)
        self.cache[frame] = {"inps": inps, "vertices": verts,
                             "bounds": bounds}
        return self.cache[frame]

    # -- per-query conversion (reference :169-227) ---------------------------
    def build_rays(self, c2w: np.ndarray):
        import jax.numpy as jnp

        H, W = self.input_h_w
        dirs = self.XYZ @ jnp.asarray(c2w[:3, :3]).T
        rays_o = jnp.broadcast_to(jnp.asarray(c2w[:3, 3]), (H, W, 3))
        rays = jnp.concatenate([rays_o, dirs, self.XY], axis=-1)
        return rays.reshape(-1, 8), H, W

    def convert_data(self, data_dict: Dict, c2w: np.ndarray,
                     w2c: np.ndarray) -> Dict:
        import jax.numpy as jnp

        cfg = self.cfg
        i = cfg.enerf.cas_config.num - 1
        rays, H, W = self.build_rays(c2w)

        bounds = data_dict["bounds"]
        mask = rays_aabb_mask(np.asarray(rays), bounds).astype(np.float32)

        verts = data_dict["vertices"] @ w2c[:3, :3].T + w2c[:3, 3:].T
        near_far = np.array([max(verts[:, 2].min(), 0.05),
                             verts[:, 2].max()], np.float32)

        dist = np.linalg.norm(self.cam_points - c2w[:3, 3][None], axis=-1)
        near_views = np.argsort(dist)[: cfg.enerf.test_input_views]

        S_max = cfg.enerf.max_views
        pad = S_max - len(near_views)
        view_mask = np.concatenate(
            [np.ones(len(near_views)), np.zeros(pad)]).astype(np.float32)
        sel = np.concatenate([near_views,
                              np.zeros(pad, near_views.dtype)])

        ret = {
            "tar_ext": jnp.asarray(w2c, jnp.float32),
            "tar_ixt": self.jixt,
            f"rays_{i}": rays,
            "mask_at_box": jnp.asarray(mask),
            "src_inps": jnp.asarray(data_dict["inps"][sel]
                                    * view_mask[:, None, None, None]),
            "src_exts": self.jexts[sel],
            "src_ixts": self.jixts[sel],
            "view_mask": jnp.asarray(view_mask),
            "near_far": jnp.asarray(near_far),
        }
        # add batch dim (reference add_batch, data_utils.py:14-26)
        return {k: v[None] for k, v in ret.items()}

    def __getitem__(self, query: Tuple[int, np.ndarray, np.ndarray]) -> Dict:
        index, c2w, w2c = query
        return self.convert_data(self.cache_data(index), c2w, w2c)

    # -- camera-path API (reference :239-277) --------------------------------
    def get_camera_up_front_center(self, index: int = 0):
        ext = self.exts[index]
        worldup = -ext.T[:3, 1]
        front = ext.T[:3, 2]
        center = -ext[:3, :3].T @ ext[:3, 3]
        return worldup, front, center

    def get_closest_camera(self, center: np.ndarray) -> int:
        return int(np.argmin(np.linalg.norm(self.cam_points - center,
                                            axis=-1)))

    def get_camera_tck(self, smoothing_term: float = 0.0):
        """Periodic B-spline through all camera (center, front, worldup)
        triples (reference :260-277, scipy splprep per=1)."""
        from scipy import interpolate

        exts = self.exts
        cens = (-np.einsum("bij,bj->bi",
                           exts[:, :3, :3].transpose(0, 2, 1),
                           exts[:, :3, 3])).T
        fros = exts[:, 2, :3].T
        wups = -exts[:, 1, :3].T
        cen_tck, cen_u = interpolate.splprep(cens, s=smoothing_term, per=1)
        fro_tck, fro_u = interpolate.splprep(fros, s=smoothing_term, per=1)
        wup_tck, wup_u = interpolate.splprep(wups, s=smoothing_term, per=1)
        return cen_tck, cen_u, fro_tck, fro_u, wup_tck, wup_u

    @property
    def n_cams(self) -> int:
        return len(self.known_cams)

    def __len__(self):
        return len(self.render_frames)
