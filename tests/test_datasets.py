"""Dataset IO contracts, driven on tiny generated fixtures (the reference
has no tests; these pin each loader's file-format decode and the
fixed-shape batch contract)."""

import json
import os

import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, DatasetConfig, ENeRFConfig


def _cfg(**enerf_kw):
    enerf_kw.setdefault("train_input_views", (2, 3))
    enerf_kw.setdefault("test_input_views", 2)
    enerf_kw.setdefault(
        "cas_config",
        CascadeConfig(num=2, volume_planes=(8, 8), num_rays=(64, 256)))
    return Config(enerf=ENeRFConfig(**enerf_kw), fix_random=True)


def _imwrite(path, img):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def _check_common(s, S_max, H, W, cas):
    assert s["src_inps"].shape == (S_max, H, W, 3)
    assert s["src_exts"].shape == (S_max, 4, 4)
    assert s["src_ixts"].shape == (S_max, 3, 3)
    assert s["view_mask"].shape == (S_max,)
    for i in range(cas.num):
        n = (int(H * cas.render_scale[i]) * int(W * cas.render_scale[i])
             if s.get("tar_img") is not None else None)
        assert s[f"rays_{i}"].shape[-1] == 8
        assert s[f"rgb_{i}"].shape[-1] == 3


# ---------------------------------------------------------------------------
# NeRF-synthetic
# ---------------------------------------------------------------------------

def _make_nerf_fixture(root, scene="lego", n=6, H=40, W=40):
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n):
        c2w = np.eye(4)
        ang = i * 0.3
        c2w[:3, 3] = [3 * np.sin(ang), 3 * np.cos(ang), 1.0]
        frames.append({"transform_matrix": c2w.tolist()})
        img = np.concatenate([rng.rand(H, W, 3), np.ones((H, W, 1))], -1)
        _imwrite(os.path.join(root, scene, f"train/r_{i}.png"), img)
    meta = {"camera_angle_x": 0.7, "frames": frames}
    os.makedirs(os.path.join(root, scene), exist_ok=True)
    json.dump(meta, open(os.path.join(root, scene,
                                      "transforms_train.json"), "w"))


def _make_pairs(tmp, scenes, n, prefix=""):
    import torch

    pairs = {}
    for s in scenes:
        pairs[f"{s}_train"] = list(range(n - 2))
        pairs[f"{s}_val"] = [n - 2, n - 1]
    os.makedirs(os.path.join(tmp, "data/mvsnerf"), exist_ok=True)
    torch.save(pairs, os.path.join(tmp, "data/mvsnerf/pairs.th"))


def test_nerf_synthetic_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    _make_nerf_fixture(os.path.join(tmp, "nerf_synthetic"))
    _make_pairs(tmp, ["lego"], 6)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.nerf_synthetic import Dataset

    cfg = _cfg()
    ds = Dataset(cfg, DatasetConfig(data_root="nerf_synthetic", scene="lego",
                                    split="test"))
    assert len(ds) == 2
    s = ds[(0, 2)]
    _check_common(s, cfg.enerf.max_views, 40, 40, cfg.enerf.cas_config)
    assert s["near_far"].tolist() == [2.5, 5.5]
    # white alpha compositing: fully-opaque fixture → rgb preserved
    assert s["tar_img"].shape == (40, 40, 3)


# ---------------------------------------------------------------------------
# LLFF
# ---------------------------------------------------------------------------

def test_llff_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    rng = np.random.RandomState(0)
    n, H, W = 6, 48, 64
    root = os.path.join(tmp, "nerf_llff_data", "flower")
    pb = np.zeros((n, 17))
    for i in range(n):
        pose = np.zeros((3, 5))
        pose[:3, :3] = np.eye(3)[:, [1, 0, 2]] * np.array([1, 1, -1])
        pose[:3, 3] = [0.1 * i, 0, 0]
        pose[0, 4], pose[1, 4], pose[2, 4] = H * 4, W * 4, 200.0
        pb[i, :15] = pose.reshape(-1)
        pb[i, 15:] = [2.0 + 0.1 * i, 6.0 + 0.1 * i]
        _imwrite(os.path.join(root, "images_4", f"im_{i:03d}.png"),
                 rng.rand(H, W, 3))
    os.makedirs(root, exist_ok=True)
    np.save(os.path.join(root, "poses_bounds.npy"), pb)
    _make_pairs(tmp, ["flower"], n)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.llff import Dataset

    cfg = _cfg()
    ds = Dataset(cfg, DatasetConfig(data_root="nerf_llff_data",
                                    scene="flower", split="test",
                                    input_h_w=(48, 64)))
    s = ds[(0, 2)]
    _check_common(s, cfg.enerf.max_views, 48, 64, cfg.enerf.cas_config)
    # scene-global near/far = min/max over all views
    np.testing.assert_allclose(s["near_far"], [2.0, 6.5], atol=1e-5)


# ---------------------------------------------------------------------------
# ZJU-MoCap
# ---------------------------------------------------------------------------

def test_zjumocap_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    rng = np.random.RandomState(0)
    n_cams, n_frames, H, W = 6, 3, 64, 64
    scene_root = os.path.join(tmp, "zju_mocap", "CoreView_313")
    Ks, Rs, Ts, Ds, ims = [], [], [], [], []
    for c in range(n_cams):
        ang = 2 * np.pi * c / n_cams
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
        import cv2

        R = cv2.Rodrigues(np.array([0.0, 0.0, ang]))[0]
        eye = -R @ np.array([2 * np.sin(ang), -2 * np.cos(ang), 0.5])
        Ks.append(K)
        Rs.append(R)
        Ts.append(eye.reshape(3, 1) * 1000.0)
        Ds.append(np.zeros((5, 1)))
    for f in range(n_frames):
        paths = []
        for c in range(n_cams):
            rel = f"Camera_B{c + 1}/{f:06d}.jpg"
            img = rng.rand(H, W, 3)
            _imwrite(os.path.join(scene_root, rel), img)
            mask = np.zeros((H, W))
            mask[16:48, 16:48] = 1
            _imwrite(os.path.join(scene_root, "mask",
                                  rel[:-4] + ".png"), mask)
            paths.append(rel)
        ims.append({"ims": paths})
        verts = rng.rand(10, 3) * 0.5
        os.makedirs(os.path.join(scene_root, "new_vertices"), exist_ok=True)
        np.save(os.path.join(scene_root, "new_vertices", f"{f + 1}.npy"),
                verts)
    annots = {"cams": {"K": Ks, "R": Rs, "T": Ts, "D": Ds}, "ims": ims}
    np.save(os.path.join(scene_root, "annots.npy"), annots)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.zjumocap import Dataset

    cfg = _cfg(sample_on_mask=True)
    ds = Dataset(cfg, DatasetConfig(
        data_root="zju_mocap", scene="CoreView_313", split="test",
        frames=(0, -1, 1), input_ratio=1.0,
        extra=(("input_views", (0, -1, 2)), ("render_views", (1, -1, 2)))))
    s = ds[(0, 2)]
    _check_common(s, cfg.enerf.max_views, H, W, cfg.enerf.cas_config)
    assert s["mask_at_box"].shape == (H * W,)
    assert s["near_far"][0] > 0.0
    # background zeroed outside mask
    assert s["tar_img"][0, 0].tolist() == [0.0, 0.0, 0.0]


# ---------------------------------------------------------------------------
# ENeRF-Outdoor
# ---------------------------------------------------------------------------

def _write_ply(path, pts):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(pts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        f.write(pts.astype("<f4").tobytes())


def _make_outdoor_fixture(tmp, scene="actor1", n_cams=5, n_frames=2,
                          H=96, W=96):
    import cv2

    rng = np.random.RandomState(0)
    root = os.path.join(tmp, "enerf_outdoor", scene)
    os.makedirs(root, exist_ok=True)
    intri = cv2.FileStorage(os.path.join(root, "intri.yml"),
                            cv2.FILE_STORAGE_WRITE)
    extri = cv2.FileStorage(os.path.join(root, "extri.yml"),
                            cv2.FILE_STORAGE_WRITE)
    names = [f"{c:02d}" for c in range(n_cams)]
    intri.startWriteStruct("names", cv2.FileNode_SEQ)
    for nm in names:
        intri.write("", nm)
    intri.endWriteStruct()
    for c, nm in enumerate(names):
        # cameras behind the scene on -z, looking toward +z (identity R
        # with tiny roll so views are distinct), scene points near origin
        K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
        Rvec = np.array([[0.0], [0.0], [0.02 * c]])
        R = cv2.Rodrigues(Rvec)[0]
        eye = np.array([0.2 * c - 0.4, 0.1 * c - 0.2, -4.0])
        T = (-R @ eye).reshape(3, 1)
        intri.write(f"K_{nm}", K)
        intri.write(f"dist_{nm}", np.zeros((5, 1)))
        extri.write(f"R_{nm}", Rvec)
        extri.write(f"T_{nm}", T)
    intri.release()
    extri.release()

    for c in range(n_cams):
        _imwrite(os.path.join(root, "bkgd", f"{c:02d}.jpg"),
                 rng.rand(H, W, 3))
        for f in range(n_frames):
            _imwrite(os.path.join(root, "images", f"{c:02d}",
                                  f"{f:06d}.jpg"), rng.rand(H, W, 3))
    os.makedirs(os.path.join(root, "vhull"), exist_ok=True)
    for f in range(n_frames):
        np.save(os.path.join(root, "vhull", f"{f:06d}.npy"),
                np.array([[-0.3, -0.3, 0.0], [0.3, 0.3, 1.5]]))
    pts = rng.rand(200, 3) * 4 - 2
    _write_ply(os.path.join(root, "background.ply"), pts)
    return root


def test_enerf_outdoor_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    _make_outdoor_fixture(tmp)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.enerf_outdoor import Dataset

    cfg = _cfg(num_fg_layers=1, fg_bbox_hw=(32, 32), viewdir_agg=False)
    ds = Dataset(cfg, DatasetConfig(
        data_root="enerf_outdoor", scene="actor1", split="test",
        frames=(0, -1, 1), input_ratio=1.0,
        extra=(("input_views", (0, -1, 1)), ("render_views", (0, 2, 1)))))
    s = ds[(0, 2)]
    H = W = 96
    _check_common(s, cfg.enerf.max_views, H, W, cfg.enerf.cas_config)
    assert s["bg_src_inps"].shape == s["src_inps"].shape
    assert s["near_far"].shape == (2, 2)  # 1 fg layer + bg
    x, y, w, h = s["bbox"][0]
    assert (w, h) == (32, 32)  # static window size
    assert 0 <= x <= W - 32 and 0 <= y <= H - 32


def test_enerf_outdoor_path_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    _make_outdoor_fixture(tmp)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.enerf_outdoor_path import Dataset

    cfg = _cfg(num_fg_layers=1, fg_bbox_hw=(32, 32), viewdir_agg=False)
    ds = Dataset(cfg, DatasetConfig(
        data_root="enerf_outdoor", scene="actor1", split="test",
        frames=(0, -1, 1), input_ratio=1.0,
        extra=(("input_views", (0, -1, 1)), ("render_views", (0, 2, 1)),
               ("num_circle_view", 10))))
    assert len(ds) == 2  # one meta per frame
    s = ds[(1, 2)]
    # target extrinsic comes from the synthesized orbit, not a real camera
    exts = ds.scene_info["exts"]
    assert not any(np.allclose(s["tar_ext"], e) for e in exts)


# ---------------------------------------------------------------------------
# DTU (train split; eval split needs full-res pfm depth)
# ---------------------------------------------------------------------------

def test_dtu_dataset(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    rng = np.random.RandomState(0)
    root = os.path.join(tmp, "dtu")
    H, W = 64, 80
    os.makedirs(os.path.join(root, "Cameras/train"), exist_ok=True)
    for i in range(49):
        ang = 0.1 * i
        ext = np.eye(4)
        ext[:3, 3] = [np.sin(ang), np.cos(ang), 600.0]
        ixt = np.array([[50.0, 0, W / 8], [0, 50.0, H / 8], [0, 0, 1]])
        lines = ["extrinsic"]
        lines += [" ".join(str(v) for v in row) for row in ext]
        lines += ["", "intrinsic"]
        lines += [" ".join(str(v) for v in row) for row in ixt]
        lines += ["", "425.0 2.5"]
        with open(os.path.join(root, "Cameras/train",
                               f"{i:08d}_cam.txt"), "w") as f:
            f.write("\n".join(lines))
    for i in range(49):
        _imwrite(os.path.join(
            root, "Rectified/scan1_train",
            f"rect_{i + 1:03d}_3_r5000.png"), rng.rand(H, W, 3))
    os.makedirs(os.path.join(tmp, "data/mvsnerf"), exist_ok=True)
    with open(os.path.join(tmp, "data/mvsnerf/dtu_train_all.txt"), "w") as f:
        f.write("scan1\n")
    _make_pairs(tmp, ["dtu"], 10)
    monkeypatch.chdir(tmp)

    from enerf_tpu.datasets.dtu import Dataset

    cfg = _cfg()
    ds = Dataset(cfg, DatasetConfig(
        data_root="dtu", ann_file="data/mvsnerf/dtu_train_all.txt",
        split="train"))
    assert len(ds) == 49
    s = ds[(0, 2)]
    _check_common(s, cfg.enerf.max_views, H, W, cfg.enerf.cas_config)
    assert s["near_far"].tolist() == [425.0, 905.0]
    # train_img=True ⇒ full grid at render scale even in train split
    # (reference enerf_utils.py:34: sampling only when not train_img)
    assert s["rays_0"].shape[0] == (H // 4) * (W // 4)
