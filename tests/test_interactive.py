"""Interactive subsystem: camera math, B-spline rail, and the headless
GUI loop end-to-end on a generated ZJU-MoCap fixture."""

import os
import sys

import numpy as np
import pytest

from enerf_tpu.interactive.camera import Camera

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from tests.test_datasets import _cfg, _imwrite  # noqa: E402


def test_camera_basis_orthonormal():
    cam = Camera()
    c2w = cam.get_c2w()
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(cam.get_w2c() @ c2w, np.eye(4), atol=1e-5)


def test_camera_orbit_preserves_origin_distance():
    cam = Camera(center=(0, 3, 1), front=(0, -1, 0))
    d0 = np.linalg.norm(cam.center - cam.origin)
    cam.begin_drag(100, 100, is_pan=False, about_origin=True, fix_y=False)
    cam.drag_update(180, 130)
    cam.end_drag()
    d1 = np.linalg.norm(cam.center - cam.origin)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
    # the camera moved
    assert np.linalg.norm(cam.center - [0, 3, 1]) > 1e-3


def test_camera_pan_moves_in_image_plane():
    cam = Camera(center=(0, 3, 1), front=(0, -1, 0))
    front0 = cam.v_front.copy()
    cam.begin_drag(0, 0, is_pan=True, about_origin=False, fix_y=False)
    cam.drag_update(50, 0)
    cam.end_drag()
    np.testing.assert_allclose(cam.v_front, front0, atol=1e-9)
    # displacement along the right vector only
    disp = cam.center - [0, 3, 1]
    assert abs(np.dot(disp, front0)) < 1e-9


def _make_zjumocap_fixture(tmp):
    """Cameras on a ring looking at the origin (so the spline rail and
    view selection are well-posed)."""
    import cv2

    rng = np.random.RandomState(0)
    n_cams, n_frames, H, W = 8, 2, 64, 64
    scene_root = os.path.join(tmp, "zju_mocap", "CoreView_313")
    Ks, Rs, Ts, Ds, ims = [], [], [], [], []
    for c in range(n_cams):
        ang = 2 * np.pi * c / n_cams
        eye = np.array([2 * np.sin(ang), -2 * np.cos(ang), 0.8])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
        Ks.append(K)
        Rs.append(R)
        Ts.append((-R @ eye).reshape(3, 1) * 1000.0)
        Ds.append(np.zeros((5, 1)))
    for f in range(n_frames):
        paths = []
        for c in range(n_cams):
            rel = f"Camera_B{c + 1}/{f:06d}.jpg"
            _imwrite(os.path.join(scene_root, rel), rng.rand(H, W, 3))
            mask = np.zeros((H, W))
            mask[16:48, 16:48] = 1
            _imwrite(os.path.join(scene_root, "mask", rel[:-4] + ".png"),
                     mask)
            paths.append(rel)
        ims.append({"ims": paths})
        os.makedirs(os.path.join(scene_root, "new_vertices"), exist_ok=True)
        np.save(os.path.join(scene_root, "new_vertices", f"{f + 1}.npy"),
                np.random.RandomState(f).rand(10, 3) * 0.4 - 0.2)
    np.save(os.path.join(scene_root, "annots.npy"),
            {"cams": {"K": Ks, "R": Rs, "T": Ts, "D": Ds}, "ims": ims})
    return H, W


def test_headless_interactive_loop(tmp_path, monkeypatch):
    from dataclasses import replace

    tmp = str(tmp_path)
    H, W = _make_zjumocap_fixture(tmp)
    monkeypatch.chdir(tmp)

    cfg = _cfg(sample_on_mask=True)
    cfg = replace(
        cfg,
        network_module="enerf_tpu.models.enerf_human",
        test_dataset_module="enerf_tpu.datasets.zjumocap_interactive",
        visualizer_module="enerf_tpu.eval.visualizer_interactive",
        workspace=tmp,
        test_dataset=replace(
            cfg.test_dataset, data_root="zju_mocap", scene="CoreView_313",
            frames=(0, 2, 1),
            extra=(("base_hw", (H, W)), ("n_known_cams", 8))),
        enerf=replace(cfg.enerf,
                      cas_config=replace(cfg.enerf.cas_config,
                                         render_if=(False, True))))

    import gui_human

    rend = gui_human.Renderer(cfg)
    gui_human.run_headless(rend, n_frames=2)
    out = os.path.join(cfg.result_dir, "interactive.mp4")
    assert os.path.exists(out) and os.path.getsize(out) > 0

    # the HUD overlay (imgui-panel replacement) draws in place and
    # changes pixels
    img = np.zeros((H, W, 3), np.uint8)
    hud = gui_human.draw_hud(img.copy(), rend)
    assert hud.shape == img.shape and hud.dtype == np.uint8
    assert (hud != img).any()


def test_interactive_dataset_rail_and_views(tmp_path, monkeypatch):
    from dataclasses import replace

    tmp = str(tmp_path)
    H, W = _make_zjumocap_fixture(tmp)
    monkeypatch.chdir(tmp)

    from enerf_tpu.config import DatasetConfig
    from enerf_tpu.datasets.zjumocap_interactive import Dataset

    cfg = _cfg(sample_on_mask=True)
    ds = Dataset(cfg, DatasetConfig(
        data_root="zju_mocap", scene="CoreView_313", split="test",
        frames=(0, 2, 1),
        extra=(("base_hw", (H, W)), ("n_known_cams", 8))))
    assert len(ds) == 2 and ds.n_cams == 8

    # rail interpolates through camera space: u=0 ≈ camera 0 center
    cen_tck, cen_u, *_ = ds.get_camera_tck(0.0)
    wup, front, center = ds.get_camera_up_front_center(0)
    from scipy import interpolate

    c0 = np.array(interpolate.splev(cen_u[0], cen_tck)).reshape(3)
    np.testing.assert_allclose(c0, center, atol=1e-4)
    assert ds.get_closest_camera(center) == 0

    # pose query: shapes + some rays hit the subject box
    cam = Camera(worldup=wup, front=front, center=center)
    batch = ds[(0, cam.get_c2w(), cam.get_w2c())]
    assert batch["src_inps"].shape == (1, cfg.enerf.max_views, H, W, 3)
    assert batch["rays_1"].shape == (1, H * W, 8)
    mab = np.asarray(batch["mask_at_box"])
    assert 0 < mab.sum() < H * W
    assert float(batch["near_far"][0, 0]) > 0
