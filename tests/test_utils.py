"""Utility-layer tests: mesh extraction, ply round trip, image concat,
perf timer, epipolar validation figure."""

import os

import numpy as np

from enerf_tpu.utils.img import colorize_depth, horizon_concate, vertical_concate
from enerf_tpu.utils.mesh import extract_mesh, marching_tetrahedra
from enerf_tpu.utils.ply import load_ply_vertices, save_ply_mesh
from enerf_tpu.utils.profiling import perf_timer, time_fn


def test_marching_tetrahedra_sphere(tmp_path):
    # density = 1 inside a radius-0.6 sphere: isosurface ≈ the sphere
    def queryfn(xyz):
        import jax.numpy as jnp

        r = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        return (r < 0.6).astype(jnp.float32)

    path = os.path.join(str(tmp_path), "sphere.ply")
    verts, faces = extract_mesh(queryfn, level=0.5, bbox=[[-1, -1, -1],
                                                          [1, 1, 1]],
                                output_path=path, N=32)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(radii) - 0.6) < 0.1
    # ply round trip
    loaded = load_ply_vertices(path)
    assert loaded.shape == verts.shape
    np.testing.assert_allclose(loaded, verts, atol=1e-4)


def test_marching_tetrahedra_empty():
    field = np.zeros((8, 8, 8))
    verts, faces = marching_tetrahedra(field, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_img_concat():
    a = np.ones((4, 6, 3))
    b = np.zeros((8, 2, 3))
    h = horizon_concate(a, b)
    assert h.shape == (8, 8, 3)
    v = vertical_concate(a, b)
    assert v.shape == (12, 6, 3)
    c = colorize_depth(np.linspace(0, 1, 16).reshape(4, 4))
    assert c.shape == (4, 4, 3) and c.min() >= 0 and c.max() <= 1


def test_perf_timer_and_time_fn():
    logs = []
    t = perf_timer(use_ms=True, logf=logs.append)
    t.logtime("a {:.3f}")
    with perf_timer(msg="b {:.3f}", logf=logs.append):
        pass
    assert len(logs) == 2
    dt = time_fn(lambda x: x + 1, 1.0, iters=3)
    assert dt >= 0


def test_load_K_Rt_from_P_roundtrip():
    import cv2

    from enerf_tpu.utils.geometry import load_K_Rt_from_P

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = cv2.Rodrigues(np.array([0.1, -0.2, 0.3]))[0]
    t = np.array([0.5, -1.0, 2.0])
    P = K @ np.concatenate([R, t[:, None]], 1)
    intr, pose = load_K_Rt_from_P(P=P.astype(np.float32))
    np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-4)
    np.testing.assert_allclose(pose[:3, 3], -R.T @ t, atol=1e-4)


def test_get_near_far_box():
    from enerf_tpu.utils.geometry import get_near_far

    bounds = np.array([[-1.0, -1, -1], [1, 1, 1]])
    ray_o = np.tile([[0.0, 0, -5]], (3, 1))
    ray_d = np.array([[0.0, 0, 1], [1, 0, 0], [0.1, 0, 1]])
    near, far, mask = get_near_far(bounds, ray_o, ray_d)
    assert mask[0] and not mask[1]
    np.testing.assert_allclose(near[0], 4.0, atol=1e-6)
    np.testing.assert_allclose(far[0], 6.0, atol=1e-6)


def test_epipolar_validation_figure(tmp_path):
    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.utils.val_data import validate

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        cas_config=CascadeConfig(num=2, volume_planes=(8, 8))))
    batch = make_synthetic_batch(cfg, H=48, W=48, batch_size=1)
    out = os.path.join(str(tmp_path), "epipolar_{b}.png")
    validate(batch, num_points=5, save_path=out)
    assert os.path.exists(out.format(b=0))
