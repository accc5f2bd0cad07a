"""COLMAP IO round-trips — the reference's only in-repo tests are the
vendored COLMAP format round-trips (lib/utils/colmap/test_read_write_*.py,
SURVEY §4); these cover the same formats for the clean-room
implementation in enerf_tpu/utils/colmap.py."""

import numpy as np
import pytest

from enerf_tpu.utils import colmap as cm


def _make_model(rng):
    cameras = {
        1: cm.Camera(1, "PINHOLE", 640, 512,
                     np.array([500.0, 505.0, 320.0, 256.0])),
        2: cm.Camera(2, "SIMPLE_RADIAL", 1024, 768,
                     np.array([800.0, 512.0, 384.0, -0.05])),
    }
    images = {}
    for i in (1, 2, 3):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        n = rng.randint(0, 5)
        images[i] = cm.Image(
            i, q, rng.randn(3), camera_id=1 + (i % 2),
            name=f"frame_{i:04d}.jpg",
            xys=rng.rand(n, 2) * 640,
            point3D_ids=rng.choice([-1, 7, 9], size=n).astype(np.int64))
    points3D = {
        7: cm.Point3D(7, rng.randn(3), np.array([10, 20, 30], np.uint8),
                      0.75, np.array([1, 2], np.int32),
                      np.array([0, 1], np.int32)),
        9: cm.Point3D(9, rng.randn(3), np.array([200, 0, 90], np.uint8),
                      1.25, np.array([3], np.int32),
                      np.array([2], np.int32)),
    }
    return cameras, images, points3D


def _assert_models_equal(a, b):
    cams_a, imgs_a, pts_a = a
    cams_b, imgs_b, pts_b = b
    assert cams_a.keys() == cams_b.keys()
    for k in cams_a:
        ca, cb = cams_a[k], cams_b[k]
        assert (ca.model, ca.width, ca.height) == (cb.model, cb.width,
                                                   cb.height)
        np.testing.assert_array_equal(ca.params, cb.params)
    assert imgs_a.keys() == imgs_b.keys()
    for k in imgs_a:
        ia, ib = imgs_a[k], imgs_b[k]
        assert (ia.camera_id, ia.name) == (ib.camera_id, ib.name)
        np.testing.assert_array_equal(ia.qvec, ib.qvec)
        np.testing.assert_array_equal(ia.tvec, ib.tvec)
        np.testing.assert_array_equal(ia.xys, ib.xys)
        np.testing.assert_array_equal(ia.point3D_ids, ib.point3D_ids)
    assert pts_a.keys() == pts_b.keys()
    for k in pts_a:
        pa, pb = pts_a[k], pts_b[k]
        np.testing.assert_array_equal(pa.xyz, pb.xyz)
        np.testing.assert_array_equal(pa.rgb, pb.rgb)
        assert pa.error == pb.error
        np.testing.assert_array_equal(pa.image_ids, pb.image_ids)
        np.testing.assert_array_equal(pa.point2D_idxs, pb.point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_model_round_trip(tmp_path, ext):
    model = _make_model(np.random.RandomState(0))
    cm.write_model(*model, str(tmp_path), ext=ext)
    assert cm.detect_model_format(str(tmp_path)) == ext
    _assert_models_equal(model, cm.read_model(str(tmp_path)))


def test_bin_txt_cross_consistency(tmp_path):
    """bin and txt encodings of the same model decode identically
    (repr() float serialization in the text path is lossless)."""
    model = _make_model(np.random.RandomState(1))
    cm.write_model(*model, str(tmp_path / "b"), ext=".bin")
    cm.write_model(*model, str(tmp_path / "t"), ext=".txt")
    _assert_models_equal(cm.read_model(str(tmp_path / "b")),
                         cm.read_model(str(tmp_path / "t")))


@pytest.mark.parametrize("shape", [(6, 9), (5, 7, 3)])
def test_dense_array_round_trip(tmp_path, shape):
    rng = np.random.RandomState(2)
    arr = rng.rand(*shape).astype(np.float32)
    p = str(tmp_path / "depth.bin")
    cm.write_array(arr, p)
    np.testing.assert_array_equal(cm.read_array(p), arr)


def test_fused_vis_round_trip(tmp_path):
    rng = np.random.RandomState(3)
    vis = [rng.randint(0, 40, size=rng.randint(0, 6)).astype(np.uint32)
           for _ in range(11)]
    p = str(tmp_path / "fused.ply.vis")
    cm.write_fused_vis(vis, p)
    out = cm.read_fused_vis(p)
    assert len(out) == len(vis)
    for a, b in zip(out, vis):
        np.testing.assert_array_equal(a, b)


def test_qvec_rotmat_round_trip():
    rng = np.random.RandomState(4)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cm.qvec2rotmat(q)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0
        np.testing.assert_allclose(cm.rotmat2qvec(R), q, atol=1e-12)


def test_model_to_enerf_cameras():
    model = _make_model(np.random.RandomState(5))
    names, ixts, exts = cm.model_to_enerf_cameras(model[0], model[1])
    assert names == sorted(names)
    assert ixts.shape == (3, 3, 3) and exts.shape == (3, 4, 4)
    # K: PINHOLE camera 1 has fx=500 fy=505
    by_name = {im.name: im for im in model[1].values()}
    for i, nm in enumerate(names):
        im = by_name[nm]
        if im.camera_id == 1:
            assert ixts[i, 0, 0] == 500.0 and ixts[i, 1, 1] == 505.0
        else:  # SIMPLE_RADIAL: fx == fy
            assert ixts[i, 0, 0] == ixts[i, 1, 1] == 800.0
        # ext is a rigid transform with the image's R, t
        np.testing.assert_allclose(exts[i, :3, :3], cm.qvec2rotmat(im.qvec))
        np.testing.assert_allclose(exts[i, :3, 3], im.tvec)
        np.testing.assert_array_equal(exts[i, 3], [0, 0, 0, 1])


def test_labels_tables():
    from enerf_tpu.utils import labels as lb

    assert len(lb.ADE20K_LABELS) == 150
    assert lb.label_id_mapping_ade20k["person"] == 12
    assert lb.id_label_mapping_ade20k[2] == "sky"
    assert lb.get_class_ids_from_labels(["sky", "person"]) == [2, 12]
    assert lb.get_class_ids_from_labels(["person"],
                                        use_human_mask=True) == [1]
    # dicts are exact inverses
    for i, name in lb.id_label_mapping_ade20k.items():
        assert lb.label_id_mapping_ade20k[name] == i
