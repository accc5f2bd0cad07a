"""Native (C++) host-pipeline kernels vs their numpy reference semantics.

Every kernel must match the exact numpy chain it replaces in the datasets
/ visualizers (reference preprocessing: lib/datasets/dtu/enerf.py:85-92,
nerf/enerf.py:127, zjumocap/enerf.py:152, lib/visualizers/enerf.py).
The suite runs twice by construction: the native path (if g++ built the
library) and the forced-fallback numpy path.
"""

import numpy as np
import pytest

from enerf_tpu import native


@pytest.fixture(params=["native", "fallback"])
def lib_mode(request, monkeypatch):
    if request.param == "fallback":
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
    else:
        if not native.available():
            pytest.skip("no native toolchain")
    return request.param


def test_u8_to_unit(lib_mode):
    img = np.random.RandomState(0).randint(0, 256, (37, 53, 3), np.uint8)
    ref = (img.astype(np.float64) / 255.0).astype(np.float32)
    out = native.u8_to_unit(img)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, atol=1.5e-7)


def test_u8_to_pm1(lib_mode):
    img = np.random.RandomState(1).randint(0, 256, (37, 53, 3), np.uint8)
    ref = ((img.astype(np.float64) / 255.0) * 2 - 1).astype(np.float32)
    out = native.u8_to_pm1(img)
    np.testing.assert_allclose(out, ref, atol=3e-7)
    # extreme values exact
    assert native.u8_to_pm1(np.zeros((2, 2), np.uint8)).min() == -1.0
    assert native.u8_to_pm1(np.full((2, 2), 255, np.uint8)).max() == 1.0


def test_u8_to_pm1_masked(lib_mode):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (33, 41, 3), np.uint8)
    mask = (rng.rand(33, 41) > 0.5).astype(np.uint8)
    # reference: zero the [0,1] image where mask==0, then *2-1
    unit = img.astype(np.float64) / 255.0
    unit[mask == 0] = 0.0
    ref = (unit * 2 - 1).astype(np.float32)
    out = native.u8_to_pm1_masked(img, mask)
    np.testing.assert_allclose(out, ref, atol=3e-7)


def test_f32_unit_to_u8_truncates_like_reference(lib_mode):
    rng = np.random.RandomState(3)
    img = rng.rand(31, 47, 3).astype(np.float32) * 1.4 - 0.2  # over/underflow
    ref = (np.clip(img, 0, 1) * 255).astype(np.uint8)  # visualizers/enerf.py
    out = native.f32_unit_to_u8(img)
    np.testing.assert_array_equal(out, ref)


def test_scale_offset_f32(lib_mode):
    img = np.random.RandomState(4).rand(17, 19).astype(np.float32) * 255.0
    np.testing.assert_allclose(native.u8_to_unit(img), img / 255.0,
                               rtol=1e-6)
    np.testing.assert_allclose(native.unit_to_pm1(img / 255.0),
                               img / 255.0 * 2 - 1, atol=3e-7)


def test_u8_rgba_over_white(lib_mode):
    img = np.random.RandomState(5).randint(0, 256, (23, 29, 4), np.uint8)
    f = img.astype(np.float64) / 255.0
    ref = (f[..., :3] * f[..., 3:] + (1 - f[..., 3:])).astype(np.float32)
    out = native.u8_rgba_over_white(img)
    assert out.shape == (23, 29, 3)
    np.testing.assert_allclose(out, ref, atol=3e-7)


def test_pfm_flip_downsample(lib_mode):
    payload = np.random.RandomState(6).rand(64, 80).astype(np.float32)
    # reference chain: flipud (pfm bottom-up) + nearest 0.5x downsample
    # (cv2 INTER_NEAREST picks src index floor(x*2) == [::2])
    ref = payload[::-1][::2, ::2]
    out = native.pfm_flip_downsample(payload, 2)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(native.pfm_flip_downsample(payload, 1),
                                  payload[::-1])


def test_collate(lib_mode):
    rng = np.random.RandomState(7)
    samples = [rng.rand(5, 7).astype(np.float32) for _ in range(3)]
    np.testing.assert_array_equal(native.collate(samples),
                                  np.stack(samples))
    ints = [np.arange(4), np.arange(4)]
    np.testing.assert_array_equal(native.collate(ints), np.stack(ints))
    scalars = [1.0, 2.0]
    np.testing.assert_array_equal(native.collate(scalars),
                                  np.stack(scalars))


def test_read_pfm_depth_half_matches_generic_reader(tmp_path, lib_mode):
    from enerf_tpu.datasets.dtu import read_pfm, read_pfm_depth_half

    depth = np.random.RandomState(8).rand(32, 40).astype(np.float32) * 900
    path = tmp_path / "d.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n40 32\n-1.0\n")
        f.write(depth[::-1].tobytes())  # pfm stores bottom-up
    generic = read_pfm(str(path))[0].astype(np.float32)
    np.testing.assert_array_equal(generic, depth)
    np.testing.assert_array_equal(read_pfm_depth_half(str(path)),
                                  depth[::2, ::2])
