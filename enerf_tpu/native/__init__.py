"""Native (C++) host-side data-pipeline kernels with numpy fallbacks.

The compute path of this framework is XLA/Pallas on the TPU chip; the
*host* side — image decode/normalize, batch collation, GUI frame
conversion — runs on a single-core CPU in this deployment, where numpy's
multi-pass expressions (``(img / 255 * 2 - 1).astype(np.float32)`` walks
the image four times through float64 temporaries) are the bottleneck.
``host_ops.cc`` provides one-pass fused kernels; this module builds it
on demand with g++ (cached as ``libhost_ops.so`` next to the source) and
falls back to numpy transparently when no toolchain is available.

Replaces the native layer of the reference's loader stack (torch
DataLoader C++ workers + tensor conversions, lib/datasets/make_dataset.py)
the TPU-native way: the device never sees any of this — batches land as
ready fp32 arrays.

API (all return np.ndarray, C-contiguous):
- ``u8_to_unit(img)``        u8 -> f32 in [0, 1]
- ``u8_to_pm1(img)``         u8 -> f32 in [-1, 1]
- ``u8_to_pm1_masked(img, mask)``  + zero-out where mask==0, one pass
- ``f32_unit_to_u8(img)``    f32 [0,1] -> u8 with clamp (GUI/mp4 frames)
- ``pfm_flip_downsample(payload, scale)``  bottom-up pfm -> top-down,
  fused nearest 1/scale downsample (DTU depth path)
- ``collate(samples)``       stack into a preallocated batch buffer
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_ops.cc")
_SO = os.path.join(_DIR, "libhost_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> Optional[str]:
    try:
        cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    """Build-once, load-once; returns None when unavailable (fallbacks)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ENERF_NO_NATIVE"):
            return None
        so = _SO if (os.path.exists(_SO)
                     and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)) \
            else _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            st = ctypes.c_size_t
            lib.u8_to_unit_f32.argtypes = [u8p, f32p, st]
            lib.u8_to_pm1_f32.argtypes = [u8p, f32p, st]
            lib.u8_to_pm1_masked_f32.argtypes = [u8p, u8p, f32p, st, st, st]
            lib.f32_unit_to_u8.argtypes = [f32p, u8p, st]
            lib.f32_scale_offset.argtypes = [f32p, f32p, st,
                                             ctypes.c_float, ctypes.c_float]
            lib.u8_rgba_over_white_f32.argtypes = [u8p, f32p, st]
            lib.collate_f32.argtypes = [f32p, f32p, st, st]
            lib.pfm_flip_downsample_f32.argtypes = [f32p, f32p, st, st, st]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _scale_offset_f32(img: np.ndarray, scale: float, offset: float
                      ) -> np.ndarray:
    """Fused x*scale+offset for a f32 array (native when possible)."""
    lib = _load()
    if lib is not None and img.dtype == np.float32 and img.flags.c_contiguous:
        out = np.empty(img.shape, np.float32)
        lib.f32_scale_offset(_f32p(img), _f32p(out), img.size,
                             scale, offset)
        return out
    out = np.asarray(img, dtype=np.float32) * np.float32(scale)
    if offset:
        out += np.float32(offset)
    return out


def u8_to_unit(img: np.ndarray) -> np.ndarray:
    """u8 (or [0,255] float) image -> f32 in [0, 1], one pass."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or not img.flags.c_contiguous:
        return _scale_offset_f32(img, 1.0 / 255.0, 0.0)
    out = np.empty(img.shape, np.float32)
    lib.u8_to_unit_f32(_u8p(img), _f32p(out), img.size)
    return out


def u8_to_pm1(img: np.ndarray) -> np.ndarray:
    """u8 (or [0,255] float) image -> f32 in [-1, 1], one pass."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or not img.flags.c_contiguous:
        return _scale_offset_f32(img, 2.0 / 255.0, -1.0)
    out = np.empty(img.shape, np.float32)
    lib.u8_to_pm1_f32(_u8p(img), _f32p(out), img.size)
    return out


def unit_to_pm1(img: np.ndarray) -> np.ndarray:
    """[0,1] f32 image -> [-1,1] (the img*2-1 normalize), one pass."""
    return _scale_offset_f32(img, 2.0, -1.0)


def u8_rgba_over_white(img: np.ndarray) -> np.ndarray:
    """u8 (H, W, 4) RGBA -> f32 (H, W, 3) in [0,1], alpha-composited onto
    white in one pass (reference nerf/enerf.py:127 semantics)."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 4 \
            or not img.flags.c_contiguous:
        f = np.asarray(img, dtype=np.float32) / np.float32(255.0)
        return (f[..., :3] * f[..., 3:] + (1.0 - f[..., 3:])
                ).astype(np.float32)
    out = np.empty(img.shape[:-1] + (3,), np.float32)
    lib.u8_rgba_over_white_f32(_u8p(img), _f32p(out),
                               img.shape[0] * img.shape[1])
    return out


def u8_to_pm1_masked(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """u8 (H, W, C) + u8 (H, W) mask -> [-1, 1] f32 with mask==0 pixels at
    -1 (the zeroed-then-normalized value), one pass."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or mask.dtype != np.uint8 \
            or not (img.flags.c_contiguous and mask.flags.c_contiguous):
        out = np.asarray(img, dtype=np.float32) * np.float32(2.0 / 255.0) \
            - np.float32(1.0)
        out[np.asarray(mask) == 0] = -1.0
        return out
    h, w, c = img.shape
    out = np.empty(img.shape, np.float32)
    lib.u8_to_pm1_masked_f32(_u8p(img), _u8p(mask), _f32p(out), h, w, c)
    return out


def f32_unit_to_u8(img: np.ndarray) -> np.ndarray:
    """Truncating (reference ``(img*255).astype(uint8)`` semantics)."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.float32)
    if lib is None:
        return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    out = np.empty(img.shape, np.uint8)
    lib.f32_unit_to_u8(_f32p(img), _u8p(out), img.size)
    return out


def pfm_flip_downsample(payload: np.ndarray, scale: int = 1) -> np.ndarray:
    """(H, W) f32 bottom-up pfm scanlines -> top-down, nearest-downsampled
    by ``scale`` (1 or 2) in the same pass (cv2.resize INTER_NEAREST
    fx=1/scale picks source index floor(x*scale) — matched exactly)."""
    assert scale in (1, 2), scale
    lib = _load()
    payload = np.ascontiguousarray(payload, dtype=np.float32)
    h, w = payload.shape
    if lib is None:
        flipped = payload[::-1]
        return np.ascontiguousarray(flipped[::scale, ::scale])
    out = np.empty((h // scale, w // scale), np.float32)
    lib.pfm_flip_downsample_f32(_f32p(payload), _f32p(out), h, w, scale)
    return out


def collate(samples: List[np.ndarray]) -> np.ndarray:
    """np.stack for f32 samples via direct writes into the batch buffer."""
    lib = _load()
    if lib is None or not isinstance(samples[0], np.ndarray) \
            or samples[0].dtype != np.float32 \
            or not all(isinstance(s, np.ndarray) and s.flags.c_contiguous
                       and s.shape == samples[0].shape
                       and s.dtype == np.float32 for s in samples):
        return np.stack(samples)
    out = np.empty((len(samples),) + samples[0].shape, np.float32)
    n = samples[0].size
    for i, s in enumerate(samples):
        lib.collate_f32(_f32p(s), _f32p(out), i, n)
    return out
