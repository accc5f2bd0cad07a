"""Bilinear/trilinear sampling and resize primitives.

These reimplement torch's ``F.grid_sample`` (align_corners=True, zeros /
border padding) and ``F.interpolate(mode='bilinear', align_corners=True)``
bit-faithfully — every stage of the ENeRF pipeline depends on them
(reference lib/networks/enerf/utils.py:88-90, :457, :706 and the many
``F.interpolate`` call sites). Tested against torch CPU in
tests/test_sampling.py.

Layouts are channels-last: images (H, W, C), volumes (D, H, W, C).
Batched variants take a leading batch axis via vmap.

TPU notes: the inner loop is a 4-way (2D) / 8-way (3D) gather over a
flattened spatial axis — XLA lowers this to dynamic-gather. The resize
functions instead build static interpolation matrices and run on the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_rows(n_rows: int, flat: jnp.ndarray, idx: jnp.ndarray):
    return jnp.take(flat, idx, axis=0)


def _take_rows_fwd(n_rows, flat, idx):
    proto = jnp.zeros((0,) + flat.shape[1:], flat.dtype)
    return jnp.take(flat, idx, axis=0), (idx, proto)


def _take_rows_bwd(n_rows, res, g):
    idx, proto = res
    # The scatter-add itself is fast on TPU (2.6M rows ~0.04 ms measured in
    # isolation) — what kills it in the train program is fusion/layout
    # context: fused with its value producer and assigned a row-minormost
    # layout, it degrades ~25,000x. The barriers force materialized,
    # default-layout operands/results so the fast scatter emitter applies.
    gf = jax.lax.optimization_barrier(
        g.reshape(-1, g.shape[-1]).astype(proto.dtype))
    dflat = jnp.zeros((n_rows, gf.shape[-1]), proto.dtype) \
        .at[idx.ravel()].add(gf)
    dflat = jax.lax.optimization_barrier(dflat)
    return dflat, np.zeros(idx.shape, jax.dtypes.float0)


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def take_rows(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``flat[idx]`` row gather with a pinned-lowering backward.

    The autodiff transpose of a gather is an unsorted scatter-add.
    Inside the full train program XLA fuses the scatter with its
    cotangent producer and assigns it a row-minormost layout, a far
    slower lowering than the standalone op gets. This custom VJP pins
    the standalone lowering: ``optimization_barrier`` on the cotangent
    and on the scatter result forces materialized, default-layout
    operands so the plain scatter emitter applies. Forward lowering is
    identical to ``jnp.take``.
    """
    return _take_rows(flat.shape[0], flat, idx)


def _gather_2d(img_flat: jnp.ndarray, xi, yi, W: int, H: int, zero_pad: bool):
    """Gather img_flat[(yi*W + xi)] with clamped indices; optionally zero
    out-of-bounds corners (torch zeros padding validates each corner)."""
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    v = take_rows(img_flat, yc * W + xc)
    if zero_pad:
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = v * inb[..., None].astype(v.dtype)
    return v


def bilinear_sample_2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                       padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``img (H, W, C)`` at float pixel coords ``x, y (...)``.

    Matches torch grid_sample(align_corners=True) semantics once the
    normalized grid has been converted to pixel coordinates:
    ``pix = (g + 1) / 2 * (size - 1)``.
    """
    H, W, C = img.shape
    if padding_mode == "border":
        # torch clips the *coordinate* for border mode
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(H * W, C)
    # bf16 row-gathers lower to a serial per-channel while-loop on TPU
    # (same pathology as the 3D case below — measured catastrophic, the
    # whole forward drops from ~3000 to ~4 FPS); gather + lerp in f32 and
    # cast back
    out_dtype = img.dtype
    if flat.dtype == jnp.bfloat16:
        # the barrier materializes the f32 copy: otherwise XLA sinks the
        # convert into the gather and lowers the pair as a serial
        # while-loop (%wide.body.sunk — whole forward drops ~1000x)
        flat = jax.lax.optimization_barrier(flat.astype(jnp.float32))
        tx = tx.astype(jnp.float32)
        ty = ty.astype(jnp.float32)
    v00 = _gather_2d(flat, x0i, y0i, W, H, zero_pad)
    v01 = _gather_2d(flat, x0i + 1, y0i, W, H, zero_pad)
    v10 = _gather_2d(flat, x0i, y0i + 1, W, H, zero_pad)
    v11 = _gather_2d(flat, x0i + 1, y0i + 1, W, H, zero_pad)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return (top * (1 - ty) + bot * ty).astype(out_dtype)


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """torch-compatible grid_sample, align_corners=True.

    img: (H, W, C); grid: (..., 2) normalized coords in [-1, 1],
    grid[..., 0] indexes W, grid[..., 1] indexes H. Returns (..., C).
    """
    H, W, _ = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    return bilinear_sample_2d(img, x, y, padding_mode)


def _gather_3d(vol_flat, xi, yi, zi, W, H, D, zero_pad):
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    zc = jnp.clip(zi, 0, D - 1)
    v = take_rows(vol_flat, (zc * H + yc) * W + xc)
    if zero_pad:
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
               & (zi >= 0) & (zi <= D - 1))
        v = v * inb[..., None].astype(v.dtype)
    return v


def trilinear_sample_3d(vol: jnp.ndarray, x, y, z,
                        padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``vol (D, H, W, C)`` at float coords x (W-axis), y (H-axis),
    z (D-axis), torch grid_sample-3D align_corners=True semantics."""
    D, H, W, C = vol.shape
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        z = jnp.clip(z, 0.0, D - 1.0)
        zero_pad = False
    elif padding_mode == "zeros":
        zero_pad = True
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    tx = (x - x0)[..., None]; ty = (y - y0)[..., None]; tz = (z - z0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)

    flat = vol.reshape(D * H * W, C)
    # bf16 row-gather at C=8 lowers to a serial per-channel while-loop on
    # TPU (measured 285 ms vs 0.2 ms for the whole 512x640 forward);
    # gather in f32 and cast back — one extra pass over a small volume
    out_dtype = vol.dtype
    if flat.dtype == jnp.bfloat16:
        # barrier: see bilinear_sample_2d — keeps the convert out of the
        # gather so XLA doesn't lower it as a serial while-loop
        flat = jax.lax.optimization_barrier(flat.astype(jnp.float32))
        tx = tx.astype(jnp.float32)
        ty = ty.astype(jnp.float32)
        tz = tz.astype(jnp.float32)
    g = functools.partial(_gather_3d, flat, W=W, H=H, D=D, zero_pad=zero_pad)
    v000 = g(x0i, y0i, z0i)
    v001 = g(x0i + 1, y0i, z0i)
    v010 = g(x0i, y0i + 1, z0i)
    v011 = g(x0i + 1, y0i + 1, z0i)
    v100 = g(x0i, y0i, z0i + 1)
    v101 = g(x0i + 1, y0i, z0i + 1)
    v110 = g(x0i, y0i + 1, z0i + 1)
    v111 = g(x0i + 1, y0i + 1, z0i + 1)

    c00 = v000 * (1 - tx) + v001 * tx
    c01 = v010 * (1 - tx) + v011 * tx
    c10 = v100 * (1 - tx) + v101 * tx
    c11 = v110 * (1 - tx) + v111 * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return (c0 * (1 - tz) + c1 * tz).astype(out_dtype)


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """torch grid_sample 3D, align_corners=True. vol (D, H, W, C);
    grid (..., 3) normalized, [x (W), y (H), z (D)]. Returns (..., C)."""
    D, H, W, _ = vol.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    z = (grid[..., 2] + 1.0) * 0.5 * (D - 1)
    return trilinear_sample_3d(vol, x, y, z, padding_mode)


# ---------------------------------------------------------------------------
# Resize (F.interpolate parity) — static interpolation matrices on the MXU
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) bilinear matrix, align_corners=True."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        A[0, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        t = src - i0
        A[o, i0] += 1.0 - t
        A[o, i1] += t
    return A


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') index map (floor(o * in/out))."""
    return np.minimum((np.arange(out_size) * (in_size / out_size)).astype(np.int64),
                      in_size - 1)


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (F.interpolate parity).

    img: (..., H, W, C) → (..., H_out, W_out, C). Runs as two small dense
    matmuls (MXU-friendly) instead of gathers.
    """
    H_out, W_out = out_hw
    H_in, W_in = img.shape[-3], img.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return img
    Ah = jnp.asarray(_interp_matrix(H_in, H_out), dtype=img.dtype)
    Aw = jnp.asarray(_interp_matrix(W_in, W_out), dtype=img.dtype)
    # HIGHEST precision: these matmuls are tiny, and depth/std resampling
    # feeds the cascade — bf16 default matmul precision costs PSNR.
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,...hwc->...owc", Ah, img, precision=hp)
    out = jnp.einsum("pw,...owc->...opc", Aw, out, precision=hp)
    return out


def resize_trilinear(vol: jnp.ndarray, out_dhw: Tuple[int, int, int]
                     ) -> jnp.ndarray:
    """Trilinear resize with align_corners=True (F.interpolate
    mode='trilinear' parity; used by the alt MinCostRegNet,
    reference cost_reg_net_.py:85-87).

    vol: (..., D, H, W, C) → (..., D_out, H_out, W_out, C).
    """
    D_out, H_out, W_out = out_dhw
    D_in, H_in, W_in = vol.shape[-4], vol.shape[-3], vol.shape[-2]
    if (D_in, H_in, W_in) == (D_out, H_out, W_out):
        return vol
    Ad = jnp.asarray(_interp_matrix(D_in, D_out), dtype=vol.dtype)
    Ah = jnp.asarray(_interp_matrix(H_in, H_out), dtype=vol.dtype)
    Aw = jnp.asarray(_interp_matrix(W_in, W_out), dtype=vol.dtype)
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("od,...dhwc->...ohwc", Ad, vol, precision=hp)
    out = jnp.einsum("ph,...ohwc->...opwc", Ah, out, precision=hp)
    out = jnp.einsum("qw,...opwc->...opqc", Aw, out, precision=hp)
    return out


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize (cv2.INTER_NEAREST / F.interpolate nearest)."""
    H_out, W_out = out_hw
    H_in, W_in = img.shape[-3], img.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return img
    iy = jnp.asarray(_nearest_index(H_in, H_out))
    ix = jnp.asarray(_nearest_index(W_in, W_out))
    return img[..., iy, :, :][..., :, ix, :]


def scale_size(size: int, scale: float) -> int:
    """torch recompute_scale_factor output-size rule: floor(in * scale)."""
    return int(np.floor(size * scale))
