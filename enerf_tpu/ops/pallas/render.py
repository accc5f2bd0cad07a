"""Pallas TPU kernel: fused IBR render stage (lane-packed).

Everything between the source-feature bilinear blend and the composited
frame — ray-difference features, the Agg pooling MLP, sigma/color heads,
per-view softmax blending, and alpha compositing (reference
lib/networks/enerf/nerf.py:6-89 + utils.py:571-603) — runs in ONE
VMEM-resident pass over the packed blended-feature operand.

Why this shape (v2; the v1 kernel took raw 4-corner rows and blended
in-VMEM):
- TPU minor dims tile to 128 physical lanes. The v1 corner-row operand
  (S, n, P, 4*Cp) at Cp=16 moved ~1 GB of physical HBM per frame at
  512x640 (64 useful lanes of 128), plus separate w12/xyzz/vox operands
  each padding 12/8/8 lanes to 128 — ~3 GB physical per frame — and the
  in-kernel corner blend burned ~25 narrow-lane VPU ops per sample.
  The packed operand A carries the ALREADY-BLENDED per-(sample, view)
  features plus the geometry lanes in exactly-128-lane-multiple rows
  (see ops/ibr.py get_img_feat_packed).
- All per-view work is lane-packed: the S views' features live in one
  (T, S*Cp) register tensor, per-view Dense layers run as ONE
  block-diagonal matmul (identical math — the off-block zeros add
  exactly), the masked mean/variance reduce over views via 0/1
  selection matmuls with the view mask baked in, and the per-view
  softmaxes are lane reductions over (T, S). A VPU op on (T, c) costs
  ceil(c/128) * T/8 cycles regardless of c < 128 — v1 spent ~215
  mostly-lane-starved ops per sample; v2 spends ~55 mostly-full ones.

Precision rule: learned-weight matmuls use DEFAULT precision (matches
the jnp path's flax Dense); constant selection/reduction matmuls
(geometry tiling, masked mean/var, tent blend) must produce exactly-f32
results like the jnp path's elementwise math — via ``_mm3``: the data
operand splits into three bf16 terms (x = hi + mid + lo EXACTLY: 3x8
mantissa bits cover f32's 24) and three single-pass bf16 dots accumulate
in f32. Every such constant matrix is 0/1 (bf16-exact; the masked
mean/var 1/cnt scales are hoisted to elementwise multiplies), so each
partial product is exact: pure selections reproduce x bit-exactly, and
reductions agree with a HIGHEST dot to f32 summation-order rounding
(inside every path's fp-reassociation tolerance). Measured on v5e:
0.585 vs 1.054 ns/(row*op) for HIGHEST — 1.8x (Mosaic rejects
Precision.HIGH, and HIGHEST costs ~8.4 DEFAULT passes, not 6).

MXU pass economy (the kernel is MXU-pass-bound, not FLOP-bound: every
(T, K<=128)x(K, N<=128) matmul costs the same ~T/8-cycle pass): matmuls
sharing the same row operand are merged — the 5 color-head input
matmuls run as ONE concat([xk, vox, agg, feats, dirs]) @ row-stacked
weights, the 3 global_fc inputs as one, the sigma head's two as one
(w0 consumed unsplit), and the geometry expansions pair up via
block-diagonal constants. ~34 passes/sample -> ~20.

Layout contract (per batch item; rays tiled by ``tile``):
- A     (P, L)       packed rows, see ops/ibr.py ``packed_feat_layout``:
                     n*S blended Cp-lane feature groups (group (k, s) at
                     lane (k*S+s)*Cp, channels [feat, rgb] with rgb at
                     Cf-3..Cf), then n 8-lane geometry groups
                     [x, y, z, z_val, z01, 0, 0, 0].
- vox   (P, D*Cv)    tent mode: the spatially-resized feature volume,
                     plane-major lanes — the kernel does the tent
                     (grid_sample two-plane lerp) depth blend; or
        (P, n*Cv)    per-sample trilinear features (non-grid rays).
- out   (P, 16)      [rgb(3), depth(1), weights(n), 0 pad]

v3 (``segs`` passed): the XLA-side segment merge + parity select +
corner blend (the (M, 8*Cp) wide-table gather rows -> blended (M, Cp)
features) moves INTO the kernel — measured ~18 ms/frame of HBM-bound
narrow-lane XLA elementwise passes at 512x640 (3x 3.26 ms blend +
3x 1.26 ms select_convert + 4.5 ms operand concat) become VMEM-resident
VPU selects plus 2 MXU passes per (sample, view): the per-row 8-chunk
blend weights expand through a 0/1 chunk-tiling matmul and the weighted
chunks sum through a 0/1 chunk-summing matmul. Operands then:
- A     (P, Lg)      geometry-only rows: n 8-lane geometry groups
                     [x, y, z, z_val, z01, 0, 0, 0] at k*8, then n
                     4S-lane blend groups [tx(S) | ty(S) | par(S) |
                     row(S)] at n*8 + k*4S (see
                     ops/sampling.py corner_gather_segments).
- segs  V*K of       per-(view, table-segment) gather rows, sample-
        (n, P, 8Cp)  major; garbage rows outside segment k's row range
                     (clamped local indices), merged by row-index
                     select in-kernel.

Eval-only (no autodiff rule); the model falls back to the jnp path in
train mode. Numerics match the jnp path to fp-reassociation tolerance
(tested in interpret mode, tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _mm(x, w, precision=None):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               precision=precision)


def _split3(x):
    """x = hi + mid + lo exactly, each bf16 (3x8 mantissa bits = f32's
    24; each remainder is exactly representable)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mm3(x, w):
    """Exactly-f32 matmul against a bf16-exact (0/1) constant: three
    single-pass bf16 dots over the exact 3-way split of x, accumulated
    in f32. See the module docstring's precision rule."""
    wb = w.astype(jnp.bfloat16)

    def dot(t):
        return jax.lax.dot_general(t, wb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    hi, mid, lo = _split3(x)
    return dot(hi) + dot(mid) + dot(lo)


def _mm1(x, w):
    """ONE bf16 pass against a 0/1 constant: rounds the data operand to
    bf16 (~8-bit relative error on the selected/summed values). The
    fast_const mode — a pure speed/precision trade measured far below
    metric visibility at the bf16_all rung's operating point (the
    gather tables and model weights are already bf16 there)."""
    return jax.lax.dot_general(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mmc(fast: bool):
    """Constant-matmul dispatcher: exact 3-pass split (default) or the
    single-pass bf16 rounding fast path."""
    return _mm1 if fast else _mm3


def _lane_softmax(logits):
    """Softmax over the (small) lane axis of (T, S)."""
    mx = jnp.max(logits, axis=1, keepdims=True)
    es = jnp.exp(logits - mx)
    return es / jnp.sum(es, axis=1, keepdims=True)


def _render_kernel(A_ref, vox_ref, *refs,
                   S: int, n: int, Cp: int, Cf: int, Cv: int, L_feat: int,
                   white_bkgd: bool, viewdir_agg: bool, use_vox_feat: bool,
                   tent_vox_D: int, n_segs: int = 0, seg_rows: int = 0,
                   fast_const: bool = False):
    """Pallas wrapper: load the VMEM refs, run the shared math body."""
    out_ref = refs[-1]
    loaded = tuple(r[:] for r in refs[:-1])
    out_ref[:] = _render_math(
        A_ref[:], vox_ref[:] if use_vox_feat else None,
        loaded[:n_segs] if n_segs else None,
        loaded[n_segs:] if n_segs else loaded,
        S=S, n=n, Cp=Cp, Cf=Cf, Cv=Cv, L_feat=L_feat,
        white_bkgd=white_bkgd, viewdir_agg=viewdir_agg,
        use_vox_feat=use_vox_feat, tent_vox_D=tent_vox_D,
        seg_rows=seg_rows, fast_const=fast_const)


def _render_math(A, vox_all, seg_arrays, consts, *,
                 S: int, n: int, Cp: int, Cf: int, Cv: int, L_feat: int,
                 white_bkgd: bool, viewdir_agg: bool, use_vox_feat: bool,
                 tent_vox_D: int, seg_rows: int = 0,
                 fast_const: bool = False, raw_out: bool = False):
    """The fused render stage's math on plain ARRAYS — shared verbatim
    by the Pallas kernel (refs pre-loaded by the wrapper above) and the
    differentiable XLA train path (``render_rays_packed_xla``): one
    source of truth for the packed-lane IBR head. ``consts`` is the ref
    tuple minus seg arrays and out; ``seg_arrays`` the v3 gather-row
    blocks or None."""
    _mm3 = _mmc(fast_const)
    n_segs = len(seg_arrays) if seg_arrays else 0
    if n_segs:
        seg_refs = seg_arrays
        C6S, SUMC_S = consts[0], consts[1]
        consts = consts[2:]
    (E34_2, G4, G4_2, R4, RD4, cams_row, mvec,
     Wv_bd, bvS, Wsum_sel, Wtile,
     W_gs, bgS, Wa_bd, baS, wfc, bfc,
     w0, b0, ws, bs,
     W_c0, bc0S, Wc1_bd, bc1S,
     tileDC, sumD) = consts

    A = A.astype(jnp.float32)
    vox_all = vox_all.astype(jnp.float32) if use_vox_feat else None
    mv = mvec[:]                     # (1, S) view-mask lanes
    neg = (1.0 - mv) * -1e9
    tar_c = cams_row[:, 4 * S:4 * S + 3]          # (1, 3)
    src_c4 = cams_row[:, 0:4 * S]                 # (1, 4S), lanes 4s+3 = 0
    inv_mean = cams_row[:, 4 * S + 3:4 * S + 4]   # 1/cnt (masked mean)
    inv_var = cams_row[:, 4 * S + 4:4 * S + 5]    # 1/max(cnt-1, 1)

    sigmas = []
    rgbs = []
    zvals = []
    for k in range(n):
        if n_segs:
            # v3: in-kernel segment merge + parity select + corner
            # blend (the gather half ran in XLA —
            # ops/sampling.py corner_gather_segments). The blend is
            # lane-packed over ALL views: weight math runs once on
            # (T, S) lanes instead of per view on (T, 1) slices (a VPU
            # op costs T/8 cycles regardless of lane count), and the
            # two blend matmuls run once on (T, S*8Cp) concat rows —
            # same pass count as per-view (K/N > 128 splits), ~30 fewer
            # narrow VPU ops per sample.
            Kseg = n_segs // S
            bb = n * 8 + k * 4 * S
            merged = []
            for s in range(S):
                g = seg_refs[s * Kseg][k]               # (T, 8*Cp)
                if Kseg > 1:
                    rowf = A[:, bb + 3 * S + s:bb + 3 * S + s + 1]
                    for kk in range(1, Kseg):
                        g = jnp.where(rowf >= kk * seg_rows,
                                      seg_refs[s * Kseg + kk][k], g)
                merged.append(g)
            mf = jnp.concatenate(merged, axis=1).astype(jnp.float32)
            txS = A[:, bb:bb + S]
            tyS = A[:, bb + S:bb + 2 * S]
            parS = A[:, bb + 2 * S:bb + 3 * S]
            # per-chunk blend weights: chunk dy*4+u holds pixel
            # (y0+dy, 2q+u); pixel x0 is at u=par, x0+1 at par+1
            # (chunks u=3 have zero weight and are skipped: C6S has no
            # rows for them)
            a0 = 1.0 - txS
            wx0 = (1.0 - parS) * a0
            wx1 = txS + parS * (a0 - txS)
            wx2 = parS * txS
            u0 = 1.0 - tyS
            w6 = jnp.concatenate(
                [u0 * wx0, u0 * wx1, u0 * wx2,
                 tyS * wx0, tyS * wx1, tyS * wx2], axis=1)  # (T, 6S)
            wfull = _mm3(w6, C6S[:])                 # (T, S*8Cp)
            feats = _mm3(mf * wfull, SUMC_S[:])      # (T, S*Cp)
            off = k * 8
        else:
            feats = A[:, k * S * Cp:(k + 1) * S * Cp]   # (T, S*Cp)
            off = L_feat + k * 8
        xyz = A[:, off:off + 3]
        zvals.append(A[:, off + 3:off + 4])

        # ray-difference geometry, all views lane-packed (reference
        # utils.py:706-722): 4-lane groups [rd(3), dot]. Expansion /
        # reduction pairs share one block-diagonal matmul each.
        td = xyz - tar_c
        td = td / (jnp.sqrt(jnp.sum(td * td, axis=1, keepdims=True)) + 1e-6)
        both4 = _mm3(jnp.concatenate([xyz, td], axis=1), E34_2[:])
        xyz4 = both4[:, :4 * S]                         # (T, 4S)
        td4 = both4[:, 4 * S:]
        sd = xyz4 - src_c4
        sdist = jnp.sqrt(_mm3(sd * sd, G4[:]))          # (T, S)
        sdn = sd * _mm3(1.0 / (sdist + 1e-6), R4[:])
        rd = td4 - sdn
        g2 = _mm3(jnp.concatenate([rd * rd, td4 * sdn], axis=1),
                  G4_2[:])                              # (T, 2S)
        rdn = jnp.sqrt(g2[:, :S])
        dot = g2[:, S:]
        e2 = _mm3(jnp.concatenate(
            [1.0 / jnp.maximum(rdn, 1e-6), dot], axis=1), RD4[:])
        dirs = rd * e2[:, :4 * S] + e2[:, 4 * S:]       # (T, 4S)

        # Agg (reference nerf.py:74-89): relu view_fc, masked mean/var
        # over views (mask baked into the 0/1 selection matmuls),
        # global_fc over concat([xs, var, mean]) in one pass, softmax
        # attention over the view lanes, fc
        if viewdir_agg:
            xs = feats + jnp.maximum(_mm(dirs, Wv_bd[:]) + bvS[:], 0.0)
        else:
            xs = feats
        mean = _mm3(xs, Wsum_sel[:]) * inv_mean         # (T, Cp)
        d = xs - _mm3(mean, Wtile[:])
        var = _mm3(d * d, Wsum_sel[:]) * inv_var
        gs = jnp.maximum(
            _mm(jnp.concatenate([xs, var, mean], axis=1), W_gs[:])
            + bgS[:], 0.0)                              # (T, S*32)
        logits = (jnp.maximum(_mm(gs, Wa_bd[:]) + baS[:], 0.0)
                  * mv + neg)                           # (T, S)
        attn = _lane_softmax(logits)
        im = gs[:, 0:32] * attn[:, 0:1]
        for s in range(1, S):
            im = im + gs[:, s * 32:(s + 1) * 32] * attn[:, s:s + 1]
        agg = jnp.maximum(_mm(im, wfc[:]) + bfc[:], 0.0)      # (T, 16)

        # sigma head (reference nerf.py:13-18, 34-37)
        if use_vox_feat and tent_vox_D:
            # grid rays: tent weights == grid_sample's two-plane lerp
            # (zeros outside); blend via 0/1 tiling + plane-sum matmuls
            zk = A[:, off + 4:off + 5] * (tent_vox_D - 1)
            # tpu.iota only admits integer results on current toolchains
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, tent_vox_D), 1).astype(jnp.float32)
            wd = jnp.maximum(0.0, 1.0 - jnp.abs(zk - iota))   # (T, D)
            vox_k = _mm3(vox_all * _mm3(wd, tileDC[:]), sumD[:])
        elif use_vox_feat:
            vox_k = vox_all[:, k * Cv:(k + 1) * Cv]
        else:
            vox_k = None
        # w0 consumed unsplit: input rows are [vox_k | agg]
        if vox_k is None:
            xk = jnp.maximum(_mm(agg, w0[:]) + b0[:], 0.0)    # (T, 64)
        else:
            xk = jnp.maximum(
                _mm(jnp.concatenate([vox_k, agg], axis=1), w0[:])
                + b0[:], 0.0)
        sigmas.append(jax.nn.softplus(_mm(xk, ws[:]) + bs[:]))  # (T, 1)

        # color head (reference nerf.py:19-23, 38-43): per-view weight
        # MLP — ALL five inputs concatenated into one row operand so the
        # five matmuls become one (row-stacked W_c0)
        cparts = [xk] + ([vox_k] if vox_k is not None else []) \
            + [agg, feats, dirs]
        h = jnp.maximum(
            _mm(jnp.concatenate(cparts, axis=1), W_c0[:]) + bc0S[:],
            0.0)                                              # (T, S*64)
        cl = jnp.maximum(_mm(h, Wc1_bd[:]) + bc1S[:], 0.0) * mv + neg
        attn2 = _lane_softmax(cl)                             # (T, S)
        rgb = feats[:, Cf - 3:Cf] * attn2[:, 0:1]
        for s in range(1, S):
            rgb = rgb + (feats[:, s * Cp + Cf - 3:s * Cp + Cf]
                         * attn2[:, s:s + 1])
        rgbs.append(rgb)                                      # (T, 3)

    if raw_out:
        # raw per-sample head output [rgb(3), sigma(1)] per k — the
        # composite model composites ACROSS layers later
        # (reference utils.py:875-942 raw2outputs_composite)
        parts = []
        for k in range(n):
            parts += [rgbs[k], sigmas[k]]
        return jnp.concatenate(parts, axis=1)  # (P, 4n)

    # alpha compositing (reference utils.py:571-603: no dists term;
    # depth = softmax(weights) . z; white background option)
    running = jnp.ones_like(sigmas[0])
    weights = []
    rgb_map = jnp.zeros_like(rgbs[0])
    for k in range(n):
        alpha = 1.0 - jnp.exp(-sigmas[k])
        wgt = alpha * running
        running = running * (1.0 - alpha + 1e-10)
        weights.append(wgt)
        rgb_map = rgb_map + wgt * rgbs[k]

    mx = weights[0]
    for k in range(1, n):
        mx = jnp.maximum(mx, weights[k])
    es = [jnp.exp(weights[k] - mx) for k in range(n)]
    z = es[0]
    for k in range(1, n):
        z = z + es[k]
    depth = (es[0] / z) * zvals[0]
    for k in range(1, n):
        depth = depth + (es[k] / z) * zvals[k]

    if white_bkgd:
        acc = weights[0]
        for k in range(1, n):
            acc = acc + weights[k]
        rgb_map = rgb_map + (1.0 - acc)

    pad = 16 - 4 - n
    return jnp.concatenate([rgb_map, depth] + weights
                          + [jnp.zeros_like(depth)] * pad, axis=1)


def render_rays_packed_xla(A: jnp.ndarray, vox: jnp.ndarray, head_vars,
                           src_cam: jnp.ndarray, tar_cam: jnp.ndarray,
                           vmask: jnp.ndarray, *,
                           S: int, n: int, Cp: int, Cf: int, Cv: int,
                           white_bkgd: bool, viewdir_agg: bool = True,
                           use_vox_feat: bool = True,
                           tent_vox: bool = False,
                           raw_out: bool = False) -> jnp.ndarray:
    """DIFFERENTIABLE twin of ``fused_render_rays`` (v2 packed-A path):
    the identical lane-packed math (``_render_math``) run as plain XLA
    array ops, so autodiff applies — the TRAIN path's render stage
    (models/enerf.py ``_render_rays_fused(use_kernel=False)``).

    Why: the train program's per-view (P, S, C<=15) jnp head walked
    ~100 ms/step of 128-lane-padded narrow tensors, relayout copies and
    broadcasts at 512×640 (tools/profile_train.py round-5 attribution);
    the packed layout runs the same reference math (nerf.py:6-89) on
    full-width rows with block-diagonal MXU matmuls. Gradients flow to
    the ORIGINAL flax param tree through ``head_params_packed``'s jnp
    weight packing (block-diag/tile/pad are linear, so the VJP
    un-packs cotangents exactly). Always exact constant dots
    (fast_const off); learned matmuls at DEFAULT precision like the
    flax Dense path. No Pallas, no tile constraint.
    """
    P, L = A.shape
    L_feat = n * S * Cp
    D = vox.shape[-1] // Cv if (use_vox_feat and tent_vox) else 0

    mvec = vmask.astype(jnp.float32).reshape(1, S)
    cnt = jnp.maximum(jnp.sum(mvec), 1.0)
    cams_row = jnp.concatenate(
        [jnp.pad(src_cam.astype(jnp.float32),
                 ((0, 0), (0, 1))).reshape(1, 4 * S),
         tar_cam.astype(jnp.float32).reshape(1, 3),
         (1.0 / cnt).reshape(1, 1),
         (1.0 / jnp.maximum(cnt - 1.0, 1.0)).reshape(1, 1)],
        axis=1)
    params = head_params_packed(head_vars, viewdir_agg, Cf, S, Cp, Cv,
                                vmask)
    consts = (_geometry_consts(S) + (cams_row, mvec) + tuple(params)
              + tent_consts(D, max(Cv, 1)))
    return _render_math(A, vox if use_vox_feat else None, None, consts,
                        S=S, n=n, Cp=Cp, Cf=Cf, Cv=Cv, L_feat=L_feat,
                        white_bkgd=white_bkgd, viewdir_agg=viewdir_agg,
                        use_vox_feat=use_vox_feat, tent_vox_D=D,
                        fast_const=False, raw_out=raw_out)


def fused_render_rays(A: jnp.ndarray, vox: jnp.ndarray,
                      head_vars,
                      src_cam: jnp.ndarray, tar_cam: jnp.ndarray,
                      vmask: jnp.ndarray, *,
                      S: int, n: int, Cp: int, Cf: int, Cv: int,
                      white_bkgd: bool, viewdir_agg: bool = True,
                      use_vox_feat: bool = True, tent_vox: bool = False,
                      tile: int = 1024, segs=None,
                      seg_rows: int = 0,
                      fast_const: bool = False) -> jnp.ndarray:
    """Run the fused render stage for one batch item. Returns (P, 16)
    packed [rgb(3), depth(1), weights(n), 0]. P must divide by ``tile``
    (callers pick a budgeted tile or fall back to the jnp path).

    A: (P, L) packed blended features + geometry lanes (see
    ops/ibr.py get_img_feat_packed) — or, v3 (``segs`` given), (P, Lg)
    geometry+blend lanes only (ops/ibr.py get_img_feat_segments) with
    ``segs`` the V*K view-major list of (n, P, 8*Cp) gather-row arrays
    and ``seg_rows`` the table rows per segment. vox: (P, D*Cv) resized
    volume (tent_vox) or (P, n*Cv) per-sample features; pass a (P, 8)
    dummy when use_vox_feat is False. head_vars: the NeRFHead flax
    variables — packed into lane layouts here (``head_params_packed`` /
    ``head_params_packed_k``, weights pre-block-diagonalized in XLA,
    view mask baked into the mean/var selections). src_cam (S, 3),
    tar_cam (3,), vmask (S,) f32.
    """
    P, L = A.shape
    assert P % tile == 0, (P, tile)
    L_feat = n * S * Cp
    D = vox.shape[-1] // Cv if (use_vox_feat and tent_vox) else 0
    n_segs = len(segs) if segs else 0
    # v5 lane-packs the samples too — applies on the segs+tent headline
    # path (per-sample vox lanes and packed-A layouts keep the per-k
    # kernel)
    lane_k = bool(n_segs) and tent_vox and use_vox_feat and Cv > 0

    mvec = vmask.astype(jnp.float32).reshape(1, S)
    cnt = jnp.maximum(jnp.sum(mvec), 1.0)
    cams_row = jnp.concatenate(
        [jnp.pad(src_cam.astype(jnp.float32),
                 ((0, 0), (0, 1))).reshape(1, 4 * S),
         tar_cam.astype(jnp.float32).reshape(1, 3),
         (1.0 / cnt).reshape(1, 1),
         (1.0 / jnp.maximum(cnt - 1.0, 1.0)).reshape(1, 1)],
        axis=1)  # (1, 4S+5): src cams, tar cam, masked mean/var scales

    def rep(a):  # whole-array block, same for every grid step
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    seg_ops = []
    seg_specs = []
    if n_segs:
        for sg in segs:
            assert sg.shape == (n, P, segs[0].shape[-1]), sg.shape
            seg_specs.append(pl.BlockSpec((n, tile, sg.shape[-1]),
                                          lambda i: (0, i, 0),
                                          memory_space=pltpu.VMEM))
        seg_ops = list(segs)

    if lane_k:
        params = head_params_packed_k(head_vars, viewdir_agg, Cf, S, n,
                                      Cp, Cv, vmask)
        kern = functools.partial(
            _render_kernel_v5, S=S, n=n, Cp=Cp, Cf=Cf, Cv=Cv,
            white_bkgd=white_bkgd, viewdir_agg=viewdir_agg,
            tent_vox_D=D, n_segs=n_segs, seg_rows=seg_rows,
            fast_const=fast_const)
        small = (blend_consts_k(S, n, Cp) + _geometry_consts_k(S, n)
                 + (cams_row, mvec) + tuple(params)
                 + misc_consts_k(S, n, Cp, Cf, D, Cv))
    else:
        params = head_params_packed(head_vars, viewdir_agg, Cf, S,
                                    Cp, Cv, vmask)
        kern = functools.partial(
            _render_kernel, S=S, n=n, Cp=Cp, Cf=Cf, Cv=Cv, L_feat=L_feat,
            white_bkgd=white_bkgd, viewdir_agg=viewdir_agg,
            use_vox_feat=use_vox_feat, tent_vox_D=D,
            n_segs=n_segs, seg_rows=seg_rows, fast_const=fast_const)
        if n_segs:
            blend = blend_consts(S, Cp)
            seg_ops = seg_ops + list(blend)
            seg_specs = seg_specs + [rep(b) for b in blend]
        small = (_geometry_consts(S) + (cams_row, mvec) + tuple(params)
                 + tent_consts(D, max(Cv, 1)))
    return pl.pallas_call(
        kern,
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, vox.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + seg_specs + [rep(p) for p in small],
        out_specs=pl.BlockSpec((tile, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 16), jnp.float32),
    )(A, vox, *seg_ops, *small)


@functools.lru_cache(maxsize=None)
def _geometry_consts_np(S: int):
    E34 = np.zeros((3, 4 * S), np.float32)   # xyz -> [x,y,z,0] per view
    G4 = np.zeros((4 * S, S), np.float32)    # 4-lane group sum
    R4 = np.zeros((S, 4 * S), np.float32)    # per-view scalar -> 4 lanes
    D4 = np.zeros((S, 4 * S), np.float32)    # per-view scalar -> lane 3
    for s in range(S):
        for i in range(3):
            E34[i, 4 * s + i] = 1.0
        for i in range(4):
            G4[4 * s + i, s] = 1.0
            R4[s, 4 * s + i] = 1.0
        D4[s, 4 * s + 3] = 1.0
    # paired (block-diagonal) variants: two expansions/reductions with
    # independent inputs share one MXU pass
    E34_2 = np.zeros((6, 8 * S), np.float32)       # [xyz | td] -> 2x4S
    E34_2[0:3, 0:4 * S] = E34
    E34_2[3:6, 4 * S:] = E34
    G4_2 = np.zeros((8 * S, 2 * S), np.float32)    # [rd² | td4·sdn] sums
    G4_2[0:4 * S, 0:S] = G4
    G4_2[4 * S:, S:] = G4
    RD4 = np.zeros((2 * S, 8 * S), np.float32)     # [1/rdn | dot] expand
    RD4[0:S, 0:4 * S] = R4
    RD4[S:, 4 * S:] = D4
    return E34_2, G4, G4_2, R4, RD4


def _geometry_consts(S: int):
    return tuple(jnp.asarray(a) for a in _geometry_consts_np(S))


def head_params_packed(head_vars, viewdir_agg: bool, feat_ch: int,
                       S: int, Cp: int, Cv: int,
                       vmask: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Pre-shape a NeRFHead variable pytree for the lane-packed kernel.

    Per-view Dense weights become S-block-diagonal matrices (zero
    off-blocks — numerically exact: x*0 terms add exactly), view-shared
    inputs to per-view layers become lane-tiled weights, and the masked
    mean/var selection matrices bake the view mask and counts in. All
    built in XLA once per program — the kernel reads them as small VMEM
    operands. Returns the ``params`` tuple ``fused_render_rays``
    expects (order matches ``_render_kernel``'s ref list).
    """
    p = head_vars["params"]
    Cf = feat_ch

    def wb(node):
        if "linear" in node:
            node = node["linear"]
        return (node["kernel"].astype(jnp.float32),
                node["bias"].astype(jnp.float32).reshape(1, -1))

    def pad_out(w):  # pad output dim Cf -> Cp (zero lanes stay zero)
        return jnp.pad(w, ((0, 0), (0, Cp - Cf)))

    def pad_in(w):   # pad input dim Cf -> Cp (reads the zero pad lanes)
        return jnp.pad(w, ((0, Cp - Cf), (0, 0)))

    def block_diag(w):  # (a, b) -> (S*a, S*b)
        a, b = w.shape
        out = jnp.zeros((S * a, S * b), jnp.float32)
        for s in range(S):
            out = out.at[s * a:(s + 1) * a, s * b:(s + 1) * b].set(w)
        return out

    def tile_cols(w):   # (a, b) -> (a, S*b)
        return jnp.concatenate([w] * S, axis=1)

    m = vmask.astype(jnp.float32).reshape(S)
    eye = jnp.eye(Cp, dtype=jnp.float32)
    # 0/1 masked-sum selection; the 1/cnt scales ride cams_row and apply
    # elementwise in-kernel (keeps every constant matrix bf16-exact for
    # the _mm3 split-dot path)
    Wsum_sel = jnp.concatenate([eye * m[s] for s in range(S)], axis=0)
    Wtile = jnp.concatenate([eye] * S, axis=1)       # (Cp, S*Cp)

    if viewdir_agg:
        wv, bv = wb(p["agg"]["view_fc"])             # (4, Cf)
    else:
        wv = jnp.zeros((4, Cf), jnp.float32)
        bv = jnp.zeros((1, Cf), jnp.float32)
    Wv_bd = block_diag(pad_out(wv))                  # (4S, S*Cp)
    bvS = tile_cols(pad_out(bv))                     # (1, S*Cp)

    wg, bg = wb(p["agg"]["global_fc"])               # (3*Cf, 32)
    # one pass over concat([xs (S*Cp), var (Cp), mean (Cp)])
    W_gs = jnp.concatenate([block_diag(pad_in(wg[0:Cf])),
                            tile_cols(pad_in(wg[Cf:2 * Cf])),
                            tile_cols(pad_in(wg[2 * Cf:3 * Cf]))], axis=0)
    bgS = tile_cols(bg)

    wa, ba = wb(p["agg"]["agg_w_fc"])                # (32, 1)
    Wa_bd = block_diag(wa)
    baS = tile_cols(ba)

    wfc, bfc = wb(p["agg"]["fc"])                    # (32, 16)
    w0, b0 = wb(p["lr0"])                            # (Cv+16, 64)
    ws, bs = wb(p["sigma"])                          # (64, 1)

    wc0, bc0 = wb(p["color_0"])   # (64 + [Cv] + 16 + Cf + 4, 64)
    off = 64
    wc0_x = wc0[0:64]
    if Cv:
        wc0_v = wc0[off:off + Cv]
        off += Cv
    wc0_a = wc0[off:off + 16]
    off += 16
    wc0_f = wc0[off:off + Cf]
    off += Cf
    wc0_d = wc0[off:off + 4]
    # one pass over concat([xk (64), vox (Cv), agg (16), feats (S*Cp),
    # dirs (4S)]) — row order must match the kernel's cparts concat
    c0_rows = [tile_cols(wc0_x)]
    if Cv:
        c0_rows.append(tile_cols(wc0_v))
    c0_rows += [tile_cols(wc0_a), block_diag(pad_in(wc0_f)),
                block_diag(wc0_d)]
    W_c0 = jnp.concatenate(c0_rows, axis=0)
    bc0S = tile_cols(bc0)

    wc1, bc1 = wb(p["color_1"])                      # (64, 1)
    Wc1_bd = block_diag(wc1)
    bc1S = tile_cols(bc1)

    # tent-blend 0/1 selections: plane-weight lane tiling (D, D*Cv) and
    # plane summation (D*Cv, Cv). Sized lazily by the caller's vox
    # operand; built here for any D via the largest the head can see.
    return (Wv_bd, bvS, Wsum_sel, Wtile,
            W_gs, bgS, Wa_bd, baS, wfc, bfc,
            w0, b0, ws, bs,
            W_c0, bc0S, Wc1_bd, bc1S)


@functools.lru_cache(maxsize=None)
def _blend_consts_np(S: int, Cp: int):
    # All-view blend constants: w6 lane p*S+s (p = dy*3+u, u<3 — the
    # u=3 chunks have zero weight and no rows) tiles to view s's chunk
    # j=dy*4+u of the (T, S*8Cp) concat gather rows; SUMC_S sums each
    # view's weighted chunks back to its Cp block of (T, S*Cp).
    C6S = np.zeros((6 * S, S * 8 * Cp), np.float32)
    SUMC_S = np.zeros((S * 8 * Cp, S * Cp), np.float32)
    eye = np.eye(Cp, dtype=np.float32)
    for s in range(S):
        for p in range(6):
            j = (p // 3) * 4 + (p % 3)
            C6S[p * S + s, s * 8 * Cp + j * Cp:
                s * 8 * Cp + (j + 1) * Cp] = 1.0
        for j in range(8):
            SUMC_S[s * 8 * Cp + j * Cp:s * 8 * Cp + (j + 1) * Cp,
                   s * Cp:(s + 1) * Cp] = eye
    return C6S, SUMC_S


def blend_consts(S: int, Cp: int):
    a, b = _blend_consts_np(S, Cp)
    return jnp.asarray(a), jnp.asarray(b)


@functools.lru_cache(maxsize=None)
def _tent_consts_np(D: int, Cv: int):
    tileDC = np.zeros((D, D * Cv), np.float32)
    sumD = np.zeros((D * Cv, Cv), np.float32)
    for d in range(D):
        tileDC[d, d * Cv:(d + 1) * Cv] = 1.0
        sumD[d * Cv:(d + 1) * Cv, :] = np.eye(Cv, dtype=np.float32)
    return tileDC, sumD


def tent_consts(D: int, Cv: int):
    """0/1 selection matrices for the in-kernel tent depth blend:
    lane-tile plane weights (D -> D*Cv) and sum over planes
    (D*Cv -> Cv). D=0 (non-tent) returns (1, Cv)-shaped placeholders
    sized for the per-sample vox slicing path (unused by the kernel)."""
    a, b = _tent_consts_np(max(D, 1), Cv)
    return jnp.asarray(a), jnp.asarray(b)


# ---------------------------------------------------------------------------
# v5: lane-packed across SAMPLES as well as views
#
# The v3/v4 kernel ran the per-sample pipeline once per k in a Python
# loop — every VPU op paid T/8 cycles per k even on (T, <=48) tensors
# (op cost is row-count-bound, not lane-bound). v5 packs the n samples
# into lanes (per-(sample, view) lane index j = k*S + s), so the whole
# pipeline runs ONCE on tensors that still mostly fit <=3 vregs: the
# narrow-op count roughly halves at n=2 while MXU pass counts stay equal
# (K/N > 128 splits pay the same subtiles the per-k loop paid as
# iterations). Applies on the v3-segs + tent-vox path (the DTU/human
# headline rung); other paths keep the per-k kernel.
# ---------------------------------------------------------------------------


def _group_softmax(logits, n: int, S: int):
    """Softmax over each sample's S view lanes of (T, n*S)."""
    parts = []
    for k in range(n):
        lk = logits[:, k * S:(k + 1) * S]
        mx = jnp.max(lk, axis=1, keepdims=True)
        es = jnp.exp(lk - mx)
        parts.append(es / jnp.sum(es, axis=1, keepdims=True))
    return jnp.concatenate(parts, axis=1)


def _render_kernel_v5(A_ref, vox_ref, *refs,
                      S: int, n: int, Cp: int, Cf: int, Cv: int,
                      white_bkgd: bool, viewdir_agg: bool,
                      tent_vox_D: int,
                      n_segs: int, seg_rows: int, fast_const: bool):
    _mm3 = _mmc(fast_const)
    Sn = n * S
    D = tent_vox_D
    seg_refs = refs[:n_segs]
    (C6SN, SUMC_SN,
     SUM3n, EXP3n, E34_2n, G4n, R4n, G4_2n, RD4n,
     cams_row, mvec,
     Wv_bdn, bvSn, Wsum_seln, Wtilen,
     W_gsn, bgSn, Wa_bdn, baSn, wfc_bdn, bfcn,
     w0n, b0n, ws_bdn, bsn,
     W_c0n, bc0Sn, Wc1_bdn, bc1Sn,
     TILE32n, SUM32n, TILECPn, RGBSELn,
     TILEVn, TILEDCn, SUMDn, EXPn3, SUM3RGB, out_ref) = refs[n_segs:]

    A = A_ref[:].astype(jnp.float32)
    vox_all = vox_ref[:].astype(jnp.float32)
    # (1, c) row tiling is ~free (single sublane row)
    mv = mvec[:]
    mvn = jnp.concatenate([mv] * n, axis=1)            # (1, Sn)
    negn = (1.0 - mvn) * -1e9
    tar_c = cams_row[:, 4 * S:4 * S + 3]
    tar_c3n = jnp.concatenate([tar_c] * n, axis=1)     # (1, 3n)
    src_c4 = cams_row[:, 0:4 * S]
    src_c4n = jnp.concatenate([src_c4] * n, axis=1)    # (1, 4Sn)
    inv_mean = cams_row[:, 4 * S + 3:4 * S + 4]
    inv_var = cams_row[:, 4 * S + 4:4 * S + 5]

    # ---- segment merge + corner blend, all (k, s) lane-packed ----
    Kseg = n_segs // S
    merged = []
    for k in range(n):
        bb = n * 8 + k * 4 * S
        for s in range(S):
            g = seg_refs[s * Kseg][k]                  # (T, 8*Cp)
            if Kseg > 1:
                rowf = A[:, bb + 3 * S + s:bb + 3 * S + s + 1]
                for kk in range(1, Kseg):
                    g = jnp.where(rowf >= kk * seg_rows,
                                  seg_refs[s * Kseg + kk][k], g)
            merged.append(g)
    mf = jnp.concatenate(merged, axis=1).astype(jnp.float32)  # (T, Sn*8Cp)

    def blend_lanes(off):
        return jnp.concatenate(
            [A[:, n * 8 + k * 4 * S + off:n * 8 + k * 4 * S + off + S]
             for k in range(n)], axis=1)               # (T, Sn)

    tx = blend_lanes(0)
    ty = blend_lanes(S)
    par = blend_lanes(2 * S)
    a0 = 1.0 - tx
    wx0 = (1.0 - par) * a0
    wx1 = tx + par * (a0 - tx)
    wx2 = par * tx
    u0 = 1.0 - ty
    w6 = jnp.concatenate(
        [u0 * wx0, u0 * wx1, u0 * wx2,
         ty * wx0, ty * wx1, ty * wx2], axis=1)        # (T, 6Sn)
    wfull = _mm3(w6, C6SN[:])                          # (T, Sn*8Cp)
    feats = _mm3(mf * wfull, SUMC_SN[:])               # (T, Sn*Cp)

    # ---- geometry, all samples lane-packed ----
    xyzn = jnp.concatenate([A[:, k * 8:k * 8 + 3]
                            for k in range(n)], axis=1)   # (T, 3n)
    zvaln = jnp.concatenate([A[:, k * 8 + 3:k * 8 + 4]
                             for k in range(n)], axis=1)  # (T, n)
    z01n = jnp.concatenate([A[:, k * 8 + 4:k * 8 + 5]
                            for k in range(n)], axis=1)   # (T, n)
    td = xyzn - tar_c3n
    nrm = jnp.sqrt(_mm3(td * td, SUM3n[:]))            # (T, n)
    td = td * _mm3(1.0 / (nrm + 1e-6), EXP3n[:])
    both4 = _mm3(jnp.concatenate([xyzn, td], axis=1), E34_2n[:])
    xyz4 = both4[:, :4 * Sn]                           # (T, 4Sn)
    td4 = both4[:, 4 * Sn:]
    sd = xyz4 - src_c4n
    sdist = jnp.sqrt(_mm3(sd * sd, G4n[:]))            # (T, Sn)
    sdn = sd * _mm3(1.0 / (sdist + 1e-6), R4n[:])
    rd = td4 - sdn
    g2 = _mm3(jnp.concatenate([rd * rd, td4 * sdn], axis=1), G4_2n[:])
    rdn = jnp.sqrt(g2[:, :Sn])
    dot = g2[:, Sn:]
    e2 = _mm3(jnp.concatenate(
        [1.0 / jnp.maximum(rdn, 1e-6), dot], axis=1), RD4n[:])
    dirs = rd * e2[:, :4 * Sn] + e2[:, 4 * Sn:]        # (T, 4Sn)

    # ---- Agg, all samples ----
    if viewdir_agg:
        xs = feats + jnp.maximum(_mm(dirs, Wv_bdn[:]) + bvSn[:], 0.0)
    else:
        xs = feats
    mean = _mm3(xs, Wsum_seln[:]) * inv_mean           # (T, n*Cp)
    d = xs - _mm3(mean, Wtilen[:])
    var = _mm3(d * d, Wsum_seln[:]) * inv_var
    gs = jnp.maximum(
        _mm(jnp.concatenate([xs, var, mean], axis=1), W_gsn[:])
        + bgSn[:], 0.0)                                # (T, Sn*32)
    logits = (jnp.maximum(_mm(gs, Wa_bdn[:]) + baSn[:], 0.0)
              * mvn + negn)                            # (T, Sn)
    attn = _group_softmax(logits, n, S)
    im = _mm3(gs * _mm3(attn, TILE32n[:]), SUM32n[:])  # (T, n*32)
    agg = jnp.maximum(_mm(im, wfc_bdn[:]) + bfcn[:], 0.0)  # (T, n*16)

    # ---- tent-vox depth blend, both samples from one volume read ----
    zk = z01n * (D - 1)                                # (T, n)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n * D), 1)
    dlane = (iota % D).astype(jnp.float32)             # (1, nD)
    zk_exp = _mm3(zk, EXPn3[:])                        # (T, nD)
    wd = jnp.maximum(0.0, 1.0 - jnp.abs(zk_exp - dlane))
    voxn = _mm3(vox_all, TILEVn[:])                    # (T, n*D*Cv)
    wdfull = _mm3(wd, TILEDCn[:])
    voxk = _mm3(voxn * wdfull, SUMDn[:])               # (T, n*Cv)

    # ---- sigma + color heads ----
    xk = jnp.maximum(
        _mm(jnp.concatenate([voxk, agg], axis=1), w0n[:]) + b0n[:], 0.0)
    sig = jax.nn.softplus(_mm(xk, ws_bdn[:]) + bsn[:])  # (T, n)
    h = jnp.maximum(
        _mm(jnp.concatenate([xk, voxk, agg, feats, dirs], axis=1),
            W_c0n[:]) + bc0Sn[:], 0.0)                 # (T, Sn*64)
    cl = (jnp.maximum(_mm(h, Wc1_bdn[:]) + bc1Sn[:], 0.0)
          * mvn + negn)                                # (T, Sn)
    attn2 = _group_softmax(cl, n, S)
    rgbn = _mm3(feats * _mm3(attn2, TILECPn[:]), RGBSELn[:])  # (T, 3n)

    # ---- alpha compositing on sample lanes ----
    alpha = 1.0 - jnp.exp(-sig)                        # (T, n)
    running = None
    wcols = []
    for k in range(n):
        a_k = alpha[:, k:k + 1]
        w_k = a_k if running is None else a_k * running
        t_k = 1.0 - a_k + 1e-10
        running = t_k if running is None else running * t_k
        wcols.append(w_k)
    w = jnp.concatenate(wcols, axis=1)                 # (T, n)
    rgb_map = _mm3(rgbn * _mm3(w, EXP3n[:]), SUM3RGB[:])  # (T, 3)
    mx = jnp.max(w, axis=1, keepdims=True)
    es = jnp.exp(w - mx)
    depth = (jnp.sum(es * zvaln, axis=1, keepdims=True)
             / jnp.sum(es, axis=1, keepdims=True))
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(w, axis=1, keepdims=True))

    pad = 16 - 4 - n
    out = jnp.concatenate([rgb_map, depth, w]
                          + [jnp.zeros_like(depth)] * pad, axis=1)
    out_ref[:] = out


@functools.lru_cache(maxsize=None)
def _geometry_consts_k_np(S: int, n: int):
    """k-extended geometry constants: per-(sample, view) lane index
    j = k*S + s; per-sample lane index k."""
    Sn = n * S
    SUM3n = np.zeros((3 * n, n), np.float32)
    EXP3n = np.zeros((n, 3 * n), np.float32)
    E34_2n = np.zeros((6 * n, 8 * Sn), np.float32)
    G4n = np.zeros((4 * Sn, Sn), np.float32)
    R4n = np.zeros((Sn, 4 * Sn), np.float32)
    G4_2n = np.zeros((8 * Sn, 2 * Sn), np.float32)
    RD4n = np.zeros((2 * Sn, 8 * Sn), np.float32)
    for k in range(n):
        for i in range(3):
            SUM3n[k * 3 + i, k] = 1.0
            EXP3n[k, k * 3 + i] = 1.0
        for s in range(S):
            j = k * S + s
            for i in range(3):
                E34_2n[k * 3 + i, j * 4 + i] = 1.0
                E34_2n[3 * n + k * 3 + i, 4 * Sn + j * 4 + i] = 1.0
    for j in range(Sn):
        for i in range(4):
            G4n[j * 4 + i, j] = 1.0
            R4n[j, j * 4 + i] = 1.0
            G4_2n[j * 4 + i, j] = 1.0                 # rd² group sums
            G4_2n[4 * Sn + j * 4 + i, Sn + j] = 1.0   # td4·sdn sums
            RD4n[j, j * 4 + i] = 1.0                  # 1/rdn expand
        RD4n[Sn + j, 4 * Sn + j * 4 + 3] = 1.0        # dot -> lane 3
    return SUM3n, EXP3n, E34_2n, G4n, R4n, G4_2n, RD4n


def _geometry_consts_k(S: int, n: int):
    return tuple(jnp.asarray(a) for a in _geometry_consts_k_np(S, n))


@functools.lru_cache(maxsize=None)
def _blend_consts_k_np(S: int, n: int, Cp: int):
    """All-(sample, view) blend constants (see _blend_consts_np; lane
    index j = k*S + s)."""
    Sn = n * S
    C6SN = np.zeros((6 * Sn, Sn * 8 * Cp), np.float32)
    SUMC_SN = np.zeros((Sn * 8 * Cp, Sn * Cp), np.float32)
    eye = np.eye(Cp, dtype=np.float32)
    for j in range(Sn):
        for p in range(6):
            ch = (p // 3) * 4 + (p % 3)
            C6SN[p * Sn + j, j * 8 * Cp + ch * Cp:
                 j * 8 * Cp + (ch + 1) * Cp] = 1.0
        for ch in range(8):
            SUMC_SN[j * 8 * Cp + ch * Cp:j * 8 * Cp + (ch + 1) * Cp,
                    j * Cp:(j + 1) * Cp] = eye
    return C6SN, SUMC_SN


def blend_consts_k(S: int, n: int, Cp: int):
    a, b = _blend_consts_k_np(S, n, Cp)
    return jnp.asarray(a), jnp.asarray(b)


@functools.lru_cache(maxsize=None)
def _misc_consts_k_np(S: int, n: int, Cp: int, Cf: int, D: int, Cv: int):
    Sn = n * S
    TILE32n = np.zeros((Sn, Sn * 32), np.float32)
    SUM32n = np.zeros((Sn * 32, n * 32), np.float32)
    TILECPn = np.zeros((Sn, Sn * Cp), np.float32)
    RGBSELn = np.zeros((Sn * Cp, 3 * n), np.float32)
    for j in range(Sn):
        k = j // S
        TILE32n[j, j * 32:(j + 1) * 32] = 1.0
        SUM32n[j * 32:(j + 1) * 32, k * 32:(k + 1) * 32] = \
            np.eye(32, dtype=np.float32)
        TILECPn[j, j * Cp:(j + 1) * Cp] = 1.0
        for i in range(3):
            RGBSELn[j * Cp + Cf - 3 + i, k * 3 + i] = 1.0
    TILEVn = np.zeros((D * Cv, n * D * Cv), np.float32)
    TILEDCn = np.zeros((n * D, n * D * Cv), np.float32)
    SUMDn = np.zeros((n * D * Cv, n * Cv), np.float32)
    EXPn3 = np.zeros((n, n * D), np.float32)
    eyeCv = np.eye(Cv, dtype=np.float32)
    for k in range(n):
        for dd in range(D):
            TILEDCn[k * D + dd, k * D * Cv + dd * Cv:
                    k * D * Cv + (dd + 1) * Cv] = 1.0
            SUMDn[k * D * Cv + dd * Cv:k * D * Cv + (dd + 1) * Cv,
                  k * Cv:(k + 1) * Cv] = eyeCv
            EXPn3[k, k * D + dd] = 1.0
        for c in range(D * Cv):
            TILEVn[c, k * D * Cv + c] = 1.0
    SUM3RGB = np.zeros((3 * n, 3), np.float32)
    for k in range(n):
        SUM3RGB[k * 3:(k + 1) * 3, :] = np.eye(3, dtype=np.float32)
    return (TILE32n, SUM32n, TILECPn, RGBSELn,
            TILEVn, TILEDCn, SUMDn, EXPn3, SUM3RGB)


def misc_consts_k(S: int, n: int, Cp: int, Cf: int, D: int, Cv: int):
    return tuple(jnp.asarray(a)
                 for a in _misc_consts_k_np(S, n, Cp, Cf, D, Cv))


def head_params_packed_k(head_vars, viewdir_agg: bool, feat_ch: int,
                         S: int, n: int, Cp: int, Cv: int,
                         vmask: jnp.ndarray):
    """Sample-and-view lane-packed head weights for ``_render_kernel_v5``
    (see ``head_params_packed``): per-view Dense weights become
    (n*S)-block-diagonal, per-sample shared inputs tile within each
    sample's view group, and the masked mean/var selections reduce each
    sample's views to its own Cp block."""
    p = head_vars["params"]
    Cf = feat_ch
    Sn = n * S

    def wb(node):
        if "linear" in node:
            node = node["linear"]
        return (node["kernel"].astype(jnp.float32),
                node["bias"].astype(jnp.float32).reshape(1, -1))

    def pad_out(w):
        return jnp.pad(w, ((0, 0), (0, Cp - Cf)))

    def pad_in(w):
        return jnp.pad(w, ((0, Cp - Cf), (0, 0)))

    def block_diag(w, reps):
        a, b = w.shape
        out = jnp.zeros((reps * a, reps * b), jnp.float32)
        for j in range(reps):
            out = out.at[j * a:(j + 1) * a, j * b:(j + 1) * b].set(w)
        return out

    def tile_cols(w, reps):
        return jnp.concatenate([w] * reps, axis=1)

    m = vmask.astype(jnp.float32).reshape(S)
    eye = jnp.eye(Cp, dtype=jnp.float32)
    # masked view sums per sample: (Sn*Cp, n*Cp)
    Wsum_seln = jnp.zeros((Sn * Cp, n * Cp), jnp.float32)
    Wtilen = jnp.zeros((n * Cp, Sn * Cp), jnp.float32)
    for k in range(n):
        for s in range(S):
            j = k * S + s
            Wsum_seln = Wsum_seln.at[
                j * Cp:(j + 1) * Cp, k * Cp:(k + 1) * Cp].set(eye * m[s])
            Wtilen = Wtilen.at[
                k * Cp:(k + 1) * Cp, j * Cp:(j + 1) * Cp].set(eye)

    if viewdir_agg:
        wv, bv = wb(p["agg"]["view_fc"])
    else:
        wv = jnp.zeros((4, Cf), jnp.float32)
        bv = jnp.zeros((1, Cf), jnp.float32)
    Wv_bdn = block_diag(pad_out(wv), Sn)               # (4Sn, Sn*Cp)
    bvSn = tile_cols(pad_out(bv), Sn)

    wg, bg = wb(p["agg"]["global_fc"])                 # (3*Cf, 32)
    # rows: [xs (Sn*Cp) | var (n*Cp) | mean (n*Cp)] -> (Sn*32)
    gs_xs = block_diag(pad_in(wg[0:Cf]), Sn)
    gs_var = jnp.zeros((n * Cp, Sn * 32), jnp.float32)
    gs_mean = jnp.zeros((n * Cp, Sn * 32), jnp.float32)
    wv_p = pad_in(wg[Cf:2 * Cf])
    wm_p = pad_in(wg[2 * Cf:3 * Cf])
    for k in range(n):
        for s in range(S):
            j = k * S + s
            gs_var = gs_var.at[k * Cp:(k + 1) * Cp,
                               j * 32:(j + 1) * 32].set(wv_p)
            gs_mean = gs_mean.at[k * Cp:(k + 1) * Cp,
                                 j * 32:(j + 1) * 32].set(wm_p)
    W_gsn = jnp.concatenate([gs_xs, gs_var, gs_mean], axis=0)
    bgSn = tile_cols(bg, Sn)

    wa, ba = wb(p["agg"]["agg_w_fc"])                  # (32, 1)
    Wa_bdn = block_diag(wa, Sn)
    baSn = tile_cols(ba, Sn)

    wfc, bfc = wb(p["agg"]["fc"])                      # (32, 16)
    wfc_bdn = block_diag(wfc, n)
    bfcn = tile_cols(bfc, n)

    w0, b0 = wb(p["lr0"])                              # (Cv+16, 64)
    # rows: [voxk (n*Cv) | agg (n*16)] -> (n*64)
    w0n = jnp.zeros((n * Cv + n * 16, n * 64), jnp.float32)
    for k in range(n):
        if Cv:
            w0n = w0n.at[k * Cv:(k + 1) * Cv,
                         k * 64:(k + 1) * 64].set(w0[0:Cv])
        w0n = w0n.at[n * Cv + k * 16:n * Cv + (k + 1) * 16,
                     k * 64:(k + 1) * 64].set(w0[Cv:Cv + 16])
    b0n = tile_cols(b0, n)

    ws, bs = wb(p["sigma"])                            # (64, 1)
    ws_bdn = block_diag(ws, n)
    bsn = tile_cols(bs, n)

    wc0, bc0 = wb(p["color_0"])   # (64 + Cv + 16 + Cf + 4, 64)
    off = 64
    wc0_x = wc0[0:64]
    wc0_v = wc0[off:off + Cv]
    off += Cv
    wc0_a = wc0[off:off + 16]
    off += 16
    wc0_f = wc0[off:off + Cf]
    off += Cf
    wc0_d = wc0[off:off + 4]
    # rows: [xk (n*64) | voxk (n*Cv) | agg (n*16) | feats (Sn*Cp) |
    #        dirs (4Sn)] -> h (Sn*64)
    rows = n * 64 + n * Cv + n * 16 + Sn * Cp + 4 * Sn
    W_c0n = jnp.zeros((rows, Sn * 64), jnp.float32)
    for k in range(n):
        for s in range(S):
            j = k * S + s
            W_c0n = W_c0n.at[k * 64:(k + 1) * 64,
                             j * 64:(j + 1) * 64].set(wc0_x)
            if Cv:
                W_c0n = W_c0n.at[n * 64 + k * Cv:n * 64 + (k + 1) * Cv,
                                 j * 64:(j + 1) * 64].set(wc0_v)
            W_c0n = W_c0n.at[
                n * 64 + n * Cv + k * 16:n * 64 + n * Cv + (k + 1) * 16,
                j * 64:(j + 1) * 64].set(wc0_a)
    fb = n * 64 + n * Cv + n * 16
    W_c0n = W_c0n.at[fb:fb + Sn * Cp, :].set(
        block_diag(pad_in(wc0_f), Sn))
    W_c0n = W_c0n.at[fb + Sn * Cp:, :].set(block_diag(wc0_d, Sn))
    bc0Sn = tile_cols(bc0, Sn)

    wc1, bc1 = wb(p["color_1"])                        # (64, 1)
    Wc1_bdn = block_diag(wc1, Sn)
    bc1Sn = tile_cols(bc1, Sn)

    return (Wv_bdn, bvSn, Wsum_seln, Wtilen,
            W_gsn, bgSn, Wa_bdn, baSn, wfc_bdn, bfcn,
            w0n, b0n, ws_bdn, bsn,
            W_c0n, bc0Sn, Wc1_bdn, bc1Sn)
