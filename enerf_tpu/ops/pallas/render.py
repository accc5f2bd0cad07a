"""Pallas TPU kernel: fused IBR render stage.

Everything between the source-feature corner gather and the composited
frame — corner blending, ray-difference features, the Agg pooling MLP,
sigma/color heads, per-view softmax blending, and alpha compositing
(reference lib/networks/enerf/nerf.py:6-89 + utils.py:571-603) — runs in
ONE VMEM-resident pass over the gather output.

Why: as separate XLA ops this stage is ~40+ ms at 512x640 (dozens of
(P, S, C)-shaped elementwise ops, each a full HBM round trip of a
100-500 MB tensor, many in hostile layouts); the fused kernel reads the
503 MB corner-row tensor once and writes 20 MB. The MLPs are tiny
(64-wide) and ride the MXU per block.

Layout contract (per batch item; rays tiled by ``tile``):
- v     (S, n, P, 4*Cp)  corner rows from ``get_img_feat_corners``
                         (s-major index order: m = (s*n + k)*P + p)
- w12   (n, P, 4*S)      corner weights, lanes corner-major/view-minor
                         (produced lane-native by the single-matmul
                         projection in get_img_feat_corners — no
                         (S, n, P, 1)-shaped stacks)
- xyzz  (n, P, 8)        [world x, y, z, z_val, 0...]
- vox   (n, P, Cv)       regularized-volume features (Cv = 8)
- cams  (S+1, 4)         rows 0..S-1 src camera centers, row S target
- vmask (S, 1)           1.0 = valid view (padded-view support)
- out   (P, 16)          [rgb(3), depth(1), weights(n), 0 pad]

Eval-only (no autodiff rule); the model falls back to the jnp path in
train mode. Numerics match the jnp path to fp-reassociation tolerance
(tested in interpret mode, tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_rows(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))


def _render_kernel(*refs,
                   S: int, n: int, Cp: int, Cf: int, Cv: int,
                   white_bkgd: bool, viewdir_agg: bool, use_vox_feat: bool,
                   tent_vox_D: int = 0, stacked: bool = False):
    # corner rows: either ONE stacked (S, n, T, 4Cp) operand (fused-table
    # gather output, read in place — no per-view slices materialized) or
    # S per-view operands (pinned-table gathers; see corner_gather_perview)
    if stacked:
        v_all = refs[0]
        refs = refs[1:]

        def vrow(s, k):
            return v_all[s, k]
    else:
        v_refs = refs[:S]
        refs = refs[S:]

        def vrow(s, k):
            return v_refs[s][k]
    (w_ref, xyzz_ref, vox_ref,
     wv_ref, bv_ref, wg_ref, bg_ref, wa_ref, ba_ref,
     wfc_ref, bfc_ref, w0_ref, b0_ref, ws_ref, bs_ref,
     wc0_ref, bc0_ref, wc1_ref, bc1_ref,
     cams_ref, vmask_ref, out_ref) = refs

    def mm(x, w):
        # DEFAULT matmul precision, matching the jnp path's flax Dense
        # (precision=None). The kernel originally forced HIGHEST — a
        # 6-pass f32 MXU decomposition, ~6x the weight-load traffic of
        # the single-pass default — which was STRICTER than the path it
        # must agree with.
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))

    def dense(x, w_r, b_r, relu=True):
        y = mm(x, w_r[:]) + b_r[:]
        return jnp.maximum(y, 0.0) if relu else y

    tar_c = cams_ref[S:S + 1, 0:3]          # (1, 3)
    # view mask as true SMEM scalars: (1, 1) VMEM slices broadcast against
    # (T, C) vectors need a both-axis vector broadcast, which newer Mosaic
    # versions reject ("Broadcast in both sublanes and lanes"); scalar
    # splats are always supported
    m = [vmask_ref[s] for s in range(S)]    # scalar each
    cnt = m[0]
    for s in range(1, S):
        cnt = cnt + m[s]

    sigmas = []
    rgbs = []
    for k in range(n):
        xyz = xyzz_ref[k, :, 0:3]           # (T, 3)
        td = xyz - tar_c
        td = td / (_norm_rows(td) + 1e-6)

        feats = []
        dirs = []
        wk = w_ref[k]                       # (T, 4S) corner-major lanes
        for s in range(S):
            vb = vrow(s, k).astype(jnp.float32)  # (T, 4*Cp); bf16
            # corner rows convert in-VMEM
            f = (vb[:, 0:Cp] * wk[:, s:s + 1]
                 + vb[:, Cp:2 * Cp] * wk[:, S + s:S + s + 1]
                 + vb[:, 2 * Cp:3 * Cp] * wk[:, 2 * S + s:2 * S + s + 1]
                 + vb[:, 3 * Cp:4 * Cp] * wk[:, 3 * S + s:3 * S + s + 1])
            feats.append(f[:, :Cf])         # (T, Cf) = [feat, rgb]

            sc = cams_ref[s:s + 1, 0:3]
            sd = xyz - sc
            sd = sd / (_norm_rows(sd) + 1e-6)
            rd = td - sd
            rdn = _norm_rows(rd)
            dot = jnp.sum(td * sd, axis=1, keepdims=True)
            dirs.append(jnp.concatenate(
                [rd / jnp.maximum(rdn, 1e-6), dot], axis=1))  # (T, 4)

        # Agg (reference nerf.py:74-89): optional view_fc, masked
        # mean/var over views, global_fc, softmax attention, fc
        if viewdir_agg:
            xs = [feats[s] + dense(dirs[s], wv_ref, bv_ref)
                  for s in range(S)]
        else:
            xs = feats
        mean = xs[0] * m[0]
        for s in range(1, S):
            mean = mean + xs[s] * m[s]
        mean = mean / jnp.maximum(cnt, 1.0)
        var = ((xs[0] - mean) ** 2) * m[0]
        for s in range(1, S):
            var = var + ((xs[s] - mean) ** 2) * m[s]
        var = var / jnp.maximum(cnt - 1.0, 1.0)

        # global_fc over concat([xs, var, mean]) as SPLIT matmuls on
        # static row slices of the weight — lane-dim concats are VREG
        # shuffle chains in Mosaic, and the var/mean halves hoist out of
        # the per-view loop (computed once, not S times)
        wg = wg_ref[:]
        gvm = (mm(var, wg[Cf:2 * Cf]) + mm(mean, wg[2 * Cf:3 * Cf])
               + bg_ref[:])
        gs = [jnp.maximum(mm(xs[s], wg[0:Cf]) + gvm, 0.0)
              for s in range(S)]
        # masked logits via arithmetic (exact for m in {0, 1}): scalar
        # jnp.where predicates also hit the Mosaic both-axis broadcast
        logits = [dense(gs[s], wa_ref, ba_ref) * m[s] + (1.0 - m[s]) * -1e9
                  for s in range(S)]
        mx = logits[0]
        for s in range(1, S):
            mx = jnp.maximum(mx, logits[s])
        es = [jnp.exp(logits[s] - mx) for s in range(S)]
        z = es[0]
        for s in range(1, S):
            z = z + es[s]
        im_feat = gs[0] * (es[0] / z)
        for s in range(1, S):
            im_feat = im_feat + gs[s] * (es[s] / z)
        agg = dense(im_feat, wfc_ref, bfc_ref)          # (T, 16)

        # sigma head (reference nerf.py:13-18, 34-37)
        if use_vox_feat and tent_vox_D:
            # grid rays: vox_ref holds the full-res-resized feature
            # volume (D, T, Cv); the trilinear depth blend (tent
            # weights == grid_sample's two-plane lerp, zeros outside)
            # happens here instead of a (P·n, D)×(D, C) XLA contraction
            # in a hostile shape (ops/ibr.py get_vox_feat_grid)
            zk = xyzz_ref[k, :, 4:5] * (tent_vox_D - 1)   # (T, 1)
            vox_k = None
            for d in range(tent_vox_D):
                wd = jnp.maximum(0.0, 1.0 - jnp.abs(zk - float(d)))
                contrib = wd * vox_ref[d].astype(jnp.float32)
                vox_k = contrib if vox_k is None else vox_k + contrib
            vox_k = vox_k[:, :Cv]
        elif use_vox_feat:
            vox_k = vox_ref[k][:, :Cv]
        else:
            vox_k = None
        # lr0 over concat([vox, agg]) as split matmuls (see gvm note)
        w0 = w0_ref[:]
        if vox_k is None:
            xk = jnp.maximum(mm(agg, w0) + b0_ref[:], 0.0)   # (T, 64)
        else:
            xk = jnp.maximum(mm(vox_k, w0[0:Cv]) + mm(agg, w0[Cv:])
                             + b0_ref[:], 0.0)               # (T, 64)
        sigmas.append(jax.nn.softplus(dense(xk, ws_ref, bs_ref,
                                            relu=False)))  # (T, 1)

        # color head (reference nerf.py:19-23, 38-43): per-view weight
        # MLP, softmax over views, blend source rgbs (lanes Cf-3..Cf).
        # inp = concat([xk, vox, agg, feats_s, dirs_s]) as split
        # matmuls; the view-independent part hoists out of the s loop.
        wc0 = wc0_ref[:]
        comps = [xk] + ([] if vox_k is None else [vox_k]) + [agg]
        base = bc0_ref[:]
        off = 0
        for t in comps:
            d = t.shape[1]
            base = base + mm(t, wc0[off:off + d])
            off += d
        cl = []
        for s in range(S):
            h = jnp.maximum(base + mm(feats[s], wc0[off:off + Cf])
                            + mm(dirs[s], wc0[off + Cf:off + Cf + 4]),
                            0.0)
            cl.append(dense(h, wc1_ref, bc1_ref) * m[s]
                      + (1.0 - m[s]) * -1e9)
        mx = cl[0]
        for s in range(1, S):
            mx = jnp.maximum(mx, cl[s])
        es = [jnp.exp(cl[s] - mx) for s in range(S)]
        z = es[0]
        for s in range(1, S):
            z = z + es[s]
        rgb = feats[0][:, Cf - 3:Cf] * (es[0] / z)
        for s in range(1, S):
            rgb = rgb + feats[s][:, Cf - 3:Cf] * (es[s] / z)
        rgbs.append(rgb)                                # (T, 3)

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
    depth = (es[0] / z) * xyzz_ref[0, :, 3:4]
    for k in range(1, n):
        depth = depth + (es[k] / z) * xyzz_ref[k, :, 3:4]

    if white_bkgd:
        acc = weights[0]
        for k in range(1, n):
            acc = acc + weights[k]
        rgb_map = rgb_map + (1.0 - acc)

    pad = 16 - 4 - n
    out = jnp.concatenate([rgb_map, depth] + weights
                          + [jnp.zeros_like(depth)] * pad, axis=1)
    out_ref[:] = out


def fused_render_rays(vs: Tuple[jnp.ndarray, ...], w12: jnp.ndarray,
                      xyzz: jnp.ndarray,
                      vox: jnp.ndarray, params: Tuple[jnp.ndarray, ...],
                      cams: jnp.ndarray, vmask: jnp.ndarray, *,
                      white_bkgd: bool, viewdir_agg: bool = True,
                      use_vox_feat: bool = True, tent_vox: bool = False,
                      tile: int = 1024) -> jnp.ndarray:
    """Run the fused render stage for one batch item. Returns (P, 16)
    packed [rgb(3), depth(1), weights(n), 0]. P must divide by ``tile``
    (callers pick a divisor or fall back to the jnp path).

    vs: corner rows — an S-tuple of per-view (n, P, 4*Cp) arrays
    (separate operands keep the upstream gathers per-view; VMEM-pinnable
    tables, see ``corner_gather_perview``) or ONE stacked
    (S, n, P, 4*Cp) array (the fused-table gather output read in place —
    slicing it per view in XLA materializes S full copies, ~6 ms at the
    512×640 render shape).

    tent_vox: ``vox`` is the spatially-resized feature volume
    (D, P, Cv) and ``xyzz[..., 4]`` carries the volume-normalized sample
    depth in [0, 1] — the kernel does the trilinear depth blend (grid
    rays only; see get_vox_feat_grid). Otherwise ``vox`` is the
    per-sample (n, P, Cv) features, precomputed.
    """
    stacked = not isinstance(vs, tuple)
    if stacked:
        S, n, P, C4 = vs.shape
        v_args = (vs,)
        v_specs = [pl.BlockSpec((S, n, tile, C4), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM)]
    else:
        S = len(vs)
        n, P, C4 = vs[0].shape
        v_args = tuple(vs)
        v_specs = [pl.BlockSpec((n, tile, C4), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(S)]
    Cp = C4 // 4
    Cf = params[0].shape[1]   # view_fc out == feat_ch
    Cv = vox.shape[-1]
    assert P % tile == 0, (P, tile)

    kern = functools.partial(
        _render_kernel, S=S, n=n, Cp=Cp, Cf=Cf, Cv=Cv,
        white_bkgd=white_bkgd, viewdir_agg=viewdir_agg,
        use_vox_feat=use_vox_feat,
        tent_vox_D=vox.shape[0] if tent_vox else 0, stacked=stacked)

    def rep(a):  # whole-array block, same for every grid step
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    vox_lead = vox.shape[0]  # D (tent) or n (precomputed)
    return pl.pallas_call(
        kern,
        grid=(P // tile,),
        in_specs=v_specs + [
            pl.BlockSpec((n, tile, 4 * S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile, 8), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vox_lead, tile, Cv), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [rep(p) for p in params] + [
            rep(cams),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 16), jnp.float32),
    )(*v_args, w12, xyzz, vox, *params, cams, vmask.reshape(S))


def head_params_tuple(head_vars, viewdir_agg: bool,
                      feat_ch: int) -> Tuple[jnp.ndarray, ...]:
    """Flatten a NeRFHead variable pytree into the kernel's param order.

    Order: view_fc, global_fc, agg_w_fc, fc, lr0, sigma, color_0,
    color_1 — (kernel (in, out), bias (1, out)) each. When viewdir_agg
    is off the head has no view_fc; zero placeholders keep the calling
    convention fixed.
    """
    p = head_vars["params"]

    def wb(node):
        if "linear" in node:
            node = node["linear"]
        return (node["kernel"].astype(jnp.float32),
                node["bias"].astype(jnp.float32).reshape(1, -1))

    if viewdir_agg:
        wv, bv = wb(p["agg"]["view_fc"])
    else:
        wv = jnp.zeros((4, feat_ch), jnp.float32)
        bv = jnp.zeros((1, feat_ch), jnp.float32)
    wg, bg = wb(p["agg"]["global_fc"])
    wa, ba = wb(p["agg"]["agg_w_fc"])
    wfc, bfc = wb(p["agg"]["fc"])
    w0, b0 = wb(p["lr0"])
    ws, bs = wb(p["sigma"])
    wc0, bc0 = wb(p["color_0"])
    wc1, bc1 = wb(p["color_1"])
    return (wv, bv, wg, bg, wa, ba, wfc, bfc, w0, b0, ws, bs,
            wc0, bc0, wc1, bc1)
