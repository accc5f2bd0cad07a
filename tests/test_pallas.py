"""Pallas reduction kernels vs their jnp reference ops (interpret mode on
CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.ops.depth import depth_regression

# interpret mode on the CPU backend
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("depth_inv", [False, True])
def test_depth_regression_kernel_matches_jnp(depth_inv):
    from enerf_tpu.ops.pallas.reductions import depth_regression_pallas

    rng = np.random.RandomState(1)
    B, D, H, W = 2, 16, 12, 20
    logits = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    values = jnp.asarray(
        np.linspace(2.0, 6.0, D, dtype=np.float32)[None, :, None, None]
        * np.ones((B, D, H, W), np.float32))

    d_ref, s_ref = depth_regression(logits, values, depth_inv)
    d_out, s_out = depth_regression_pallas(logits, values, depth_inv,
                                           tile_p=128)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("depth_inv", [False, True])
def test_depth_regression_fused_gradients(depth_inv):
    """custom_vjp backward must equal the jnp path's gradients exactly."""
    from enerf_tpu.ops.pallas.reductions import depth_regression_fused

    rng = np.random.RandomState(2)
    B, D, H, W = 1, 8, 8, 16
    logits = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    values = jnp.asarray(
        np.linspace(2.0, 6.0, D, dtype=np.float32)[None, :, None, None]
        + 0.1 * rng.rand(B, D, H, W).astype(np.float32))

    def loss_fused(l, v):
        d, s = depth_regression_fused(l, v, depth_inv)
        return jnp.sum(d * 1.3 + s * 0.7)

    def loss_ref(l, v):
        d, s = depth_regression(l, v, depth_inv)
        return jnp.sum(d * 1.3 + s * 0.7)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(logits, values)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(logits, values)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("depth_inv", [False, True])
def test_depth_regression_kernel_bf16_io(depth_inv):
    """bf16 network dtype: kernel takes/returns bf16 but computes the
    softmax moments in f32 internally — results must match the f32
    reference to bf16 resolution (the bug this pins: mixed-dtype store
    rejected by pallas, and bf16-precision moments drifting)."""
    from enerf_tpu.ops.pallas.reductions import depth_regression_pallas

    rng = np.random.RandomState(3)
    B, D, H, W = 1, 16, 8, 16
    logits32 = rng.randn(B, D, H, W).astype(np.float32)
    values32 = (np.linspace(2.0, 6.0, D, dtype=np.float32)[None, :, None, None]
                * np.ones((B, D, H, W), np.float32))
    l16 = jnp.asarray(logits32).astype(jnp.bfloat16)
    v16 = jnp.asarray(values32).astype(jnp.bfloat16)

    d16, s16 = depth_regression_pallas(l16, v16, depth_inv, tile_p=128)
    assert d16.dtype == jnp.bfloat16 and s16.dtype == jnp.bfloat16
    # f32 reference over the same (bf16-quantized) inputs
    d_ref, s_ref = depth_regression(l16.astype(jnp.float32),
                                    v16.astype(jnp.float32), depth_inv)
    np.testing.assert_allclose(np.asarray(d16, np.float32),
                               np.asarray(d_ref), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(s16, np.float32),
                               np.asarray(s_ref), rtol=2e-2, atol=1e-3)


def test_fused_render_matches_jnp_path():
    """cfg.enerf.fused_render runs the whole render stage (corner blend +
    IBR head + compositing) in one Pallas kernel; outputs must match the
    jnp path (fp-reassociation tolerance). Exercises the full model."""
    import dataclasses

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_f = dataclasses.replace(cfg.enerf, fused_render=True)
    model_f = ENeRF(cfg=cfg_f, train_mode=False)
    out_f = model_f.apply(variables, batch)

    assert set(out_f) == set(out)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_fused_render_padded_views():
    """Fused kernel with a padded source view (view_mask) must match the
    jnp path — exercises the masked mean/var and masked softmaxes."""
    import dataclasses

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, n_src=2)  # 1 padded
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_f = dataclasses.replace(cfg.enerf, fused_render=True)
    out_f = ENeRF(cfg=cfg_f, train_mode=False).apply(variables, batch)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("table_bf16", [False, True])
def test_fused_cost_volume_matches_jnp(masked, table_bf16):
    """build_cost_volume(fused=True) — ONE Pallas pass for corner blend +
    masked cross-view variance — must match the jnp path."""
    from enerf_tpu.ops.warp import build_cost_volume

    rng = np.random.RandomState(7)
    B, S, H_s, W_s, C = 2, 3, 24, 32, 16
    D, H_t, W_t = 4, 8, 16  # P = 512 → tile fits
    feats = jnp.asarray(rng.randn(B, S, H_s, W_s, C).astype(np.float32))
    # projection ≈ identity + jitter so coords land mostly in-frame with
    # some out-of-range (exercises zero padding)
    pm = np.zeros((B, S, 3, 4), np.float32)
    pm[..., :3, :3] = np.eye(3) + 0.02 * rng.randn(B, S, 3, 3)
    pm[..., :2, 3] = 2.0 * rng.randn(B, S, 2)
    pm[..., 2, 3] = 0.1 * rng.rand(B, S)
    proj = jnp.asarray(pm)
    dv = jnp.asarray(
        (2.0 + 3.0 * rng.rand(B, D, H_t, W_t)).astype(np.float32))
    vm = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]]) if masked else None

    ref = build_cost_volume(feats, proj, dv, vm, table_bf16=table_bf16)
    out = build_cost_volume(feats, proj, dv, vm, table_bf16=table_bf16,
                            fused=True)
    assert out.shape == ref.shape == (B, D, H_t, W_t, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_render_gather_bf16_matches_jnp():
    """gather_bf16 + fused_render: bf16 corner rows convert in-VMEM; the
    two paths quantize the same table, so outputs must agree."""
    import dataclasses

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,), gather_bf16=True,
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_f = dataclasses.replace(cfg.enerf, fused_render=True,
                                fused_volume=True)
    out_f = ENeRF(cfg=cfg_f, train_mode=False).apply(variables, batch)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out[k]),
            rtol=5e-4, atol=5e-5, err_msg=k)


def test_fused_render_grid_tent_vox_matches_jnp():
    """grid_rays + fused_render: the kernel does the trilinear depth
    blend (tent_vox) in VMEM; must match the non-fused grid path."""
    import dataclasses

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,), grid_rays=True,
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_f = dataclasses.replace(cfg.enerf, fused_render=True)
    out_f = ENeRF(cfg=cfg_f, train_mode=False).apply(variables, batch)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("force_segments", [False, True])
def test_fused_render_gather_blend_matches_jnp(force_segments):
    """fused_gather_blend (v3): the render kernel consumes raw
    per-(view, segment) gather rows and does the segment merge + parity
    select + corner blend in VMEM; must match the jnp path. The
    force_segments case shrinks the pin limit so the K>1 in-kernel
    merge path runs at test size."""
    import dataclasses

    import enerf_tpu.ops.sampling as sampling
    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3), grid_rays=True,
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, n_src=2)  # 1 padded
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_f = dataclasses.replace(cfg.enerf, fused_render=True,
                                fused_gather_blend=True)
    orig = sampling._GATHER_PIN_LIMIT_BYTES
    if force_segments:
        # wide table at 64x96xCp16 f32 is ~1.63 MB -> K=3 segments
        sampling._GATHER_PIN_LIMIT_BYTES = 600_000
        assert sampling.wide_table_segments(64, 96, 11, False)[0] == 3
    try:
        out_f = ENeRF(cfg=cfg_f, train_mode=False).apply(variables, batch)
    finally:
        sampling._GATHER_PIN_LIMIT_BYTES = orig
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("limit,expect", [
    (1, "fused"),            # K > max segments -> fused-table fallback
    (None, "pinned"),        # default: small tables -> per-view pinned
    (100000, "segmented"),   # K=3: clamped-segment merge path
])
def test_corner_gather_branches_agree(limit, expect):
    """corner_gather_perview's three lowerings (per-view pinned,
    segmented clamped-merge, single fused-table) must produce identical
    corner rows/weights — only the gather strategy differs."""
    import enerf_tpu.ops.sampling as sampling
    from enerf_tpu.ops.sampling import corner_gather_perview

    rng = np.random.RandomState(7)
    V, H, W, C = 3, 24, 32, 5
    M = 97
    imgs = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    x = jnp.asarray((rng.rand(M, V) * (W + 3) - 1.5).astype(np.float32))
    y = jnp.asarray((rng.rand(M, V) * (H + 3) - 1.5).astype(np.float32))

    ref_vs, ref_w, Cp = corner_gather_perview(imgs, x, y, "zeros")
    assert isinstance(ref_vs, tuple)  # default: pinned per-view

    orig = sampling._GATHER_PIN_LIMIT_BYTES
    if limit is not None:
        sampling._GATHER_PIN_LIMIT_BYTES = limit
    try:
        vs, w12, Cp2 = corner_gather_perview(imgs, x, y, "zeros")
    finally:
        sampling._GATHER_PIN_LIMIT_BYTES = orig
    assert Cp2 == Cp
    if expect == "fused":
        assert not isinstance(vs, tuple) and vs.shape[0] == V
        vs = tuple(vs[s] for s in range(V))
    else:
        assert isinstance(vs, tuple)
    np.testing.assert_allclose(np.asarray(w12), np.asarray(ref_w))
    for a, b in zip(vs, ref_vs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_fast_const_close_to_exact():
    """fused_fast_const (v4 rung): single-pass bf16 constant matmuls +
    MXU cost-volume blend. Not bit-matched to the jnp path by design —
    assert bf16-class agreement with the exact fused output (the same
    precision class as gather_bf16/bf16 weights at the bf16_all rungs)."""
    import dataclasses

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3), grid_rays=True,
        fused_render=True, fused_gather_blend=True, fused_volume=True,
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8))))
    batch_np = make_synthetic_batch(cfg, H=64, W=96, n_src=2)  # 1 padded
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ("tar_img",)}
    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    cfg_fast = dataclasses.replace(cfg.enerf, fused_fast_const=True)
    out_fast = ENeRF(cfg=cfg_fast, train_mode=False).apply(variables, batch)

    rgb, rgb_f = np.asarray(out["rgb_level1"]), np.asarray(out_fast["rgb_level1"])
    assert np.max(np.abs(rgb - rgb_f)) < 0.06, np.max(np.abs(rgb - rgb_f))
    assert np.mean(np.abs(rgb - rgb_f)) < 6e-3
    d, d_f = np.asarray(out["depth_level1"]), np.asarray(out_fast["depth_level1"])
    scale = np.maximum(np.abs(d), 1.0)
    assert np.max(np.abs(d - d_f) / scale) < 0.05


@pytest.mark.parametrize("fast_const", [False, True])
def test_fused_wide_variance_matches_jnp(fast_const, monkeypatch):
    """The WIDE-table cost-volume path (fused_wide_variance +
    corner_gather_segments zeros-mode validity lanes) only activates
    when the 2x2 per-view table exceeds the VMEM pin limit — unreachable
    at test shapes with the production limit. Shrink the limit so the
    wide path runs here, with random projections that scatter warp
    coords far out of range (exercising the vx0/vx1/vy0/vy1 validity
    masking) and one padded view (mask semantics)."""
    import enerf_tpu.ops.pallas.cost_volume as cv
    import enerf_tpu.ops.sampling as sampling
    from enerf_tpu.ops.warp import build_cost_volume

    rng = np.random.RandomState(11)
    B, S, H_s, W_s, C = 1, 3, 16, 24, 32
    D, H_t, W_t = 8, 16, 24
    feats = jnp.asarray(rng.randn(B, S, H_s, W_s, C).astype(np.float32))
    # projections roughly centered on the grid but with enough spread
    # that a large fraction of coords land outside [0, W) x [0, H)
    projs = np.tile(np.eye(3, 4, dtype=np.float32), (B, S, 1, 1))
    projs += 0.35 * rng.randn(B, S, 3, 4).astype(np.float32)
    projs[..., 2, 2] = 1.0
    depth_values = jnp.asarray(
        (2.0 + rng.rand(B, D, H_t, W_t) * 3.0).astype(np.float32))
    vmask = jnp.asarray(np.array([[1.0, 1.0, 0.0]], np.float32))

    ref = build_cost_volume(feats, jnp.asarray(projs), depth_values,
                            view_mask=vmask, fused=False)

    # production pin limit keeps the 2x2 table pinned at this size;
    # shrink it so bytes_2x2 (17*25*4*32*4 = 217,600) overflows and the
    # wide path (K=3 segments) activates
    monkeypatch.setattr(sampling, "_GATHER_PIN_LIMIT_BYTES", 100_000)
    assert sampling.wide_table_segments(H_s, W_s, C, False)[0] == 3
    calls = []
    orig_wide = cv.fused_wide_variance

    def counted(*a, **kw):
        calls.append(1)
        return orig_wide(*a, **kw)

    monkeypatch.setattr(cv, "fused_wide_variance", counted)
    out = build_cost_volume(feats, jnp.asarray(projs), depth_values,
                            view_mask=vmask, fused=True,
                            fast_const=fast_const)
    assert calls, "wide path did not activate"
    out, ref = np.asarray(out), np.asarray(ref)
    if fast_const:
        # single-pass bf16 constant matmuls: bf16-class agreement (same
        # contract as test_fused_fast_const_close_to_exact)
        assert np.max(np.abs(out - ref)) < 0.05, np.max(np.abs(out - ref))
        assert np.mean(np.abs(out - ref)) < 5e-3
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
