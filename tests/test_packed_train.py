"""The lane-packed differentiable train render path
(cfg.enerf.train_packed_render -> ops/pallas/render.py
render_rays_packed_xla) must match the per-view jnp head in outputs AND
gradients — it is the same reference math (nerf.py:6-89) on the fused
kernels' packed layouts, so agreement is fp-reassociation class."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf import ENeRF


def _run(packed, grid_rays, n_src=2, viewdir_agg=True):
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3),
        train_render_chunk=0, grid_rays=grid_rays,
        viewdir_agg=viewdir_agg,
        train_packed_render=packed,
        cas_config=CascadeConfig(num=2, volume_planes=(8, 8),
                                 num_rays=(256, 1024),
                                 train_img=(True, True))))
    batch_np = make_synthetic_batch(cfg, H=32, W=32, batch_size=1,
                                    split="train", n_src=n_src)
    batch_np.pop("tar_img")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = ENeRF(cfg=cfg.enerf, train_mode=True, axis_name=None)
    init_cfg = dataclasses.replace(cfg.enerf, train_packed_render=False)
    variables = ENeRF(cfg=init_cfg, train_mode=True, axis_name=None).init(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, mutable=["batch_stats"])
        return (jnp.mean((out["rgb_level1"] - batch["rgb_1"]) ** 2)
                + 0.1 * jnp.mean((out["rgb_level0"] - batch["rgb_0"]) ** 2)
                ), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    return float(loss), out, grads


@pytest.mark.parametrize("grid_rays,n_src", [(False, 2), (True, 2),
                                             (True, 3)])
def test_packed_train_render_matches_jnp(grid_rays, n_src):
    """grid (tent) and gather vox modes, full and padded views (n_src=2
    of S_max=3 exercises the masked mean/var/softmax selections)."""
    loss1, out1, g1 = _run(packed=False, grid_rays=grid_rays, n_src=n_src)
    loss2, out2, g2 = _run(packed=True, grid_rays=grid_rays, n_src=n_src)
    np.testing.assert_allclose(loss1, loss2, rtol=2e-4)
    for k in ("rgb_level0", "rgb_level1", "depth_level1"):
        np.testing.assert_allclose(np.asarray(out2[k]), np.asarray(out1[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)

    # Scale-aware grad check. The paths reassociate every reduction
    # differently (matmul mean/var vs elementwise, row-stacked color
    # matmul, tent factorizations); through the random-init network's
    # softmax/softplus chains this amplifies to ~5e-3 relative on the
    # feature_net leaves (measured; head/cost_reg leaves are ~1e-3
    # class), and leaves whose whole gradient is TINY (norm < 1e-3 —
    # e.g. a 16-entry bias at 1.5e-4 max) balloon in relative terms
    # while their absolute error stays ~1e-5. So: tiny leaves get an
    # absolute bar; real leaves a relative-L2 bar. A broken gradient
    # lands orders of magnitude past either (bisects: >0.1). The
    # FUNCTIONAL backstop is tests/test_train_oracle.py, which trains
    # through this path (train_packed_render defaults True) to a
    # recorded PSNR.
    tol = 5e-2 if grid_rays else 1e-2

    def close(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        na = np.linalg.norm(a.ravel())
        if na < 1e-3:
            assert np.max(np.abs(a - b)) < 1e-4, (
                f"{path}: tiny-leaf abs error {np.max(np.abs(a - b)):.2e}")
            return
        rel = np.linalg.norm((a - b).ravel()) / na
        assert rel < tol, f"{path}: relative grad norm error {rel:.2e}"

    jax.tree_util.tree_map_with_path(close, g1, g2)
