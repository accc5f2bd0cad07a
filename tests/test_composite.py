"""Composite (ENeRF-Outdoor) model: forward shapes, finiteness, and the
fg-window semantics (reference network_composite.py:77-146)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_composite_batch
from enerf_tpu.models.enerf_composite import ENeRFComposite


def _cfg(num_fg_layers=1):
    return Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        viewdir_agg=False, num_fg_layers=num_fg_layers,
        fg_bbox_hw=(32, 32), bg_volume_planes=(16, 4),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8),
                                 num_samples=(2, 1),
                                 render_if=(True, True))))


@pytest.fixture(scope="module", params=[1, 2])
def composite_out(request):
    L = request.param
    cfg = _cfg(L)
    H, W = 64, 64
    batch_np = make_composite_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = ENeRFComposite(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, batch)
    return cfg, batch_np, out, L


def test_output_shapes(composite_out):
    cfg, batch_np, out, L = composite_out
    cas = cfg.enerf.cas_config
    H, W = 64, 64
    for i in range(cas.num):
        rs = cas.render_scale[i]
        n = int(H * rs) * int(W * rs)
        assert out[f"rgb_level{i}"].shape == (1, n, 3)
        assert out[f"depth_level{i}"].shape == (1, n)
        # samples: L fg layers + bg, all scattered full-frame
        total = cas.num_samples[i] * L + cas.num_samples[i]
        assert out[f"weights_level{i}"].shape == (1, n, total)


def test_finite_and_fg_contribution(composite_out):
    cfg, batch_np, out, L = composite_out
    rgb = np.asarray(out["rgb_level1"])
    assert np.all(np.isfinite(rgb))
    w = np.asarray(out["weights_level1"])[0]  # (N, samples)
    H = W = 64
    x, y, fw, fh = batch_np["bbox"][0, 0]
    inside = np.zeros((H, W), bool)
    inside[y:y + fh, x:x + fw] = True
    n_fg = cfg.enerf.cas_config.num_samples[1] * L
    # fg samples only receive weight inside the window
    fg_w = w[..., :n_fg].sum(-1).reshape(H, W)
    assert np.all(fg_w[~inside] == 0.0)
    assert fg_w[inside].max() > 0.0
