"""Ray-sharded multi-chip rendering must equal single-device rendering
(rays are independent — zero-collective parallelism over the mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import make_synthetic_batch
from enerf_tpu.models.enerf import ENeRF
from enerf_tpu.parallel.mesh import make_mesh
from enerf_tpu.train.step import make_eval_step, make_sharded_render_step


def test_sharded_render_matches_single_device():
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8),
                                 render_if=(False, True))))
    H, W = 32, 32  # 1024 rays / 8 devices = 128 per shard
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), batch)

    single = make_eval_step(cfg)
    out1 = single(variables["params"], variables["batch_stats"], batch)

    mesh = make_mesh((8,), ("data",), devices=jax.devices()[:8])
    sharded = make_sharded_render_step(cfg, mesh)
    out8 = sharded(variables["params"], variables["batch_stats"], batch)

    assert set(out1) == set(out8)
    for k in out1:
        np.testing.assert_allclose(np.asarray(out8[k]), np.asarray(out1[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
