"""Training entry point (reference train_net.py:19-117).

Usage mirrors the reference:
    python train.py --cfg_file configs/enerf/dtu_pretrain.yaml [key value ...]

Multi-host: launch one process per host with ``jax.distributed`` env vars
set (replaces torch.distributed.launch + NCCL init, train_net.py:98-103);
the data-parallel mesh spans all chips and gradients psum over it.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", default="configs/enerf/dtu_pretrain.yaml")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() (multi-host)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


def init_variables(cfg, model_cls, batch_np):
    """Initialize params/batch_stats from one host batch (single device)."""
    import jax
    import jax.numpy as jnp

    from enerf_tpu.datasets.loader import device_batch

    model = model_cls(cfg=cfg.enerf, train_mode=True, axis_name=None,
                      dtype=jnp.dtype(cfg.compute_dtype))
    one = {k: v[:1] for k, v in device_batch(batch_np).items()}
    rng = jax.random.PRNGKey(0 if cfg.fix_random else int.from_bytes(os.urandom(4), "little"))
    return model.init(rng, one)


def train(cfg, args):
    import jax
    import jax.numpy as jnp

    from enerf_tpu.datasets.loader import make_data_loader
    from enerf_tpu.eval.evaluator import Evaluator
    from enerf_tpu.factory import network_class
    from enerf_tpu.parallel.mesh import make_mesh
    from enerf_tpu.train.checkpoint import (
        load_model,
        load_pretrain,
        save_model,
        save_trained_config,
    )
    from enerf_tpu.train.state import create_train_state
    from enerf_tpu.train.step import (
        make_bn_refresh_step,
        make_eval_step,
        make_train_step,
        replicate_state,
    )
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.train.vgg import load_vgg16_params

    if cfg.fix_random:
        np.random.seed(0)

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    n_shards = int(np.prod([mesh.shape[a] for a in cfg.mesh_axes]))

    train_loader = make_data_loader(
        cfg, "train", max_iter=cfg.ep_iter,
        process_index=jax.process_index(), process_count=jax.process_count())
    first = next(iter(train_loader))
    H_O, W_O = first["src_inps"].shape[2:4]

    model_cls = network_class(cfg)
    variables = init_variables(cfg, model_cls, first)
    variables = load_pretrain(cfg, variables)
    state = create_train_state(cfg, variables)
    state, begin_epoch = load_model(cfg.trained_model_dir, state,
                                    resume=cfg.resume)
    state = replicate_state(state, mesh)
    if jax.process_index() == 0:
        save_trained_config(cfg)

    vgg_params = load_vgg16_params()
    if vgg_params is None and any(cfg.enerf.cas_config.train_img):
        print("WARNING: vgg16 weights missing (data/vgg16_features.npz) — "
              "perceptual loss disabled, training with MSE only")
    vgg_params = (jax.tree_util.tree_map(jnp.asarray, vgg_params)
                  if vgg_params is not None else None)

    train_step = make_train_step(cfg, mesh, (H_O, W_O), vgg_params=vgg_params,
                                 model_cls=model_cls,
                                 batch_stats_template=variables["batch_stats"])
    bn_refresh = make_bn_refresh_step(cfg, mesh, model_cls=model_cls)
    trainer = Trainer(cfg, train_step, mesh, bn_refresh=bn_refresh)
    eval_step = None

    for epoch in range(begin_epoch, cfg.train.epoch):
        train_loader.sampler.set_epoch(epoch)
        state = trainer.train_epoch(epoch, state, train_loader)

        if jax.process_index() == 0:
            if (epoch + 1) % cfg.save_ep == 0:
                save_model(cfg.trained_model_dir, state, epoch)
            elif (epoch + 1) % cfg.save_latest_ep == 0:
                save_model(cfg.trained_model_dir, state, epoch)
            if (epoch + 1) % cfg.eval_ep == 0:
                if eval_step is None:
                    eval_step = make_eval_step(cfg, model_cls=model_cls)
                val_loader = make_data_loader(cfg, "test")
                trainer.val(epoch, state, val_loader, eval_step,
                            Evaluator(cfg))
    return state


def test(cfg):
    """--test: evaluate the latest checkpoint (reference train_net.py:70-80)."""
    import run as run_cli

    run_cli.run_evaluate(cfg)


def _apply_platform_override():
    """``ENERF_PLATFORM=cpu|tpu|...``: select the jax backend before any
    backend init. An env hook (not a flag) because this environment's
    sitecustomize registers the TPU plugin at interpreter start, which
    makes ``JAX_PLATFORMS`` alone ineffective — tests and CI force CPU
    through this."""
    platform = os.environ.get("ENERF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main():
    args = parse_args()
    _apply_platform_override()
    if args.distributed:
        import jax

        jax.distributed.initialize()

    from enerf_tpu.config import make_cfg

    cfg = make_cfg(args.cfg_file, args.opts)
    from enerf_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    if cfg.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.test:
        test(cfg)
    else:
        train(cfg, args)


if __name__ == "__main__":
    main()
