"""Inference/eval CLI (reference run.py): 4 subcommands dispatched by
``--type``:

    python run.py --type dataset  --cfg_file ...   # data-loader smoke
    python run.py --type network  --cfg_file ...   # timed forward passes
    python run.py --type evaluate --cfg_file ...   # metrics + FPS
    python run.py --type visualize --cfg_file ...  # render video

FPS methodology (differs from the reference run.py:62-76 in mechanism,
matches it in meaning): the reference brackets each cuda-synchronized
forward; on remote TPU backends like this environment's "axon",
``block_until_ready`` returns before the device finishes, so
host-bracketed loops print garbage (the repo's round-1 CLI did exactly
that). The printed FPS is instead the honest on-device per-frame
latency: N forwards chained in one jitted fori_loop, N-vs-1 wall-clock
differencing (``enerf_tpu.utils.profiling.frame_latency_fori`` — same
methodology as bench.py, agreeing with it on the same workload).
"""

from __future__ import annotations

import argparse

import numpy as np

import tqdm


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--type", dest="run_type", default="evaluate",
                        choices=["dataset", "network", "evaluate", "visualize"])
    parser.add_argument("--cfg_file", default="configs/enerf/dtu_pretrain.yaml")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


def _device_batch(batch_np):
    from enerf_tpu.datasets.loader import device_batch

    return device_batch(batch_np)


def _load_eval_model(cfg):
    """Network + trained weights + jitted eval step."""
    import jax

    from enerf_tpu.factory import network_class
    from enerf_tpu.train.checkpoint import load_network
    from enerf_tpu.train.step import make_eval_step

    model_cls = network_class(cfg)
    eval_step = make_eval_step(cfg, model_cls=model_cls)

    def raw_apply(variables, batch):
        import jax.numpy as jnp

        model = model_cls(cfg=cfg.enerf, train_mode=False,
                          dtype=jnp.dtype(cfg.compute_dtype))
        return model.apply(variables, batch)

    def init_from(batch, concrete):
        import jax.numpy as jnp

        model = model_cls(cfg=cfg.enerf, train_mode=False,
                          dtype=jnp.dtype(cfg.compute_dtype))
        if not concrete:
            # checkpoint values replace these — skip the init compile and
            # produce a zero tree with the right structure
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), batch))
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return model.init(jax.random.PRNGKey(0), batch)

    def load(batch):
        variables = init_from(batch, concrete=False)
        try:
            variables, epoch = load_network(cfg.trained_model_dir, variables)
            print(f"loaded checkpoint epoch {epoch} from {cfg.trained_model_dir}")
        except FileNotFoundError:
            print(f"WARNING: no checkpoint under {cfg.trained_model_dir}; "
                  "using random init")
            variables = init_from(batch, concrete=True)
        return variables

    return eval_step, load, raw_apply


def _print_fps(raw_apply, variables, batch):
    """Honest on-device FPS on the given (representative) batch — see
    the module docstring for why host-bracketed timing is not used."""
    from enerf_tpu.utils.profiling import frame_latency_fori

    sec = frame_latency_fori(raw_apply, variables, batch)
    print(f"FPS: {1.0 / sec:.3f} (on-device per-frame latency, "
          f"fori-chained; {1e3 * sec:.2f} ms/frame)")


def run_dataset(cfg):
    """Iterate the test loader end-to-end (reference run.py:5-12)."""
    from enerf_tpu.datasets.loader import make_data_loader

    loader = make_data_loader(cfg, "test")
    for _ in tqdm.tqdm(loader):
        pass


def run_network(cfg):
    """Timed forward passes, no metrics (reference run.py:14-37)."""
    import jax

    from enerf_tpu.datasets.loader import make_data_loader

    loader = make_data_loader(cfg, "test")
    eval_step, load, raw_apply = _load_eval_model(cfg)
    variables = None
    batch = None
    for batch_np in tqdm.tqdm(loader):
        batch = _device_batch(batch_np)
        if variables is None:
            variables = load(batch)
        out = eval_step(variables["params"], variables["batch_stats"], batch)
        jax.block_until_ready(out)
    if batch is not None:
        _print_fps(raw_apply, variables, batch)


def run_evaluate(cfg):
    """Metrics + FPS (reference run.py:39-76)."""
    import jax

    from enerf_tpu.datasets.loader import make_data_loader
    from enerf_tpu.factory import make_evaluator

    loader = make_data_loader(cfg, "test")
    evaluator = make_evaluator(cfg)
    eval_step, load, raw_apply = _load_eval_model(cfg)
    variables = None
    batch = None
    for batch_np in tqdm.tqdm(loader):
        batch = _device_batch(batch_np)
        if variables is None:
            variables = load(batch)
        out = eval_step(variables["params"], variables["batch_stats"], batch)
        jax.block_until_ready(out)
        evaluator.evaluate({k: np.asarray(v) for k, v in out.items()}, batch_np)
    evaluator.summarize()
    if batch is not None:
        _print_fps(raw_apply, variables, batch)


def run_visualize(cfg):
    """Render a camera path to video (reference run.py:79-103)."""
    import jax

    from enerf_tpu.datasets.loader import make_data_loader
    from enerf_tpu.factory import make_visualizer

    loader = make_data_loader(cfg, "test")
    visualizer = make_visualizer(cfg)
    eval_step, load, _ = _load_eval_model(cfg)
    variables = None
    for batch_np in tqdm.tqdm(loader):
        batch = _device_batch(batch_np)
        if variables is None:
            variables = load(batch)
        out = eval_step(variables["params"], variables["batch_stats"], batch)
        jax.block_until_ready(out)
        visualizer.visualize({k: np.asarray(v) for k, v in out.items()},
                             batch_np)
    visualizer.summarize()


def main():
    args = parse_args()
    from train import _apply_platform_override

    _apply_platform_override()

    from enerf_tpu.config import make_cfg

    cfg = make_cfg(args.cfg_file, args.opts)
    from enerf_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    if cfg.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    globals()["run_" + args.run_type](cfg)


if __name__ == "__main__":
    main()
