"""Honest on-device train-step benchmark (DTU pretrain workload).

Same methodology as bench.py: N steps chained inside ONE jitted
``lax.fori_loop`` (the TrainState carry serializes every step — params
change each iteration, so each step does genuinely fresh work), timed by
differencing N=11 vs N=1 wall clock. Host-loop timings are meaningless
on this environment's remote TPU backend (see bench.py docstring).

Reference comparison: the fine-tune recipe runs 3k iters in ~11 min on
an RTX 3090 (README.md:93) = ~220 ms/iter at 512x640 rays
(dtu_pretrain.yaml: num_rays [4096, 32768] train sampling — here the
synthetic train batch mirrors the same per-level ray counts).

Usage: python tools/bench_train.py [H W]   (default 512 640)

Env knobs (the train mini-ladder in bench.py drives these):
  ENERF_TRAIN_CHUNK  train_render_chunk override (0 = no remat tiling)
  ENERF_TRAIN_DTYPE  compute dtype ("float32" | "bfloat16") — bf16 is
      the TPU analog of the reference's Ampere TF32 convs (torch 1.9
      runs conv/matmul in TF32 on the 3090 by default)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF
    from enerf_tpu.parallel.mesh import make_mesh, shard_batch
    from enerf_tpu.train.state import create_train_state
    from enerf_tpu.train.step import make_train_step, replicate_state

    H = int(sys.argv[1]) if len(sys.argv) > 2 else 512
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    chunk = int(os.environ.get("ENERF_TRAIN_CHUNK", "65536"))
    dtype = os.environ.get("ENERF_TRAIN_DTYPE", "float32")
    cfg = Config(compute_dtype=dtype, enerf=ENeRFConfig(
        test_input_views=3, train_input_views=(2, 3),
        train_render_chunk=chunk,
        grid_rays=True,  # dtu_pretrain.yaml sets it; enables the
                         # differentiable grid fast paths on train_img
                         # levels (models/enerf.py _render_stage)
        cas_config=CascadeConfig(num=2, volume_planes=(64, 8))))

    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=1,
                                    split="train")
    batch_np.pop("tar_img", None)
    mesh = make_mesh((1,), ("data",))
    batch = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()},
                        mesh)

    init_model = ENeRF(cfg=cfg.enerf, train_mode=True)
    small = make_synthetic_batch(cfg, H=64, W=96, split="train")
    small.pop("tar_img", None)
    variables = init_model.init(jax.random.PRNGKey(0),
                                {k: jnp.asarray(v) for k, v in small.items()})
    state = replicate_state(create_train_state(cfg, variables), mesh)

    inner = make_train_step(cfg, mesh, (H, W),
                            batch_stats_template=variables["batch_stats"])

    @jax.jit
    def run(n, state, batch):
        def body(i, st):
            st2, _ = inner(st, batch)  # nested jit inlines when traced
            return st2
        out = lax.fori_loop(0, n, body, state)
        # reduce over params so no step can be dead-code-eliminated
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out.params))

    def cache_entries():
        try:
            return len(os.listdir(".jax_cache"))
        except OSError:
            return 0

    t0 = time.time()
    entries0 = cache_entries()
    _ = float(run(jnp.int32(1), state, batch))
    print(f"[bench:train:chunk{chunk}_{dtype}] "
          f"first_call_s={time.time()-t0:.1f} "
          f"cache_entries_new={cache_entries() - entries0}",
          file=sys.stderr, flush=True)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(1), state, batch))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(11), state, batch))
        t11 = time.perf_counter() - t0
        per = (t11 - t1) / 10
        best = per if best is None else min(best, per)

    print(json.dumps({
        "metric": "train_step_ms_512x640" if (H, W) == (512, 640)
        else f"train_step_ms_{H}x{W}",
        "value": round(1e3 * best, 2),
        "unit": "ms/step",
        "vs_baseline": round(220.0 / (1e3 * best), 4),
        "rung": f"chunk{chunk}_{dtype}",
    }))


if __name__ == "__main__":
    main()
