"""Trace the TRAIN grad program on the real TPU and attribute device
time per HLO op — the grad-side sibling of tools/profile_render.py
(VERDICT round-3 ask #2: the train step has never been profiled).

Usage:
    python tools/profile_train.py [--hw 512 640] [--top 45]

Same methodology as profile_render.py: steps chained inside one jitted
``lax.fori_loop`` (the TrainState carry serializes steps), per-op
durations from a ``jax.profiler.trace`` of 3 chained steps matched back
to HLO op_name metadata. Workload matches tools/bench_train.py: DTU
pretrain shapes — volume_planes (64, 8), num_rays (4096, 32768),
3 padded source views.
"""

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_train")
    ap.add_argument("--hlo-out", default="/tmp/train_opt.hlo")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF
    from enerf_tpu.parallel.mesh import make_mesh, shard_batch
    from enerf_tpu.train.state import create_train_state
    from enerf_tpu.train.step import make_train_step, replicate_state

    H, W = args.hw
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
            st2, _ = inner(st, batch)
            return st2
        out = lax.fori_loop(0, n, body, state)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out.params))

    t0 = time.time()
    _ = float(run(jnp.int32(1), state, batch))
    print("compile_s:", round(time.time() - t0, 1), flush=True)
    txt = run.lower(jnp.int32(1), state, batch).compile().as_text()
    open(args.hlo_out, "w").write(txt)

    t0 = time.perf_counter()
    _ = float(run(jnp.int32(1), state, batch))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(jnp.int32(11), state, batch))
    t11 = time.perf_counter() - t0
    print(json.dumps({"ms_per_step": round(1e3 * (t11 - t1) / 10, 2)}),
          flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        _ = float(run(jnp.int32(args.steps), state, batch))

    latest = max(glob.glob(args.trace_dir + "/plugins/profile/*"),
                 key=os.path.getmtime)
    tr = glob.glob(latest + "/*.trace.json.gz")[0]
    with gzip.open(tr) as f:
        data = json.load(f)
    evs = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in evs:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in str(pids.get(e["pid"], ""))):
            dur[e["name"]] += e["dur"]
    hlo = open(args.hlo_out).read()
    meta = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", hlo):
        meta[m.group(1)] = m.group(2)
    rows = []
    small_ms = 0.0
    n_small = 0
    for name, d in dur.items():
        if name.startswith("jit_") or name.startswith("while"):
            continue
        ms = d / (args.steps * 1e3)
        if ms < 0.5:
            small_ms += ms
            n_small += 1
            continue
        rows.append((ms, name, meta.get(name, "?")))
    rows.sort(reverse=True)
    for ms, name, op in rows[:args.top]:
        print(f"{ms:8.2f} ms  {name:<32} {op[:110]}", flush=True)
    print("accounted:", round(sum(r[0] for r in rows), 1), "ms",
          f"+ {round(small_ms, 1)} ms in {n_small} ops under 0.5 ms",
          flush=True)


if __name__ == "__main__":
    main()
