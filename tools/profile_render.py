"""Trace the eval render program on the real TPU and attribute device
time per HLO op (the harness behind the PARITY.md optimization log).

Usage:
    python tools/profile_render.py [--fused 1] [--gather-bf16 0]
        [--dtype f32|bf16] [--hw 512 640] [--top 45]

Methodology notes (see bench.py): frames are chained inside one jitted
``lax.fori_loop`` so the device time is honest; per-op durations come
from a ``jax.profiler.trace`` of 5 chained frames, matched back to HLO
``op_name`` metadata from the compiled program. On this environment's
remote TPU backend, host-side dispatch timing measures nothing — only
on-device traces and N-vs-1 fori differencing are trustworthy.
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
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--v3", type=int, default=0,
                    help="fused_gather_blend: in-kernel segment merge "
                         "+ corner blend")
    ap.add_argument("--fast", type=int, default=0,
                    help="fused_fast_const: single-pass bf16 constant "
                         "matmuls + MXU cost-volume blend")
    ap.add_argument("--gather-bf16", type=int, default=0)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--human", type=int, default=0,
                    help="profile the ZJU-MoCap-shaped masked human "
                         "workload (bench.py run_human shapes) instead "
                         "of DTU")
    ap.add_argument("--composite", type=int, default=0,
                    help="profile the ENeRF-Outdoor-shaped composite "
                         "workload (bench.py run_composite shapes)")
    ap.add_argument("--window", type=int, nargs=2, default=None,
                    help="mask_window_hw for --human (default: the "
                         "headline bench.HUMAN_WINDOW_HW)")
    ap.add_argument("--hw", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_prof")
    ap.add_argument("--hlo-out", default="/tmp/prof_opt.hlo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    if args.composite:
        from enerf_tpu.datasets.synthetic import make_composite_batch
        from enerf_tpu.models.enerf_composite import ENeRFComposite

        H, W = args.hw
        cfg = Config(enerf=ENeRFConfig(
            test_input_views=3, train_input_views=(2, 3),
            viewdir_agg=False, num_fg_layers=1, fg_bbox_hw=(256, 192),
            bg_volume_planes=(16, 4),
            fused_render=bool(args.fused),
            fused_gather_blend=bool(args.v3),
            fused_volume=bool(args.fused),
            gather_bf16=bool(args.gather_bf16),
            fused_fast_const=bool(args.fast),
            cas_config=CascadeConfig(
                num=2, volume_planes=(32, 8), num_samples=(2, 1),
                render_if=(False, True))))
        b = make_composite_batch(cfg, H=H, W=W, batch_size=1)
        b.pop("tar_img")
        model_cls = ENeRFComposite
    elif args.human:
        import numpy as np

        # single source of truth for the human workload shape — the
        # profile must attribute the same program the headline measures
        from bench import HUMAN_MASK_FRAC, HUMAN_WINDOW_HW
        from enerf_tpu.models.enerf_human import ENeRFHuman

        window = tuple(args.window) if args.window else HUMAN_WINDOW_HW
        H = W = 512
        cfg = Config(enerf=ENeRFConfig(
            test_input_views=2, train_input_views=(2,), use_pallas=False,
            grid_rays=True, fused_render=bool(args.fused),
            fused_gather_blend=bool(args.v3),
            fused_volume=bool(args.fused),
            gather_bf16=bool(args.gather_bf16),
            fused_fast_const=bool(args.fast),
            mask_window_hw=window,
            cas_config=CascadeConfig(num=2, volume_planes=(32, 8),
                                     render_if=(False, True))))
        b = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
        b.pop("tar_img")
        mask = np.zeros((H, W), np.float32)
        mh, mw = int(H * HUMAN_MASK_FRAC[0]), int(W * HUMAN_MASK_FRAC[1])
        y0, x0 = (H - mh) // 2, (W - mw) // 2
        mask[y0:y0 + mh, x0:x0 + mw] = 1.0
        b["mask_at_box"] = mask.reshape(1, -1)
        model_cls = ENeRFHuman
    else:
        cfg = Config(enerf=ENeRFConfig(
            test_input_views=3, train_input_views=(2, 3), use_pallas=False,
            grid_rays=True, fused_render=bool(args.fused),
            fused_gather_blend=bool(args.v3),
            fused_volume=bool(args.fused),
            gather_bf16=bool(args.gather_bf16),
            fused_fast_const=bool(args.fast),
            cas_config=CascadeConfig(num=2, volume_planes=(48, 8),
                                     render_if=(False, True))))
        H, W = args.hw
        b = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
        b.pop("tar_img")
        model_cls = ENeRF
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    model = model_cls(cfg=cfg.enerf, train_mode=False, dtype=dt)
    if args.composite:
        # init shape must fit the static fg window at volume scale
        sm = make_composite_batch(cfg, H=256, W=256, batch_size=1)
    else:
        sm = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    sm.pop("tar_img")
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in sm.items()})

    # see bench.py: fused-kernel outputs land in scoped vmem on the 2026
    # libtpu; the default 16 MB stack limit OOMs at the 512x640 shape
    from enerf_tpu.ops.pallas import compiler_options

    @functools.partial(jax.jit, compiler_options=compiler_options())
    def run(n, v, bb):
        def frame(i, s):
            d = dict(bb)
            d["src_inps"] = bb["src_inps"] + s
            out = model.apply(v, d)
            return (jnp.sum(out["rgb_level1"].astype(jnp.float32) ** 2)
                    * 1e-38 + 1e-39)
        return lax.fori_loop(0, n, frame, jnp.float32(0.0))

    t0 = time.time()
    _ = float(run(jnp.int32(1), variables, batch))
    print("compile_s:", round(time.time() - t0, 1), flush=True)
    txt = run.lower(jnp.int32(1), variables, batch).compile().as_text()
    open(args.hlo_out, "w").write(txt)

    t0 = time.perf_counter()
    _ = float(run(jnp.int32(1), variables, batch))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(jnp.int32(21), variables, batch))
    t21 = time.perf_counter() - t0
    print(json.dumps({"ms_per_frame": round(1e3 * (t21 - t1) / 20, 2)}),
          flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        _ = float(run(jnp.int32(5), variables, batch))

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
    small = 0.0
    n_small = 0
    for name, d in dur.items():
        if name.startswith("jit_") or name.startswith("while"):
            continue
        ms = d / 5e3  # 5 traced frames, µs → ms
        if ms < 0.3:
            small += ms
            n_small += 1
            continue
        rows.append((ms, name, meta.get(name, "?")))
    rows.sort(reverse=True)
    for ms, name, op in rows[:args.top]:
        print(f"{ms:8.2f} ms  {name:<32} {op[:100]}", flush=True)
    print("accounted:", round(sum(r[0] for r in rows), 1), "ms",
          f"+ {round(small, 1)} ms in {n_small} ops under 0.3 ms",
          flush=True)


if __name__ == "__main__":
    main()
