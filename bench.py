"""Headline benchmark: render FPS at 512×640, 3 source views — the
reference's DTU evaluation workload (README.md:121-124: 21.78 FPS on an
RTX 3090; reference timing methodology run.py:62-76: synchronized
forward-only, first frame excluded).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology (IMPORTANT): on this environment's remote "axon" TPU
backend, ``block_until_ready`` returns before the device finishes, and
per-dispatch round-trip latency is large — wall-clock loops over single
dispatches measure neither compute nor throughput. The honest number is
on-device per-frame latency: run the forward N times inside ONE jitted
``lax.fori_loop`` whose carry (a scalar reduced from the frame's output)
perturbs the next frame's inputs — every frame fully recomputed, fully
serialized, zero host involvement — then difference N=21 vs N=1 wall
time. This matches the reference's cuda-synchronized per-frame timing.

Config ladder: the parent process tries the fastest configuration first
and falls back down the ladder if one fails (e.g. a kernel-lowering
regression) — each attempt in its OWN subprocess, both for isolation and
because timing two compiled 512×640 programs in one process degrades the
second (XLA allocator state).

gather_bf16 quantizes the feature gather tables to bf16 (lerp and all
downstream math stay f32): output agreement with the f32 tables is
~75 dB PSNR (max |Δrgb| ≈ 1e-3) — far below metric visibility at DTU's
~27.6 dB operating point.
"""

import functools
import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 21.78  # RTX 3090, reference README.md:124

# (name, fused kernels, gather_bf16) — fastest first, safest last
LADDER = [
    ("fused_bf16", True, True),
    ("fused_f32", True, False),
    ("plain_f32", False, False),
]


def run_config(fused: bool, gather_bf16: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax

    # persistent compile cache: the 512x640 program takes ~5-10 min to
    # build on the TPU backend the first time, ~1 min afterwards
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
    from enerf_tpu.datasets.synthetic import make_synthetic_batch
    from enerf_tpu.models.enerf import ENeRF

    cfg = Config(enerf=ENeRFConfig(
        test_input_views=3,
        train_input_views=(2, 3),
        use_pallas=False,     # the standalone depth-reg kernel: no e2e win
        grid_rays=True,       # eval rays are the full raster grid
        fused_render=fused,   # one-kernel render stage (ops/pallas/render.py)
        fused_volume=fused,   # one-kernel cost-volume variance stage
        gather_bf16=gather_bf16,
        cas_config=CascadeConfig(
            num=2, volume_planes=(48, 8), render_if=(False, True))))

    H, W = 512, 640
    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = ENeRF(cfg=cfg.enerf, train_mode=False)
    # params are shape-independent (fully convolutional + MLPs): init at a
    # small shape so the big compile budget goes to the benchmarked apply
    small_np = make_synthetic_batch(cfg, H=64, W=96, batch_size=1)
    small_np.pop("tar_img")
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in small_np.items()})

    # the 2026 libtpu places large Pallas-kernel outputs in scoped vmem
    # (stack) — the fused cost-volume output alone is ~25 MB, over the
    # 16 MB default limit; raise it (v5e VMEM is 128 MB)
    opts = {"xla_tpu_scoped_vmem_limit_kib": 65536}

    @functools.partial(jax.jit, compiler_options=opts)
    def run(n, v, b):
        def frame(i, s):
            bb = dict(b)
            # the carry perturbs the *images*, so every stage (feature
            # net included) re-executes every frame — nothing is
            # loop-invariant
            bb["src_inps"] = b["src_inps"] + s
            out = model.apply(v, bb)
            return jnp.sum(out["rgb_level1"] ** 2) * 1e-38 + 1e-39

        return lax.fori_loop(0, n, frame, jnp.float32(0.0))

    _ = float(run(jnp.int32(1), variables, batch))  # compile + settle
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(1), variables, batch))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(21), variables, batch))
        t21 = time.perf_counter() - t0
        per = (t21 - t1) / 20
        best = per if best is None else min(best, per)

    fps = 1.0 / best
    print(json.dumps({
        "metric": "render_fps_512x640",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


def main():
    mode = os.environ.get("ENERF_BENCH_MODE")
    if mode:
        name = dict((n, (f, g)) for n, f, g in LADDER)
        fused, gbf16 = name[mode]
        run_config(fused, gbf16)
        return

    for i, (name, _, _) in enumerate(LADDER):
        env = dict(os.environ, ENERF_BENCH_MODE=name)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            print(f"[bench] {name}: timeout, falling back", file=sys.stderr)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return
        print(f"[bench] {name}: failed (rc={r.returncode})\n"
              + r.stderr[-2000:], file=sys.stderr)
    raise SystemExit("all bench configurations failed")


if __name__ == "__main__":
    main()
