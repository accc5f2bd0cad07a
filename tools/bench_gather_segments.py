"""Microbench: segmented pinned gathers at the 512x640 render shape for
different segment counts K (patches _GATHER_MAX_SEGMENTS/_GATHER_PIN_LIMIT
to force K), fori-loop differenced on the real chip.

The question: the ~42 MB/view bf16 render table is split into ceil(42/17)
= 3 pinnable segments; if a ~21 MB segment still pins (the measured
no-pin point was 25.6 MB, the measured pin point 16.6 MB), K=2 saves a
third of the gather passes + cheaper merge selects.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from enerf_tpu.ops import sampling


def bench_k(K_target, H=512, W=640, S=3, n=2, C=11):
    # coherent raster coords like the real render stage
    P = H * W
    M = n * P
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    x0 = np.stack([xx.ravel()] * n).reshape(M)
    y0 = np.stack([yy.ravel()] * n).reshape(M)
    x = jnp.asarray(np.stack([x0 + 0.3 * (s + 1) for s in range(S)], 1))
    y = jnp.asarray(np.stack([y0 + 0.2 * (s + 1) for s in range(S)], 1))
    imgs = jnp.asarray(np.random.rand(S, H, W, C).astype(np.float32))

    table_mb = (H + 1) * (W + 1) * 4 * 16 * 2 / 2 ** 20
    # force the segment count: pin limit = table_bytes / K (rounded up)
    sampling._GATHER_PIN_LIMIT_BYTES = int(
        (H + 1) * (W + 1) * 4 * 16 * 2 / K_target) + 2 ** 16

    @jax.jit
    def run(k, xs, ys):
        def step(i, carry):
            acc, xs, ys = carry
            vs, w12, Cp = sampling.corner_gather_perview(
                imgs, xs, ys, "zeros", table_bf16=True)
            s = jnp.float32(0)
            for v in (vs if isinstance(vs, tuple) else [vs]):
                s += jnp.sum(v.astype(jnp.float32)[::4096, :8])
            return (acc + s * 1e-30,
                    xs + s * 1e-30, ys)
        return lax.fori_loop(0, k, step, (jnp.float32(0), xs, ys))[0]

    _ = float(run(jnp.int32(1), x, y))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(run(jnp.int32(1), x, y))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(run(jnp.int32(11), x, y))
        tn = time.perf_counter() - t0
        per = (tn - t1) / 10
        best = per if best is None else min(best, per)
    seg_mb = table_mb / K_target
    print(f"K={K_target}: {1e3 * best:7.3f} ms  "
          f"({seg_mb:.1f} MB/segment, {S} views x {M / 1e6:.2f}M rows)",
          flush=True)


if __name__ == "__main__":
    for K in (int(a) for a in (sys.argv[1:] or ["3", "2", "1"])):
        bench_k(K)
