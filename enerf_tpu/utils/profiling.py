"""Profiling helpers (reference perf_timer, lib/utils/net_utils.py:31-70 —
a cuda-synchronizing stopwatch; here block_until_ready-synchronizing, plus
a jax.profiler trace context)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


def setup_compile_cache(path: str = ".jax_cache") -> None:
    """Point JAX's persistent compile cache at ``path``. On this
    environment's TPU backend a 512×640 program takes minutes to build
    the first time and ~seconds afterwards; every CLI entry point calls
    this so interactive/eval runs share the cache with bench.py."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class perf_timer:
    """Context manager + sequential ``logtime`` stopwatch. Synchronizes the
    device (block_until_ready on a token) before reading the clock so the
    numbers mean device time, like the reference's
    torch.cuda.synchronize()."""

    def __init__(self, msg: str = "{:.3f}", use_ms: bool = True,
                 logf: Optional[Callable] = print, disabled: bool = False,
                 sync_value=None):
        self.msg = msg
        self.use_ms = use_ms
        self.logf = logf or print
        self.disabled = disabled
        self.sync_value = sync_value
        self._t = time.perf_counter()

    def _sync(self):
        if self.sync_value is not None:
            import jax

            jax.block_until_ready(self.sync_value)

    def __enter__(self):
        if not self.disabled:
            self._sync()
            self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if not self.disabled:
            self.logtime(self.msg)
        return False

    def logtime(self, msg: Optional[str] = None, sync_value=None):
        if self.disabled:
            return
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        else:
            self._sync()
        now = time.perf_counter()
        dt = (now - self._t) * (1000.0 if self.use_ms else 1.0)
        if msg:
            try:
                self.logf(msg.format(dt))
            except (IndexError, KeyError):
                self.logf(f"{msg} {dt:.3f}")
        self._t = time.perf_counter()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — open the result with TensorBoard or
    Perfetto (the TPU answer to the reference's nvprof-style timing)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1,
            **kwargs) -> float:
    """Mean seconds per call, device-synchronized, warmup excluded
    (the reference's FPS methodology, run.py:62-76)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def frame_latency_fori(apply_fn: Callable, variables, batch, *,
                       perturb_key: str = "src_inps", n: int = 21,
                       repeats: int = 3) -> float:
    """Honest on-device seconds-per-frame for ``apply_fn(variables,
    batch)``.

    Methodology (same as bench.py; the reference's cuda-synchronized
    timing is run.py:62-76): some remote TPU backends (this
    environment's "axon") return from ``block_until_ready`` before the
    device finishes, so host-bracketed per-dispatch loops measure
    nothing. Instead N frames are chained inside ONE jitted
    ``lax.fori_loop`` whose scalar carry perturbs the next frame's
    inputs — every frame fully recomputed, fully serialized on device —
    and the per-frame time is the (N − 1)-frame wall-clock difference
    between an N-frame and a 1-frame invocation (the loop count is a
    traced scalar: one compiled program serves both).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from enerf_tpu.ops.pallas import compiler_options

    @functools.partial(jax.jit, compiler_options=compiler_options())
    def chain(k, v, b):
        def frame(i, s):
            bb = dict(b)
            bb[perturb_key] = b[perturb_key] + s
            out = apply_fn(v, bb)
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    acc = acc + jnp.sum(leaf.astype(jnp.float32) ** 2)
            return acc * 1e-38 + 1e-39

        return lax.fori_loop(0, k, frame, jnp.float32(0.0))

    _ = float(chain(jnp.int32(1), variables, batch))  # compile + settle
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(1), variables, batch))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(n), variables, batch))
        tn = time.perf_counter() - t0
        per = (tn - t1) / (n - 1)
        best = per if best is None else min(best, per)
    return best
