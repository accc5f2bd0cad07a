"""Profiling helpers (reference perf_timer, lib/utils/net_utils.py:31-70 —
a cuda-synchronizing stopwatch; here block_until_ready-synchronizing, plus
a jax.profiler trace context)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


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
