"""Pallas TPU kernels. See ``reductions.py`` for the measured rationale
of what is (and deliberately is not) a Pallas kernel in this framework."""

from enerf_tpu.ops.pallas.reductions import depth_regression_pallas

# Scoped-VMEM (kernel stack) limit the eval programs are compiled with.
# The 2026 libtpu stack-allocates the FULL output of a pallas_call in
# scoped vmem (measured: the (327680, 16) f32 fused-render output alone
# is 21 MB; the whole render call wants 73.64 MB at tile=2048) — the
# 16 MB default and the 64 MB limit round 1 shipped with both OOM at
# 512x640. v5e VMEM is 128 MB; 96 MB scoped leaves 32 MB for XLA's own
# fusion buffers, which is enough for every program in the repo. Keep
# the kernels' tile pickers (``fused_vmem_tile``) and the jit wrappers
# (``compiler_options``) agreeing on this number.
SCOPED_VMEM_KIB = 98304


def compiler_options(extra=None):
    """Compiler options for jitting programs that run the fused Pallas
    eval kernels (bench.py, run.py, tools/profile_render.py). TPU-only
    flags are dropped on other backends (the CPU compiler rejects
    unknown options with INVALID_ARGUMENT rather than ignoring them)."""
    import jax

    opts = {}
    if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm"):
        opts["xla_tpu_scoped_vmem_limit_kib"] = SCOPED_VMEM_KIB
    if extra:
        opts.update(extra)
    return opts


def fused_available() -> bool:
    """True when the fused Pallas eval kernels can lower: on a TPU
    backend, or anywhere under ``pltpu.force_tpu_interpret_mode`` (the
    test suite's fixture). On a plain CPU/GPU backend the model's fused
    dispatch gates off and the jnp paths run instead — the CLIs degrade
    gracefully instead of dying in pallas_call lowering."""
    import jax

    if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm"):
        return True
    try:
        from jax._src import config as _jcfg

        return (_jcfg.pallas_tpu_interpret_mode_context_manager.value
                is not None)
    except Exception:
        return False


def fused_vmem_tile(n_rows: int, *, out_lanes: int,
                    block_bytes_per_row: int,
                    interm_bytes_per_row: int = 20 * 1024,
                    budget_bytes: int = (SCOPED_VMEM_KIB - 4096) * 1024,
                    candidates=(2048, 1024, 512, 256, 128)) -> int:
    """Largest ray/row tile that (a) divides ``n_rows`` and (b) fits the
    scoped-VMEM budget. 0 = nothing fits — callers fall back to jnp.

    Budget model (calibrated against the real OOM report: 73.64 MB at
    512x640, tile=2048, f32 corner rows):
      full f32 output on the kernel stack        n_rows * out_lanes * 4
      double-buffered input blocks               2 * tile * block_bytes_per_row
      Mosaic kernel-body temporaries             tile * interm_bytes_per_row
    The temporaries dominate for the render kernel: every (T, c) f32
    temp pads its lane dim to a full VREG, so each of the ~35 live temps
    costs tile/8 VREGs (~18.7 KB/row measured; 20 KB/row budgeted).

    Candidates cap at 2048: the model under-counts multi-operand window
    buffering (each per-view input window is separately double-buffered
    at full 128-lane padding), so a 16384 tile that the model accepts
    for the cost-volume kernel OOMs scoped VMEM on the real chip
    (measured 2026-08-19); 2048 is also the measured-fastest render
    tile, so larger candidates buy nothing.
    """
    fixed = n_rows * out_lanes * 4
    for t in candidates:
        if n_rows % t:
            continue
        need = fixed + t * (2 * block_bytes_per_row + interm_bytes_per_row)
        if need <= budget_bytes:
            return t
    return 0


__all__ = ["depth_regression_pallas", "SCOPED_VMEM_KIB",
           "compiler_options", "fused_available", "fused_vmem_tile"]
