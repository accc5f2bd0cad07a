"""Pallas TPU kernels. See ``reductions.py`` for the measured rationale
of what is (and deliberately is not) a Pallas kernel in this framework."""

from enerf_tpu.ops.pallas.reductions import depth_regression_pallas

__all__ = ["depth_regression_pallas"]
