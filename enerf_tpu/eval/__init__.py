"""Evaluation harness: PSNR / skimage-compatible SSIM / LPIPS, depth
metrics, per-scene tables, FPS timing (rebuild of
/root/reference/lib/evaluators/* and run.py:39-76)."""

from enerf_tpu.eval.metrics import psnr, ssim, psnr_masked
from enerf_tpu.eval.evaluator import Evaluator
