"""enerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for generalizable
image-based-rendering NeRFs, with the full capability surface of the
reference ENeRF implementation (zju3dv/ENeRF, SIGGRAPH Asia 2022).

Subpackages
-----------
- ``enerf_tpu.config``    — frozen dataclass config tree (jit-static), YAML
  loading with ``parent_cfg`` inheritance and dotted CLI overrides
  (replaces the reference's yacs singleton, lib/config/config.py).
- ``enerf_tpu.ops``       — the pure-function op library (plane-sweep warp,
  cost-volume variance, depth regression, depth-guided ray sampling, IBR
  compositing) — the TPU rebuild of lib/networks/enerf/utils.py.
- ``enerf_tpu.models``    — flax.linen modules: FPN feature net, 3D cost
  regularization U-Nets, IBR NeRF head, cascade ENeRF network.
- ``enerf_tpu.datasets``  — host-side data pipeline (DTU, NeRF-synthetic,
  LLFF, ZJU-MoCap, ENeRF-Outdoor) emitting fixed-shape numpy batches.
- ``enerf_tpu.train``     — loss, optimizer/schedule, sharded train step,
  Orbax checkpointing, recorder.
- ``enerf_tpu.eval``      — PSNR/SSIM/LPIPS + depth metrics, evaluator, FPS
  harness.
- ``enerf_tpu.parallel``  — device mesh + sharding helpers (the DDP/NCCL
  replacement: shard_map over a ``data`` axis with psum/pmean collectives).
"""

__version__ = "0.1.0"
