"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL DDP stack (train_net.py:98-103, trainer.py:15-22,
samplers.py:103-159): one ``Mesh`` with a ``data`` axis, a GSPMD-jitted
train step (batch dim sharded over ``data``, params replicated, XLA
inserts the gradient all-reduces; global-batch BN = SyncBatchNorm), and
per-host data sharding. shard_map was measured ~10,000× slower here and
is not used (see train/step.py)."""

from enerf_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    local_batch_slice,
)
