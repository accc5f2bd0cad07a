"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL DDP stack (train_net.py:98-103, trainer.py:15-22,
samplers.py:103-159): one ``Mesh`` with a ``data`` axis, shard_map'd train
step with psum gradient reduction, pmean-synced BatchNorm stats, and
per-host data sharding."""

from enerf_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    local_batch_slice,
)
