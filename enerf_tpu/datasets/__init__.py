"""Host-side data pipeline: numpy dataset loaders emitting fixed-shape
batches (padded source views + view_mask, per-level ray grids).

Rebuilds of /root/reference/lib/datasets/* — DTU, NeRF-synthetic, LLFF,
ZJU-MoCap, ENeRF-Outdoor — plus a synthetic procedural scene used by the
test-suite and benchmarks (the reference has no such fixture)."""

from enerf_tpu.datasets.ray_utils import build_rays_host, sample_patch
from enerf_tpu.datasets.synthetic import make_synthetic_batch, SyntheticDataset
