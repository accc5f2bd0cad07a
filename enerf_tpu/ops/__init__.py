"""Pure-function op library — the TPU rebuild of the reference's
lib/networks/enerf/utils.py (plane-sweep warp, cost volume, depth
regression, depth-guided sampling, IBR compositing).

All functions are jit-compatible: static shapes, no Python control flow on
traced values, channels-last layouts (NHWC / BDHWC).
"""

from enerf_tpu.ops.sampling import (
    bilinear_sample_2d,
    bilinear_sample_2d_multi,
    trilinear_sample_3d,
    trilinear_sample_3d_multi,
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear,
    resize_nearest,
)
from enerf_tpu.ops.camera import get_proj_mats, scale_intrinsics
from enerf_tpu.ops.warp import homo_warp, build_cost_volume
from enerf_tpu.ops.depth import (
    init_depth_values,
    cascade_depth_values,
    depth_regression,
)
from enerf_tpu.ops.rays import (
    build_rays,
    sample_along_depth,
    gather_ray_bounds,
)
from enerf_tpu.ops.ibr import get_vox_feat, get_img_feat, unpreprocess
from enerf_tpu.ops.composite import raw2outputs, raw2outputs_ngp, raw2outputs_layer
