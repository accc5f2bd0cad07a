"""flax.linen model zoo: FPN feature extractor, 3D cost-regularization
U-Nets, IBR NeRF heads, and the cascade ENeRF networks
(rebuilds of /root/reference/lib/networks/enerf/*)."""

from enerf_tpu.models.layers import ConvBnReLU, ConvBnReLU3D, ConvTransposeBn
from enerf_tpu.models.feature_net import FeatureNet, CNNRender
from enerf_tpu.models.cost_reg import CostRegNet, MinCostRegNet
from enerf_tpu.models.nerf_head import NeRFHead, Agg, MVSNeRFHead
from enerf_tpu.models.enerf import ENeRF
