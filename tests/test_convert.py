"""Torch→JAX weight conversion parity: each module's converted weights
must reproduce torch outputs to ~1e-5 (fp32), including BN running stats
(the checkpoint-convertibility contract, SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from enerf_tpu.models.cost_reg import CostRegNet, MinCostRegNet
from enerf_tpu.models.feature_net import FeatureNet
from enerf_tpu.models.nerf_head import NeRFHead
from enerf_tpu.utils.convert import flax_to_torch, torch_to_flax
from tests.torch_ref import (
    TorchCostRegNet,
    TorchFeatureNet,
    TorchMinCostRegNet,
    TorchNeRF,
)


def randomize_bn_stats(module, rng):
    """Give BN layers nontrivial running stats so eval-mode parity is real."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                1.0 + rng.rand(*m.running_var.shape).astype(np.float32)))


def prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_feature_net_conversion(rng):
    tmodel = TorchFeatureNet().eval()
    with torch.no_grad():
        randomize_bn_stats(tmodel, rng)
    x = rng.randn(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        tf2, tf1, tf0 = tmodel(torch.from_numpy(x))

    jmodel = FeatureNet(train=False)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jmodel.init(jax.random.PRNGKey(0), x_j)
    variables = torch_to_flax(prefix_sd(tmodel, "feature_net"),
                              _wrap(variables, "feature_net"))
    variables = _unwrap(variables, "feature_net")
    f2, f1, f0 = jmodel.apply(variables, x_j)

    for ours, ref in [(f2, tf2), (f1, tf1), (f0, tf0)]:
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def _wrap(variables, name):
    """Nest each collection's tree under a module name so the converter
    sees reference-style prefixed paths."""
    return {coll: {name: tree} for coll, tree in variables.items()}


def _unwrap(variables, name):
    return {coll: tree[name] for coll, tree in variables.items()}


def test_min_cost_reg_conversion(rng):
    tmodel = TorchMinCostRegNet(32).eval()
    with torch.no_grad():
        randomize_bn_stats(tmodel, rng)
    x = rng.randn(1, 32, 8, 8, 12).astype(np.float32)  # (B,C,D,H,W)
    with torch.no_grad():
        tfeat, tdepth = tmodel(torch.from_numpy(x))

    jmodel = MinCostRegNet(train=False)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    variables = jmodel.init(jax.random.PRNGKey(0), x_j)
    variables = _unwrap(torch_to_flax(prefix_sd(tmodel, "cost_reg_0"),
                                      _wrap(variables, "cost_reg_0")), "cost_reg_0")
    feat, depth = jmodel.apply(variables, x_j)
    np.testing.assert_allclose(np.asarray(feat),
                               tfeat.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), tdepth.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_cost_reg_conversion(rng):
    tmodel = TorchCostRegNet(16).eval()
    with torch.no_grad():
        randomize_bn_stats(tmodel, rng)
    x = rng.randn(1, 16, 8, 8, 16).astype(np.float32)
    with torch.no_grad():
        tfeat, tdepth = tmodel(torch.from_numpy(x))

    jmodel = CostRegNet(train=False)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    variables = jmodel.init(jax.random.PRNGKey(0), x_j)
    variables = _unwrap(torch_to_flax(prefix_sd(tmodel, "cost_reg_1"),
                                      _wrap(variables, "cost_reg_1")), "cost_reg_1")
    feat, depth = jmodel.apply(variables, x_j)
    np.testing.assert_allclose(np.asarray(feat),
                               tfeat.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), tdepth.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_nerf_head_conversion(rng):
    feat_ch = 32 + 3
    tmodel = TorchNeRF(feat_ch=feat_ch).eval()
    vox = rng.randn(1, 100, 8).astype(np.float32)
    img = rng.randn(1, 100, 3, feat_ch + 4).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(vox), torch.from_numpy(img))

    jmodel = NeRFHead(feat_ch=feat_ch, viewdir_agg=True)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(vox), jnp.asarray(img))
    variables = _unwrap(torch_to_flax(prefix_sd(tmodel, "nerf_0"),
                                      _wrap(variables, "nerf_0")), "nerf_0")
    out = jmodel.apply(variables, jnp.asarray(vox), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_roundtrip_flax_torch(rng):
    """flax→torch→flax must be the identity (export path)."""
    jmodel = NeRFHead(feat_ch=35, viewdir_agg=True)
    vox = jnp.asarray(rng.randn(1, 10, 8).astype(np.float32))
    img = jnp.asarray(rng.randn(1, 10, 3, 39).astype(np.float32))
    variables = _wrap(jmodel.init(jax.random.PRNGKey(0), vox, img), "nerf_0")
    sd = flax_to_torch(variables)
    back = torch_to_flax(sd, variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
