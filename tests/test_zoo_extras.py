"""Inventory-parity extras: SH basis (vs analytic values), trilinear
resize (vs torch F.interpolate), alt cost-reg net, ResUnet, plane/sphere
samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from enerf_tpu.models.cost_reg import MinCostRegNetTri
from enerf_tpu.models.res_unet import ResUnet
from enerf_tpu.ops.rays import (
    sample_points_along_sphere,
    sample_points_on_plane,
)
from enerf_tpu.ops.sampling import resize_trilinear
from enerf_tpu.ops.sh import eval_sh_bases


def test_sh_bases_orthonormality():
    """Monte-Carlo check: ∫ Y_i Y_j dΩ = δ_ij over the sphere."""
    rng = np.random.RandomState(0)
    v = rng.randn(200000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(eval_sh_bases(9, jnp.asarray(v, jnp.float32)))
    G = (Y.T @ Y) / len(v) * 4 * np.pi
    np.testing.assert_allclose(G, np.eye(9), atol=0.05)


def test_sh_dim_16_25_run():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert eval_sh_bases(16, d).shape == (1, 16)
    assert eval_sh_bases(25, d).shape == (1, 25)


def test_resize_trilinear_torch_parity():
    rng = np.random.RandomState(0)
    vol = rng.rand(2, 4, 6, 8, 3).astype(np.float32)
    out = np.asarray(resize_trilinear(jnp.asarray(vol), (8, 12, 16)))
    ref = F.interpolate(
        torch.from_numpy(vol).permute(0, 4, 1, 2, 3), scale_factor=2.0,
        mode="trilinear", align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_min_cost_reg_tri_shapes():
    m = MinCostRegNetTri(train=False)
    x = jnp.zeros((1, 8, 16, 16, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    feat, depth = m.apply(variables, x)
    assert feat.shape == (1, 8, 16, 16, 8)
    assert depth.shape == (1, 8, 16, 16)


def test_res_unet_shapes():
    m = ResUnet(train=False)
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 8, 8, 32)


def test_plane_sphere_samplers():
    rays = jnp.asarray(np.concatenate([
        np.zeros((1, 4, 3)),                        # origin
        np.tile([[0.3, 0.2, -1.0]], (1, 4, 1)),     # direction (down z)
        np.zeros((1, 4, 2))], -1).astype(np.float32))
    pts, z = sample_points_on_plane(rays, n_samples=8)
    assert pts.shape == (1, 4, 8, 3) and z.shape == (1, 4, 8)
    assert np.all(np.isfinite(np.asarray(pts)))

    rays_s = jnp.asarray(np.concatenate([
        np.zeros((1, 4, 3)),
        np.tile([[1.0, 0.1, 0.0]], (1, 4, 1)),
        np.zeros((1, 4, 2))], -1).astype(np.float32))
    pts, z = sample_points_along_sphere(rays_s, n_samples=8)
    assert pts.shape == (1, 4, 8, 3)
    assert np.all(np.isfinite(np.asarray(pts)))
