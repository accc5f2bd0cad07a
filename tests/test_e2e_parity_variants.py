"""End-to-end numerical parity of the HUMAN and COMPOSITE variants
against the REAL reference networks (VERDICT round-2 item 5).

Same recipe as tests/test_e2e_parity.py: load the actual sources
/root/reference/lib/networks/enerf/network_human.py (mask gather/scatter,
:90-107) and network_composite.py (layered fg/bg, :77-146) through
tests/ref_loader.py, transfer random torch weights via
utils/convert.torch_to_flax, and assert the composed outputs agree —
including the mask-scatter (ours: static bbox-window render) and the
layered fg-crop + z-sort compositing (ours: static-window redesign).
"""

import numpy as np
import pytest
import torch

from enerf_tpu.config import CascadeConfig, Config, ENeRFConfig
from enerf_tpu.datasets.synthetic import (
    make_composite_batch,
    make_synthetic_batch,
)
from enerf_tpu.models.enerf_composite import ENeRFComposite
from enerf_tpu.models.enerf_human import ENeRFHuman
from enerf_tpu.utils.convert import torch_to_flax
from tests.ref_loader import load_reference_enerf, make_ref_cfg
from tests.test_convert import randomize_bn_stats

import jax
import jax.numpy as jnp


def _np_views(batch_np):
    """Number of real (unpadded) source views in the synthetic batch."""
    return int(batch_np["view_mask"][0].sum())


def _nchw(x):
    return torch.from_numpy(x.transpose(0, 1, 4, 2, 3)).contiguous()


@pytest.mark.slow
def test_human_network_parity_vs_reference():
    """Masked final-level rendering: the reference gathers
    rays[mask_at_box] and scatters rgb into zeros
    (network_human.py:90-107); ours renders a static bbox window.
    rgb must agree full-frame; depth agrees on the masked subset (the
    reference never scatters depth back)."""
    H, W = 64, 96
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        use_pallas=False, grid_rays=True,
        fused_render=False, fused_volume=False, gather_bf16=False,
        mask_window_hw=(32, 48),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8),
                                 render_if=(False, True))))
    ref_cfg = make_ref_cfg(cfg.enerf.cas_config,
                           white_bkgd=cfg.enerf.white_bkgd,
                           viewdir_agg=cfg.enerf.viewdir_agg)
    ref_pkg = load_reference_enerf(ref_cfg)
    import importlib
    ref_human = importlib.import_module("ref_enerf.network_human")

    torch.manual_seed(0)
    tnet = ref_human.Network().eval()
    randomize_bn_stats(tnet, np.random.RandomState(0))

    batch_np = make_synthetic_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")
    # 16-aligned mask bbox inside the (32, 48) window: rows 16:48,
    # cols 32:64
    mask = np.zeros((H, W), np.float32)
    mask[16:48, 32:64] = 1.0
    batch_np["mask_at_box"] = mask.reshape(1, -1)

    n = _np_views(batch_np)
    tb = {"src_inps": _nchw(batch_np["src_inps"][:, :n])}
    for k in ("src_exts", "src_ixts"):
        tb[k] = torch.from_numpy(batch_np[k][:, :n]).contiguous()
    for k in ("tar_ext", "tar_ixt", "near_far", "rays_0", "rays_1",
              "mask_at_box"):
        tb[k] = torch.from_numpy(batch_np[k])
    with torch.no_grad():
        ref_out = tnet(tb)

    model = ENeRFHuman(cfg=cfg.enerf, train_mode=False)
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = model.init(jax.random.PRNGKey(0), jb)
    variables = torch_to_flax(tnet.state_dict(), variables)
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, jb)

    # full-frame rgb (both scatter into zeros outside the mask)
    np.testing.assert_allclose(
        np.asarray(out["rgb_level1"]),
        ref_out["rgb_level1"].numpy().reshape(1, H * W, 3),
        rtol=1e-3, atol=3e-4, err_msg="rgb_level1")
    # depth: reference keeps the gathered subset (raster order);
    # ours is full-frame — compare inside the mask
    m = mask.reshape(-1) > 0
    ours_depth = np.asarray(out["depth_level1"])[0][m]
    np.testing.assert_allclose(
        ours_depth, ref_out["depth_level1"].numpy().reshape(-1),
        rtol=1e-3, atol=3e-3, err_msg="depth_level1 (masked subset)")
    # volume-stage outputs are full-frame in both
    for key, atol in (("depth_mvs", 3e-3), ("std", 3e-3)):
        ours = np.asarray(out[f"{key}_level1"])
        ref = ref_out[f"{key}_level1"].numpy()
        np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                                   rtol=1e-3, atol=atol,
                                   err_msg=f"{key}_level1")


@pytest.mark.slow
@pytest.mark.parametrize("num_fg_layers", [1, 2])
def test_composite_network_parity_vs_reference(num_fg_layers):
    """Layered fg/bg compositing: per-layer cropped cost volumes, padded
    depth logits, cropped rays, z-sorted joint alpha compositing
    (network_composite.py:77-146, utils.py:875-942). The bbox the torch
    net crops dynamically equals our static ``fg_bbox_hw`` window."""
    H, W = 64, 64
    L = num_fg_layers
    cfg = Config(enerf=ENeRFConfig(
        test_input_views=2, train_input_views=(2,),
        use_pallas=False, grid_rays=False,
        fused_render=False, fused_volume=False, gather_bf16=False,
        viewdir_agg=False, num_fg_layers=L,
        fg_bbox_hw=(32, 32), bg_volume_planes=(16, 4),
        cas_config=CascadeConfig(num=2, volume_planes=(16, 8),
                                 render_if=(True, True))))
    ref_cfg = make_ref_cfg(cfg.enerf.cas_config,
                           white_bkgd=cfg.enerf.white_bkgd,
                           viewdir_agg=False, num_fg_layers=L)
    ref_pkg = load_reference_enerf(ref_cfg)
    import importlib
    ref_comp = importlib.import_module("ref_enerf.network_composite")

    torch.manual_seed(0)
    tnet = ref_comp.Network().eval()
    randomize_bn_stats(tnet, np.random.RandomState(0))

    batch_np = make_composite_batch(cfg, H=H, W=W, batch_size=1)
    batch_np.pop("tar_img")

    n = _np_views(batch_np)
    tb = {"src_inps": _nchw(batch_np["src_inps"][:, :n]),
          "bg_src_inps": _nchw(batch_np["bg_src_inps"][:, :n])}
    for k in ("src_exts", "src_ixts"):
        tb[k] = torch.from_numpy(batch_np[k][:, :n]).contiguous()
    for k in ("tar_ext", "tar_ixt", "near_far", "rays_0", "rays_1"):
        tb[k] = torch.from_numpy(batch_np[k])
    tb["bbox"] = torch.from_numpy(batch_np["bbox"].astype(np.float32))
    with torch.no_grad():
        ref_out = tnet(tb)

    model = ENeRFComposite(cfg=cfg.enerf, train_mode=False)
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = model.init(jax.random.PRNGKey(0), jb)
    variables = torch_to_flax(tnet.state_dict(), variables)
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, jb)

    for lvl in (0, 1):
        for key, atol in (("rgb", 3e-4), ("depth", 3e-3)):
            ours = np.asarray(out[f"{key}_level{lvl}"])
            ref = ref_out[f"{key}_level{lvl}"].numpy()
            np.testing.assert_allclose(
                ours, ref.reshape(ours.shape), rtol=1e-3, atol=atol,
                err_msg=f"{key}_level{lvl} (L={L})")
        # the composited per-sample weights pin the z-sort + scatter
        ours_w = np.asarray(out[f"weights_level{lvl}"])
        ref_w = ref_out[f"weights_level{lvl}"].numpy()
        np.testing.assert_allclose(
            ours_w, ref_w.reshape(ours_w.shape), rtol=1e-3, atol=3e-4,
            err_msg=f"weights_level{lvl} (L={L})")
