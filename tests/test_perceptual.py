"""Numerical parity of the VGG-perceptual loss and LPIPS metric against
random-weight pure-torch oracles (VERDICT round-1 item 4: the flax ports
had zero numerical coverage because torchvision / lpips aren't installed;
random weights pin the MATH — block boundaries, normalization, lin layers
— today; the only remaining gap is the pretrained weight files).

The torch oracles rebuild torchvision's ``vgg16().features`` Sequential
layout by hand (Conv2d at indices 0,2,5,7,10,12,14,17,19,21,24,26,28 with
ReLU between and MaxPool2d at 4,9,16,23 — the fixed public layout) so the
state-dict keys are exactly what ``load_vgg16_params``/``load_lpips_params``
expect from a real torchvision export.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from enerf_tpu.eval import lpips_jax
from enerf_tpu.train import vgg as vgg_jax

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def make_vgg16_features(rng: np.random.RandomState) -> nn.Sequential:
    """torchvision.models.vgg16().features layout with random weights."""
    layers = []
    cin = 3
    for c in _VGG16_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(cin, c, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(
                    rng.randn(c, cin, 3, 3).astype(np.float32)
                    * np.sqrt(2.0 / (cin * 9))))
                conv.bias.copy_(torch.from_numpy(
                    rng.randn(c).astype(np.float32) * 0.05))
            layers += [conv, nn.ReLU(inplace=False)]
            cin = c
    return nn.Sequential(*layers).eval()


def features_npz_dict(seq: nn.Sequential) -> dict:
    return {f"features.{k}": v.detach().numpy()
            for k, v in seq.state_dict().items()}


def _to_params(raw: dict, loader_stages) -> dict:
    """Replicate the load_*_params npz decode on an in-memory dict."""
    params = {}
    for stage in loader_stages:
        for entry in stage:
            idx = entry[1] if isinstance(entry, tuple) else entry
            params[f"w{idx}"] = raw[f"features.{idx}.weight"].transpose(2, 3, 1, 0)
            params[f"b{idx}"] = raw[f"features.{idx}.bias"]
    return params


class TorchVGGPerceptual(nn.Module):
    """Reference lib/train/losses/vgg_perceptual_loss.py:4-44 semantics,
    with an injected features stack instead of torchvision download."""

    def __init__(self, feats: nn.Sequential):
        super().__init__()
        self.blocks = nn.ModuleList([feats[:4], feats[4:9],
                                     feats[9:16], feats[16:23]])
        self.register_buffer("mean",
                             torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer("std",
                             torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(self, input, target):
        input = (input - self.mean) / self.std
        target = (target - self.mean) / self.std
        loss, x, y = 0.0, input, target
        for block in self.blocks:
            x, y = block(x), block(y)
            loss = loss + F.l1_loss(x, y)
        return loss


def test_vgg_perceptual_matches_torch_oracle(rng):
    feats = make_vgg16_features(rng)
    oracle = TorchVGGPerceptual(feats)
    pred = rng.rand(2, 3, 32, 48).astype(np.float32)
    gt = rng.rand(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        ref = float(oracle(torch.from_numpy(pred), torch.from_numpy(gt)))

    params = _to_params(features_npz_dict(feats),
                        [[(0, i) for i in stage] for stage in
                         [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21)]])
    ours = float(vgg_jax.vgg_perceptual_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)), params))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TorchLPIPSVgg(nn.Module):
    """The lpips package's LPIPS(net='vgg', spatial=False) forward math
    (reference uses it as the metric, lib/evaluators/enerf.py:25):
    ScalingLayer → five vgg stages (relu1_2..relu5_3) → unit channel
    normalization (eps 1e-10 added to the norm) → squared diff → 1×1
    non-negative lin conv → spatial mean → sum over stages."""

    def __init__(self, feats: nn.Sequential, lins, rng):
        super().__init__()
        self.stages = nn.ModuleList([feats[:4], feats[4:9], feats[9:16],
                                     feats[16:23], feats[23:30]])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))
        self.lins = [torch.from_numpy(l) for l in lins]

    @staticmethod
    def _norm(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, x, y):
        x = (x - self.shift) / self.scale
        y = (y - self.shift) / self.scale
        total = 0.0
        for i, stage in enumerate(self.stages):
            x, y = stage(x), stage(y)
            d = (self._norm(x) - self._norm(y)) ** 2
            w = self.lins[i].view(1, -1, 1, 1)
            total = total + torch.sum(d * w, dim=1, keepdim=True).mean(
                dim=(2, 3), keepdim=True)
        return total


def test_lpips_matches_torch_oracle(rng):
    feats = make_vgg16_features(rng)
    chans = [64, 128, 256, 512, 512]
    lins = [np.abs(rng.randn(c).astype(np.float32)) * 0.1 for c in chans]
    oracle = TorchLPIPSVgg(feats, lins, rng)

    pred = (rng.rand(2, 3, 32, 48).astype(np.float32)) * 2 - 1
    gt = (rng.rand(2, 3, 32, 48).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        ref = oracle(torch.from_numpy(pred),
                     torch.from_numpy(gt)).numpy().reshape(2)

    raw = features_npz_dict(feats)
    for i, l in enumerate(lins):
        raw[f"lin{i}.model.1.weight"] = l.reshape(1, -1, 1, 1)
    params = {}
    for stage in lpips_jax._STAGES:
        for idx in stage:
            params[f"w{idx}"] = raw[f"features.{idx}.weight"].transpose(2, 3, 1, 0)
            params[f"b{idx}"] = raw[f"features.{idx}.bias"]
    for i in range(5):
        params[f"lin{i}"] = raw[f"lin{i}.model.1.weight"][0, :, 0, 0]

    ours = np.asarray(lpips_jax.lpips(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)), params))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
