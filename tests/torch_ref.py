"""Compact torch oracles implementing the reference module architectures
(lib/networks/enerf/{feature_net,cost_reg_net,nerf}.py specs) for weight
conversion / numerical parity tests. Built from the architecture spec in
SURVEY.md §2.2 — used only as numerical oracles."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def cbr2d(cin, cout, k, s, p):
    return nn.Sequential()  # placeholder (unused)


class CBR2d(nn.Module):
    def __init__(self, cin, cout, k=3, s=1, p=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class CBR3d(nn.Module):
    def __init__(self, cin, cout, k=3, s=1, p=1):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


def up_add(x, y):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True) + y


class TorchFeatureNet(nn.Module):
    """feature_net.py:4-36 spec."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Sequential(CBR2d(3, 8, 3, 1, 1), CBR2d(8, 8, 3, 1, 1))
        self.conv1 = nn.Sequential(CBR2d(8, 16, 5, 2, 2), CBR2d(16, 16, 3, 1, 1))
        self.conv2 = nn.Sequential(CBR2d(16, 32, 5, 2, 2), CBR2d(32, 32, 3, 1, 1))
        self.toplayer = nn.Conv2d(32, 32, 1)
        self.lat1 = nn.Conv2d(16, 32, 1)
        self.lat0 = nn.Conv2d(8, 32, 1)
        self.smooth1 = nn.Conv2d(32, 16, 3, padding=1)
        self.smooth0 = nn.Conv2d(32, 8, 3, padding=1)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        f2 = self.toplayer(c2)
        f1 = up_add(f2, self.lat1(c1))
        f0 = up_add(f1, self.lat0(c0))
        return f2, self.smooth1(f1), self.smooth0(f0)


def deconv_bn(cin, cout):
    return nn.Sequential(
        nn.ConvTranspose3d(cin, cout, 3, padding=1, output_padding=1,
                           stride=2, bias=False),
        nn.BatchNorm3d(cout))


class TorchMinCostRegNet(nn.Module):
    """cost_reg_net.py:51-86 spec."""

    def __init__(self, cin):
        super().__init__()
        self.conv0 = CBR3d(cin, 8)
        self.conv1 = CBR3d(8, 16, s=2)
        self.conv2 = CBR3d(16, 16)
        self.conv3 = CBR3d(16, 32, s=2)
        self.conv4 = CBR3d(32, 32)
        self.conv9 = deconv_bn(32, 16)
        self.conv11 = deconv_bn(16, 8)
        self.depth_conv = nn.Sequential(nn.Conv3d(8, 1, 3, padding=1, bias=False))
        self.feat_conv = nn.Sequential(nn.Conv3d(8, 8, 3, padding=1, bias=False))

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = c2 + self.conv9(c4)
        x = c0 + self.conv11(x)
        return self.feat_conv(x), self.depth_conv(x).squeeze(1)


class TorchCostRegNet(nn.Module):
    """cost_reg_net.py:4-48 spec."""

    def __init__(self, cin):
        super().__init__()
        self.conv0 = CBR3d(cin, 8)
        self.conv1 = CBR3d(8, 16, s=2)
        self.conv2 = CBR3d(16, 16)
        self.conv3 = CBR3d(16, 32, s=2)
        self.conv4 = CBR3d(32, 32)
        self.conv5 = CBR3d(32, 64, s=2)
        self.conv6 = CBR3d(64, 64)
        self.conv7 = deconv_bn(64, 32)
        self.conv9 = deconv_bn(32, 16)
        self.conv11 = deconv_bn(16, 8)
        self.depth_conv = nn.Sequential(nn.Conv3d(8, 1, 3, padding=1, bias=False))
        self.feat_conv = nn.Sequential(nn.Conv3d(8, 8, 3, padding=1, bias=False))

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = self.conv6(self.conv5(c4))
        x = c4 + self.conv7(x)
        x = c2 + self.conv9(x)
        x = c0 + self.conv11(x)
        return self.feat_conv(x), self.depth_conv(x).squeeze(1)


class TorchAgg(nn.Module):
    """nerf.py:47-89 spec (viewdir_agg=True)."""

    def __init__(self, feat_ch):
        super().__init__()
        self.feat_ch = feat_ch
        self.view_fc = nn.Sequential(nn.Linear(4, feat_ch), nn.ReLU())
        self.global_fc = nn.Sequential(nn.Linear(feat_ch * 3, 32), nn.ReLU())
        self.agg_w_fc = nn.Sequential(nn.Linear(32, 1), nn.ReLU())
        self.fc = nn.Sequential(nn.Linear(32, 16), nn.ReLU())

    def forward(self, x):
        B, S = len(x), x.shape[-2]
        vf = self.view_fc(x[..., -4:])
        ifr = x[..., :-4] + vf
        var = torch.var(ifr, dim=-2).view(B, -1, 1, self.feat_ch).repeat(1, 1, S, 1)
        avg = torch.mean(ifr, dim=-2).view(B, -1, 1, self.feat_ch).repeat(1, 1, S, 1)
        feat = torch.cat([ifr, var, avg], dim=-1)
        gf = self.global_fc(feat)
        w = F.softmax(self.agg_w_fc(gf), dim=-2)
        return self.fc((gf * w).sum(dim=-2))


class TorchNeRF(nn.Module):
    """nerf.py:6-44 spec."""

    def __init__(self, hid_n=64, feat_ch=16 + 3):
        super().__init__()
        self.agg = TorchAgg(feat_ch)
        self.lr0 = nn.Sequential(nn.Linear(8 + 16, hid_n), nn.ReLU())
        self.sigma = nn.Sequential(nn.Linear(hid_n, 1), nn.Softplus())
        self.color = nn.Sequential(
            nn.Linear(64 + 24 + feat_ch + 4, hid_n), nn.ReLU(),
            nn.Linear(hid_n, 1), nn.ReLU())

    def forward(self, vox_feat, x):
        B, N, S = x.shape[:-1]
        img_feat = self.agg(x)
        vif = torch.cat([vox_feat, img_feat], dim=-1)
        h = self.lr0(vif)
        sigma = self.sigma(h)
        h = torch.cat([h, vif], dim=-1)
        h = h.view(B, -1, 1, h.shape[-1]).repeat(1, 1, S, 1)
        h = torch.cat([h, x], dim=-1)
        w = F.softmax(self.color(h), dim=-2)
        color = torch.sum(x[..., -7:-4] * w, dim=-2)
        return torch.cat([color, sigma], dim=-1)
