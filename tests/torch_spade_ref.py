"""Torch oracle of the GenProjector SPADE stack with the reference's exact
module naming (fresh implementation of the architecture described in
GenProjector/models/networks/ — used only to validate checkpoint import and
flax graph parity)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import spectral_norm

from tests.test_sphere_conv import _torch_reference_grid


class TSphereConv(nn.Module):
    """grid_sample-based sphere conv (sphere_cnn.py:87-124 semantics)."""

    def __init__(self, cin, cout, stride=1, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, 3, 3) * 0.1)
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.stride = stride
        self._grids = {}

    def forward(self, x):
        key = tuple(x.shape[2:4])
        if key not in self._grids:
            self._grids[key] = _torch_reference_grid(x.shape[2], x.shape[3], self.stride)
        grid = self._grids[key].to(x.dtype).repeat(x.shape[0], 1, 1, 1)
        r = F.grid_sample(x, grid, mode="bilinear", align_corners=False)
        return F.conv2d(r, self.weight, self.bias, stride=3)


class TSPADE(nn.Module):
    def __init__(self, norm_nc, label_nc, nhidden=128):
        super().__init__()
        self.param_free_norm = nn.BatchNorm2d(norm_nc, affine=False)
        self.mlp_shared = nn.Sequential(TSphereConv(label_nc, nhidden), nn.ReLU())
        self.mlp_gamma = TSphereConv(nhidden, norm_nc)
        self.mlp_beta = TSphereConv(nhidden, norm_nc)

    def forward(self, x, segmap):
        normalized = self.param_free_norm(x)
        seg = F.interpolate(segmap, size=x.shape[2:], mode="nearest")
        a = self.mlp_shared(seg)
        return normalized * (1 + self.mlp_gamma(a)) + self.mlp_beta(a)


class TSPADEResnetBlock(nn.Module):
    def __init__(self, fin, fout, label_nc=3):
        super().__init__()
        fmiddle = min(fin, fout)
        self.learned_shortcut = fin != fout
        self.conv_0 = spectral_norm(TSphereConv(fin, fmiddle))
        self.conv_1 = spectral_norm(TSphereConv(fmiddle, fout))
        self.norm_0 = TSPADE(fin, label_nc)
        self.norm_1 = TSPADE(fmiddle, label_nc)
        if self.learned_shortcut:
            self.conv_s = spectral_norm(TSphereConv(fin, fout))
            self.norm_s = TSPADE(fin, label_nc)

    def forward(self, x, seg):
        xs = self.conv_s(self.norm_s(x, seg)) if self.learned_shortcut else x
        dx = self.conv_0(F.leaky_relu(self.norm_0(x, seg), 0.2))
        dx = self.conv_1(F.leaky_relu(self.norm_1(dx, seg), 0.2))
        return xs + dx


class TEncoder(nn.Module):
    def __init__(self, ndf):
        super().__init__()
        widths = [(3, ndf), (ndf, ndf * 2), (ndf * 2, ndf * 4),
                  (ndf * 4, ndf * 8), (ndf * 8, ndf * 8)]
        for i, (ci, co) in enumerate(widths, start=1):
            setattr(self, f"layer{i}", nn.Sequential(
                spectral_norm(nn.Conv2d(ci, co, 3, stride=2, padding=1, bias=False)),
                nn.InstanceNorm2d(co, affine=False),
            ))
        self.fc = nn.Linear(ndf * 8 * 4 * 4, 16 * ndf * 2 * 1)

    def forward(self, x):
        x = F.interpolate(x, size=(128, 128), mode="bilinear")
        x = self.layer1(x)
        for i in range(2, 6):
            x = getattr(self, f"layer{i}")(F.leaky_relu(x, 0.2))
        x = F.leaky_relu(x, 0.2)
        return self.fc(x.reshape(x.shape[0], -1))


class TGenerator(nn.Module):
    def __init__(self, ngf=64, crop_size=256):
        super().__init__()
        nf = ngf
        self.nf = nf
        self.sw = crop_size // 32
        self.sh = round(self.sw / 2.0)
        self.head_0 = TSPADEResnetBlock(16 * nf, 16 * nf)
        self.G_middle_0 = TSPADEResnetBlock(16 * nf, 16 * nf)
        self.G_middle_1 = TSPADEResnetBlock(16 * nf, 16 * nf)
        self.up_0 = TSPADEResnetBlock(16 * nf, 8 * nf)
        self.up_1 = TSPADEResnetBlock(8 * nf, 4 * nf)
        self.up_2 = TSPADEResnetBlock(4 * nf, 2 * nf)
        self.up_3 = TSPADEResnetBlock(2 * nf, 1 * nf)
        self.sphere_conv1 = TSphereConv(nf, 3)
        self.netE = TEncoder(nf)

    def forward(self, guide, crop):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        x = self.netE(crop).view(-1, 16 * self.nf, 1, 2)
        x = F.interpolate(x, size=(self.sh, self.sw), mode="nearest")
        x = self.head_0(x, guide)
        x = up(x)
        x = self.G_middle_0(x, guide)
        x = self.G_middle_1(x, guide)
        x = up(x)
        x = self.up_0(x, guide)
        x = up(x)
        x = self.up_1(x, guide)
        x = up(x)
        x = self.up_2(x, guide)
        x = up(x)
        x = self.up_3(x, guide)
        x = self.sphere_conv1(F.leaky_relu(x, 0.2))
        return (torch.tanh(x) + 1) * 25


class TNLayerD(nn.Module):
    def __init__(self, ndf=64, n_layers=4, input_nc=6):
        super().__init__()
        self.n_layers = n_layers
        self.model0 = nn.Sequential(TSphereConv(input_nc, ndf, stride=2),
                                    nn.LeakyReLU(0.2, False))
        nf = ndf
        for n in range(1, n_layers):
            prev, nf = nf, min(nf * 2, 512)
            stride = 1 if n == n_layers - 1 else 2
            setattr(self, f"model{n}", nn.Sequential(
                nn.Sequential(
                    spectral_norm(TSphereConv(prev, nf, stride=stride, bias=False)),
                    nn.InstanceNorm2d(nf, affine=False),
                ),
                nn.LeakyReLU(0.2, False),
            ))
        setattr(self, f"model{n_layers}", nn.Sequential(TSphereConv(nf, 3)))

    def forward(self, x):
        results = []
        h = x
        for n in range(self.n_layers + 1):
            h = getattr(self, f"model{n}")(h)
            results.append(h)
        return results


class TMultiscaleD(nn.Module):
    def __init__(self, ndf=64, num_d=2, n_layers=4, input_nc=6):
        super().__init__()
        for i in range(num_d):
            setattr(self, f"discriminator_{i}", TNLayerD(ndf, n_layers, input_nc))
        self.num_d = num_d

    def forward(self, x):
        out = []
        for i in range(self.num_d):
            out.append(getattr(self, f"discriminator_{i}")(x))
            if i != self.num_d - 1:
                x = F.avg_pool2d(x, 3, stride=2, padding=1, count_include_pad=False)
        return out


def randomize(model, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
    # settle spectral u/v with a few power iterations (training-mode forwards
    # would do this; converged u makes eval sigma deterministic)
    for m in model.modules():
        for hook in m._forward_pre_hooks.values():
            if hook.__class__.__name__ == "SpectralNorm":
                for _ in range(20):
                    hook.compute_weight(m, do_power_iteration=True)
