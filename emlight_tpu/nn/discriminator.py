"""Multiscale PatchGAN discriminator built from SphereConvs.

Parity with GenProjector/models/networks/discriminator.py:16-125:
- NLayerDiscriminator: SphereConv(s2)+lrelu, then (n_layers_D-1) spectral+
  instance-normed SphereConvs (stride 2,2,1), final SphereConv->3ch; returns
  every intermediate activation for the feature-matching loss.
- MultiscaleDiscriminator: num_D pyramid copies; input downsampled by
  3x3/s2 count-exclude avg pool between scales (discriminator.py:48-51).
"""

from __future__ import annotations

import flax.linen as nn

from .layers import avg_pool_3x3s2, instance_norm
from .spade import SNSphereConv, _lrelu
from .sphere_conv import SphereConv2D

__all__ = ["NLayerDiscriminator", "MultiscaleDiscriminator"]


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        results = []
        h = _lrelu(SphereConv2D(self.ndf, stride=2, name="model0_conv")(x))
        results.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = SNSphereConv(nf, stride=stride, use_bias=False, name=f"model{n}_conv")(
                h, update_u=train
            )
            h = _lrelu(instance_norm(h))
            results.append(h)
        results.append(SphereConv2D(3, name=f"model{self.n_layers}_conv")(h))
        return results


class MultiscaleDiscriminator(nn.Module):
    ndf: int = 64
    num_d: int = 2
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = []
        for i in range(self.num_d):
            out.append(
                NLayerDiscriminator(self.ndf, self.n_layers, name=f"discriminator_{i}")(
                    x, train
                )
            )
            if i != self.num_d - 1:
                x = avg_pool_3x3s2(x)
        return out
