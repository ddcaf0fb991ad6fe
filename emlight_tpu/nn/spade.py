"""SPADE generator stack (EMLight stage 2 / GenProjector) in Flax.

Parity targets in /root/reference/GenProjector/models/networks/:
- SPADE conditional norm:      normalization.py:68-115 (SphereConv γ/β MLPs)
- SPADEResnetBlock:            architecture.py:22-69 (spectral-norm SphereConvs)
- SPADEGenerator + ConvEncoder: generator.py:17-126
- norm config: norm_G='spectralspadesyncbatch3x3' (generator.py:20),
  norm_E='spectralinstance' (options/base_options.py:29)

The guide ("segmap") is the rasterized anchor environment map; SyncBN becomes
a plain Flax BatchNorm with an optional axis_name (pmean over the data mesh),
which subsumes the reference's 738-line sync_batchnorm package.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import instance_norm, resize_bilinear, resize_nearest, spectral_normalize
from .sphere_conv import (
    SphereConv2D,
    _count_flops,
    apply_output_hook,
    compute_dtype_of,
    sphere_conv_apply,
)

__all__ = ["SPADE", "SPADEResnetBlock", "ConvEncoder", "SPADEGenerator", "SNConv", "SNSphereConv"]


class SNConv(nn.Module):
    """Standard conv with torch-style spectral norm on the kernel.

    Bias is dropped when followed by a norm (get_nonspade_norm_layer removes
    it, normalization.py:35-39).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, update_u: bool = False):
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(), (k, k, cin, self.features)
        )
        kernel = spectral_normalize(self, kernel, update_u)
        pad = (k - 1) // 2
        _count_flops(
            2 * x.shape[0] * ((x.shape[1] + self.stride - 1) // self.stride)
            * ((x.shape[2] + self.stride - 1) // self.stride)
            * k * k * cin * self.features
        )
        dt = compute_dtype_of(x)
        # conv in dt, output cast back to f32: the astype's transpose casts the
        # cotangent to dt, keeping the conv VJP dtypes consistent (lax.conv is
        # strict about matching operand dtypes, unlike einsum)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return apply_output_hook(y)


class SNSphereConv(nn.Module):
    """SphereConv2D with spectral norm (architecture.py:36-40 wraps the
    sphere convs of every SPADE resnet block)."""

    features: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_u: bool = False):
        cin = x.shape[-1]
        fan_in = 9 * cin
        bound = float(np.sqrt(6.0 / (6 * fan_in)))
        kernel = self.param(
            "kernel",
            lambda key: jax.random.uniform(key, (3, 3, cin, self.features),
                                           minval=-bound, maxval=bound),
        )
        kernel = spectral_normalize(self, kernel, update_u)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return sphere_conv_apply(x, kernel, bias, self.stride)


class SPADE(nn.Module):
    """Spatially-adaptive denormalization conditioned on the env-map guide."""

    norm_type: str = "syncbatch"  # syncbatch | batch | instance
    nhidden: int = 128            # normalization.py:88 (hardcoded upstream too)
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, segmap, train: bool = False, shared_a=None):
        if self.norm_type == "instance":
            normalized = instance_norm(x)
        else:
            axis = self.axis_name if self.norm_type == "syncbatch" else None
            normalized = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                use_scale=False, use_bias=False, axis_name=axis,
                name="param_free_norm",
            )(x)
        if shared_a is None:
            # standalone path; SPADEResnetBlock passes this norm's slice of
            # its block-level fused mlp_shared conv instead (same math)
            seg = resize_nearest(segmap, x.shape[1:3])
            shared_a = nn.relu(SphereConv2D(self.nhidden, name="mlp_shared")(seg))
        # gamma and beta convs share the input: ONE conv with 2C outputs is
        # bit-exact (each output channel is independent; same kaiming fan_in)
        # and halves the dominant cost — the sphere-sampling staging, which
        # the profile puts at 42% of the G step when done twice per norm.
        # torch_import._spade concatenates the reference's two kernels.
        gamma_beta = SphereConv2D(2 * x.shape[-1], name="mlp_gammabeta")(shared_a)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return normalized * (1 + gamma) + beta


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class SPADEResnetBlock(nn.Module):
    fout: int
    norm_type: str = "syncbatch"
    axis_name: str | None = None
    nhidden: int = 128

    @nn.compact
    def __call__(self, x, seg, train: bool = False):
        fin = x.shape[-1]
        fmiddle = min(fin, self.fout)
        learned_shortcut = fin != self.fout
        spade = lambda name: SPADE(
            self.norm_type, nhidden=self.nhidden, axis_name=self.axis_name, name=name
        )

        # Every norm in the block resizes the SAME guide to the SAME spatial
        # dims (x and dx share them; stride-1 convs throughout) and runs its
        # own cin=3 mlp_shared sphere conv on it. ONE conv with
        # n_norms*nhidden outputs is bit-exact (independent output channels,
        # and the kaiming init bound depends only on cin) and does the
        # sphere-sampling staging once instead of 2-3x — at high resolution
        # the staging, not the matmul, is the cost (the Pallas kernel pads
        # cin=3 to the 128-lane tile). torch_import._block concatenates the
        # reference's per-norm mlp_shared kernels in (norm_0, norm_1, norm_s)
        # order.
        n_norms = 3 if learned_shortcut else 2
        seg_r = resize_nearest(seg, x.shape[1:3])
        a_all = nn.relu(SphereConv2D(n_norms * self.nhidden, name="mlp_shared")(seg_r))
        a = jnp.split(a_all, n_norms, axis=-1)  # norm_0, norm_1[, norm_s]

        if learned_shortcut:
            x_s = SNSphereConv(self.fout, name="conv_s")(
                spade("norm_s")(x, seg, train, shared_a=a[2]), update_u=train
            )
        else:
            x_s = x
        dx = SNSphereConv(fmiddle, name="conv_0")(
            _lrelu(spade("norm_0")(x, seg, train, shared_a=a[0])), update_u=train
        )
        dx = SNSphereConv(self.fout, name="conv_1")(
            _lrelu(spade("norm_1")(dx, seg, train, shared_a=a[1])), update_u=train
        )
        return x_s + dx


class ConvEncoder(nn.Module):
    """Crop image -> latent z (generator.py:90-126); norm_E='spectralinstance'.

    vae=False (the EMLight fork's behavior: its encoder.py comments fc_var
    out and returns a deterministic z) -> one `fc` head. vae=True restores
    upstream SPADE's --use_vae surface (SPADE encoder.py fc_mu/fc_var):
    returns (mu, logvar) at the same latent width so the generator's
    z.view(16nf, 1, 2) path is unchanged; losses/gan.kld_loss consumes them.
    """

    ndf: int = 64
    vae: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = resize_bilinear(x, (128, 128))
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, self.ndf * 8)
        for i, wdt in enumerate(widths, start=1):
            if i > 1:
                x = _lrelu(x)
            x = SNConv(wdt, 3, 2, name=f"layer{i}")(x, update_u=train)
            x = instance_norm(x)
        x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)
        zdim = 16 * self.ndf * 2 * 1
        if self.vae:
            return (nn.Dense(zdim, name="fc_mu")(x),
                    nn.Dense(zdim, name="fc_var")(x))
        return nn.Dense(zdim, name="fc")(x)


class SPADEGenerator(nn.Module):
    """guide (B,128,256,3) + crop (B,H,W,3) -> HDR env map (B,128,256,3).

    Forward graph of generator.py:65-88: encoder latent reshaped to
    (16nf, 1, 2), nearest-resized to (sh, sw)=(4, 8), 7 SPADE blocks with 5
    nearest 2x upsamples, SphereConv head, (tanh+1)*25 HDR range.
    """

    ngf: int = 64
    norm_type: str = "syncbatch"
    num_upsampling_layers: str = "normal"
    crop_size: int = 256
    aspect_ratio: float = 2.0
    axis_name: str | None = None
    # upstream SPADE's --use_vae (dead code in the EMLight fork, kept for
    # completeness): reparameterized latent + (mu, logvar) sown for the KLD
    # loss. Training samples eps via the 'vae' rng collection; eval uses mu.
    use_vae: bool = False

    @nn.compact
    def __call__(self, guide, crop, train: bool = False):
        nf = self.ngf
        num_up = {"normal": 5, "more": 6, "most": 7}[self.num_upsampling_layers]
        sw = self.crop_size // (2 ** num_up)
        sh = round(sw / self.aspect_ratio)

        if self.use_vae:
            mu, logvar = ConvEncoder(ndf=nf, vae=True, name="netE")(crop, train)
            self.sow("vae_stats", "mu", mu)
            self.sow("vae_stats", "logvar", logvar)
            if train:
                eps = jax.random.normal(self.make_rng("vae"), mu.shape, mu.dtype)
                z = mu + eps * jnp.exp(0.5 * logvar)  # SPADE reparameterize
            else:
                z = mu
        else:
            z = ConvEncoder(ndf=nf, name="netE")(crop, train)
        # torch does z.view(-1, 16nf, 1, 2) in NCHW (generator.py:69); match
        # that element order, then go NHWC
        x = jnp.transpose(z.reshape(-1, 16 * nf, 1, 2), (0, 2, 3, 1))
        x = resize_nearest(x, (sh, sw))

        block = lambda fout, name: SPADEResnetBlock(
            fout, self.norm_type, axis_name=self.axis_name, name=name
        )
        up = lambda t: resize_nearest(t, (t.shape[1] * 2, t.shape[2] * 2))

        x = block(16 * nf, "head_0")(x, guide, train)
        x = up(x)
        x = block(16 * nf, "G_middle_0")(x, guide, train)
        if self.num_upsampling_layers in ("more", "most"):
            x = up(x)
        x = block(16 * nf, "G_middle_1")(x, guide, train)
        x = up(x)
        x = block(8 * nf, "up_0")(x, guide, train)
        x = up(x)
        x = block(4 * nf, "up_1")(x, guide, train)
        x = up(x)
        x = block(2 * nf, "up_2")(x, guide, train)
        x = up(x)
        x = block(1 * nf, "up_3")(x, guide, train)
        if self.num_upsampling_layers == "most":
            x = up(x)
            x = block(nf // 2, "up_4")(x, guide, train)

        x = SphereConv2D(3, name="sphere_conv1")(_lrelu(x))
        return (jnp.tanh(x) + 1.0) * 25.0
