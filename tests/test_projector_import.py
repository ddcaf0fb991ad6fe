"""Stage-2 checkpoint parity: torch SPADE generator/discriminator state_dicts
import into the flax models and reproduce eval-mode outputs (<=1e-3 rel err,
the BASELINE.md acceptance bar)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from emlight_tpu.nn.discriminator import MultiscaleDiscriminator
from emlight_tpu.nn.spade import SPADEGenerator
from emlight_tpu.train.torch_import import (
    import_discriminator_state_dict,
    import_generator_state_dict,
)
from tests.torch_spade_ref import TGenerator, TMultiscaleD, randomize

NGF = 8
CROP_SIZE = 64  # env maps 32x64


def test_generator_import_parity():
    tg = TGenerator(ngf=NGF, crop_size=CROP_SIZE)
    randomize(tg, seed=0)
    tg.eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    assert "head_0.conv_0.weight_orig" in sd
    assert "head_0.norm_0.param_free_norm.running_mean" in sd
    assert "netE.layer3.0.weight_u" in sd

    params, stats = import_generator_state_dict(sd, ngf=NGF)

    rng = np.random.default_rng(0)
    guide = rng.random((2, 32, 64, 3)).astype(np.float32)
    crop = rng.random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tg(
            torch.from_numpy(np.transpose(guide, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(crop, (0, 3, 1, 2))),
        ).numpy()

    g = SPADEGenerator(ngf=NGF, norm_type="syncbatch", crop_size=CROP_SIZE)
    out = jax.jit(lambda v, a, b: g.apply(v, a, b, train=False))(
        {"params": params, **stats}, jnp.asarray(guide), jnp.asarray(crop)
    )
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    rel = np.abs(out_nchw - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 1e-3, rel


def test_discriminator_import_parity():
    td = TMultiscaleD(ndf=NGF, num_d=2, n_layers=4, input_nc=6)
    randomize(td, seed=1)
    td.eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    assert "discriminator_0.model1.0.0.weight_orig" in sd

    params, stats = import_discriminator_state_dict(sd, num_d=2, n_layers=4)

    rng = np.random.default_rng(1)
    x = rng.random((2, 32, 64, 6)).astype(np.float32)
    with torch.no_grad():
        ref = td(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    d = MultiscaleDiscriminator(ndf=NGF, num_d=2, n_layers=4)
    out = jax.jit(lambda v, a: d.apply(v, a, train=False))(
        {"params": params, **stats}, jnp.asarray(x)
    )
    for i in range(2):
        for j in range(5):
            r = ref[i][j].numpy()
            o = np.transpose(np.asarray(out[i][j]), (0, 3, 1, 2))
            rel = np.abs(o - r).max() / max(np.abs(r).max(), 1e-6)
            assert rel < 1e-3, (i, j, rel)
