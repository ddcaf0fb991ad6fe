"""VGG19 perceptual-loss parity vs a random-weight torch oracle.

The reference applies a pretrained-VGG19 perceptual term unconditionally at
x5 (GenProjector/models/pix2pix_model.py:120, slices at
models/networks/architecture.py:92-122, weights 1/32..1 at loss.py:107).
Pretrained weights can't be downloaded in this image, but the *code path* —
slice boundaries, pool placement, L1-with-detach loss — is validated here
end-to-end against a freshly built random-weight torch VGG19, and the term is
exercised inside both the single-device and the shard_mapped generator steps.
"""

import dataclasses
import functools

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from emlight_tpu.config import AnchorConfig, ProjectorConfig
from emlight_tpu.nn.vgg import (
    VGG19Features,
    VGG_SLICE_WEIGHTS,
    load_vgg19_params,
    vgg_perceptual_loss,
)

# torchvision vgg19.features layout: conv indices + channel widths
_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512, 512, 512, 512]
# slice boundaries at feature indices 2/7/12/21/30 (architecture.py:97-106)
_SLICE_ENDS = [2, 7, 12, 21, 30]


def _build_torch_vgg19_features(seed: int = 0) -> tnn.Sequential:
    """Random-weight replica of torchvision.models.vgg19().features."""
    torch.manual_seed(seed)
    layers, in_ch = [], 3
    for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU(inplace=False)]
            in_ch = v
    return tnn.Sequential(*layers)


def _export_npz(feats: tnn.Sequential, path: str) -> None:
    # same format as nn.vgg.export_torchvision_weights (OIHW -> HWIO)
    arrays = {}
    for i, tid in enumerate(_CONV_IDS):
        conv = feats[tid]
        arrays[f"conv{i}_kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"conv{i}_bias"] = conv.bias.detach().numpy()
    np.savez(path, **arrays)


def _torch_slices(feats, x_nchw):
    out, prev = [], 0
    h = x_nchw
    for end in _SLICE_ENDS:
        for i in range(prev, end):
            h = feats[i](h)
        out.append(h)
        prev = end
    return out


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    feats = _build_torch_vgg19_features()
    path = str(tmp_path_factory.mktemp("vgg") / "vgg19.npz")
    _export_npz(feats, path)
    variables = load_vgg19_params(path)
    assert variables is not None
    return feats, variables


def test_vgg_slices_match_torch(oracle):
    feats, variables = oracle
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 5, (2, 32, 64, 3)).astype(np.float32)  # HDR-ish range
    jax_slices = jax.jit(VGG19Features().apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        t_slices = _torch_slices(feats, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(jax_slices) == 5
    for i, (a, b) in enumerate(zip(jax_slices, t_slices)):
        np.testing.assert_allclose(
            np.asarray(a),
            b.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
            err_msg=f"slice {i} (relu{i+1}_1) mismatch",
        )


def test_vgg_perceptual_loss_matches_torch(oracle):
    feats, variables = oracle
    rng = np.random.default_rng(1)
    fake = rng.uniform(0, 5, (2, 32, 64, 3)).astype(np.float32)
    real = rng.uniform(0, 5, (2, 32, 64, 3)).astype(np.float32)

    apply = VGG19Features().apply
    got = float(
        jax.jit(lambda v, f, r: vgg_perceptual_loss(apply, v, f, r))(
            variables, jnp.asarray(fake), jnp.asarray(real)
        )
    )
    with torch.no_grad():
        tf = _torch_slices(feats, torch.from_numpy(fake.transpose(0, 3, 1, 2)))
        tr = _torch_slices(feats, torch.from_numpy(real.transpose(0, 3, 1, 2)))
        want = sum(
            w * torch.nn.functional.l1_loss(a, b)
            for w, a, b in zip(VGG_SLICE_WEIGHTS, tf, tr)
        ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_vgg_loss_gradient_skips_detached_real(oracle):
    _, variables = oracle
    apply = VGG19Features().apply
    fake = jnp.ones((1, 32, 64, 3)) * 2.0
    real = jnp.ones((1, 32, 64, 3))
    g_fake, g_real = jax.grad(
        lambda f, r: vgg_perceptual_loss(apply, variables, f, r), argnums=(0, 1)
    )(fake, real)
    assert float(jnp.abs(g_fake).max()) > 0
    np.testing.assert_array_equal(np.asarray(g_real), 0.0)  # real is detached


# --- the VGG term inside the actual train steps (single + parallel) ---

TINY = dataclasses.replace(
    ProjectorConfig(),
    crop_size=64, ngf=8, ndf=8, batch_size=8,
    anchors=AnchorConfig(n_anchors=16, env_h=32, env_w=64),
)


class _TinyVGG(fnn.Module):
    """5-slice stand-in with the VGG feature-list contract.

    The generator step treats vgg_apply as a black box returning 5 feature
    maps (train/projector.py); the REAL VGG19 math is oracle-tested above
    (slices + loss + gradient vs torch). Using a small stand-in here keeps
    the single-vs-parallel drift guard (the property under test) while
    dropping the 16-conv/512-channel compile that made this the slowest
    test in the suite — coverage of the two halves is unchanged, only the
    redundant composition (full VGG19 *inside* the 8-device step) goes.
    """

    @fnn.compact
    def __call__(self, x):
        feats = []
        for i in range(5):
            x = fnn.Conv(8, (3, 3), padding=1, name=f"conv{i}")(x)
            x = fnn.relu(x)
            feats.append(x)
            if i < 4:
                x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def test_generator_step_vgg_single_vs_parallel():
    import os
    import subprocess
    import sys

    if os.environ.get("EMLIGHT_VGG_SUBTEST") != "1":
        # Run the scenario in a FRESH interpreter. In a full-suite run (~120
        # prior tests of accumulated XLA CPU JIT state) jaxlib deterministically
        # segfaults in backend_compile_and_load while compiling this test's
        # programs; alone it passes quickly. Isolation keeps the coverage
        # identical and the suite green.
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             __file__ + "::test_generator_step_vgg_single_vs_parallel", "-q", "-x"],
            env={**os.environ, "EMLIGHT_VGG_SUBTEST": "1"},
            capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, (r.stdout[-3000:] or "") + (r.stderr[-2000:] or "")
        return

    from emlight_tpu.dist import (
        make_mesh, make_parallel_projector_steps, replicate, shard_batch,
    )
    from emlight_tpu.dist.mesh import DATA_AXIS
    from emlight_tpu.train import projector as P
    from emlight_tpu.train.data import synthetic_projector_batch

    net = _TinyVGG()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    vgg_apply = net.apply

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            8, n_anchors=16, crop_size=32, env_hw=(32, 64), seed=5
        ).items()
        if not isinstance(v, list)
    }

    state_s = P.create_state(jax.random.PRNGKey(3), TINY)
    ss, ms, _ = P.generator_step(state_s, batch, TINY, vgg_apply, variables)
    assert "VGG" in ms and np.isfinite(float(ms["VGG"])) and float(ms["VGG"]) > 0

    mesh = make_mesh(8)
    state_p = replicate(
        P.create_state(jax.random.PRNGKey(3), TINY, axis_name=DATA_AXIS), mesh
    )
    g_step, _ = make_parallel_projector_steps(TINY, mesh, vgg_apply, variables)
    sp, mp, _ = g_step(state_p, shard_batch(batch, mesh))

    # same params + same global batch -> identical loss terms (the VGG value
    # equality is the drift guard between the single-device and shard_mapped
    # generator losses) and identical cross-replica BN statistics
    np.testing.assert_allclose(float(mp["VGG"]), float(ms["VGG"]), rtol=1e-4)
    np.testing.assert_allclose(float(mp["loss_G"]), float(ms["loss_G"]), rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(sp.g_stats["batch_stats"]),
        jax.tree.leaves(ss.g_stats["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # NOTE: post-step params are deliberately not compared elementwise — after
    # ONE Adam step every update is lr*sign(grad), so elements whose gradient
    # is at fp-noise level (deep biases) flip sign between the two reduction
    # orders; the loss and BN-stat equalities above are the real invariants.
