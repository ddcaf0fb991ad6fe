"""Checkpoint-import parity: a randomly-initialized torch DenseNet with the
reference's exact state_dict naming (RegressionNetwork/DenseNet.py:68-157)
must produce the same outputs through the Flax model after import
(BASELINE.md target: <=1e-3 rel err; we hold ~1e-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from emlight_tpu.nn.densenet import DenseNet
from emlight_tpu.train.torch_import import import_densenet_state_dict
from emlight_tpu.train.torch_ref import build_torch_densenet, randomize_densenet


def test_torch_checkpoint_import_parity():
    torch_model = build_torch_densenet()
    randomize_densenet(torch_model)
    torch_model.eval()

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    # the reference's expected key naming must be present
    assert "features.denseblock1.denselayer1.norm1.weight" in sd
    assert "features.transition2.conv.weight" in sd
    assert "features.last_norm3.running_var" in sd

    params, batch_stats = import_densenet_state_dict(sd)

    x = np.random.default_rng(0).random((2, 192, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.fwd(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    flax_model = DenseNet(n_anchors=96)
    out = jax.jit(lambda v, a: flax_model.apply(v, a, train=False))(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x)
    )
    for k in ("distribution", "intensity", "rgb_ratio", "ambient"):
        r = ref[k].numpy()
        o = np.asarray(out[k])
        denom = np.maximum(np.abs(r).max(), 1e-6)
        rel = np.abs(o - r).max() / denom
        assert rel < 1e-3, f"{k}: rel err {rel}"


def test_fold_bn_eval_exact():
    """fold_eval_variables + fold_bn=True must reproduce the plain eval
    forward exactly (BN folded into conv2 is a pure parameter transform)."""
    from emlight_tpu.nn.densenet import fold_eval_variables

    torch_model = build_torch_densenet(block_config=(3, 3))
    randomize_densenet(torch_model, seed=3)  # nontrivial running stats
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, batch_stats = import_densenet_state_dict(sd, block_config=(3, 3))

    # 2 blocks -> /16 total downsample; 96x128 keeps the default 6x8 pooled map
    x = jnp.asarray(
        np.random.default_rng(3).random((2, 96, 128, 3)).astype(np.float32)
    )
    base = DenseNet(n_anchors=96, block_config=(3, 3))
    ref = jax.jit(lambda v, a: base.apply(v, a, train=False))(
        {"params": params, "batch_stats": batch_stats}, x
    )

    fp, fs = fold_eval_variables(params, batch_stats)
    folded = DenseNet(n_anchors=96, block_config=(3, 3), fold_bn=True)
    out = jax.jit(lambda v, a: folded.apply(v, a, train=False))(
        {"params": fp, "batch_stats": fs}, x
    )
    for k in ref:
        r, o = np.asarray(ref[k]), np.asarray(out[k])
        rel = np.abs(o - r).max() / max(np.abs(r).max(), 1e-6)
        assert rel < 1e-4, (k, rel)
