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


class _TLayer(tnn.Module):
    """Dense layer with the reference's exact child names/order
    (norm1,relu,conv1,norm2,conv2 — no second relu)."""

    def __init__(self, cin, growth=12):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(4 * growth)
        self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(torch.relu(self.norm1(x)))
        h = self.conv2(self.norm2(h))
        return torch.cat([x, h], 1)


class _TTransition(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm = tnn.BatchNorm2d(cin)
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return tnn.functional.avg_pool2d(self.conv(torch.relu(self.norm(x))), 2)


def _build_torch_reference(block_config=(16, 16, 16), growth=12, init=24):
    feats = tnn.Module()
    feats.conv0 = tnn.Conv2d(3, init, 3, padding=1, bias=False)
    feats.norm0 = tnn.BatchNorm2d(init)
    c = init
    order = ["conv0", "norm0"]
    for i, n_layers in enumerate(block_config, start=1):
        block = tnn.Module()
        for j in range(1, n_layers + 1):
            setattr(block, f"denselayer{j}", _TLayer(c, growth))
            c += growth
        setattr(feats, f"denseblock{i}", block)
        cout = c // 2
        setattr(feats, f"transition{i}", _TTransition(c, cout))
        c = cout
        setattr(feats, f"last_norm{i}", tnn.BatchNorm2d(c))
        order += [f"denseblock{i}", f"transition{i}", f"last_norm{i}"]

    model = tnn.Module()
    model.features = feats
    model.fc = tnn.Linear(c * 6 * 8, 1024)
    model.fc_dist = tnn.Linear(1024, 96)
    model.fc_intensity = tnn.Linear(1024, 1)
    model.fc_rgb_ratio = tnn.Linear(1024, 3)
    model.fc_ambient = tnn.Linear(1024, 3)

    def fwd(x):
        h = torch.relu(feats.norm0(feats.conv0(x)))
        for i in range(1, len(block_config) + 1):
            block = getattr(feats, f"denseblock{i}")
            for j in range(1, len(list(block.children())) + 1):
                h = getattr(block, f"denselayer{j}")(h)
            h = getattr(feats, f"transition{i}")(h)
            h = getattr(feats, f"last_norm{i}")(h)
        h = torch.relu(h)
        h = tnn.functional.avg_pool2d(h, 4).reshape(h.shape[0], -1)
        h = model.fc(h)
        return {
            "distribution": model.fc_dist(h),
            "intensity": model.fc_intensity(h),
            "rgb_ratio": model.fc_rgb_ratio(h),
            "ambient": model.fc_ambient(h),
        }

    model.fwd = fwd
    return model


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_torch_checkpoint_import_parity():
    torch_model = _build_torch_reference()
    _randomize(torch_model)
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
