"""PyTorch checkpoint import for the DenseNet regressor (parity harness).

Maps a reference `state_dict` (RegressionNetwork/DenseNet.py:68-157, saved by
train.py:147-167) onto the Flax module tree of nn/densenet.py:

- conv weights OIHW -> HWIO
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- Linear weight (out,in) -> kernel (in,out)
- the fc layer additionally permutes its input axis: torch flattens pooled
  features as C*H*W (NCHW view(B,-1), DenseNet.py:138), Flax as H*W*C —
  handled by an explicit index permutation so logits match bit-for-bit
  (up to f32 reassociation).

Accepts either a torch .pth path (torch.load on CPU) or an in-memory
{name: numpy array} dict, so the harness runs without torch installed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["import_densenet_state_dict", "load_torch_state_dict"]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv(sd, prefix):
    return {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _linear(sd, prefix):
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": sd[f"{prefix}.bias"]}


def import_densenet_state_dict(
    sd: dict[str, np.ndarray] | str,
    block_config=(16, 16, 16),
    pooled_hw: tuple[int, int] = (6, 8),
):
    """Returns (params, batch_stats) pytrees for nn.densenet.DenseNet.

    pooled_hw: spatial dims of the pooled feature map feeding fc (6x8 for the
    reference's 192x256 crops; the channel count is inferred).
    """
    if isinstance(sd, str):
        sd = load_torch_state_dict(sd)
    params: dict = {}
    stats: dict = {}

    def put(name, conv=None, bnp=None):
        if conv is not None:
            params[name] = conv
        if bnp is not None:
            params[name], stats[name] = bnp

    put("conv0", conv=_conv(sd, "features.conv0"))
    put("norm0", bnp=_bn(sd, "features.norm0"))
    for i, num_layers in enumerate(block_config, start=1):
        for j in range(1, num_layers + 1):
            tp = f"features.denseblock{i}.denselayer{j}"
            fl = f"denseblock{i}_denselayer{j}"
            p1, s1 = _bn(sd, f"{tp}.norm1")
            p2, s2 = _bn(sd, f"{tp}.norm2")
            params[fl] = {
                "norm1": p1,
                "conv1": _conv(sd, f"{tp}.conv1"),
                "norm2": p2,
                "conv2": _conv(sd, f"{tp}.conv2"),
            }
            stats[fl] = {"norm1": s1, "norm2": s2}
        pt, st = _bn(sd, f"features.transition{i}.norm")
        params[f"transition{i}"] = {"norm": pt, "conv": _conv(sd, f"features.transition{i}.conv")}
        stats[f"transition{i}"] = {"norm": st}
        put(f"last_norm{i}", bnp=_bn(sd, f"features.last_norm{i}"))

    # fc: permute the flattened input axis from torch's C,H,W to Flax's H,W,C
    fc = _linear(sd, "fc")
    in_dim = fc["kernel"].shape[0]
    ph, pw = pooled_hw
    c = in_dim // (ph * pw)
    assert c * ph * pw == in_dim, f"fc in_dim {in_dim} not divisible by {ph}x{pw}"
    # torch flat index: c*ph*pw + h*pw + w ; flax flat index: h*pw*c + w*c + c_idx
    torch_idx = np.arange(in_dim).reshape(c, ph, pw)
    flax_order = np.transpose(torch_idx, (1, 2, 0)).reshape(-1)  # flax position -> torch index
    fc["kernel"] = np.ascontiguousarray(fc["kernel"][flax_order])
    params["fc"] = fc

    for head in ("fc_dist", "fc_intensity", "fc_rgb_ratio", "fc_ambient"):
        params[head] = _linear(sd, head)

    import jax

    f32 = lambda t: jax.tree.map(lambda a: np.asarray(a, np.float32), t)
    return f32(params), f32(stats)
