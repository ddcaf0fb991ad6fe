"""One-command checkpoint-parity harness against reference PyTorch weights.

    python -m emlight_tpu.cli.verify_parity --torch_pth latest_net.pth
    python -m emlight_tpu.cli.verify_parity --torch_pth netG.pth --stage generator

Loads a reference checkpoint (RegressionNetwork/train.py:147-167 DenseNet
state_dicts, or GenProjector/util.py:173-179 netG/netD state_dicts), runs the
reference math through the in-package torch oracle (train/torch_ref.py), runs
the imported Flax model on the same inputs, and prints the max relative error
of every output (logits + reconstructed env maps for the regression stage).
Exits nonzero if any error exceeds --tol (default 1e-3, the BASELINE.md
acceptance bar) — the moment a real Laval `.pth` appears, this is the
acceptance number.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _detect_stage(sd: dict) -> str:
    if "fc_dist.weight" in sd:
        return "regression"
    if "head_0.conv_0.weight_orig" in sd:
        return "generator"
    if "discriminator_0.model0.0.weight" in sd:
        return "discriminator"
    raise SystemExit(
        "could not auto-detect checkpoint stage from keys "
        f"(got e.g. {sorted(sd)[:5]}); pass --stage explicitly"
    )


def _rel_err(out: np.ndarray, ref: np.ndarray) -> float:
    return float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))


def _load_sd(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # unwrap common nestings ({'state_dict': ...} / {'model': ...})
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def _verify_regression(sd, args) -> list[tuple[str, float]]:
    import jax
    import jax.numpy as jnp
    import torch

    from ..nn.densenet import DenseNet
    from ..representation import render_anchor_params
    from ..train.torch_import import import_densenet_state_dict
    from ..train.torch_ref import build_torch_densenet

    n_anchors = sd["fc_dist.weight"].shape[0]
    growth = sd["features.denseblock1.denselayer1.conv2.weight"].shape[0]
    init = sd["features.conv0.weight"].shape[0]
    n_blocks = sum(1 for k in sd if k.startswith("features.transition")
                   and k.endswith(".conv.weight"))
    block_config = tuple(
        sum(1 for k in sd
            if k.startswith(f"features.denseblock{i}.") and k.endswith(".conv1.weight"))
        for i in range(1, n_blocks + 1)
    )
    model = build_torch_densenet(
        block_config=block_config, growth=growth, init=init,
        n_anchors=n_anchors, pooled_hw=tuple(args.pooled_hw),
    )
    model.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    model.eval()
    print(f"regression checkpoint: anchors={n_anchors} growth={growth} "
          f"init={init} blocks={block_config}")

    ph, pw = args.pooled_hw
    # total downsample: one /2 per transition + the final avg_pool2d(4)
    ds = 4 * (2 ** len(block_config))
    h, w = ph * ds, pw * ds
    x = np.random.default_rng(args.seed).random((args.batch, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ref = {k: v.numpy() for k, v in model.fwd(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).items()}

    np_sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
             for k, v in sd.items()}
    params, batch_stats = import_densenet_state_dict(
        np_sd, block_config=block_config, pooled_hw=(ph, pw))
    flax_model = DenseNet(n_anchors=n_anchors, growth_rate=growth,
                          num_init_features=init, block_config=block_config)
    out = jax.jit(lambda v, a: flax_model.apply(v, a, train=False))(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x)
    )
    errs = [(k, _rel_err(np.asarray(out[k]), ref[k]))
            for k in ("distribution", "intensity", "rgb_ratio", "ambient")]

    # reconstructed env maps: render both predictions through the splat
    # rasterizer (RegressionNetwork/train.py:110-145 viz path) and compare
    def render(pred):
        dist = jax.nn.softmax(jnp.asarray(pred["distribution"]), axis=-1)
        return render_anchor_params(
            dist,
            jnp.asarray(pred["intensity"])[:, 0],
            jnp.asarray(pred["rgb_ratio"]),
            jnp.asarray(pred["ambient"]),
            n=n_anchors,
        )

    env_flax = np.asarray(render({k: np.asarray(v) for k, v in out.items()}))
    env_ref = np.asarray(render(ref))
    errs.append(("env_map", _rel_err(env_flax, env_ref)))
    return errs


def _verify_generator(sd, args) -> list[tuple[str, float]]:
    import jax
    import jax.numpy as jnp
    import torch

    from ..nn.spade import SPADEGenerator
    from ..train import torch_ref
    from ..train.torch_import import import_generator_state_dict

    ngf = sd["sphere_conv1.weight"].shape[1]
    tg = torch_ref.TGenerator(ngf=ngf, crop_size=args.crop_size)
    tg.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    tg.eval()
    print(f"generator checkpoint: ngf={ngf} crop_size={args.crop_size}")

    eh, ew = args.crop_size // 2, args.crop_size
    rng = np.random.default_rng(args.seed)
    guide = rng.random((args.batch, eh, ew, 3)).astype(np.float32)
    crop = rng.random((args.batch, args.crop_size // 2, args.crop_size // 2, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tg(
            torch.from_numpy(np.transpose(guide, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(crop, (0, 3, 1, 2))),
        ).numpy()

    np_sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
             for k, v in sd.items()}
    params, stats = import_generator_state_dict(np_sd, ngf=ngf)
    g = SPADEGenerator(ngf=ngf, norm_type="syncbatch", crop_size=args.crop_size)
    out = jax.jit(lambda v, a, b: g.apply(v, a, b, train=False))(
        {"params": params, **stats}, jnp.asarray(guide), jnp.asarray(crop)
    )
    return [("env_map", _rel_err(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref))]


def _verify_discriminator(sd, args) -> list[tuple[str, float]]:
    import jax
    import jax.numpy as jnp
    import torch

    from ..nn.discriminator import MultiscaleDiscriminator
    from ..train import torch_ref
    from ..train.torch_import import import_discriminator_state_dict

    ndf = sd["discriminator_0.model0.0.weight"].shape[0]
    num_d = len({k.split(".")[0] for k in sd if k.startswith("discriminator_")})
    n_layers = max(
        int(k.split(".")[1].removeprefix("model"))
        for k in sd if k.startswith("discriminator_0.model")
    )
    td = torch_ref.TMultiscaleD(ndf=ndf, num_d=num_d, n_layers=n_layers, input_nc=6)
    td.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    td.eval()
    print(f"discriminator checkpoint: ndf={ndf} num_d={num_d} n_layers={n_layers}")

    eh, ew = args.crop_size // 2, args.crop_size
    x = np.random.default_rng(args.seed).random((args.batch, eh, ew, 6)).astype(np.float32)
    with torch.no_grad():
        ref = td(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    np_sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
             for k, v in sd.items()}
    params, stats = import_discriminator_state_dict(np_sd, num_d=num_d, n_layers=n_layers)
    d = MultiscaleDiscriminator(ndf=ndf, num_d=num_d, n_layers=n_layers)
    out = jax.jit(lambda v, a: d.apply(v, a, train=False))(
        {"params": params, **stats}, jnp.asarray(x)
    )
    return [
        (f"D{i}_feat{j}", _rel_err(
            np.transpose(np.asarray(out[i][j]), (0, 3, 1, 2)), ref[i][j].numpy()))
        for i in range(num_d) for j in range(n_layers + 1)
    ]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--torch_pth", required=True, help="reference .pth checkpoint")
    ap.add_argument("--stage", default="auto",
                    choices=["auto", "regression", "generator", "discriminator"])
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--crop_size", type=int, default=256,
                    help="GenProjector crop_size opt (env maps crop_size/2 x crop_size)")
    ap.add_argument("--pooled_hw", type=int, nargs=2, default=(6, 8),
                    help="regression pooled feature map (6 8 for 192x256 crops)")
    args = ap.parse_args(argv)

    sd = _load_sd(args.torch_pth)
    stage = _detect_stage(sd) if args.stage == "auto" else args.stage
    errs = {
        "regression": _verify_regression,
        "generator": _verify_generator,
        "discriminator": _verify_discriminator,
    }[stage](sd, args)

    worst = max(e for _, e in errs)
    for name, e in errs:
        marker = "ok " if e <= args.tol else "FAIL"
        print(f"  [{marker}] {name:<14} max rel err {e:.3e}")
    print(f"{stage}: worst {worst:.3e} vs tol {args.tol:g} -> "
          + ("PASS" if worst <= args.tol else "FAIL"))
    return 0 if worst <= args.tol else 1


if __name__ == "__main__":
    sys.exit(main())
