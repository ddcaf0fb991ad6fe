"""verify_parity CLI: synthetic reference-format .pth checkpoints for all
three stages must pass the 1e-3 acceptance bar end-to-end (torch.save ->
auto-detect -> torch oracle -> flax import -> rel-err report)."""

import numpy as np
import pytest
import torch

from emlight_tpu.cli.verify_parity import main
from emlight_tpu.train.torch_ref import (
    TGenerator,
    TMultiscaleD,
    build_torch_densenet,
    randomize,
    randomize_densenet,
)


def test_verify_parity_regression(tmp_path):
    m = build_torch_densenet(block_config=(4, 4), n_anchors=96)
    randomize_densenet(m, seed=0)
    path = tmp_path / "latest_net.pth"
    torch.save(m.state_dict(), path)
    assert main(["--torch_pth", str(path)]) == 0


def test_verify_parity_generator(tmp_path):
    tg = TGenerator(ngf=4, crop_size=64)
    randomize(tg, seed=0)
    path = tmp_path / "netG.pth"
    torch.save(tg.state_dict(), path)
    assert main(["--torch_pth", str(path), "--crop_size", "64"]) == 0


def test_verify_parity_discriminator(tmp_path):
    td = TMultiscaleD(ndf=4, num_d=2, n_layers=4, input_nc=6)
    randomize(td, seed=1)
    path = tmp_path / "netD.pth"
    torch.save(td.state_dict(), path)
    assert main(["--torch_pth", str(path), "--crop_size", "64"]) == 0


def test_verify_parity_detects_import_bug(tmp_path, monkeypatch):
    """The FAIL path: a (simulated) bug in the torch->flax importer must trip
    the tolerance and exit nonzero. (Corrupting the .pth itself would NOT
    fail — both the torch oracle and the flax import read the same file and
    would still agree; the harness checks the import path, not the file.)"""
    import emlight_tpu.cli.verify_parity as vp
    from emlight_tpu.train.torch_import import import_densenet_state_dict

    def buggy_import(sd, **kw):
        params, stats = import_densenet_state_dict(sd, **kw)
        params = dict(params)
        head = dict(params["fc_dist"])
        head["kernel"] = head["kernel"] + 0.5
        params["fc_dist"] = head
        return params, stats

    monkeypatch.setattr(
        "emlight_tpu.train.torch_import.import_densenet_state_dict", buggy_import
    )
    m = build_torch_densenet(block_config=(4, 4), n_anchors=96)
    randomize_densenet(m, seed=0)
    path = tmp_path / "net.pth"
    torch.save(m.state_dict(), path)
    assert main(["--torch_pth", str(path)]) == 1
