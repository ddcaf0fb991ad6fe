"""OmniDigits dataset + SphereCNN demo loop (OmniMNIST capability,
reference: GenProjector/models/networks/spherenet/dataset.py:73-216)."""

import numpy as np

from emlight_tpu.nn.sphere_demo import OmniDigits, synthetic_digits


def test_omni_digits_projection_and_aug():
    imgs, labels = synthetic_digits(32)
    ds = OmniDigits(imgs, labels, outshape=(24, 24), flip=True,
                    h_rotate=True, v_rotate=True, fix_aug=True)
    x, y = ds.batch(range(8))
    assert x.shape == (8, 24, 24, 1) and y.shape == (8,)
    # gnomonic projection: pixels outside the FOV window are exactly zero
    assert (x == 0).mean() > 0.2
    assert x.max() > 100  # the digit made it onto the sphere
    # fix_aug freezes the per-index augmentation draw
    x2, _ = ds.batch(range(8))
    np.testing.assert_array_equal(x, x2)
    # plain (un-augmented) dataset centers the digit on the equator row
    ds0 = OmniDigits(imgs, labels, outshape=(24, 24))
    x0, _ = ds0.batch([0])
    assert x0[0, 12].max() > 0


def test_sphere_demo_training_learns():
    from emlight_tpu.cli.sphere_demo import main

    acc = main([
        "--train", "120", "--batch", "32", "--n_synth", "512",
        "--outshape", "16,16", "--lr", "3e-3",
    ])
    assert acc is not None and acc > 0.3  # well above the 0.1 chance level
