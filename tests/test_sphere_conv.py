"""SphereConv parity against the reference's grid_sample pipeline (torch oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from emlight_tpu.nn.sphere_conv import (
    SphereConv2D,
    SphereMaxPool2D,
    sphere_conv_apply,
    sphere_gather,
    sphere_taps,
)


from emlight_tpu.train.torch_ref import reference_grid as _torch_reference_grid


def _torch_sphere_conv(x_nchw, weight, bias, stride):
    h, w = x_nchw.shape[2:]
    grid = _torch_reference_grid(h, w, stride).repeat(x_nchw.shape[0], 1, 1, 1)
    resampled = TF.grid_sample(x_nchw, grid, mode="bilinear", align_corners=False)
    return TF.conv2d(resampled, weight, bias, stride=3)


def test_sphere_conv_matches_torch_grid_sample_pipeline():
    rng = np.random.default_rng(0)
    h, w, cin, cout, b = 16, 32, 5, 7, 2
    x = rng.random((b, h, w, cin)).astype(np.float32)
    kernel = rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32)
    bias = rng.normal(0, 0.1, cout).astype(np.float32)

    for stride in (1, 2):
        ours = sphere_conv_apply(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), stride)
        w_t = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)))  # HWIO->OIHW
        ref = _torch_sphere_conv(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), w_t, torch.from_numpy(bias), stride
        ).numpy()
        ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


def test_sphere_maxpool_matches_torch():
    rng = np.random.default_rng(1)
    h, w, c, b = 16, 32, 4, 2
    x = rng.random((b, h, w, c)).astype(np.float32)
    for stride in (1, 2):
        pool = SphereMaxPool2D(stride=stride)
        ours = pool.apply({}, jnp.asarray(x))
        grid = _torch_reference_grid(h, w, stride).repeat(b, 1, 1, 1)
        resampled = TF.grid_sample(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), grid,
            mode="bilinear", align_corners=False,
        )
        ref = TF.max_pool2d(resampled, 3, stride=3).numpy()
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-5, atol=1e-6
        )


def test_center_tap_is_halfpixel_identity():
    # center tap replicates grid_sample's half-pixel shift: sampling the
    # (i-0.5, j-0.5) corner average — first row/col get zero-padding weight
    idx, wgt, _ = sphere_taps(8, 16, 1)
    p = 3 * 16 + 5  # pixel (3, 5)
    np.testing.assert_allclose(wgt[p, 4], [0.25, 0.25, 0.25, 0.25])
    np.testing.assert_array_equal(
        idx[p, 4], [2 * 16 + 4, 2 * 16 + 5, 3 * 16 + 4, 3 * 16 + 5]
    )


def test_sphere_conv_module_shapes():
    m = SphereConv2D(features=6, stride=2)
    x = jnp.zeros((2, 16, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 8, 16, 6)
    assert variables["params"]["kernel"].shape == (3, 3, 3, 6)
