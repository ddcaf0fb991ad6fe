"""SPADE generator variant coverage: num_upsampling_layers and norm types
(generator.py:20-25 choices; options norm_G variants)."""

import jax
import jax.numpy as jnp

from emlight_tpu.nn.spade import SPADEGenerator


def test_more_variant_structure_via_eval_shape():
    # execution coverage for the default graph lives in test_projector_train;
    # variants are shape-checked without the (minutes-long) compile
    g = SPADEGenerator(ngf=2, num_upsampling_layers="more", crop_size=128)
    guide = jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32)
    crop = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(lambda g_, c_: g.init(jax.random.PRNGKey(0), g_, c_, train=False),
                            guide, crop)
    assert "up_4" not in shapes["params"]
    out = jax.eval_shape(
        lambda v, g_, c_: g.apply(v, g_, c_, train=False), shapes, guide, crop
    )
    assert out.shape == (1, 64, 128, 3)


def test_most_variant_structure_via_eval_shape():
    # 'most' needs crop_size >= 256 (sw = crop//128); eval_shape avoids the
    # very expensive full-resolution compile while still checking the graph
    g = SPADEGenerator(ngf=2, num_upsampling_layers="most", crop_size=256)
    guide = jax.ShapeDtypeStruct((1, 128, 256, 3), jnp.float32)
    crop = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(lambda g_, c_: g.init(jax.random.PRNGKey(0), g_, c_, train=False),
                            guide, crop)
    assert "up_4" in shapes["params"]  # the extra block (generator.py:23)
    out = jax.eval_shape(
        lambda v, g_, c_: g.apply(v, g_, c_, train=False), shapes, guide, crop
    )
    assert out.shape == (1, 128, 256, 3)


def test_instance_norm_generator_has_no_batch_stats():
    g = SPADEGenerator(ngf=2, norm_type="instance", crop_size=64)
    guide = jnp.zeros((1, 32, 64, 3))
    crop = jnp.zeros((1, 32, 32, 3))
    v = jax.jit(lambda: g.init(jax.random.PRNGKey(0), guide, crop, train=True))()
    assert "batch_stats" not in v  # instance norm is stateless
    out = g.apply(v, guide, crop, train=False, mutable=False)
    assert out.shape == (1, 32, 64, 3)
