import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model, MODEL_REGISTRY
from smd_tpu.models.autoregressive import shift_right
from smd_tpu.models.blocks import (noise_encoding, positional_encoding,
                                   sinusoidal_embedding)


def test_positional_encoding_shape_and_values():
    pe = positional_encoding(32, 128)
    assert pe.shape == (32, 128)
    # position 0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(pe[0, :64]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[0, 64:]), 1.0, atol=1e-6)


def test_noise_encoding_scale():
    """Noise is scaled x5000 before the sinusoid (reference ncsn.py:36)."""
    n = jnp.array([[0.5]])
    emb = noise_encoding(n, 128)
    ref = sinusoidal_embedding(jnp.array([2500.0]), 128)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), atol=1e-5)


def test_odd_channels_padded():
    emb = sinusoidal_embedding(jnp.arange(4.0), 7)
    assert emb.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(emb[:, -1]), 0.0)


def test_shift_right():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    y = shift_right(x)
    np.testing.assert_allclose(np.asarray(y[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(y[:, 1:]), np.asarray(x[:, :-1]))


@pytest.mark.parametrize("name", ["TransformerDDPM", "TransformerDDPM4"])
def test_transformer_ddpm_shapes(rng, name):
    model = get_model(name, num_layers=2, num_heads=4, num_mlp_layers=2,
                      mlp_dims=64)
    x = jnp.ones((2, 32, 42))
    t = jnp.full((2, 1, 1), 0.5)
    params = model.init(rng, x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dense_ddpm_shapes(rng):
    model = get_model("DenseDDPM", num_layers=2, mlp_dims=32)
    x = jnp.ones((4, 10))
    t = jnp.full((4, 1), 0.3)
    params = model.init(rng, x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape


def test_dense_ncsn_conditions_on_sigma(rng):
    """Fixed-bug model: FiLM conditioning derives from sigma (so outputs at
    two sigmas differ), and output shape matches the input."""
    model = get_model("DenseNCSN", num_layers=1, mlp_dims=32)
    x = jnp.ones((4, 10))
    params = model.init(rng, x, jnp.full((4, 1), 1.0))
    out1 = model.apply(params, x, jnp.full((4, 1), 1.0))
    out2 = model.apply(params, x, jnp.full((4, 1), 2.0))
    assert out1.shape == x.shape
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_conv_ncsn_shapes(rng):
    model = get_model("ConvNCSN")
    x = jnp.ones((2, 16, 8))
    sig = jnp.full((2, 1, 1), 0.5)
    params = model.init(rng, x, sig)
    out = model.apply(params, x, sig)
    assert out.shape == x.shape


def test_transformer_mdn_shapes_and_causality(rng):
    model = get_model("TransformerMDN", num_layers=2, num_heads=4,
                      num_mlp_layers=1, mlp_dims=64, mdn_mixtures=5)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 6))
    params = model.init(rng, x)
    pi, mu, log_sigma = model.apply(params, x)
    assert pi.shape == (2, 8, 5)
    assert mu.shape == (2, 8, 30)
    assert log_sigma.shape == (2, 8, 30)

    # Causality with teacher-forcing shift: output at position i depends only
    # on inputs < i; perturbing the last input must not change outputs [0..i].
    x2 = x.at[:, -1].add(100.0)
    pi2, mu2, _ = model.apply(params, x2)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(pi2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-4)

    # Perturbing the first input must change later outputs.
    x3 = x.at[:, 0].add(100.0)
    _, mu3, _ = model.apply(params, x3)
    assert not np.allclose(np.asarray(mu[:, 1:]), np.asarray(mu3[:, 1:]),
                           atol=1e-3)


def test_toy_models(rng):
    for name in ("ToyDDPM", "ToyNCSN"):
        model = get_model(name)
        x = jnp.ones((4, 2))
        t = jnp.full((4, 1), 0.5)
        params = model.init(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == x.shape


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        get_model("NopeNet")
    assert len(MODEL_REGISTRY) == 8


def test_registry_drops_extra_kwargs(rng):
    # CLI passes the uniform kwarg set; models ignore what they don't need.
    model = get_model("DenseDDPM", num_layers=1, num_heads=8, num_mlp_layers=2,
                      mlp_dims=16, mdn_mixtures=100)
    x = jnp.ones((2, 4))
    params = model.init(rng, x, jnp.ones((2, 1)))
    assert model.apply(params, x, jnp.ones((2, 1))).shape == x.shape


def test_mixed_precision_and_remat(rng):
    """bf16 compute with fp32 params; remat wraps layers without changing
    outputs' finiteness; param dtypes stay fp32."""
    model = get_model("TransformerDDPM", num_layers=2, num_heads=4,
                      num_mlp_layers=1, mlp_dims=64, dtype=jnp.bfloat16,
                      remat=True)
    x = jnp.ones((2, 8, 6))
    t = jnp.full((2, 1, 1), 0.5)
    params = model.init(rng, x, t)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    out = model.apply(params, x, t)
    assert out.dtype == jnp.float32  # fp32 output head
    assert np.isfinite(np.asarray(out)).all()

    # gradients flow through the remat blocks
    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
