import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model
from smd_tpu.models.fuse import fuse_attention_params
from smd_tpu.ops import fused_attention as fat


def _mk_weights(rng, E, H):
    ks = jax.random.split(rng, 5)
    return dict(
        wqkv=jax.random.normal(ks[0], (E, 3 * E)) * 0.05,
        bqkv=jax.random.normal(ks[1], (3 * E,)) * 0.01,
        wout=jax.random.normal(ks[2], (E, E)) * 0.05,
        bout=jax.random.normal(ks[3], (E,)) * 0.01,
        ln_scale=jnp.ones((E,)),
        ln_bias=jnp.zeros((E,)),
    )


@pytest.mark.parametrize("causal", [False, True])
def test_fused_kernel_matches_reference_interpret(rng, causal):
    B, S, E, H = 8, 32, 128, 8
    w = _mk_weights(rng, E, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.float32)
    out = fat.fused_ln_attention(x, w["wqkv"], w["bqkv"], w["wout"],
                                 w["bout"], w["ln_scale"], w["ln_bias"], H,
                                 causal, True)
    ref = fat._reference(x, w["wqkv"], w["bqkv"], w["wout"], w["bout"],
                         w["ln_scale"], w["ln_bias"], H, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_kernel_gradients(rng):
    B, S, E, H = 4, 32, 128, 4
    w = _mk_weights(rng, E, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.float32)

    def loss_fused(x, wqkv):
        return jnp.sum(fat.fused_ln_attention(
            x, wqkv, w["bqkv"], w["wout"], w["bout"], w["ln_scale"],
            w["ln_bias"], H, False, True)**2)

    def loss_ref(x, wqkv):
        return jnp.sum(fat._reference(
            x, wqkv, w["bqkv"], w["wout"], w["bout"], w["ln_scale"],
            w["ln_bias"], H, False)**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, w["wqkv"])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w["wqkv"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_supported():
    assert fat.supported(1000, 32, 128, 8)
    assert fat.supported(7, 32, 128, 8)          # prime batch: one 224-row tile
    assert not fat.supported(1, 32, 128, 8)      # single item: can't tile
    assert not fat.supported(64, 32, 100, 8)     # embed not 128-multiple
    assert fat._pick_nb(1000, 32) == 10          # 320-row tiles


def test_fuse_params_preserves_model_output(rng):
    """Standard-layout params fused to the serving layout give the same
    model output (CPU path: reference einsum with flat weights)."""
    kwargs = dict(num_layers=2, num_heads=4, num_mlp_layers=1, mlp_dims=64)
    std = get_model("TransformerDDPM", **kwargs)
    fused = get_model("TransformerDDPM", fused_attention=True, **kwargs)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 6))
    t = jnp.full((4, 1, 1), 0.5)
    params = std.init(rng, x, t)
    fused_params = fuse_attention_params(params)

    out_std = std.apply(params, x, t)
    out_fused = fused.apply(fused_params, x, t)
    np.testing.assert_allclose(np.asarray(out_std), np.asarray(out_fused),
                               atol=2e-5)
