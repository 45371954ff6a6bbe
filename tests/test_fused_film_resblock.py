"""Parity tests for the fused FiLM-resblock kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model
from smd_tpu.models.fuse import fuse_head_params
from smd_tpu.ops import fused_film_resblock as ffr


@pytest.mark.parametrize("residual", [False, True])
def test_kernel_matches_reference(rng, residual):
    B, S, K, N = 8, 32, 256, 256
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (B, S, K)) * 0.5
    scale = jax.random.normal(ks[1], (B, 1, K)) * 0.2 + 1.0
    shift = jax.random.normal(ks[2], (B, 1, K)) * 0.2
    w = jax.random.normal(ks[3], (K, N)) * 0.05
    b = jax.random.normal(ks[4], (N,)) * 0.1
    res = jax.random.normal(ks[5], (B, S, N)) if residual else None

    out = ffr.fused_ln_film_swish_dense(x, scale, shift, w, b, res,
                                        interpret=True)
    ref = ffr._reference(x, scale, shift, w, b, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16_matches_reference(rng):
    B, S, K = 4, 32, 128
    ks = jax.random.split(rng, 5)
    x = (jax.random.normal(ks[0], (B, S, K)) * 0.5).astype(jnp.bfloat16)
    scale = jnp.ones((B, 1, K), jnp.float32)
    shift = jnp.zeros((B, 1, K), jnp.float32)
    w = (jax.random.normal(ks[3], (K, K)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((K,), jnp.bfloat16)
    out = ffr.fused_ln_film_swish_dense(x, scale, shift, w, b,
                                        interpret=True)
    ref = ffr._reference(x, scale, shift, w, b)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_fused_head_model_matches_standard(rng):
    """fused_head=True + fuse_head_params == standard model (CPU fallback
    path exercises the same folded-affine math)."""
    kwargs = dict(num_layers=1, num_heads=2, num_mlp_layers=2, mlp_dims=128)
    std = get_model("TransformerDDPM", **kwargs)
    fused = get_model("TransformerDDPM", fused_head=True, **kwargs)
    x = jax.random.normal(rng, (4, 8, 6))
    t = jnp.full((4, 1, 1), 0.3)
    params = std.init(jax.random.PRNGKey(0), x, t)
    fused_params = fuse_head_params(params)
    out_std = std.apply(params, x, t)
    out_fused = fused.apply(fused_params, x, t)
    np.testing.assert_allclose(np.asarray(out_std), np.asarray(out_fused),
                               atol=2e-5, rtol=2e-5)


def test_fused_head_grad_matches(rng):
    """custom_vjp backward (reference recompute) matches the standard grad."""
    kwargs = dict(num_layers=0, num_heads=2, num_mlp_layers=1, mlp_dims=128)
    std = get_model("TransformerDDPM", **kwargs)
    fused = get_model("TransformerDDPM", fused_head=True, **kwargs)
    x = jax.random.normal(rng, (2, 8, 6))
    t = jnp.full((2, 1, 1), 0.3)
    params = std.init(jax.random.PRNGKey(0), x, t)
    fused_params = fuse_head_params(params)

    g_std = jax.grad(lambda xx: std.apply(params, xx, t).sum())(x)
    g_fused = jax.grad(lambda xx: fused.apply(fused_params, xx, t).sum())(x)
    np.testing.assert_allclose(np.asarray(g_std), np.asarray(g_fused),
                               atol=2e-5, rtol=2e-4)
