"""Autoregressive MDN decoding as a single on-device scan.

Capability parity with the reference's ``sample_mdn.py:54-121`` — but where
the reference runs a *host-driven Python loop* of 32 un-jitted full forward
passes (TFP mixture construction on host each step), this is one
``jit(lax.scan)`` program: all 32 steps, mixture sampling included, stay on
device. Mixture sampling is pure JAX (categorical over components + diagonal
Gaussian), replacing TFP.

Decode semantics match the reference exactly, including its final-step
behavior: during steps i < S-1 the sample at position i is written into slot
i+1 (slot 0 is the zero start token); the last step replaces the whole buffer
with the per-position samples, which removes the start token
(``sample_mdn.py:113-116``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["sample_mixture", "ar_decode"]


def sample_mixture(rng, pi, mu, log_sigma, channels: int,
                   log_sigma_cap=None):
    """Sample from an MDN head output.

    Shapes: pi (..., K); mu, log_sigma (..., K*channels). Returns
    (..., channels).

    ``log_sigma_cap`` clamps per-component log stddev from above before
    sampling. The NLL never bounds sigma, so trained mixtures carry junk
    components with huge variance (measured on the flagship MDN: log_sigma
    up to +6, sigma ~500x the data scale) that are near-ignored by
    teacher-forced likelihood but detonate free-running decode — one
    oversized draw knocks the input off-manifold and errors compound
    autoregressively. Capping at the data scale (0.0 for unit-scale
    latents) is a pure serving-side guard: in-distribution components sit
    far below the cap and are unaffected.
    """
    k = pi.shape[-1]
    lead = pi.shape[:-1]
    comp_rng, norm_rng = jax.random.split(rng)
    comp = jax.random.categorical(comp_rng, pi, axis=-1)   # (...,)
    if log_sigma_cap is not None:
        log_sigma = jnp.minimum(log_sigma, log_sigma_cap)
    mus = mu.reshape(*lead, k, channels)
    sigmas = jnp.exp(log_sigma).reshape(*lead, k, channels)
    mu_sel = jnp.take_along_axis(mus, comp[..., None, None], axis=-2)
    sig_sel = jnp.take_along_axis(sigmas, comp[..., None, None], axis=-2)
    mu_sel = mu_sel.squeeze(-2)
    sig_sel = sig_sel.squeeze(-2)
    eps = jax.random.normal(norm_rng, mu_sel.shape, mu_sel.dtype)
    return mu_sel + sig_sel * eps


def ar_decode(rng,
              model_fn: Callable,
              num_samples: int,
              steps: int = 32,
              channels: int = 42,
              log_sigma_cap=None) -> jnp.ndarray:
    """Generate sequences by ancestral MDN decoding.

    Args:
        rng: PRNG key.
        model_fn: ``tokens -> (pi, mu, log_sigma)`` applied WITHOUT the
            teacher-forcing shift (the zero start token is explicit here).
        num_samples: batch size N.
        steps: sequence length S.
        channels: embedding width D.

    Returns:
        (N, S, D) sampled latent sequences.
    """
    tokens0 = jnp.zeros((num_samples, steps, channels), jnp.float32)

    def step(tokens, inputs):
        i, step_rng = inputs
        pi, mu, log_sigma = model_fn(tokens)
        sampled = sample_mixture(step_rng, pi, mu, log_sigma, channels,
                                 log_sigma_cap=log_sigma_cap)
        next_tokens = jax.lax.cond(
            i < steps - 1,
            lambda: jax.lax.dynamic_update_index_in_dim(
                tokens, jax.lax.dynamic_index_in_dim(sampled, i, axis=1,
                                                     keepdims=False),
                i + 1, axis=1),
            lambda: sampled,
        )
        return next_tokens, ()

    keys = jax.random.split(rng, steps)
    tokens, _ = jax.lax.scan(step, tokens0, (jnp.arange(steps), keys))
    return tokens


def ar_decode_cached(rng,
                     model,
                     params,
                     num_samples: int,
                     steps: int = 32,
                     channels: int = 42,
                     log_sigma_cap=None) -> jnp.ndarray:
    """Ancestral MDN decoding with a KV cache — O(S) attention per step.

    Incremental decoding (SURVEY.md §7.5 "causal cache"): each step feeds one
    position through the transformer with cached keys/values instead of
    re-running the full sequence. Clean ancestral sampling y_t ~ p(.|y_<t)
    (the reference's final-step full resample quirk is not reproduced here;
    use ``ar_decode`` for reference-exact behavior).

    Args:
        model: a TransformerMDN module (standard layer layout).
        params: its trained variables ({'params': ...}).
    """
    max_len = getattr(model, "max_decode_length", 128)
    if steps > max_len:
        raise ValueError(
            f"steps={steps} exceeds the model's KV-cache capacity "
            f"max_decode_length={max_len}; construct the model with "
            f"max_decode_length>={steps} (decoding past the cache would "
            f"silently attend over truncated history)")
    # Initialize the cache collection with a one-position decode trace.
    token0 = jnp.zeros((num_samples, 1, channels), jnp.float32)
    _, variables = model.apply(params, token0, decode=True,
                               decode_position=jnp.zeros((), jnp.int32),
                               mutable=["cache"])
    # Reset: the init trace above advanced cache_index; zero the collection.
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, variables["cache"])

    def step(carry, inputs):
        token, cache, out = carry
        i, step_rng = inputs
        (pi, mu, log_sigma), vars_out = model.apply(
            {**params, "cache": cache}, token, decode=True,
            decode_position=i, mutable=["cache"])
        z = sample_mixture(step_rng, pi[:, 0], mu[:, 0], log_sigma[:, 0],
                           channels, log_sigma_cap=log_sigma_cap)
        out = jax.lax.dynamic_update_index_in_dim(out, z, i, axis=1)
        return (z[:, None, :], vars_out["cache"], out), ()

    keys = jax.random.split(rng, steps)
    out0 = jnp.zeros((num_samples, steps, channels), jnp.float32)
    (_, _, out), _ = jax.lax.scan(step, (token0, cache0, out0),
                                  (jnp.arange(steps), keys))
    return out
