"""Training objectives.

Capability parity with the reference's ``utils/losses.py`` (denoising score
matching :129, sliced score matching :182, DDPM epsilon-MSE :250, Gaussian
mixture NLL :62, plus the small generic losses) and with ``train_mdn.py:100-133``
(sequence MDN NLL, implemented here in pure JAX instead of TFP-on-JAX).

All objectives take the model as a plain callable ``model_fn(x, cond) -> out``
so they compose with jit / pjit / shard_map and with Flax ``apply`` partials.
Noise-level sampling semantics (discrete vs. continuous-between-adjacent-levels)
match the reference exactly to preserve training dynamics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "reduce_fn",
    "denoising_score_matching_loss",
    "sliced_score_matching_loss",
    "diffusion_loss",
    "gaussian_mixture_loss",
    "mdn_nll",
    "mean_squared_error",
    "binary_cross_entropy_with_logits",
    "sigmoid_cross_entropy",
    "kl_divergence_std_normal",
]


def reduce_fn(x, mode):
    if mode == "none" or mode is None:
        return jnp.asarray(x)
    if mode == "sum":
        return jnp.sum(x)
    if mode == "mean":
        return jnp.mean(jnp.asarray(x))
    raise ValueError("Unsupported reduction option.")


def _broadcast_to_batch(values, batch_shape):
    """Reshape (B,) values to (B, 1, ..., 1) matching batch rank."""
    return values.reshape(batch_shape[0], *([1] * (len(batch_shape) - 1)))


def _sample_sigmas(rng, sigmas, batch, continuous_noise):
    """Sample per-example noise levels.

    Discrete: sigma_i with i ~ U{0, L-1}. Continuous: i ~ U{1, L-1} then
    sigma ~ U(sigmas[i-1], sigmas[i]) — reference ``losses.py:149-162``.
    """
    label_rng, noise_rng = jax.random.split(rng)
    labels = jax.random.randint(label_rng, (batch.shape[0],),
                                minval=int(continuous_noise),
                                maxval=sigmas.shape[0])
    if continuous_noise:
        used = jax.random.uniform(noise_rng, labels.shape,
                                  minval=sigmas[labels - 1],
                                  maxval=sigmas[labels])
    else:
        used = sigmas[labels]
    return _broadcast_to_batch(used, batch.shape)


def denoising_score_matching_loss(batch, model_fn, sigmas, rng,
                                  continuous_noise=False, reduction="mean"):
    """DSM objective for NCSNs: E ||s(x+σε, σ) + ε/σ²·σ||² weighted by σ²."""
    rng, sample_rng = jax.random.split(rng)
    used_sigmas = _sample_sigmas(rng, sigmas, batch, continuous_noise)
    noise = jax.random.normal(sample_rng, batch.shape) * used_sigmas
    perturbed = batch + noise
    target = -1.0 / (used_sigmas**2) * noise
    scores = model_fn(perturbed, used_sigmas)

    target = target.reshape(target.shape[0], -1)
    scores = scores.reshape(scores.shape[0], -1)
    loss = 0.5 * jnp.sum(jnp.square(scores - target), axis=-1)
    loss = loss * used_sigmas.reshape(batch.shape[0])**2
    return reduce_fn(loss, reduction)


def sliced_score_matching_loss(batch, model_fn, sigmas, rng,
                               continuous_noise=False, reduction="mean"):
    """Hutchinson-style sliced score matching with Rademacher probes."""
    rng, sample_rng, score_rng = jax.random.split(rng, num=3)
    used_sigmas = _sample_sigmas(rng, sigmas, batch, continuous_noise)
    noise = jax.random.normal(sample_rng, batch.shape) * used_sigmas
    perturbed = batch + noise

    vectors = jax.random.rademacher(score_rng, perturbed.shape,
                                    dtype=batch.dtype)

    first_grad = model_fn(perturbed, used_sigmas)
    score_fn = lambda x: jnp.sum(model_fn(x, used_sigmas) * vectors)
    _, second_grad = jax.value_and_grad(score_fn)(perturbed)

    first_grad = first_grad.reshape(batch.shape[0], -1)
    score_loss = 0.5 * jnp.sum(jnp.square(first_grad), axis=-1)
    hessian_loss = jnp.sum((vectors * second_grad).reshape(batch.shape[0], -1),
                           axis=-1)
    loss = (score_loss + hessian_loss) * used_sigmas.reshape(batch.shape[0])**2
    return reduce_fn(loss, reduction)


def diffusion_loss(batch, model_fn, betas, rng, continuous_noise=False,
                   reduction="mean"):
    """DDPM epsilon-prediction MSE with continuous ᾱ conditioning.

    ᾱ is sampled uniformly in [ᾱ_{t-1}, ᾱ_t] (with ᾱ padded by a leading 1)
    and the model is conditioned on sqrt(ᾱ) — reference ``losses.py:270-305``.
    The reference applies the continuous branch unconditionally (its discrete
    branch is commented out); we preserve that behavior.
    """
    T = betas.shape[0]
    rng, label_rng, sample_rng, noise_rng = jax.random.split(rng, num=4)
    labels = jax.random.randint(label_rng, (batch.shape[0],),
                                minval=int(continuous_noise),
                                maxval=T + int(continuous_noise))

    alphas_prod = jnp.cumprod(1.0 - betas)
    alphas_prod = jnp.concatenate([jnp.ones((1,), betas.dtype), alphas_prod])
    used_alphas = jax.random.uniform(noise_rng, labels.shape,
                                     minval=alphas_prod[labels - 1],
                                     maxval=alphas_prod[labels])
    used_alphas = _broadcast_to_batch(used_alphas, batch.shape)

    eps = jax.random.normal(sample_rng, batch.shape)
    perturbed = jnp.sqrt(used_alphas) * batch + jnp.sqrt(1 - used_alphas) * eps
    pred = model_fn(perturbed, jnp.sqrt(used_alphas))

    loss = jnp.square(eps - pred)
    loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
    return reduce_fn(loss, reduction)


def _log_gaussian_pdf(y, mu, log_sigma):
    norm_const = jnp.log(jnp.sqrt(2.0 * jnp.pi))
    return -0.5 * ((y - mu) / jnp.exp(log_sigma))**2 - log_sigma - norm_const


def gaussian_mixture_loss(log_pi, mu, log_sigma, data, reduction="mean"):
    """NLL of data under a diagonal Gaussian mixture (toy MDN head).

    Shapes: log_pi (B, K); mu, log_sigma (B, K, D); data (B, D).
    """
    k = log_pi.shape[-1]
    data = jnp.repeat(data[:, jnp.newaxis, :], k, axis=1)
    loglik = _log_gaussian_pdf(data, mu, log_sigma).sum(axis=2)
    loss = jax.scipy.special.logsumexp(log_pi + loglik, axis=1)
    return -reduce_fn(loss, reduction)


def mdn_nll(pi, mu, log_sigma, x, reduction="mean"):
    """Sequence MDN negative log-likelihood in pure JAX.

    Replaces the reference's TFP ``MixtureSameFamily(Categorical,
    MultivariateNormalDiag)`` NLL (``train_mdn.py:100-133``) with an explicit
    logsumexp over components — identical math, no TFP dependency, and fully
    fusable by XLA.

    Shapes: pi (..., K); mu, log_sigma (..., D*K); x (..., D).
    """
    channels = x.shape[-1]
    k = pi.shape[-1]
    logits = pi.reshape(-1, k)
    mus = mu.reshape(-1, k, channels)
    log_sigmas = log_sigma.reshape(-1, k, channels)
    xs = x.reshape(-1, 1, channels)

    log_mix = jax.nn.log_softmax(logits, axis=-1)            # (N, K)
    comp_ll = _log_gaussian_pdf(xs, mus, log_sigmas).sum(-1)  # (N, K)
    ll = jax.scipy.special.logsumexp(log_mix + comp_ll, axis=-1)
    return reduce_fn(-ll, reduction)


def mean_squared_error(logits, labels, reduction="mean"):
    loss = jnp.square(logits - labels).mean(axis=1)
    return reduce_fn(loss, reduction)


def series_loss(context, true_target, pred_target, reduction="mean"):
    """Self-similarity + MSE loss over a sequence context (ref :33-53)."""
    ss = context @ true_target.T
    ss_hat = context @ pred_target.T
    loss = (mean_squared_error(ss.T, ss_hat.T) +
            mean_squared_error(true_target, pred_target))
    return reduce_fn(loss, reduction)


def binary_cross_entropy_with_logits(logits, labels):
    return (labels * jax.nn.softplus(-logits) +
            (1 - labels) * jax.nn.softplus(logits))


def sigmoid_cross_entropy(logits, labels, reduction="sum"):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -labels * log_p - (1.0 - labels) * log_not_p
    return reduce_fn(loss, reduction)


def kl_divergence_std_normal(mu, var):
    return 0.5 * jnp.sum(jnp.square(mu) + var - 1 - jnp.log(var))
