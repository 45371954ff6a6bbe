import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.diffusion import losses, schedules


def _zero_model(x, cond):
    return jnp.zeros_like(x)


def _identity_model(x, cond):
    return x


def test_reduce_fn_modes():
    x = jnp.array([1.0, 2.0, 3.0])
    assert losses.reduce_fn(x, "sum") == 6.0
    assert losses.reduce_fn(x, "mean") == 2.0
    np.testing.assert_array_equal(losses.reduce_fn(x, "none"), x)


def test_dsm_zero_model_analytic(rng):
    """With s(x)=0, DSM loss = 0.5*E||noise/sigma^2||^2 * sigma^2 = 0.5*E||z||^2."""
    batch = jnp.zeros((512, 8))
    sigmas = schedules.noise_schedule(1.0, 1e-2, 10, "geometric")
    loss = losses.denoising_score_matching_loss(batch, _zero_model, sigmas,
                                                rng, False, "mean")
    # target = -z/sigma, loss = 0.5*sum(z^2/sigma^2)*sigma^2 = 0.5*sum z^2
    # E[0.5 * sum_{d=8} z^2] = 4.0
    assert abs(float(loss) - 4.0) < 0.5


def test_dsm_continuous_noise_shapes(rng):
    batch = jnp.ones((16, 32, 42))
    sigmas = schedules.noise_schedule(1.0, 1e-2, 15, "geometric")
    loss = losses.denoising_score_matching_loss(batch, _zero_model, sigmas,
                                                rng, True, "none")
    assert loss.shape == (16,)
    assert np.isfinite(np.asarray(loss)).all()


def test_diffusion_loss_perfect_model_is_zero(rng):
    """A model that returns the true eps gives zero loss; build one via closure."""
    betas = schedules.noise_schedule(1e-6, 0.01, 100, "linear")
    batch = jax.random.normal(jax.random.PRNGKey(7), (8, 4))

    # Reconstruct eps from perturbed sample: eps = (x_t - sqrt(a)*x0)/sqrt(1-a)
    def oracle(perturbed, sqrt_alpha):
        a = sqrt_alpha.reshape(-1, 1)**2
        return (perturbed - jnp.sqrt(a) * batch) / jnp.sqrt(1 - a)

    loss = losses.diffusion_loss(batch, oracle, betas, rng, True, "mean")
    assert float(loss) < 1e-8


def test_diffusion_loss_zero_model_near_one(rng):
    """With eps_hat=0, loss = E||eps||^2 per-dim = 1."""
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    batch = jnp.zeros((2048, 4))
    loss = losses.diffusion_loss(batch, _zero_model, betas, rng, True, "mean")
    assert abs(float(loss) - 1.0) < 0.1


def test_ssm_runs_and_is_finite(rng):
    batch = jax.random.normal(rng, (32, 6))
    sigmas = schedules.noise_schedule(0.5, 1e-2, 10, "linear")
    loss = losses.sliced_score_matching_loss(batch, _identity_model, sigmas,
                                             rng, False, "mean")
    assert np.isfinite(float(loss))


def test_mdn_nll_matches_single_gaussian():
    """K=1 mixture NLL equals the diagonal Gaussian NLL."""
    np_rng = np.random.default_rng(0)
    B, S, D, K = 4, 3, 5, 1
    x = jnp.asarray(np_rng.normal(size=(B, S, D)).astype(np.float32))
    mu = jnp.asarray(np_rng.normal(size=(B, S, D * K)).astype(np.float32))
    log_sigma = jnp.asarray(
        np_rng.normal(size=(B, S, D * K)).astype(np.float32) * 0.1)
    pi = jnp.zeros((B, S, K))

    nll = losses.mdn_nll(pi, mu, log_sigma, x, "mean")

    mus = np.asarray(mu).reshape(-1, D)
    lsig = np.asarray(log_sigma).reshape(-1, D)
    xs = np.asarray(x).reshape(-1, D)
    ll = (-0.5 * ((xs - mus) / np.exp(lsig))**2 - lsig -
          np.log(np.sqrt(2 * np.pi))).sum(-1)
    np.testing.assert_allclose(float(nll), -ll.mean(), rtol=1e-5)


def test_mdn_nll_permutation_invariant_components():
    np_rng = np.random.default_rng(1)
    B, D, K = 8, 3, 4
    x = jnp.asarray(np_rng.normal(size=(B, D)).astype(np.float32))
    mu = np_rng.normal(size=(B, K, D)).astype(np.float32)
    ls = (np_rng.normal(size=(B, K, D)) * 0.1).astype(np.float32)
    pi = np_rng.normal(size=(B, K)).astype(np.float32)

    perm = np_rng.permutation(K)
    nll1 = losses.mdn_nll(jnp.asarray(pi), jnp.asarray(mu.reshape(B, -1)),
                          jnp.asarray(ls.reshape(B, -1)), x)
    nll2 = losses.mdn_nll(jnp.asarray(pi[:, perm]),
                          jnp.asarray(mu[:, perm].reshape(B, -1)),
                          jnp.asarray(ls[:, perm].reshape(B, -1)), x)
    np.testing.assert_allclose(float(nll1), float(nll2), rtol=1e-5)


def test_gaussian_mixture_loss_matches_mdn_nll():
    np_rng = np.random.default_rng(2)
    B, D, K = 16, 2, 3
    data = jnp.asarray(np_rng.normal(size=(B, D)).astype(np.float32))
    log_pi = jnp.asarray(
        np.log(np_rng.dirichlet(np.ones(K), B)).astype(np.float32))
    mu = jnp.asarray(np_rng.normal(size=(B, K, D)).astype(np.float32))
    log_sigma = jnp.asarray(
        (np_rng.normal(size=(B, K, D)) * 0.1).astype(np.float32))

    a = losses.gaussian_mixture_loss(log_pi, mu, log_sigma, data, "mean")
    b = losses.mdn_nll(log_pi, mu.reshape(B, -1), log_sigma.reshape(B, -1),
                       data, "mean")
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4)
