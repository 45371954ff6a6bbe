import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model
from smd_tpu.sampling import mdn_decode
from smd_tpu.training import mdn as mdn_trainer
from smd_tpu.training.diffusion import TrainConfig


def test_sample_mixture_statistics(rng):
    """Point-mass mixture at component means: samples match selection."""
    N, K, D = 4096, 3, 2
    pi = jnp.log(jnp.broadcast_to(jnp.array([0.7, 0.2, 0.1]), (N, K)))
    mus = jnp.stack([jnp.full((N, D), m) for m in (0.0, 10.0, -10.0)], axis=1)
    log_sigma = jnp.full((N, K * D), -6.0)  # tiny sigma
    out = mdn_decode.sample_mixture(rng, pi, mus.reshape(N, -1), log_sigma, D)
    assert out.shape == (N, D)
    frac0 = (np.abs(np.asarray(out[:, 0])) < 1).mean()
    frac1 = (np.asarray(out[:, 0]) > 5).mean()
    assert abs(frac0 - 0.7) < 0.05
    assert abs(frac1 - 0.2) < 0.05


def test_sample_mixture_log_sigma_cap(rng):
    """The serving-side cap defuses junk huge-variance components.

    Trained MDN mixtures carry components the NLL never bounds (measured
    log_sigma up to +6 on the flagship); capped sampling must stay at the
    data scale while uncapped sampling detonates.
    """
    N, K, D = 4096, 2, 2
    pi = jnp.zeros((N, K))                      # uniform over components
    mus = jnp.zeros((N, K * D))
    # component 0: sigma=e^-1 (real); component 1: sigma=e^6 (junk)
    log_sigma = jnp.tile(jnp.array([-1.0, -1.0, 6.0, 6.0]), (N, 1))
    wild = mdn_decode.sample_mixture(rng, pi, mus, log_sigma, D)
    capped = mdn_decode.sample_mixture(rng, pi, mus, log_sigma, D,
                                       log_sigma_cap=0.0)
    assert float(jnp.abs(wild).max()) > 50.0
    assert float(jnp.abs(capped).max()) < 10.0
    # components below the cap are untouched: identical rng, tight sigma
    tight = jnp.tile(jnp.array([-1.0, -1.0, -2.0, -2.0]), (N, 1))
    a = mdn_decode.sample_mixture(rng, pi, mus, tight, D)
    b = mdn_decode.sample_mixture(rng, pi, mus, tight, D, log_sigma_cap=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ar_decode_shapes_and_determinism(rng):
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=4)
    x = jnp.zeros((2, 8, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    model_fn = lambda tokens: model.apply(params, tokens, shift=False)

    out1 = mdn_decode.ar_decode(rng, model_fn, 2, steps=8, channels=6)
    out2 = mdn_decode.ar_decode(rng, model_fn, 2, steps=8, channels=6)
    assert out1.shape == (2, 8, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_mdn_training_decreases_loss():
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=4)
    config = TrainConfig(batch_size=16, learning_rate=1e-3)
    rng = jax.random.PRNGKey(0)
    state = mdn_trainer.create_train_state(rng, model, (16, 8, 4), config)
    step = mdn_trainer.make_train_step(model)

    batch = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 4)) * 0.5
    losses = []
    for _ in range(25):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_mdn_fit_and_eval(tmp_path):
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=16, mdn_mixtures=2)
    config = TrainConfig(batch_size=8, epochs=1, max_steps=4,
                         snapshot_freq=100, logging_freq=100, verbose=False)
    rng = np.random.default_rng(0)

    def data():
        for _ in range(6):
            yield rng.normal(size=(8, 4, 4)).astype(np.float32) * 0.3

    state = mdn_trainer.fit(model, data, lambda: list(data())[:1], (4, 4),
                            config, str(tmp_path / "mdn"))
    assert int(state.step) == 4
    assert state.ema_params is None  # reference MDN training has no EMA


def test_cached_decode_matches_full_forward(rng):
    """Incremental (KV-cache) forward equals the full causal forward when fed
    the same token sequence position by position."""
    model = get_model("TransformerMDN", num_layers=2, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=3)
    B, S, D = 2, 8, 6
    x = jax.random.normal(jax.random.PRNGKey(3), (B, S, D))
    params = model.init(jax.random.PRNGKey(0), x)

    pi_full, mu_full, ls_full = model.apply(params, x, shift=False)

    # init cache
    _, variables = model.apply(params, x[:, :1], decode=True,
                               decode_position=jnp.zeros((), jnp.int32),
                               mutable=["cache"])
    cache = jax.tree_util.tree_map(jnp.zeros_like, variables["cache"])
    pis, mus = [], []
    for i in range(S):
        (pi, mu, ls), vars_out = model.apply(
            {**params, "cache": cache}, x[:, i:i + 1], decode=True,
            decode_position=jnp.asarray(i, jnp.int32), mutable=["cache"])
        cache = vars_out["cache"]
        pis.append(pi[:, 0])
        mus.append(mu[:, 0])
    np.testing.assert_allclose(np.asarray(jnp.stack(pis, 1)),
                               np.asarray(pi_full), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.stack(mus, 1)),
                               np.asarray(mu_full), atol=2e-4)


def test_ar_decode_cached_runs(rng):
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=4)
    x = jnp.zeros((2, 8, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    out = mdn_decode.ar_decode_cached(rng, model, params, 2, steps=8,
                                      channels=6)
    assert out.shape == (2, 8, 6)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic given the key
    out2 = mdn_decode.ar_decode_cached(rng, model, params, 2, steps=8,
                                       channels=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ar_decode_cached_long_sequence(rng):
    """Decoding past 128 positions works when the model is built for it."""
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=4,
                      max_decode_length=256)
    x = jnp.zeros((1, 256, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    out = mdn_decode.ar_decode_cached(rng, model, params, 1, steps=256,
                                      channels=4)
    assert out.shape == (1, 256, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ar_decode_cached_over_cap_fails_loudly(rng):
    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=4)
    x = jnp.zeros((1, 8, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="max_decode_length"):
        mdn_decode.ar_decode_cached(rng, model, params, 1, steps=200,
                                    channels=4)


def test_gate_gaussian_baseline_nll_matches_closed_form():
    """The NLL-leg baseline equals the exact diagonal-Gaussian NLL."""
    from smd_tpu.sampling import gates
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4000, 5, 3)).astype(np.float32) * 2.0 + 1.0
    got = gates.gaussian_baseline_nll(x)
    # Unit-variance-after-standardization closed form: per-position NLL of
    # a fitted diagonal Gaussian on its own fitting data is
    # D/2 * (1 + log(2*pi)) + sum_d log(sigma_d) as N -> inf.
    mu = x.mean(0)
    var = x.var(0)
    want = float(np.mean(np.sum(
        0.5 * (1.0 + np.log(2 * np.pi * var)), axis=-1)))
    assert abs(got - want) < 1e-3
    del mu


def test_gate_marginal_deviation_separates_healthy_from_detonated():
    """The probe leg is ~0 for same-distribution draws and large for the
    drift/detonation failure mode it exists to catch (free-running decode
    with inflated variance, measured FD 3803 on a flagship pilot that
    PASSED the NLL leg)."""
    from smd_tpu.sampling import gates
    rng = np.random.default_rng(1)
    real = rng.normal(size=(2000, 8, 4)).astype(np.float32)
    healthy = rng.normal(size=(2000, 8, 4)).astype(np.float32)
    assert gates.marginal_deviation(real, healthy) < 0.1
    detonated = healthy * 5.0 + 2.0
    assert gates.marginal_deviation(real, detonated) > 2.0
    drifted = healthy + np.linspace(0, 3, 8)[None, :, None]
    assert gates.marginal_deviation(real, drifted) > 0.5
