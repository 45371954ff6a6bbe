import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.diffusion import samplers, schedules


def _gauss_score(x, sigma):
    """Oracle score of N(0, I) data perturbed by noise level sigma."""
    return -x / (1.0 + sigma**2)


def test_ald_oracle_converges_to_standard_normal(rng):
    sigmas = schedules.noise_schedule(1.0, 1e-2, 10, "geometric")
    init = jax.random.uniform(jax.random.PRNGKey(5), (4096, 2),
                              minval=-np.sqrt(12) / 2, maxval=np.sqrt(12) / 2)
    out = samplers.annealed_langevin_dynamics(rng, _gauss_score, sigmas, init,
                                              epsilon=2e-5, T=100,
                                              denoise=True)
    x = np.asarray(out.state)
    assert abs(x.mean()) < 0.05
    assert abs(x.std() - 1.0) < 0.1
    assert out.collection.shape == (102, 4096, 2)
    assert out.metrics.shape == (4, 10, 100)
    # final denoised state is in the last collection slot
    np.testing.assert_allclose(np.asarray(out.collection[-1]), x)


def test_ald_no_collection_no_metrics(rng):
    sigmas = schedules.noise_schedule(1.0, 1e-1, 3, "geometric")
    init = jnp.zeros((8, 2))
    out = samplers.annealed_langevin_dynamics(rng, _gauss_score, sigmas, init,
                                              epsilon=1e-4, T=5, denoise=False,
                                              collect_steps=0,
                                              collect_metrics=False)
    assert out.collection is None
    assert out.metrics is None


def test_cas_returns_triple(rng):
    """Reference bug fix: CAS must return the standard 3-tuple."""
    sigmas = schedules.noise_schedule(1.0, 1e-2, 50, "geometric")
    init = jnp.zeros((16, 2))
    out = samplers.consistent_langevin_dynamics(rng, _gauss_score, sigmas,
                                                init, epsilon=1e-4)
    assert isinstance(out, samplers.SamplerOutput)
    state, collection, metrics = out
    assert state.shape == (16, 2)
    assert metrics.shape == (4, 50, 1)
    assert collection is not None


def _zero_data_eps(x, cond):
    """Optimal eps-predictor when the data distribution is a point mass at 0:
    x_t = sqrt(1-abar)*eps  =>  eps = x_t / sqrt(1-abar)."""
    abar = cond**2
    return x / jnp.sqrt(1.0 - abar + 1e-12)


def test_ddpm_oracle_contracts_to_zero(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    init = jax.random.normal(jax.random.PRNGKey(4), (256, 8))
    out = samplers.diffusion_dynamics(rng, _zero_data_eps, betas, init)
    x = np.asarray(out.state)
    assert np.abs(x).mean() < 0.05
    assert out.collection.shape == (41, 256, 8)
    assert out.metrics.shape == (4, 1000, 1)
    # final state lands in the last collection slot (reference off-by-one fixed)
    np.testing.assert_allclose(np.asarray(out.collection[-1]), x, atol=1e-6)
    # slot 0 is the initial state
    np.testing.assert_allclose(np.asarray(out.collection[0]),
                               np.asarray(init))


def test_ddpm_deterministic_given_key(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 50, "linear")
    init = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    o1 = samplers.diffusion_dynamics(rng, _zero_data_eps, betas, init,
                                     collect_steps=0, collect_metrics=False)
    o2 = samplers.diffusion_dynamics(rng, _zero_data_eps, betas, init,
                                     collect_steps=0, collect_metrics=False)
    np.testing.assert_array_equal(np.asarray(o1.state), np.asarray(o2.state))


def test_ddpm_infill_pins_masked_elements(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 100, "linear")
    init = jax.random.normal(jax.random.PRNGKey(2), (16, 32, 4))
    target = jnp.full((16, 32, 4), 0.25)
    masks = jnp.zeros((16, 32, 4)).at[:, :8].set(1.0).at[:, -8:].set(1.0)
    out = samplers.diffusion_dynamics(rng, _zero_data_eps, betas, init,
                                      infill_samples=target,
                                      infill_masks=masks,
                                      collect_steps=0, collect_metrics=False)
    x = np.asarray(out.state)
    # t=0 overwrites masked entries with the clean infill content
    np.testing.assert_allclose(x[:, :8], 0.25, atol=1e-6)
    np.testing.assert_allclose(x[:, -8:], 0.25, atol=1e-6)
    # unmasked middle is generated (not the target value)
    assert not np.allclose(x[:, 8:-8], 0.25, atol=1e-3)


def test_ald_infill_pins_masked_elements(rng):
    sigmas = schedules.noise_schedule(1.0, 1e-2, 5, "geometric")
    init = jnp.zeros((8, 10))
    target = jnp.full((8, 10), 0.5)
    masks = jnp.zeros((8, 10)).at[:, :5].set(1.0)
    out = samplers.annealed_langevin_dynamics(
        rng, _gauss_score, sigmas, init, epsilon=1e-4, T=10, denoise=False,
        infill_samples=target, infill_masks=masks,
        collect_steps=0, collect_metrics=False)
    x = np.asarray(out.state)
    # masked entries = target + sigma_L * noise; loosely pinned near 0.5
    assert np.abs(x[:, :5] - 0.5).mean() < 0.05


def test_stochastic_encoder_statistics(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    samples = jnp.full((2048, 4), 3.0)
    z = np.asarray(samplers.diffusion_stochastic_encoder(rng, samples, betas))
    aprod = np.cumprod(1 - np.asarray(betas))
    expect_mu = np.sqrt(aprod[-1]) * 3.0
    expect_sig = np.sqrt(1 - aprod[-1])
    assert abs(z.mean() - expect_mu) < 0.05
    assert abs(z.std() - expect_sig) < 0.05


def test_collate_sampling_metrics_shape(rng):
    sigmas = schedules.noise_schedule(1.0, 1e-1, 3, "geometric")
    init = jnp.zeros((4, 2))
    out = samplers.annealed_langevin_dynamics(rng, _gauss_score, sigmas, init,
                                              epsilon=1e-4, T=7, denoise=False)
    collated = samplers.collate_sampling_metrics(out.metrics)
    assert len(collated) == 3
    assert len(collated[0]) == 7
    assert set(collated[0][0]) == {"slope", "step", "alpha", "noise"}


def test_ddim_oracle_contracts_to_zero(rng):
    """DDIM with the point-mass oracle converges to 0 in only 50 steps."""
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    init = jax.random.normal(jax.random.PRNGKey(4), (256, 8))
    out = samplers.ddim_dynamics(rng, _zero_data_eps, betas, init,
                                 num_steps=50)
    x = np.asarray(out.state)
    assert np.abs(x).mean() < 0.05
    assert out.collection is None and out.metrics is None


def test_ddim_deterministic_at_eta_zero(rng):
    """eta=0: the only randomness is the init; same init -> same output
    regardless of key."""
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    init = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    o1 = samplers.ddim_dynamics(jax.random.PRNGKey(7), _zero_data_eps, betas,
                                init, num_steps=20, eta=0.0)
    o2 = samplers.ddim_dynamics(jax.random.PRNGKey(8), _zero_data_eps, betas,
                                init, num_steps=20, eta=0.0)
    np.testing.assert_allclose(np.asarray(o1.state), np.asarray(o2.state),
                               atol=1e-6)


def test_ddim_eta_one_adds_stochasticity(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    init = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    o1 = samplers.ddim_dynamics(jax.random.PRNGKey(7), _zero_data_eps, betas,
                                init, num_steps=20, eta=1.0)
    o2 = samplers.ddim_dynamics(jax.random.PRNGKey(8), _zero_data_eps, betas,
                                init, num_steps=20, eta=1.0)
    assert not np.allclose(np.asarray(o1.state), np.asarray(o2.state))


def test_ddim_matches_gaussian_statistics(rng):
    """Gaussian-data oracle (x0 ~ N(0, 0.3^2), inside the [-1,1] clip range):
    E[eps|x_t] = sqrt(1-abar)/Var(x_t) * x_t. DDIM at eta=0 should produce
    samples with matching statistics."""
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    s2 = 0.3**2

    def gauss_eps(x, cond):
        abar = cond**2
        var = s2 * abar + (1 - abar)
        return jnp.sqrt(1 - abar) / var * x

    init = jax.random.normal(jax.random.PRNGKey(5), (4096, 2))
    out = samplers.ddim_dynamics(rng, gauss_eps, betas, init, num_steps=100,
                                 eta=0.0)
    x = np.asarray(out.state)
    assert abs(x.mean()) < 0.03
    assert abs(x.std() - 0.3) < 0.05


def test_ddim_infill(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 500, "linear")
    init = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 4))
    target = jnp.full((8, 16, 4), 0.3)
    masks = jnp.zeros((8, 16, 4)).at[:, :4].set(1.0)
    out = samplers.ddim_dynamics(rng, _zero_data_eps, betas, init,
                                 num_steps=50, infill_samples=target,
                                 infill_masks=masks)
    x = np.asarray(out.state)
    np.testing.assert_allclose(x[:, :4], 0.3, atol=1e-6)
    assert np.abs(x[:, 4:]).mean() < 0.05


def test_ddpm_collect_every_step(rng):
    """collect_steps == T fills every slot exactly once (duplicate/rounding
    hazard in the collection indices — VERDICT r1 weakness #5)."""
    betas = schedules.noise_schedule(1e-4, 0.05, 40, "linear")
    init = jax.random.normal(jax.random.PRNGKey(7), (8, 4))

    def eps_fn(x, cond):
        return x * 0.1

    out = samplers.diffusion_dynamics(rng, eps_fn, betas, init,
                                      collect_steps=40,
                                      collect_metrics=False)
    col = np.asarray(out.collection)
    assert col.shape == (41, 8, 4)
    # Slot 0 is the start; every later slot must have been written (the
    # dynamics contract the state, so no written slot equals the zeros init
    # of the buffer and consecutive snapshots differ).
    for s in range(1, 41):
        assert np.abs(col[s]).sum() > 0, f"slot {s} never written"
    # final state lands in the last slot
    np.testing.assert_allclose(col[-1], np.asarray(out.state))


def test_ald_collect_every_step(rng):
    sigmas = schedules.noise_schedule(1.0, 1e-1, 5, "geometric")
    init = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
    out = samplers.annealed_langevin_dynamics(
        rng, _gauss_score, sigmas, init, epsilon=1e-3, T=7, denoise=True,
        collect_steps=35, collect_metrics=False)
    col = np.asarray(out.collection)
    assert col.shape == (37, 4, 2)
    for s in range(1, 37):
        assert np.abs(col[s]).sum() > 0, f"slot {s} never written"


def test_dpmpp_oracle_contracts_to_zero(rng):
    """DPM-Solver++(2M) with the point-mass oracle converges in 15 steps."""
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    init = jax.random.normal(jax.random.PRNGKey(4), (256, 8))
    out = samplers.dpmpp_dynamics(rng, _zero_data_eps, betas, init,
                                  num_steps=15)
    x = np.asarray(out.state)
    assert np.abs(x).mean() < 0.05
    assert out.collection is None and out.metrics is None


def test_dpmpp_deterministic(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    init = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    o1 = samplers.dpmpp_dynamics(jax.random.PRNGKey(7), _zero_data_eps,
                                 betas, init, num_steps=12)
    o2 = samplers.dpmpp_dynamics(jax.random.PRNGKey(8), _zero_data_eps,
                                 betas, init, num_steps=12)
    np.testing.assert_allclose(np.asarray(o1.state), np.asarray(o2.state),
                               atol=1e-6)


def test_dpmpp_matches_gaussian_statistics_fewer_steps(rng):
    """The 2nd-order solver reaches DDIM-100 statistics with 20 steps."""
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    s2 = 0.3**2

    def gauss_eps(x, cond):
        abar = cond**2
        var = s2 * abar + (1 - abar)
        return jnp.sqrt(1 - abar) / var * x

    init = jax.random.normal(jax.random.PRNGKey(5), (4096, 2))
    out = samplers.dpmpp_dynamics(rng, gauss_eps, betas, init, num_steps=20)
    x = np.asarray(out.state)
    assert abs(x.mean()) < 0.03
    assert abs(x.std() - 0.3) < 0.05


def test_dpmpp_degenerate_grid_no_nans(rng):
    """num_steps near/beyond the distinct-index budget must stay finite.

    Small-T schedules with large step budgets make the T-1 clamp
    reintroduce duplicate taus (h == 0); the degenerate-step guard must
    keep the chain NaN-free and still contract the point-mass oracle.
    """
    betas = schedules.noise_schedule(1e-6, 0.01, 24, "linear")
    init = jax.random.normal(jax.random.PRNGKey(3), (64, 4))
    for num_steps in (20, 24, 40):
        out = samplers.dpmpp_dynamics(rng, _zero_data_eps, betas, init,
                                      num_steps=num_steps)
        x = np.asarray(out.state)
        assert np.isfinite(x).all(), f"NaNs at num_steps={num_steps}"
        assert np.abs(x).mean() < 0.1


def test_dpmpp_infill(rng):
    betas = schedules.noise_schedule(1e-6, 0.01, 500, "linear")
    init = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 4))
    target = jnp.full((8, 16, 4), 0.3)
    masks = jnp.zeros((8, 16, 4)).at[:, :4].set(1.0)
    out = samplers.dpmpp_dynamics(rng, _zero_data_eps, betas, init,
                                  num_steps=15, infill_samples=target,
                                  infill_masks=masks)
    x = np.asarray(out.state)
    np.testing.assert_allclose(x[:, :4], 0.3, atol=1e-5)
    assert np.abs(x[:, 4:]).mean() < 0.05


def test_dpmpp_collection_and_metrics(rng):
    """Opt-in snapshot collection follows the DDIM contract: slot 0 is the
    init, the last slot equals the final state, and without the opt-in the
    sampler stays collection-free (the production default)."""
    betas = schedules.noise_schedule(1e-6, 0.01, 500, "linear")
    init = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 4))
    out = samplers.dpmpp_dynamics(rng, _zero_data_eps, betas, init,
                                  num_steps=10, collect_steps=40,
                                  collect_metrics=True)
    coll = np.asarray(out.collection)
    assert coll.shape == (11, 8, 16, 4)     # min(40, 10) snapshots + init
    np.testing.assert_array_equal(coll[0], np.asarray(init))
    np.testing.assert_allclose(coll[-1], np.asarray(out.state))
    assert np.isfinite(coll).all()
    m = np.asarray(out.metrics)
    assert m.shape == (4, 10, 1)
    assert (m[3] == 0).all()                # deterministic: no noise norm
    # Same seed without the opt-in: identical final state, no collection.
    out2 = samplers.dpmpp_dynamics(rng, _zero_data_eps, betas, init,
                                   num_steps=10)
    assert out2.collection is None and out2.metrics is None
    np.testing.assert_array_equal(np.asarray(out2.state),
                                  np.asarray(out.state))


def test_single_snapshot_slot_holds_final_state(rng):
    """collect_steps=1 must keep the FINAL state (linspace(1, S, 1) kept
    only the first, noisiest snapshot before _collection_indices)."""
    betas = schedules.noise_schedule(1e-6, 0.01, 500, "linear")
    init = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    for fn, kw in [(samplers.ddim_dynamics, dict(num_steps=10)),
                   (samplers.dpmpp_dynamics, dict(num_steps=10))]:
        out = fn(rng, _zero_data_eps, betas, init, collect_steps=1, **kw)
        coll = np.asarray(out.collection)
        assert coll.shape[0] == 2   # init + the single snapshot
        np.testing.assert_allclose(coll[-1], np.asarray(out.state))
