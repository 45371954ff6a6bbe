import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.data import synthetic
from smd_tpu.diffusion import samplers, schedules
from smd_tpu.eval import metrics
from smd_tpu.models import get_model
from smd_tpu.training import diffusion as trainer
from smd_tpu.training.optimizer import stepped_exponential_schedule
from smd_tpu.training.state import EarlyStopping


def test_stepped_exponential_schedule():
    s = stepped_exponential_schedule(1e-3, 100, 0.98)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3 * 0.98, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 1e-3 * 0.98**2, rtol=1e-6)


def test_early_stopping():
    es = EarlyStopping(patience=1)
    improved, es = es.update(1.0)
    assert improved and not es.should_stop
    improved, es = es.update(1.5)
    assert not improved and not es.should_stop
    improved, es = es.update(1.5)
    assert not improved and es.should_stop


def _toy_batches(n_batches, batch_size, lo, hi, seed):
    rng = np.random.default_rng(seed)

    def gen():
        for _ in range(n_batches):
            x = synthetic.toy_distribution(batch_size, rng)
            yield 2.0 * (x - lo) / (hi - lo) - 1.0

    return gen


@pytest.mark.slow
def test_toy_ddpm_end_to_end(tmp_path):
    """Minimum end-to-end slice (SURVEY.md §7): train ToyDDPM on the 2-D
    mixture, sample with the DDPM sampler, check Fréchet distance."""
    lo, hi = -9.0, 9.0
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    model = get_model("ToyDDPM", num_layers=3, mlp_dims=128)
    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=256, epochs=1, max_steps=2000,
                                 snapshot_freq=1000, logging_freq=500,
                                 ema=True, verbose=False)

    state = trainer.fit(model, betas,
                        _toy_batches(2000, 256, lo, hi, 0),
                        _toy_batches(4, 256, lo, hi, 1),
                        input_shape=(2,), config=config,
                        model_dir=str(tmp_path / "toy"))

    # Sample.
    rng = jax.random.PRNGKey(42)
    init = jax.random.normal(rng, (2000, 2))
    params = state.sampling_params
    model_fn = lambda x, cond: model.apply(params, x, cond)
    out = samplers.diffusion_dynamics(jax.random.PRNGKey(7), model_fn, betas,
                                      init, collect_steps=0,
                                      collect_metrics=False)
    gen = np.asarray(out.state)
    gen = (gen + 1) / 2 * (hi - lo) + lo  # denormalize

    real = synthetic.toy_distribution(2000, np.random.default_rng(9))
    fd = metrics.frechet_distance(real, gen)
    # Mixture has variance ~17 per dim; untrained/noise models give FD > 30.
    assert fd < 5.0, f"FD too high: {fd}"
    # Both modes present.
    frac_pos = (gen[:, 0] > 0).mean()
    assert 0.6 < frac_pos < 0.95

    # DDIM with 20x fewer steps stays within quality range on the same model.
    out_ddim = samplers.ddim_dynamics(jax.random.PRNGKey(8), model_fn, betas,
                                      init, num_steps=25)
    gen_ddim = np.asarray(out_ddim.state)
    gen_ddim = (gen_ddim + 1) / 2 * (hi - lo) + lo
    fd_ddim = metrics.frechet_distance(real, gen_ddim)
    assert fd_ddim < 8.0, f"DDIM FD too high: {fd_ddim}"


def test_checkpoint_resume(tmp_path):
    """fit() resumes from the latest checkpoint (reference could not)."""
    betas = schedules.noise_schedule(1e-6, 0.01, 10, "linear")
    model = get_model("ToyDDPM", num_layers=1, mlp_dims=16)
    config = trainer.TrainConfig(loss="ddpm", batch_size=8, epochs=1,
                                 max_steps=5, snapshot_freq=100,
                                 logging_freq=100, verbose=False)
    d = str(tmp_path / "resume")
    state1 = trainer.fit(model, betas, _toy_batches(5, 8, -9, 9, 0),
                         _toy_batches(1, 8, -9, 9, 1), (2,), config, d)
    assert int(state1.step) == 5

    # Second run resumes at step 5 and adds 3 more.
    config2 = trainer.TrainConfig(loss="ddpm", batch_size=8, epochs=1,
                                  max_steps=8, snapshot_freq=100,
                                  logging_freq=100, verbose=False)
    state2 = trainer.fit(model, betas, _toy_batches(10, 8, -9, 9, 2),
                         _toy_batches(1, 8, -9, 9, 1), (2,), config2, d)
    assert int(state2.step) == 8


def test_train_step_decreases_loss():
    betas = schedules.noise_schedule(1e-6, 0.01, 50, "linear")
    model = get_model("ToyDDPM", num_layers=2, mlp_dims=64)
    config = trainer.TrainConfig(loss="ddpm", batch_size=128)
    rng = jax.random.PRNGKey(0)
    state = trainer.create_train_state(rng, model, (128, 2), (128, 1), config)
    objective = trainer.objective_by_name("ddpm")
    step = trainer.make_train_step(model, objective, betas, True)

    batch = jnp.asarray(synthetic.toy_distribution(128,
                                                   np.random.default_rng(0)))
    batch = batch / 9.0
    losses = []
    for i in range(30):
        rng, srng = jax.random.split(rng)
        state, m = step(state, batch, srng)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_tracks_params():
    betas = schedules.noise_schedule(1e-6, 0.01, 10, "linear")
    model = get_model("ToyDDPM", num_layers=1, mlp_dims=16)
    config = trainer.TrainConfig(mu=0.5)
    rng = jax.random.PRNGKey(0)
    state = trainer.create_train_state(rng, model, (8, 2), (8, 1), config)
    step = trainer.make_train_step(model, trainer.objective_by_name("ddpm"),
                                   betas, True)
    batch = jnp.ones((8, 2)) * 0.5
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    # ema = 0.5*old + 0.5*new: must differ from both unless no update happened
    p_new = jax.tree_util.tree_leaves(state2.params)[0]
    e_new = jax.tree_util.tree_leaves(state2.ema_params)[0]
    assert not np.allclose(np.asarray(p_new), np.asarray(e_new))


@pytest.mark.slow
def test_toy_ncsn_ald_end_to_end(tmp_path):
    """Score-matching path: train ToyNCSN with DSM, sample with annealed
    Langevin dynamics, check Fréchet distance (the reference's
    configs/mixture/mixture-single-2.cfg scenario, DSM instead of SSM)."""
    lo, hi = -9.0, 9.0
    sigmas = schedules.noise_schedule(1.0, 1e-2, 10, "geometric")
    model = get_model("ToyNCSN", num_layers=3, mlp_dims=128)
    config = trainer.TrainConfig(loss="dsm", learning_rate=1e-3,
                                 batch_size=256, epochs=1, max_steps=2000,
                                 snapshot_freq=1000, logging_freq=500,
                                 ema=True, verbose=False)
    state = trainer.fit(model, sigmas,
                        _toy_batches(2000, 256, lo, hi, 0),
                        _toy_batches(4, 256, lo, hi, 1),
                        input_shape=(2,), config=config,
                        model_dir=str(tmp_path / "ncsn"))

    params = state.sampling_params
    model_fn = lambda x, cond: model.apply(params, x, cond)
    rho = np.sqrt(12) / 2
    init = jax.random.uniform(jax.random.PRNGKey(5), (2000, 2),
                              minval=-rho, maxval=rho)
    out = samplers.annealed_langevin_dynamics(
        jax.random.PRNGKey(7), model_fn, sigmas, init, epsilon=1e-4, T=100,
        denoise=True, collect_steps=0, collect_metrics=False)
    gen = np.asarray(out.state)
    gen = (gen + 1) / 2 * (hi - lo) + lo

    real = synthetic.toy_distribution(2000, np.random.default_rng(9))
    fd = metrics.frechet_distance(real, gen)
    assert fd < 8.0, f"ALD FD too high: {fd}"
    frac_pos = (gen[:, 0] > 0).mean()
    assert 0.55 < frac_pos < 0.98


def test_train_chunk_equals_sequential_steps():
    """make_train_chunk(K batches, rng) == K make_train_step calls with the
    chunk's split keys — bitwise-identical params, EMA, and loss rows."""
    betas = schedules.noise_schedule(1e-6, 0.01, 10, "linear")
    model = get_model("ToyDDPM", num_layers=1, mlp_dims=16)
    objective = trainer.objective_by_name("ddpm")
    config = trainer.TrainConfig(loss="ddpm", batch_size=8, ema=True)

    def fresh_state():
        return trainer.create_train_state(
            jax.random.PRNGKey(0), model, (8, 2), (8, 1), config)

    K = 3
    batches = jnp.asarray(
        np.random.default_rng(0).normal(size=(K, 8, 2)).astype(np.float32))
    rng = jax.random.PRNGKey(5)
    keys = jax.random.split(rng, K)

    chunk_fn = trainer.make_train_chunk(model, objective, betas, True)
    step_fn = trainer.make_train_step(model, objective, betas, True)

    state_a, mk = chunk_fn(fresh_state(), batches, rng)
    state_b = fresh_state()
    seq_losses = []
    for i in range(K):
        state_b, m = step_fn(state_b, batches[i], keys[i])
        seq_losses.append(float(m["loss"]))

    assert int(state_a.step) == int(state_b.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.ema_params),
                    jax.tree_util.tree_leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mk["loss"]), seq_losses, rtol=1e-5)


def test_scan_chunk_fit_boundaries(tmp_path):
    """Chunked fit clamps to snapshot/max-step boundaries exactly: snapshots
    land at the same global steps as the per-step loop, and training stops
    at max_steps even when it is not a chunk multiple."""
    betas = schedules.noise_schedule(1e-6, 0.01, 10, "linear")

    def run(scan_chunk, tag):
        model = get_model("ToyDDPM", num_layers=1, mlp_dims=16)
        config = trainer.TrainConfig(loss="ddpm", batch_size=8, epochs=1,
                                     max_steps=10, snapshot_freq=6,
                                     logging_freq=100, verbose=False,
                                     scan_chunk=scan_chunk)
        seen = []
        state = trainer.fit(model, betas, _toy_batches(50, 8, -9, 9, 0),
                            _toy_batches(1, 8, -9, 9, 1), (2,), config,
                            str(tmp_path / tag),
                            snapshot_callback=lambda s, em, i:
                            seen.append(int(s.step)))
        return int(state.step), seen

    step_c, snaps_c = run(4, "chunked")    # chunks: 4, 2(clamp@6), 4 -> 10
    step_s, snaps_s = run(1, "perstep")
    assert step_c == step_s == 10
    assert snaps_c == snaps_s == [6, 10]


def test_scan_chunk_mdn_fit(tmp_path):
    """The no-rng (MDN) harness drives the chunked loop too."""
    from smd_tpu.training import mdn as mdn_trainer

    model = get_model("TransformerMDN", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32, mdn_mixtures=3)
    config = trainer.TrainConfig(batch_size=4, epochs=1, max_steps=6,
                                 snapshot_freq=100, logging_freq=100,
                                 ema=False, verbose=False, scan_chunk=4)
    rng = np.random.default_rng(0)

    def data():
        for _ in range(20):
            yield rng.normal(size=(4, 6, 5)).astype(np.float32)

    state = mdn_trainer.fit(model, data, lambda: [next(iter(data()))],
                            (6, 5), config, str(tmp_path / "mdn"))
    assert int(state.step) == 6


def test_resume_at_completion_is_noop(tmp_path):
    """Re-running a completed job must not train past max_steps (both the
    per-step and chunked paths guard this)."""
    betas = schedules.noise_schedule(1e-6, 0.01, 10, "linear")

    for tag, chunk in (("s", 1), ("c", 4)):
        model = get_model("ToyDDPM", num_layers=1, mlp_dims=16)
        config = trainer.TrainConfig(loss="ddpm", batch_size=8, epochs=1,
                                     max_steps=8, snapshot_freq=100,
                                     logging_freq=100, verbose=False,
                                     scan_chunk=chunk)
        d = str(tmp_path / tag)
        s1 = trainer.fit(model, betas, _toy_batches(20, 8, -9, 9, 0),
                         _toy_batches(1, 8, -9, 9, 1), (2,), config, d)
        assert int(s1.step) == 8
        s2 = trainer.fit(model, betas, _toy_batches(20, 8, -9, 9, 2),
                         _toy_batches(1, 8, -9, 9, 1), (2,), config, d)
        assert int(s2.step) == 8


def test_make_optimizer_adam_m_bf16_state_dtype():
    """--adam_m_bf16 stores Adam's first moment in bfloat16 (profile_train
    measured -3% step time, indistinguishable loss; the EMA stays fp32 —
    see optimizer.make_optimizer)."""
    import jax
    import jax.numpy as jnp
    import optax

    from smd_tpu.training.optimizer import make_optimizer

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    for flag, want in ((True, jnp.bfloat16), (False, jnp.float32)):
        tx = make_optimizer(adam_m_bf16=flag)
        state = tx.init(params)
        mus = [s.mu for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")]
        assert mus, "no ScaleByAdamState found"
        assert mus[0]["w"].dtype == want
        # One update still works and keeps param dtype fp32.
        grads = {"w": jnp.ones((4, 4), jnp.float32)}
        updates, _ = tx.update(grads, state, params)
        assert updates["w"].dtype == jnp.float32
