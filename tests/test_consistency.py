"""Consistency distillation: loss contract, sampler, end-to-end 1-step win."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.diffusion import samplers, schedules
from smd_tpu.training import consistency, distill


def _betas():
    return schedules.noise_schedule(1e-6, 0.01, 1000, "linear")


def _oracle(z, cond):
    """eps = z / sigma for data == delta(0): the exact score model."""
    return z / jnp.sqrt(1.0 - cond**2)


def test_consistency_f_is_clipped_x0():
    z = jnp.asarray([[0.5, -4.0], [2.0, 0.1]])
    abar = jnp.full((2, 1), 0.64)
    # eps = 0 model: x0 = z / sqrt(abar), then clipped to [-1, 1]
    f = consistency.consistency_f(lambda x, c: jnp.zeros_like(x), z, abar)
    np.testing.assert_allclose(
        np.asarray(f), np.clip(np.asarray(z) / 0.8, -1, 1), rtol=1e-6)
    f_raw = consistency.consistency_f(lambda x, c: jnp.zeros_like(x), z,
                                      abar, clip_x0=False)
    np.testing.assert_allclose(np.asarray(f_raw), np.asarray(z) / 0.8,
                               rtol=1e-6)


def test_consistency_f_boundary_condition():
    """At the grid's clean end (abar = 1 - 1e-6) f is identity to O(1e-3)
    even for a badly wrong eps model — the x0 parameterization supplies the
    CM boundary condition without c_skip/c_out."""
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 4)) * 0.5
    wild = lambda x, c: jnp.ones_like(x) * 3.0
    f = consistency.consistency_f(wild, z, jnp.asarray(1.0 - 1e-6),
                                  clip_x0=False)
    np.testing.assert_allclose(np.asarray(f), np.asarray(z), atol=5e-3)


def test_cd_loss_zero_for_consistent_oracle():
    """The oracle's x0 prediction is 0 at every level, so student and
    target agree exactly along the teacher trajectory -> loss ~ 0; a wrong
    student is clearly positive."""
    betas = _betas()
    dense = distill.distill_grid(betas, 32)
    grid, mids = distill.halve_grid(dense)
    batch = jnp.zeros((32, 4))
    rng = jax.random.PRNGKey(0)
    loss = consistency.consistency_distillation_loss(
        batch, _oracle, _oracle, _oracle, grid, mids, rng)
    assert float(loss) < 1e-6

    wrong = lambda z, cond: jnp.zeros_like(z)  # x0 = z/alpha, not 0
    loss_wrong = consistency.consistency_distillation_loss(
        batch, wrong, _oracle, _oracle, grid, mids, rng)
    assert float(loss_wrong) > 1e-2


def test_ct_loss_zero_for_consistent_oracle():
    """Teacher-free CT loss: the oracle predicts x0 = 0 at every level, so
    shared-noise adjacent points give identical predictions -> loss ~ 0; a
    wrong student is clearly positive (scaled by the 1/(sig_n - sig_{n+1})
    iCT weighting, so compare against a loose bound)."""
    betas = _betas()
    grid = distill.distill_grid(betas, 16)
    batch = jnp.zeros((32, 4))
    rng = jax.random.PRNGKey(0)
    loss = consistency.consistency_training_loss(batch, _oracle, _oracle,
                                                 grid, rng)
    assert float(loss) < 1e-4

    wrong = lambda z, cond: jnp.zeros_like(z)
    loss_wrong = consistency.consistency_training_loss(batch, wrong, _oracle,
                                                       grid, rng)
    assert float(loss_wrong) > 1e-2


def test_ct_lognormal_sampling_prefers_mid_sigmas():
    """The discretized lognormal (p_mean=-1.1) must place most segment
    draws away from the extreme ends of the grid: with a two-sided check
    on a fine grid, neither the noisiest nor the cleanest quartile should
    absorb the majority of draws."""
    betas = _betas()
    grid = distill.distill_grid(betas, 64)
    # Recover the segment distribution by instrumenting the same math the
    # loss uses.
    sig = jnp.sqrt((1.0 - grid) / grid)
    cdf = jax.scipy.special.erf((jnp.log(sig) + 1.1) / (jnp.sqrt(2.0) * 2.0))
    mass = np.asarray(jnp.maximum(cdf[:-1] - cdf[1:], 0.0))
    mass = mass / mass.sum()
    assert mass[:16].sum() < 0.5 and mass[-16:].sum() < 0.5
    assert mass[16:48].sum() > 0.3


def test_consistency_train_toy_one_step(tmp_path):
    """End to end teacher-free CT on the 2-D toy mixture: 1-step sampling
    from a CT-refined model must land close to the data distribution."""
    from smd_tpu.data import synthetic
    from smd_tpu.eval import metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer

    lo, hi = -9.0, 9.0
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    model = get_model("ToyDDPM", num_layers=3, mlp_dims=128)

    def batches(n, batch, seed):
        def gen():
            rng = np.random.default_rng(seed)
            for _ in range(n):
                x = synthetic.toy_distribution(batch, rng)
                yield ((x - lo) / (hi - lo) * 2 - 1).astype(np.float32)
        return gen

    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=256, epochs=1, max_steps=1500,
                                 snapshot_freq=10000, logging_freq=1000,
                                 ema=True, verbose=False, save_ckpt=False)
    state = trainer.fit(model, betas, batches(1500, 256, 0),
                        batches(2, 256, 1), input_shape=(2,), config=config,
                        model_dir=str(tmp_path / "toy"))
    params = state.sampling_params

    def infinite():
        rng = np.random.default_rng(7)
        while True:
            x = synthetic.toy_distribution(256, rng)
            yield ((x - lo) / (hi - lo) * 2 - 1).astype(np.float32)

    out = consistency.consistency_train(
        model, params, betas, infinite(), steps=1200,
        seg_schedule=(8, 16, 32), learning_rate=2e-4, seed=3)
    assert out["grid"].shape[0] == 33  # final (finest) stage's grid ships

    real = synthetic.toy_distribution(2000, np.random.default_rng(9))
    init = jax.random.normal(jax.random.PRNGKey(42), (2000, 2))
    ct_fn = lambda x, c: model.apply(out["params"], x, c)
    gen = np.asarray(samplers.consistency_dynamics(
        jax.random.PRNGKey(11), ct_fn, out["grid"], init, num_steps=1).state)
    gen = (gen + 1) / 2 * (hi - lo) + lo
    fd1 = metrics.frechet_distance(real, gen)
    assert fd1 < 6.0, f"1-step CT FD: {fd1:.2f}"


def test_consistency_sampler_oracle_contracts_to_zero():
    betas = _betas()
    out = consistency.consistency_distill  # noqa: silence unused-import lint
    dense = distill.distill_grid(betas, 16)
    grid, _ = distill.halve_grid(dense)
    init = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    for k in (1, 2, 4):
        res = samplers.consistency_dynamics(jax.random.PRNGKey(2), _oracle,
                                            grid, init, num_steps=k)
        assert np.abs(np.asarray(res.state)).mean() < 0.01, k
        assert res.collection is None and res.metrics is None


def test_consistency_sampler_one_step_is_single_f_eval():
    """num_steps=1 must equal f(init, grid[0]) exactly (no re-noising)."""
    betas = _betas()
    grid, _ = distill.halve_grid(distill.distill_grid(betas, 16))
    init = jax.random.normal(jax.random.PRNGKey(3), (32, 5))
    got = samplers.consistency_dynamics(jax.random.PRNGKey(4), _oracle,
                                        grid, init, num_steps=1).state
    want = consistency.consistency_f(_oracle, init, grid[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_consistency_sampler_rejects_bad_num_steps():
    betas = _betas()
    grid, _ = distill.halve_grid(distill.distill_grid(betas, 8))
    init = jnp.zeros((2, 3))
    for k in (0, 9):
        with pytest.raises(ValueError):
            samplers.consistency_dynamics(jax.random.PRNGKey(0), _oracle,
                                          grid, init, num_steps=k)


def test_consistency_sampler_infill():
    betas = _betas()
    grid, _ = distill.halve_grid(distill.distill_grid(betas, 8))
    init = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 4))
    target = jnp.full((8, 16, 4), 0.25)
    masks = jnp.zeros((8, 16, 4)).at[:, :4].set(1.0)
    out = samplers.consistency_dynamics(jax.random.PRNGKey(6), _oracle,
                                        grid, init, num_steps=2,
                                        infill_samples=target,
                                        infill_masks=masks)
    x = np.asarray(out.state)
    np.testing.assert_allclose(x[:, :4], 0.25, atol=1e-5)
    assert np.abs(x[:, 4:]).mean() < 0.01


def test_cd_scan_matches_sequential_steps():
    """K scan-fused CD steps == K sequential make_cd_step calls (same rng
    split discipline), so --scan_chunk is a pure dispatch optimization."""
    import optax
    from smd_tpu.models import get_model
    from smd_tpu.training.state import TrainState

    betas = _betas()
    grid, mids = distill.halve_grid(distill.distill_grid(betas, 8))
    model = get_model("ToyDDPM", num_layers=2, mlp_dims=32)
    rng = jax.random.PRNGKey(7)
    params = model.init(rng, jnp.zeros((4, 2)), jnp.ones((4, 1)))
    tx = optax.adam(1e-3)

    batches = jax.random.normal(jax.random.PRNGKey(8), (3, 16, 2)) * 0.5
    key = jax.random.PRNGKey(9)

    state_a = TrainState.create(jax.tree_util.tree_map(jnp.copy, params),
                                tx, ema=True, ema_mu=0.95)
    chunk_fn = consistency.make_cd_scan(model, params, grid, mids)
    state_a, losses = chunk_fn(state_a, batches, key)

    state_b = TrainState.create(jax.tree_util.tree_map(jnp.copy, params),
                                tx, ema=True, ema_mu=0.95)
    step_fn = consistency.make_cd_step(model, params, grid, mids)
    keys = jax.random.split(key, 3)
    seq_losses = []
    for i in range(3):
        state_b, m = step_fn(state_b, batches[i], keys[i])
        seq_losses.append(float(m["loss"]))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        state_a.ema_params, state_b.ema_params)


def test_consistency_distill_toy_one_step_beats_fewstep_ddim(tmp_path):
    """End to end on the 2-D toy mixture: the consistency-distilled 1-step
    sampler must decisively beat the base model's 2-step DDIM (the regime
    where progressive distillation collapses on the flagship)."""
    from smd_tpu.data import synthetic
    from smd_tpu.eval import metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer

    lo, hi = -9.0, 9.0
    betas = schedules.noise_schedule(1e-6, 0.01, 200, "linear")
    model = get_model("ToyDDPM", num_layers=3, mlp_dims=128)

    def batches(n, batch, seed):
        def gen():
            rng = np.random.default_rng(seed)
            for _ in range(n):
                x = synthetic.toy_distribution(batch, rng)
                yield ((x - lo) / (hi - lo) * 2 - 1).astype(np.float32)
        return gen

    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=256, epochs=1, max_steps=2000,
                                 snapshot_freq=10000, logging_freq=1000,
                                 ema=True, verbose=False, save_ckpt=False)
    state = trainer.fit(model, betas, batches(2000, 256, 0),
                        batches(2, 256, 1), input_shape=(2,), config=config,
                        model_dir=str(tmp_path / "toy"))
    params = state.sampling_params

    def infinite():
        rng = np.random.default_rng(7)
        while True:
            x = synthetic.toy_distribution(256, rng)
            yield ((x - lo) / (hi - lo) * 2 - 1).astype(np.float32)

    out = consistency.consistency_distill(
        model, params, betas, infinite(), num_segments=16, steps=800,
        learning_rate=2e-4, ema_mu=0.95, seed=3)

    real = synthetic.toy_distribution(2000, np.random.default_rng(9))
    init = jax.random.normal(jax.random.PRNGKey(42), (2000, 2))

    def fd_of(fn):
        gen = np.asarray(fn(jax.random.PRNGKey(11), init))
        gen = (gen + 1) / 2 * (hi - lo) + lo
        return metrics.frechet_distance(real, gen)

    base_fn = lambda x, c: model.apply(params, x, c)
    cd_fn = lambda x, c: model.apply(out["params"], x, c)
    fd1 = fd_of(lambda k, x: samplers.consistency_dynamics(
        k, cd_fn, out["grid"], x, num_steps=1).state)
    fd2 = fd_of(lambda k, x: samplers.consistency_dynamics(
        k, cd_fn, out["grid"], x, num_steps=2).state)
    fd_ddim2 = fd_of(lambda k, x: samplers.ddim_dynamics(
        k, base_fn, betas, x, num_steps=2).state)
    assert fd1 < 0.6 * fd_ddim2, \
        f"1-step CD FD {fd1:.2f} vs DDIM-2 {fd_ddim2:.2f}"
    assert fd1 < 5.0, f"1-step CD FD: {fd1:.2f}"
    assert fd2 < 5.0, f"2-step CD FD: {fd2:.2f}"


def test_consistency_train_p_mean_plumbing(rng):
    """p_mean/p_std reach the CT loss (round-5 lever: p_mean=0 measured
    better at every step count on the converged flagship base); different
    settings must change the training trajectory from identical seeds."""
    import numpy as np

    from smd_tpu.diffusion import schedules
    from smd_tpu.models import get_model
    from smd_tpu.training import consistency

    model = get_model("DenseDDPM", num_layers=1, mlp_dims=8)
    betas = schedules.noise_schedule(1e-4, 0.02, 8, "linear")
    x = jnp.zeros((2, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 1)))

    def run(p_mean):
        def gen():
            while True:
                yield np.zeros((2, 4), np.float32)
        batches = gen()
        out = consistency.consistency_train(
            model, params, betas, batches, steps=4, seg_schedule=(4,),
            scan_chunk=2, seed=0, p_mean=p_mean)
        return np.concatenate([np.asarray(l).ravel() for l in
                               jax.tree_util.tree_leaves(out["params"])])

    a, b = run(-1.1), run(3.0)
    assert not np.allclose(a, b), \
        "p_mean had no effect on CT training (plumbing broken)"
