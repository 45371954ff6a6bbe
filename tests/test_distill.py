"""Progressive distillation: grids, loss contract, end-to-end few-step wins."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.diffusion import samplers, schedules
from smd_tpu.training import distill


def _betas():
    return schedules.noise_schedule(1e-6, 0.01, 1000, "linear")


def test_distill_grid_shape_and_endpoints():
    betas = _betas()
    c = schedules.ddpm_constants(betas)
    grid = distill.distill_grid(betas, 8, lam_max=2.5, constants=c)
    g = np.asarray(grid)
    assert g.shape == (9,)
    # strictly ascending in cleanliness
    assert (np.diff(g) > 0).all()
    # init boundary == the DDIM init level (abar at t = T-1)
    np.testing.assert_allclose(g[0], float(c.alphas_prod[-1]), rtol=1e-6)
    # clean final boundary
    np.testing.assert_allclose(g[-1], 1.0 - 1e-6)
    # the lambda cap binds: the second-to-last boundary is sigmoid(2*2.5)
    np.testing.assert_allclose(g[-2], 1 / (1 + np.exp(-5.0)), rtol=1e-5)


def test_halve_grid_nests_exactly():
    betas = _betas()
    dense = distill.distill_grid(betas, 16)
    student, mids = distill.halve_grid(dense)
    assert student.shape == (9,) and mids.shape == (8,)
    np.testing.assert_array_equal(np.asarray(student), np.asarray(dense)[::2])
    np.testing.assert_array_equal(np.asarray(mids), np.asarray(dense)[1::2])
    # halving again keeps both ends
    s2, m2 = distill.halve_grid(student)
    np.testing.assert_allclose(np.asarray(s2)[[0, -1]],
                               np.asarray(dense)[[0, -1]])
    with pytest.raises(ValueError):
        distill.halve_grid(distill.distill_grid(betas, 5))


def test_distillation_loss_zero_for_consistent_oracle():
    """Point-mass-at-zero oracle: teacher's 2-step and the oracle student's
    1-step land identically, so the loss must be exactly ~0 — and clearly
    positive for a wrong student."""
    betas = _betas()
    dense = distill.distill_grid(betas, 16)
    grid, mids = distill.halve_grid(dense)

    def oracle(z, cond):  # eps = z / sigma for data == delta(0)
        return z / jnp.sqrt(1.0 - cond**2)

    batch = jnp.zeros((32, 4))
    rng = jax.random.PRNGKey(0)
    loss = distill.progressive_distillation_loss(batch, oracle, oracle,
                                                 grid, mids, rng)
    assert float(loss) < 1e-8

    wrong = lambda z, cond: jnp.zeros_like(z)
    loss_wrong = distill.progressive_distillation_loss(batch, wrong, oracle,
                                                       grid, mids, rng)
    assert float(loss_wrong) > 1e-2


def test_distilled_sampler_oracle_contracts_to_zero():
    betas = _betas()
    grid = distill.distill_grid(betas, 4)

    def oracle(z, cond):
        return z / jnp.sqrt(1.0 - cond**2)

    init = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    out = samplers.distilled_ddim_dynamics(jax.random.PRNGKey(2), oracle,
                                           grid, init)
    assert np.abs(np.asarray(out.state)).mean() < 0.01
    assert out.collection is None and out.metrics is None


def test_distilled_sampler_infill():
    betas = _betas()
    grid = distill.distill_grid(betas, 4)
    oracle = lambda z, cond: z / jnp.sqrt(1.0 - cond**2)
    init = jax.random.normal(jax.random.PRNGKey(3), (8, 16, 4))
    target = jnp.full((8, 16, 4), 0.25)
    masks = jnp.zeros((8, 16, 4)).at[:, :4].set(1.0)
    out = samplers.distilled_ddim_dynamics(jax.random.PRNGKey(4), oracle,
                                           grid, init, infill_samples=target,
                                           infill_masks=masks)
    x = np.asarray(out.state)
    np.testing.assert_allclose(x[:, :4], 0.25, atol=1e-5)
    assert np.abs(x[:, 4:]).mean() < 0.01


def test_progressive_distill_toy_beats_fewstep_ddim(tmp_path):
    """End to end on the 2-D toy mixture: a model distilled to 4/2 steps
    must beat the BASE model's 4/2-step DDIM by a wide FD margin."""
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

    stages = distill.progressive_distill(
        model, params, betas, infinite(), start_steps=16, end_steps=2,
        steps_per_stage=400, learning_rate=2e-4, seed=3)
    assert sorted(stages) == [2, 4, 8, 16]

    real = synthetic.toy_distribution(2000, np.random.default_rng(9))
    init = jax.random.normal(jax.random.PRNGKey(42), (2000, 2))

    def fd_of(fn):
        gen = np.asarray(fn(jax.random.PRNGKey(11), init))
        gen = (gen + 1) / 2 * (hi - lo) + lo
        return metrics.frechet_distance(real, gen)

    base_fn = lambda x, c: model.apply(params, x, c)
    fds = {}
    for n in (4, 2):
        st = stages[n]
        st_fn = lambda x, c, p=st["params"]: model.apply(p, x, c)
        fds[n] = fd_of(lambda k, x: samplers.distilled_ddim_dynamics(
            k, st_fn, st["grid"], x).state)
        # Every distilled stage must hold DDIM-50-class quality (the same
        # FD bound the end-to-end training test uses for full sampling).
        assert fds[n] < 5.0, f"{n}-step distilled FD: {fds[n]:.2f}"
    # At 2 steps the base model collapses (uniform-t DDIM-2 measured FD ~13
    # on this mixture); the distilled 2-step model must beat it decisively.
    fd_ddim2 = fd_of(lambda k, x: samplers.ddim_dynamics(
        k, base_fn, betas, x, num_steps=2).state)
    assert fds[2] < 0.6 * fd_ddim2, \
        f"2-step: distilled FD {fds[2]:.2f} vs DDIM-2 {fd_ddim2:.2f}"


def test_progressive_distill_rejects_non_power_of_2_ratio():
    """start=6,end=2 passes divisibility but the halving loop would emit
    stages {6,3} and never the requested 2-step bundle — must raise."""
    betas = _betas()
    for start, end in [(6, 2), (12, 2), (20, 4), (2, 4)]:
        with pytest.raises(ValueError):
            distill.progressive_distill(
                None, None, betas, iter([]), start_steps=start,
                end_steps=end, steps_per_stage=1)
