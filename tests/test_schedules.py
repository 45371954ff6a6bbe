import numpy as np
import pytest

from smd_tpu.diffusion import schedules


def test_geometric_schedule_endpoints():
    s = schedules.noise_schedule(1.0, 1e-2, 10, "geometric")
    assert s.shape == (10,)
    np.testing.assert_allclose(s[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(s[-1], 1e-2, rtol=1e-5)
    # log-space uniform: ratios constant
    ratios = np.asarray(s[:-1] / s[1:])
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


def test_linear_schedule_monotone():
    s = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    assert s.shape == (1000,)
    diffs = np.diff(np.asarray(s))
    assert (diffs > 0).all()
    np.testing.assert_allclose(s[0], 1e-6, rtol=1e-5)
    np.testing.assert_allclose(s[-1], 0.01, rtol=1e-5)


def test_fibonacci_schedule():
    s = np.asarray(schedules.noise_schedule(num=6, kind="fibonacci"))
    np.testing.assert_allclose(s[:4], [1e-6, 2e-6, 3e-6, 5e-6], rtol=1e-6)
    np.testing.assert_allclose(s[4], s[3] + s[2], rtol=1e-6)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        schedules.noise_schedule(kind="nope")


def test_ddpm_constants_math():
    betas = schedules.noise_schedule(1e-6, 0.01, 100, "linear")
    c = schedules.ddpm_constants(betas)
    alphas = 1 - np.asarray(betas)
    aprod = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(c.alphas_prod), aprod, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c.alphas_prod_prev),
                               np.concatenate([[1.0], aprod[:-1]]), rtol=1e-5)
    # posterior mean coefficients sum to ~1 as t -> 0 noise levels
    np.testing.assert_allclose(
        np.asarray(c.sqrt_recip_alphas_prod), 1 / np.sqrt(aprod), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c.posterior_mu1),
        np.asarray(betas) * np.sqrt(np.concatenate([[1.0], aprod[:-1]])) /
        (1 - aprod), rtol=2e-4)
    assert np.isfinite(np.asarray(c.posterior_log_var)).all()
    assert c.num_steps == 100


def test_cosine_schedule_matches_improved_ddpm_curve():
    """kind='cosine' produces improved-DDPM betas: alpha-bar follows the
    squared-cosine curve, betas increase and stay below the 0.999 clip."""
    import numpy as np

    from smd_tpu.diffusion import schedules

    T = 1000
    betas = np.asarray(schedules.noise_schedule(num=T, kind="cosine"))
    assert betas.shape == (T,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert (np.diff(betas) >= -1e-6).all()   # monotone nondecreasing
    abar = np.cumprod(1.0 - betas)
    s = 0.008
    t = np.arange(1, T + 1) / T
    expect = (np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
              / np.cos(s / (1 + s) * np.pi / 2) ** 2)
    # Exact wherever the 0.999 clip is inactive (the clip binds only at
    # the very last steps where alpha-bar -> 0); fp32 schedule storage
    # bounds the tolerance.
    np.testing.assert_allclose(abar[:-5], expect[:-5], rtol=1e-3,
                               atol=1e-7)
