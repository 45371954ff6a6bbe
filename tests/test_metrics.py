import numpy as np
import pytest

from smd_tpu.eval import metrics


@pytest.fixture
def gaussians(np_rng):
    a = np_rng.normal(size=(500, 8)).astype(np.float32)
    b = np_rng.normal(size=(500, 8)).astype(np.float32)
    shifted = b + 4.0
    return a, b, shifted


def test_frechet_distance_identical_near_zero(gaussians):
    a, b, _ = gaussians
    assert metrics.frechet_distance(a, a) < 1e-6
    assert metrics.frechet_distance(a, b) < 1.0


def test_frechet_distance_shifted_analytic(gaussians):
    a, _, shifted = gaussians
    # FD between N(0,I) and N(4*1,I) in 8-d ~= ||mu||^2 = 8*16 = 128
    fd = metrics.frechet_distance(a, shifted)
    assert abs(fd - 128.0) < 15.0


def test_frechet_distance_flattens_sequences(np_rng):
    a = np_rng.normal(size=(100, 4, 3)).astype(np.float32)
    assert np.isfinite(metrics.frechet_distance(a, a + 0.1))


def test_mmd_rbf(gaussians):
    a, b, shifted = gaussians
    same = metrics.mmd_rbf(a, b, gamma=0.1)
    diff = metrics.mmd_rbf(a, shifted, gamma=0.1)
    assert same < 0.05
    assert diff > same


def test_mmd_polynomial(gaussians):
    a, b, shifted = gaussians
    assert metrics.mmd_polynomial(a, shifted) > metrics.mmd_polynomial(a, b)


def test_prd_identical_vs_disjoint(gaussians):
    a, b, shifted = gaussians
    prd_same = metrics.precision_recall_distribution(a, b, num_runs=2)
    prd_diff = metrics.precision_recall_distribution(a, shifted, num_runs=2)
    f8_same, f18_same = metrics.prd_f_beta_score(prd_same)
    f8_diff, f18_diff = metrics.prd_f_beta_score(prd_diff)
    assert f8_same > 0.9 and f18_same > 0.9
    assert f8_diff < 0.35 and f18_diff < 0.35


def test_f1_score():
    assert metrics.f1_score(1.0, 1.0) == pytest.approx(1.0, abs=1e-6)
    assert metrics.f1_score(1.0, 0.0) == pytest.approx(0.0, abs=1e-6)


def test_improved_precision_recall(gaussians):
    a, b, shifted = gaussians
    p_same, r_same = metrics.precision_recall(a, b)
    p_diff, r_diff = metrics.precision_recall(a, shifted)
    assert p_same > 0.85 and r_same > 0.85
    assert p_diff < 0.2 and r_diff < 0.2


def test_realism_scores(gaussians):
    a, b, shifted = gaussians
    r_same = metrics.realism_scores(a, b)
    r_diff = metrics.realism_scores(a, shifted)
    assert r_same.shape == (500,)
    assert r_same.mean() > r_diff.mean()


def test_ndb_score(gaussians):
    a, b, shifted = gaussians
    assert metrics.ndb_score(a, b, k=10) < 0.3
    assert metrics.ndb_score(a, shifted, k=10) > 0.7


def test_prd_plot_smoke(gaussians, tmp_path):
    a, b, _ = gaussians
    curve = metrics.precision_recall_distribution(a, b, num_runs=1)
    out = str(tmp_path / "prd.png")
    metrics.prd.plot([curve], ["test"], out_path=out)
    import os
    assert os.path.getsize(out) > 0
