"""eALS accuracy gate + parity of the exact solve against the objective.

Analog of model/cf/model_test.go:93-104 (ml-1m eALS NDCG gate) on synthetic
low-rank data, plus a direct check that the batched Cholesky solve minimizes
the eALS objective (weight 1 observed / alpha missing) better than any small
perturbation — validating the CCD -> exact-solve reformulation.
"""

import numpy as np

from gorse_tpu.data import synthetic_cf
from gorse_tpu.models import FitConfig, Params, create_mf_model
from gorse_tpu.models.als import ALS, _als_solve_side


def _eals_objective(p, q, user_fb, alpha, reg):
    """Scalar reference objective: sum over observed (1 - p.q)^2 +
    alpha * sum over missing (p.q)^2 + reg * ||p||^2 (per user)."""
    total = 0.0
    scores = p @ q.T
    for u in range(p.shape[0]):
        obs = [i for i in user_fb[u] if i >= 0]
        miss = np.setdiff1d(np.arange(q.shape[0]), obs)
        total += np.sum((1.0 - scores[u, obs]) ** 2)
        total += alpha * np.sum(scores[u, miss] ** 2)
        total += reg * np.sum(p[u] ** 2)
    return total


def test_exact_solve_minimizes_eals_objective():
    rng = np.random.default_rng(0)
    n_users, n_items, k = 8, 12, 4
    q = rng.normal(size=(n_items, k)).astype(np.float32)
    fb = np.full((n_users, 6), -1, dtype=np.int32)
    for u in range(n_users):
        c = rng.integers(1, 6)
        fb[u, :c] = rng.choice(n_items, size=c, replace=False)
    alpha, reg = 0.1, 0.05
    p = np.asarray(_als_solve_side(q, fb, block=8, alpha=alpha, reg=reg))
    base = _eals_objective(p, q, fb, alpha, reg)
    # any perturbation must not improve the objective (it's the exact argmin)
    for _ in range(10):
        pert = p + 0.01 * rng.normal(size=p.shape).astype(np.float32)
        assert _eals_objective(pert, q, fb, alpha, reg) >= base - 1e-4


def test_als_recovers_low_rank_structure():
    data = synthetic_cf(n_users=300, n_items=200, rank=4, density=0.1, seed=7)
    train, test = data.split_cf(seed=0)
    model = ALS(Params(n_factors=8, n_epochs=10, reg=0.015, alpha=0.05))
    score = model.fit(train, test, FitConfig(verbose=5, candidates=50))
    assert score.ndcg > 0.35, f"NDCG@10 too low: {score.ndcg}"


def test_verbose_zero_disables_mid_training_eval():
    """verbose=0 must mean 'evaluate only at the end', not divide by zero."""
    from gorse_tpu.models import BPR

    data = synthetic_cf(n_users=40, n_items=30, density=0.2, seed=2)
    train, test = data.split_cf(seed=0)
    for model in (ALS(Params(n_factors=4, n_epochs=3)),
                  BPR(Params(n_factors=4, n_epochs=3))):
        score = model.fit(train, test, FitConfig(verbose=0, candidates=10,
                                                 batch_size=64))
        assert 0.0 <= score.ndcg <= 1.0


def test_als_registry_and_save_load(tmp_path):
    model = create_mf_model("als", Params(n_factors=4, n_epochs=2))
    assert isinstance(model, ALS)
    data = synthetic_cf(n_users=40, n_items=30, density=0.2, seed=1)
    train, test = data.split_cf(seed=0)
    model.fit(train, test, FitConfig(verbose=2, candidates=10))
    model.save(tmp_path / "als")
    from gorse_tpu.models import MatrixFactorization

    loaded = MatrixFactorization.load(tmp_path / "als")
    assert loaded.name == "als"
    np.testing.assert_array_equal(
        np.asarray(loaded.item_factors), np.asarray(model.item_factors)
    )
