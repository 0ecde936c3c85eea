"""BPR accuracy gate on synthetic low-rank data.

Analog of the reference's ml-1m NDCG threshold test
(model/cf/model_test.go:35-48) without network egress: a trainer that
implements BPR correctly must push NDCG@10 far above the random baseline on
low-rank ground-truth data.
"""

import numpy as np

from gorse_tpu.data import synthetic_cf
from gorse_tpu.models import BPR, FitConfig, Params, evaluate_model


def test_bpr_recovers_low_rank_structure():
    data = synthetic_cf(n_users=300, n_items=200, rank=4, density=0.1, seed=7)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8, n_epochs=30, lr=0.05, reg=0.01))
    score = model.fit(train, test, FitConfig(verbose=10, candidates=50, batch_size=256))
    # random baseline for 1 target among ~51 candidates: NDCG ~ 0.08
    assert score.ndcg > 0.35, f"NDCG@10 too low: {score.ndcg}"


def test_bpr_save_load(tmp_path):
    data = synthetic_cf(n_users=50, n_items=40, density=0.2, seed=8)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=4, n_epochs=2))
    model.fit(train, test, FitConfig(verbose=2, candidates=10, batch_size=64))
    model.save(tmp_path / "bpr")
    from gorse_tpu.models import MatrixFactorization

    loaded = MatrixFactorization.load(tmp_path / "bpr")
    assert loaded.name == "bpr"
    np.testing.assert_array_equal(
        np.asarray(loaded.user_factors), np.asarray(model.user_factors)
    )
    assert loaded.user_index.to_number("u1") == model.user_index.to_number("u1")
    m1 = evaluate_model(loaded, test, train)
    m2 = evaluate_model(model, test, train)
    np.testing.assert_allclose(m1["NDCG"], m2["NDCG"], rtol=1e-6)


def test_bpr_early_stopping():
    data = synthetic_cf(n_users=60, n_items=50, density=0.15, seed=9)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=4, n_epochs=50))
    score = model.fit(train, test, FitConfig(verbose=1, patience=3, candidates=20, batch_size=64))
    assert score.ndcg >= 0.0  # smoke: early stopping must not crash


def test_bpr_mid_training_checkpoints(tmp_path):
    from gorse_tpu.data import synthetic_cf

    data = synthetic_cf(n_users=40, n_items=30, density=0.2, seed=12)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=4, n_epochs=4))
    model.fit(train, test, FitConfig(verbose=2, candidates=10, checkpoint_dir=str(tmp_path)))
    ckpts = sorted(tmp_path.glob("bpr_epoch_*.npz"))
    assert len(ckpts) == 2  # epochs 2 and 4
    arr = np.load(ckpts[-1])
    assert arr["user_factors"].shape == (40, 4)
    assert float(arr["ndcg"]) >= 0.0
