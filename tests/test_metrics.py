"""Metric parity tests against scalar reference implementations
(reference: model/cf/evaluator.go:74-160)."""

import math

import numpy as np

from gorse_tpu.ops.metrics import auc, classification_metrics, rank_metrics


def _ref_ndcg(target_set, rank_list):
    idcg = sum(1.0 / math.log2(i + 2.0) for i in range(min(len(target_set), len(rank_list))))
    dcg = sum(
        1.0 / math.log2(i + 2.0) for i, item in enumerate(rank_list) if item in target_set
    )
    return dcg / idcg


def _ref_map(target_set, rank_list):
    s, hit = 0.0, 0
    for i, item in enumerate(rank_list):
        if item in target_set:
            hit += 1
            s += hit / (i + 1)
    return s / len(target_set)


def _ref_mrr(target_set, rank_list):
    for i, item in enumerate(rank_list):
        if item in target_set:
            return 1.0 / (i + 1)
    return 0.0


def test_rank_metrics_match_scalar_reference():
    rng = np.random.default_rng(0)
    n_users, n_cand, k = 16, 30, 10
    scores = rng.normal(size=(n_users, n_cand)).astype(np.float32)
    is_target = np.zeros((n_users, n_cand), dtype=bool)
    valid = np.ones((n_users, n_cand), dtype=bool)
    for u in range(n_users):
        t = rng.integers(1, 4)
        is_target[u, :t] = True
        # some invalid padding at the end
        pad = rng.integers(0, 5)
        if pad:
            valid[u, -pad:] = False
    out = rank_metrics(scores, is_target, valid, top_k=k)

    # scalar reference
    ndcgs, precs, recalls, hrs, maps_, mrrs = [], [], [], [], [], []
    for u in range(n_users):
        cand = [(scores[u, i], i) for i in range(n_cand) if valid[u, i]]
        cand.sort(reverse=True)
        rank_list = [i for _, i in cand[:k]]
        targets = {i for i in range(n_cand) if is_target[u, i] and valid[u, i]}
        hits = sum(1 for i in rank_list if i in targets)
        ndcgs.append(_ref_ndcg(targets, rank_list))
        precs.append(hits / k)
        recalls.append(hits / len(targets))
        hrs.append(1.0 if hits else 0.0)
        maps_.append(_ref_map(targets, rank_list))
        mrrs.append(_ref_mrr(targets, rank_list))
    np.testing.assert_allclose(float(out["NDCG"]), np.mean(ndcgs), rtol=1e-5)
    np.testing.assert_allclose(float(out["Precision"]), np.mean(precs), rtol=1e-5)
    np.testing.assert_allclose(float(out["Recall"]), np.mean(recalls), rtol=1e-5)
    np.testing.assert_allclose(float(out["HR"]), np.mean(hrs), rtol=1e-5)
    np.testing.assert_allclose(float(out["MAP"]), np.mean(maps_), rtol=1e-5)
    np.testing.assert_allclose(float(out["MRR"]), np.mean(mrrs), rtol=1e-5)


def test_rank_metrics_perfect_and_zero():
    # perfect: target has the highest score
    scores = np.array([[5.0, 1.0, 0.5, 0.1]], dtype=np.float32)
    is_target = np.array([[True, False, False, False]])
    valid = np.ones((1, 4), dtype=bool)
    out = rank_metrics(scores, is_target, valid, top_k=2)
    assert float(out["NDCG"]) == 1.0
    assert float(out["HR"]) == 1.0
    assert float(out["MRR"]) == 1.0
    # zero: target scored below top-k
    scores = np.array([[0.0, 5.0, 4.0, 3.0]], dtype=np.float32)
    out = rank_metrics(scores, is_target, valid, top_k=2)
    assert float(out["NDCG"]) == 0.0
    assert float(out["Recall"]) == 0.0


def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    labels = (rng.uniform(size=200) > 0.6).astype(np.float32)
    preds = rng.normal(size=200).astype(np.float32) + labels
    ours = float(auc(labels, preds))
    ref = roc_auc_score(labels, preds)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_auc_with_padding():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(2)
    labels = (rng.uniform(size=100) > 0.5).astype(np.float32)
    preds = rng.normal(size=100).astype(np.float32)
    valid = np.ones(100, dtype=bool)
    valid[80:] = False
    ours = float(auc(labels, preds, valid))
    ref = roc_auc_score(labels[:80], preds[:80])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_classification_metrics():
    labels = np.array([1, 1, 0, 0], dtype=np.float32)
    logits = np.array([2.0, -1.0, -2.0, 1.0], dtype=np.float32)
    out = classification_metrics(labels, logits)
    assert float(out["Accuracy"]) == 0.5
    assert float(out["Precision"]) == 0.5
    assert float(out["Recall"]) == 0.5


def test_auc_tie_symmetry():
    """Tied predictions give 0.5 credit regardless of row order
    (review finding: double-argsort ranks made AUC order-dependent)."""
    import jax.numpy as jnp

    from gorse_tpu.ops.metrics import auc

    assert float(auc(jnp.array([1.0, 0.0]), jnp.array([0.5, 0.5]))) == 0.5
    assert float(auc(jnp.array([0.0, 1.0]), jnp.array([0.5, 0.5]))) == 0.5
    # mixed ties: positives tied with half the negatives
    labels = jnp.array([1.0, 1.0, 0.0, 0.0])
    preds = jnp.array([0.7, 0.5, 0.5, 0.1])
    # pairs: (p1,n1)=win, (p1,n2)=win, (p2,n1)=tie(0.5), (p2,n2)=win -> 3.5/4
    assert float(auc(labels, preds)) == 0.875


def test_auc_large_no_overflow():
    """Rank sums stay finite past the int32 range (review finding:
    n_pos*n_neg overflowed at ~46k positives)."""
    import jax.numpy as jnp
    import numpy as np

    from gorse_tpu.ops.metrics import auc

    rng = np.random.default_rng(0)
    n = 120_000
    labels = (rng.random(n) < 0.5).astype(np.float32)
    preds = labels * 0.8 + rng.standard_normal(n).astype(np.float32)
    a = float(auc(jnp.asarray(labels), jnp.asarray(preds)))
    # float64 reference with average ranks
    order = np.argsort(preds, kind="stable")
    ranks = np.empty(n); ranks[order] = np.arange(1, n + 1)
    # average tie ranks
    sp = np.sort(preds)
    lo = np.searchsorted(sp, preds, "left"); hi = np.searchsorted(sp, preds, "right")
    avg = (lo + hi + 1) / 2.0
    npos = labels.sum(); nneg = n - npos
    ref = (avg[labels > 0.5].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert 0.0 <= a <= 1.0
    assert abs(a - ref) < 1e-5
