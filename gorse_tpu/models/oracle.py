"""Sequential NumPy oracles for the reference's exact CF update loops.

These are *test oracles*: faithful re-implementations of the reference's
sequential, scalar training loops, written to pin down the algorithm the
TPU paths must match. They are deliberately slow and simple — the JAX/Pallas
implementations (models/bpr.py, models/als.py) are asserted against them in
tests/test_oracle.py, which is what grounds the "matches gorse NDCG@10"
claim on something stronger than a toy threshold.

Oracles implemented:

- :func:`bpr_oracle_sweep` / :func:`bpr_oracle_fit` — the BPR pairwise SGD
  loop (reference model/cf/model.go:448-490): per sample draw (user uniform
  among users with feedback via retry, positive uniform within the user's
  feedback, negative by unbounded rejection against the user's FULL positive
  set), then the exact update rule :469-488 with the user update reading
  pre-update item-factor copies.
- :func:`eals_oracle_epoch` / :func:`eals_oracle_fit` — the eALS/CCD loop
  (reference model/cf/model.go:609-738): S = sum of outer products over rows
  WITH feedback only (:646-659, :694-707), then per row a sequential
  per-factor coordinate-descent pass with running residuals (:661-688).

All arithmetic is float32, as in the reference (math32 / float32 slices).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# BPR oracle (reference model/cf/model.go:448-490)
# ---------------------------------------------------------------------------


def bpr_oracle_sweep(
    p: np.ndarray,  # [U, k] f32, updated in place
    q: np.ndarray,  # [I, k] f32, updated in place
    users: np.ndarray,  # [S] int
    pos: np.ndarray,  # [S] int
    neg: np.ndarray,  # [S] int
    lr: float,
    reg: float,
) -> float:
    """Apply one sequence of BPR pairwise updates in sample order.

    The exact reference rule (model/cf/model.go:469-488):
        diff = p_u . q_i - p_u . q_j
        cost += log(1 + exp(-diff))
        grad = sigmoid(-diff)
        q_i += lr * ( grad * p_u - reg * q_i)
        q_j += lr * (-grad * p_u - reg * q_j)
        p_u += lr * ( grad * (q_i_old - q_j_old) - reg * p_u)
    where the user update uses the item rows COPIED before their updates
    (the reference copies all three rows up front, :472-475).
    """
    lr = np.float32(lr)
    reg = np.float32(reg)
    cost = np.float32(0.0)
    for u, i, j in zip(users, pos, neg):
        pu = p[u].copy()
        qi = q[i].copy()
        qj = q[j].copy()
        diff = np.float32(np.dot(pu, qi) - np.dot(pu, qj))
        cost += np.log1p(np.exp(-diff, dtype=np.float32))
        grad = np.float32(1.0) / (np.float32(1.0) + np.exp(diff, dtype=np.float32))
        q[i] += lr * (grad * pu - reg * qi)
        q[j] += lr * (-grad * pu - reg * qj)
        p[u] += lr * (grad * (qi - qj) - reg * pu)
    return float(cost)


def bpr_oracle_sample(
    rng: np.random.Generator,
    user_feedback: list[list[int]],
    n_items: int,
    n_samples: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Draw (user, pos, neg) triples with the reference's sampling scheme
    (model/cf/model.go:450-468): user uniform over [0, U) retried until the
    user has feedback; positive uniform within the user's feedback; negative
    uniform over [0, I) rejected (unbounded retry) against the user's FULL
    positive set."""
    n_users = len(user_feedback)
    pos_sets = [frozenset(fb) for fb in user_feedback]
    users = np.empty(n_samples, np.int64)
    pos = np.empty(n_samples, np.int64)
    neg = np.empty(n_samples, np.int64)
    for s in range(n_samples):
        while True:
            u = rng.integers(0, n_users)
            if user_feedback[u]:
                break
        fb = user_feedback[u]
        i = fb[rng.integers(0, len(fb))]
        ps = pos_sets[u]
        while True:
            j = int(rng.integers(0, n_items))
            if j not in ps:
                break
        users[s], pos[s], neg[s] = u, i, j
    return users, pos, neg


def bpr_oracle_fit(
    user_feedback: list[list[int]],
    n_items: int,
    n_factors: int = 8,
    n_epochs: int = 10,
    lr: float = 0.05,
    reg: float = 0.01,
    init_stddev: float = 0.001,
    seed: int = 0,
    epoch_callback=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full sequential BPR fit with the reference's per-epoch sample count
    (CountFeedback updates per epoch, model/cf/model.go:448) and N(mean,
    stddev) init (:533-537). Returns (user_factors, item_factors)."""
    rng = np.random.default_rng(seed)
    n_users = len(user_feedback)
    nnz = sum(len(fb) for fb in user_feedback)
    p = rng.normal(0.0, init_stddev, size=(n_users, n_factors)).astype(np.float32)
    q = rng.normal(0.0, init_stddev, size=(n_items, n_factors)).astype(np.float32)
    for epoch in range(1, n_epochs + 1):
        users, pos, neg = bpr_oracle_sample(rng, user_feedback, n_items, nnz)
        bpr_oracle_sweep(p, q, users, pos, neg, lr, reg)
        if epoch_callback is not None:
            epoch_callback(epoch, p, q)
    return p, q


# ---------------------------------------------------------------------------
# eALS / CCD oracle (reference model/cf/model.go:609-738)
# ---------------------------------------------------------------------------


def _ccd_gram(factors: np.ndarray, feedback: list[list[int]]) -> np.ndarray:
    """S = sum of f f^T over rows WITH feedback (the reference skips rows
    whose feedback list is empty, model/cf/model.go:650-659)."""
    has = np.array([len(fb) > 0 for fb in feedback], bool)
    f = factors[has]
    return (f.T @ f).astype(np.float32)


def _ccd_update_rows(
    rows: np.ndarray,  # [N, k] rows being updated (in place)
    other: np.ndarray,  # [M, k] fixed side
    feedback: list[list[int]],  # per-row observed ids into `other`
    s: np.ndarray,  # [k, k] gram of the FIXED side over its feedback-rows
    weight: float,
    reg: float,
) -> None:
    """One CCD half-sweep (reference model/cf/model.go:661-688): for each
    row, per factor f, subtract f's contribution from the running
    predictions, solve the 1-D subproblem, and fold the new value back in.
    Rows are independent within a half-sweep (the reference runs them in a
    parallel pool against the fixed other side), so row order is free; the
    factor loop is sequential by construction."""
    w = np.float32(weight)
    reg = np.float32(reg)
    k = rows.shape[1]
    for idx in range(rows.shape[0]):
        fb = feedback[idx]
        if not fb:
            continue
        r = rows[idx]
        qf = other[fb]  # [L, k]
        pred = (qf @ r).astype(np.float32)  # running \hat r_ui
        for f in range(k):
            col = qf[:, f]
            res = pred - r[f] * col
            a = np.float32(np.sum((np.float32(1.0) - (np.float32(1.0) - w) * res) * col))
            c = np.float32(np.sum((np.float32(1.0) - w) * col * col))
            b = w * (np.float32(np.dot(r, s[:, f])) - r[f] * s[f, f])
            r[f] = (a - b) / (c + w * s[f, f] + reg)
            pred = res + r[f] * col


def eals_oracle_epoch(
    p: np.ndarray,  # [U, k] f32, updated in place
    q: np.ndarray,  # [I, k] f32, updated in place
    user_feedback: list[list[int]],
    item_feedback: list[list[int]],
    weight: float,
    reg: float,
) -> None:
    """One eALS epoch: user half-sweep against S^q, then item half-sweep
    against S^p (reference model/cf/model.go:642-738)."""
    s_q = _ccd_gram(q, item_feedback)
    _ccd_update_rows(p, q, user_feedback, s_q, weight, reg)
    s_p = _ccd_gram(p, user_feedback)
    _ccd_update_rows(q, p, item_feedback, s_p, weight, reg)


def eals_oracle_fit(
    user_feedback: list[list[int]],
    item_feedback: list[list[int]],
    n_factors: int = 8,
    n_epochs: int = 10,
    weight: float = 0.05,
    reg: float = 0.06,
    init_stddev: float = 0.1,
    seed: int = 0,
    epoch_callback=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full sequential eALS fit (reference defaults model/cf/model.go:
    578-586: reg 0.06, init stddev 0.1, alpha/weight param)."""
    rng = np.random.default_rng(seed)
    n_users, n_items = len(user_feedback), len(item_feedback)
    p = rng.normal(0.0, init_stddev, size=(n_users, n_factors)).astype(np.float32)
    q = rng.normal(0.0, init_stddev, size=(n_items, n_factors)).astype(np.float32)
    for epoch in range(1, n_epochs + 1):
        eals_oracle_epoch(p, q, user_feedback, item_feedback, weight, reg)
        if epoch_callback is not None:
            epoch_callback(epoch, p, q)
    return p, q
