"""Ranking and classification metrics, vectorized for TPU.

Covers the reference's model/cf/evaluator.go (NDCG/Precision/Recall/HR/MAP/MRR
over sampled candidates) and model/ctr/evaluator.go (AUC/Accuracy/Precision/
Recall). The reference computes metrics per user in goroutines; here the whole
evaluation is one jitted batch: scores [U, M] -> top-k -> relevance -> metrics,
averaged over users that have test feedback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("top_k",))
def rank_metrics(
    scores: jax.Array,  # [U, M] candidate scores
    is_target: jax.Array,  # [U, M] bool, True where the candidate is a test positive
    valid: jax.Array,  # [U, M] bool, False on padding candidates
    top_k: int = 10,
) -> dict[str, jax.Array]:
    """Compute NDCG/Precision/Recall/HR/MAP/MRR@top_k for all users at once.

    Matches the reference protocol (model/cf/evaluator.go:35-169): per user,
    candidates are the user's test positives plus sampled negatives; the
    metric is averaged over users with >=1 test positive.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    _, top_idx = jax.lax.top_k(masked, top_k)  # [U, K]
    rel = jnp.take_along_axis(is_target.astype(jnp.float32), top_idx, axis=1)  # [U, K]
    # guard: padding rows that won in degenerate cases contribute 0
    top_valid = jnp.take_along_axis(valid, top_idx, axis=1)
    rel = jnp.where(top_valid, rel, 0.0)

    n_targets = jnp.sum(is_target & valid, axis=1)  # [U]
    has_target = n_targets > 0
    denom_users = jnp.maximum(jnp.sum(has_target), 1)

    ranks = jnp.arange(top_k, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(ranks + 2.0)  # [K]

    # NDCG: idcg over min(n_targets, K) ideal hits
    dcg = jnp.sum(rel * discounts, axis=1)
    ideal_hits = jnp.minimum(n_targets, top_k)
    idcg_table = jnp.concatenate([jnp.zeros(1), jnp.cumsum(discounts)])
    idcg = idcg_table[ideal_hits]
    ndcg = jnp.where(has_target, dcg / jnp.maximum(idcg, 1e-12), 0.0)

    hits = jnp.sum(rel, axis=1)
    precision = hits / top_k
    recall = jnp.where(has_target, hits / jnp.maximum(n_targets, 1), 0.0)
    hr = (hits > 0).astype(jnp.float32)

    cum_hits = jnp.cumsum(rel, axis=1)
    ap = jnp.sum(rel * cum_hits / (ranks + 1.0), axis=1)
    map_ = jnp.where(has_target, ap / jnp.maximum(n_targets, 1), 0.0)

    first_hit = jnp.argmax(rel, axis=1)  # 0 if no hit; masked by hr
    mrr = hr * (1.0 / (first_hit.astype(jnp.float32) + 1.0))

    def avg(x):
        return jnp.sum(jnp.where(has_target, x, 0.0)) / denom_users

    return {
        "NDCG": avg(ndcg),
        "Precision": avg(jnp.where(has_target, precision, 0.0)),
        "Recall": avg(recall),
        "HR": avg(hr),
        "MAP": avg(map_),
        "MRR": avg(mrr),
    }


@jax.jit
def auc(labels: jax.Array, predictions: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Rank-based AUC (reference: model/ctr/evaluator.go).

    AUC = (sum of positive ranks - P(P+1)/2) / (P * N), using average ranks
    for ties via double argsort on the score order.
    """
    if valid is None:
        valid = jnp.ones_like(labels, dtype=bool)
    # push invalid entries to the bottom so their ranks don't disturb positives
    preds = jnp.where(valid, predictions, NEG_INF)
    # TRUE average ranks for ties via two searchsorted passes (a double
    # argsort assigns arbitrary distinct ranks to ties, making the result
    # depend on row order — on fully tied inputs it returned 0.0 or 1.0)
    sorted_p = jnp.sort(preds)
    lo = jnp.searchsorted(sorted_p, preds, side="left")
    hi = jnp.searchsorted(sorted_p, preds, side="right")
    avg_rank = (lo + hi + 1).astype(jnp.float32) * 0.5  # 1-based average rank
    pos = (labels > 0.5) & valid
    # float32 throughout: int32 rank sums / n_pos*n_neg overflow past ~46k
    # positives; the f32 rounding error is ~2^-24 RELATIVE to the rank sum,
    # which divides by a same-magnitude denominator, so AUC error stays ~1e-7
    n_pos = jnp.sum(pos).astype(jnp.float32)
    n_valid = jnp.sum(valid).astype(jnp.float32)
    n_neg = n_valid - n_pos
    # invalid entries occupy the lowest ranks; shift positive ranks down
    n_invalid = jnp.float32(preds.shape[0]) - n_valid
    sum_pos_ranks = jnp.sum(jnp.where(pos, avg_rank, 0.0)) - n_pos * n_invalid
    numer = sum_pos_ranks - n_pos * (n_pos + 1.0) * 0.5
    return jnp.where((n_pos > 0) & (n_neg > 0), numer / (n_pos * n_neg), 0.5)


@jax.jit
def classification_metrics(labels: jax.Array, logits: jax.Array, valid: jax.Array | None = None) -> dict[str, jax.Array]:
    """Accuracy / Precision / Recall / AUC at threshold 0 on logits
    (reference: model/ctr/evaluator.go:27-150)."""
    if valid is None:
        valid = jnp.ones_like(labels, dtype=bool)
    pred_pos = (logits > 0.0) & valid
    actual_pos = (labels > 0.5) & valid
    tp = jnp.sum(pred_pos & actual_pos)
    n = jnp.maximum(jnp.sum(valid), 1)
    correct = jnp.sum((pred_pos == actual_pos) & valid)
    precision = tp / jnp.maximum(jnp.sum(pred_pos), 1)
    recall = tp / jnp.maximum(jnp.sum(actual_pos), 1)
    return {
        "Accuracy": correct / n,
        "Precision": precision.astype(jnp.float32),
        "Recall": recall.astype(jnp.float32),
        "AUC": auc(labels, logits, valid),
    }
