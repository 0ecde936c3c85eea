"""Item-to-item / user-to-user similarity as blocked matmuls.

Covers the reference's logics/item_to_item.go + logics/user_to_user.go
similarity kernels. The reference walks sorted id lists pairwise inside HNSW
(IDF.distance, item_to_item.go:324-366); here the same quantities are batched
matrix products on the MXU:

    commonSum[i,j]   = M diag(w) M^T      (M = [N, L] incidence, w = IDF)
    commonCount[i,j] = M M^T
    weightedSum[i]   = M w

    distance = 1 - commonSum*commonCount /
               (sqrt(wsum_i) * sqrt(wsum_j) * (commonCount + 100))

with the reference's special cases: identical sets -> 0, disjoint sets -> 1.
Embedding similarity (the HNSW path) becomes exact blocked top-k by Euclidean
or cosine distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .topk import dot_topk_xla

SHRINKAGE = 100.0  # reference: item_to_item.go:335 (commonCount + 100)
BIG = 1e30


def incidence_matrix(ragged: list[list[int]], n_labels: int) -> np.ndarray:
    """Dense [N, L] 0/1 incidence matrix from ragged per-entity label lists."""
    out = np.zeros((len(ragged), n_labels), dtype=np.float32)
    for i, labels in enumerate(ragged):
        for l in set(labels):
            out[i, l] = 1.0
    return out


def _make_dist_block(incidence: jax.Array, idf: jax.Array):
    """Closure computing one [B, N] block of the IDF set-distance matrix
    (same formula and special cases as idf_neighbors / idf_distance_matrix,
    WITHOUT self-exclusion)."""
    weighted = incidence * idf[None, :]
    counts = jnp.sum(incidence, axis=1)
    sqrt_wsum = jnp.sqrt(jnp.maximum(incidence @ idf, 0.0))

    def fn(inc_blk: jax.Array) -> jax.Array:
        common_sum = inc_blk @ weighted.T  # [B, N]
        common_cnt = inc_blk @ incidence.T
        blk_counts = jnp.sum(inc_blk, axis=1)
        blk_wsum = jnp.sqrt(jnp.maximum(inc_blk @ idf, 0.0))
        denom = blk_wsum[:, None] * sqrt_wsum[None, :] * (common_cnt + SHRINKAGE)
        dist = 1.0 - common_sum * common_cnt / jnp.maximum(denom, 1e-12)
        same = (
            (blk_counts[:, None] == counts[None, :])
            & (common_cnt == blk_counts[:, None])
            & (blk_counts[:, None] > 0)
        )
        dist = jnp.where(same, 0.0, dist)
        return jnp.where(common_cnt == 0, 1.0, dist)

    return fn


@functools.partial(jax.jit, static_argnames=("k_top", "block"))
def idf_neighbors_avg(
    inc1: jax.Array,  # [N, L1] 0/1 f32
    idf1: jax.Array,  # [L1]
    inc2: jax.Array,  # [N, L2] 0/1 f32
    idf2: jax.Array,  # [L2]
    k_top: int = 10,
    block: int = 256,
):
    """Top-k under the AVERAGE of two IDF set distances (the reference's
    `auto` type, item_to_item.go:320-323), computed blockwise so memory
    stays O(block*N) — the full [N, N] average would be an O(N^2) cliff at
    catalog scale. Exact: both halves' distances are averaged for EVERY
    pair inside the block before top-k selection."""
    n = inc1.shape[0]
    pad = (-n) % block
    p1 = jnp.pad(inc1, ((0, pad), (0, 0)))
    p2 = jnp.pad(inc2, ((0, pad), (0, 0)))
    fn1 = _make_dist_block(inc1, idf1)
    fn2 = _make_dist_block(inc2, idf2)

    def block_fn(args):
        blk1, blk2, row_ids = args
        dist = (fn1(blk1) + fn2(blk2)) / 2.0
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(col == row_ids[:, None], BIG, dist)
        neg_top, idx = jax.lax.top_k(-dist, k_top)
        return -neg_top, idx.astype(jnp.int32)

    n_pad = p1.shape[0]
    row_ids = jnp.arange(n_pad, dtype=jnp.int32)
    dists, idxs = jax.lax.map(
        block_fn,
        (
            p1.reshape(n_pad // block, block, -1),
            p2.reshape(n_pad // block, block, -1),
            row_ids.reshape(n_pad // block, block),
        ),
    )
    return dists.reshape(n_pad, k_top)[:n], idxs.reshape(n_pad, k_top)[:n]


@functools.partial(jax.jit, static_argnames=("k_top", "block"))
def idf_neighbors(
    incidence: jax.Array,  # [N, L] 0/1 f32
    idf: jax.Array,  # [L] f32
    k_top: int = 10,
    block: int = 256,
):
    """Top-k nearest neighbors per row under the IDF-weighted set distance.

    Returns (distances [N, k], indices [N, k]) ascending, self excluded.
    """
    n, _ = incidence.shape
    pad = (-n) % block
    inc = jnp.pad(incidence, ((0, pad), (0, 0)))
    weighted = incidence * idf[None, :]  # [N, L]
    wsum = jnp.maximum(incidence @ idf, 0.0)  # [N]
    counts = jnp.sum(incidence, axis=1)  # [N]
    sqrt_wsum = jnp.sqrt(wsum)

    def block_fn(args):
        inc_blk, row_ids = args  # [B, L], [B]
        common_sum = inc_blk @ weighted.T  # [B, N]
        common_cnt = inc_blk @ incidence.T  # [B, N]
        blk_counts = jnp.sum(inc_blk, axis=1)  # [B]
        blk_wsum = jnp.sqrt(jnp.maximum(inc_blk @ idf, 0.0))
        denom = blk_wsum[:, None] * sqrt_wsum[None, :] * (common_cnt + SHRINKAGE)
        dist = 1.0 - common_sum * common_cnt / jnp.maximum(denom, 1e-12)
        # identical sets -> 0 (counts equal on both sides and all common)
        same = (
            (blk_counts[:, None] == counts[None, :])
            & (common_cnt == blk_counts[:, None])
            & (blk_counts[:, None] > 0)
        )
        dist = jnp.where(same, 0.0, dist)
        # disjoint or empty -> 1
        dist = jnp.where(common_cnt == 0, 1.0, dist)
        # exclude self
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(col == row_ids[:, None], BIG, dist)
        neg_top, idx = jax.lax.top_k(-dist, k_top)
        return -neg_top, idx.astype(jnp.int32)

    n_pad = inc.shape[0]
    row_ids = jnp.arange(n_pad, dtype=jnp.int32)
    dists, idxs = jax.lax.map(
        block_fn,
        (inc.reshape(n_pad // block, block, -1), row_ids.reshape(n_pad // block, block)),
    )
    return dists.reshape(n_pad, k_top)[:n], idxs.reshape(n_pad, k_top)[:n]




@jax.jit
def idf_distance_matrix(incidence: jax.Array, idf: jax.Array) -> jax.Array:
    """Full [N, N] IDF-weighted set-distance matrix (same formula and
    special cases as :func:`idf_neighbors`, without top-k selection or
    self-exclusion). Used where two similarity halves must be averaged
    EXACTLY over every pair (the 'auto' type) — a top-k-only result would
    substitute sentinels for out-of-top-k pairs."""
    weighted = incidence * idf[None, :]
    wsum = jnp.maximum(incidence @ idf, 0.0)
    counts = jnp.sum(incidence, axis=1)
    sqrt_wsum = jnp.sqrt(wsum)
    common_sum = incidence @ weighted.T
    common_cnt = incidence @ incidence.T
    denom = sqrt_wsum[:, None] * sqrt_wsum[None, :] * (common_cnt + SHRINKAGE)
    dist = 1.0 - common_sum * common_cnt / jnp.maximum(denom, 1e-12)
    # identical sets -> 0 (counts equal on both sides and all common)
    same = (
        (counts[:, None] == counts[None, :])
        & (common_cnt == counts[:, None])
        & (counts[:, None] > 0)
    )
    dist = jnp.where(same, 0.0, dist)
    # disjoint or empty -> 1
    return jnp.where(common_cnt == 0, 1.0, dist)


@functools.partial(jax.jit, static_argnames=("k_top", "metric"))
def embedding_neighbors(
    embeddings: jax.Array,  # [N, d]
    k_top: int = 10,
    metric: str = "euclidean",
):
    """Exact nearest neighbors by embedding distance (replaces HNSW:
    logics/item_to_item.go:100-168 with common/ann). Returns
    (distances [N, k], indices [N, k]) ascending, self excluded."""
    if metric == "cosine":
        x = embeddings / jnp.maximum(
            jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
        )
        sims = x @ x.T
        dist = 1.0 - sims
    elif metric == "euclidean":
        sq = jnp.sum(embeddings * embeddings, axis=1)
        dist = sq[:, None] + sq[None, :] - 2.0 * (embeddings @ embeddings.T)
        dist = jnp.maximum(dist, 0.0)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    n = embeddings.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (n, n), 1
    )
    dist = jnp.where(eye, BIG, dist)
    neg_top, idx = jax.lax.top_k(-dist, k_top)
    return -neg_top, idx.astype(jnp.int32)


def embedding_query(
    queries: jax.Array,  # [B, d]
    corpus: jax.Array,  # [N, d]
    k_top: int = 10,
    metric: str = "euclidean",
):
    """Query nearest items for external query vectors (the chat item-to-item
    path: LLM query embeddings -> neighbor search, item_to_item.go:383-531)."""
    if metric == "cosine":
        qn = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        cn = corpus / jnp.maximum(jnp.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
        s, i = dot_topk_xla(qn, cn, k_top)
        return 1.0 - s, i
    sq = jnp.sum(corpus * corpus, axis=1)
    # Euclidean ranking via augmented dot product: score = 2 q.c - |c|^2
    aug_q = jnp.concatenate([queries, jnp.ones((queries.shape[0], 1), queries.dtype)], axis=1)
    aug_c = jnp.concatenate([2.0 * corpus, -sq[:, None]], axis=1)
    s, i = dot_topk_xla(aug_q, aug_c, k_top)
    qsq = jnp.sum(queries * queries, axis=1, keepdims=True)
    return jnp.maximum(qsq - s, 0.0), i
