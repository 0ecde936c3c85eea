"""Similarity kernel parity vs scalar reference implementations
(reference: logics/item_to_item.go:324-366 IDF distance)."""

import math

import numpy as np
import jax.numpy as jnp

from gorse_tpu.ops.similarity import (
    SHRINKAGE,
    embedding_neighbors,
    embedding_query,
    idf_neighbors,
    incidence_matrix,
)


def _ref_idf_distance(a, b, idf):
    sa, sb = set(a), set(b)
    common = sa & sb
    common_sum = sum(idf[l] for l in common)
    common_count = len(common)
    if len(sa) == len(sb) and common_count == len(sa) and len(sa) > 0:
        return 0.0
    if common_count > 0 and sa and sb:
        return 1.0 - common_sum * common_count / (
            math.sqrt(sum(idf[l] for l in sa))
            * math.sqrt(sum(idf[l] for l in sb))
            * (common_count + SHRINKAGE)
        )
    return 1.0


def test_idf_neighbors_match_scalar():
    rng = np.random.default_rng(0)
    n, n_labels = 30, 15
    labels = [sorted(rng.choice(n_labels, size=rng.integers(1, 6), replace=False).tolist()) for _ in range(n)]
    idf = rng.uniform(0.5, 3.0, size=n_labels).astype(np.float32)
    inc = incidence_matrix(labels, n_labels)
    dists, idxs = idf_neighbors(jnp.asarray(inc), jnp.asarray(idf), k_top=5, block=8)
    # scalar reference distances
    for i in range(n):
        ref = sorted(
            (( _ref_idf_distance(labels[i], labels[j], idf), j) for j in range(n) if j != i),
        )[:5]
        np.testing.assert_allclose(np.asarray(dists[i]), [d for d, _ in ref], atol=1e-5)


def test_idf_identical_and_disjoint():
    labels = [[0, 1], [0, 1], [2, 3], []]
    idf = np.ones(4, dtype=np.float32)
    inc = incidence_matrix(labels, 4)
    dists, idxs = idf_neighbors(jnp.asarray(inc), jnp.asarray(idf), k_top=3, block=4)
    # items 0 and 1 have identical sets -> distance 0
    assert float(dists[0][0]) == 0.0 and int(idxs[0][0]) == 1
    # item 2 is disjoint from 0 -> distance 1
    assert np.isclose(float(dists[2][1]), 1.0)


def test_embedding_neighbors_euclidean():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(20, 8)).astype(np.float32)
    dists, idxs = embedding_neighbors(jnp.asarray(x), k_top=3, metric="euclidean")
    full = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    for i in range(20):
        order = np.argsort(full[i])[:3]
        np.testing.assert_allclose(np.asarray(dists[i]), full[i, order], rtol=1e-4, atol=1e-4)


def test_embedding_neighbors_cosine():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(15, 6)).astype(np.float32)
    dists, idxs = embedding_neighbors(jnp.asarray(x), k_top=2, metric="cosine")
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    full = 1.0 - xn @ xn.T
    np.fill_diagonal(full, np.inf)
    for i in range(15):
        order = np.argsort(full[i])[:2]
        np.testing.assert_allclose(np.asarray(dists[i]), full[i, order], rtol=1e-4, atol=2e-4)


def test_embedding_query_euclidean_matches_direct():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(50, 8)).astype(np.float32)
    dists, idxs = embedding_query(jnp.asarray(q), jnp.asarray(c), k_top=5)
    full = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    for b in range(4):
        order = np.argsort(full[b])[:5]
        np.testing.assert_allclose(np.asarray(dists[b]), full[b, order], rtol=1e-4, atol=1e-4)


def test_idf_neighbors_avg_matches_dense_average():
    """Blockwise averaged-distance top-k (the `auto` path) matches the
    exact dense [N, N] average it replaced (memory cliff fix)."""
    import jax.numpy as jnp
    import numpy as np

    from gorse_tpu.ops.similarity import (
        idf_distance_matrix,
        idf_neighbors_avg,
        incidence_matrix,
    )

    rng = np.random.default_rng(11)
    n, l1, l2, k = 70, 25, 40, 5
    lists1 = [sorted(rng.choice(l1, size=rng.integers(1, 6), replace=False)) for _ in range(n)]
    lists2 = [sorted(rng.choice(l2, size=rng.integers(0, 8), replace=False)) for _ in range(n)]
    idf1 = rng.uniform(0.1, 2.0, l1).astype(np.float32)
    idf2 = rng.uniform(0.1, 2.0, l2).astype(np.float32)
    inc1 = incidence_matrix(lists1, l1)
    inc2 = incidence_matrix(lists2, l2)

    dense = (
        np.asarray(idf_distance_matrix(jnp.asarray(inc1), jnp.asarray(idf1)))
        + np.asarray(idf_distance_matrix(jnp.asarray(inc2), jnp.asarray(idf2)))
    ) / 2.0
    np.fill_diagonal(dense, np.inf)
    want_idx = np.argsort(dense, axis=1, kind="stable")[:, :k]
    want_d = np.take_along_axis(dense, want_idx, axis=1)

    got_d, got_i = idf_neighbors_avg(
        jnp.asarray(inc1), jnp.asarray(idf1), jnp.asarray(inc2), jnp.asarray(idf2),
        k_top=k, block=32,
    )
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; distances at the returned indices match
    recomputed = np.take_along_axis(dense, np.asarray(got_i), axis=1)
    np.testing.assert_allclose(recomputed, want_d, rtol=1e-5, atol=1e-5)


def test_tags_item_to_item_deterministic_without_index():
    """Label-id fallback must be stable (no per-process randomized hash):
    two engines over the same corpus emit identical neighbor lists."""
    from gorse_tpu.logics.item_to_item import ItemToItemConfig, new_item_to_item
    from gorse_tpu.storage.types import Item

    def build():
        eng = new_item_to_item(ItemToItemConfig(name="t", type="tags"), n=3)
        eng.push(Item("a", labels=["x", "y"]), [])
        eng.push(Item("b", labels=["x", "y", "z"]), [])
        eng.push(Item("c", labels=["z", "w"]), [])
        eng.push(Item("d", labels=["w"]), [])
        return {
            iid: [(s.id, round(s.score, 6)) for s in scores]
            for iid, scores in eng.pop_all()
        }

    assert build() == build()
