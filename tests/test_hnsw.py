"""Native HNSW index tests (reference analog: common/ann/hnsw_test.go —
recall against brute force, incremental insert, delete, marshal roundtrip)."""

import numpy as np
import pytest

from gorse_tpu.native.hnsw import HNSWIndex, native_available


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(5000, 16)).astype(np.float32)
    queries = rng.normal(size=(100, 16)).astype(np.float32)
    return vecs, queries


@pytest.mark.parametrize("space", ["ip", "l2", "cosine"])
def test_recall_vs_bruteforce(corpus, space):
    vecs, queries = corpus
    k = 10
    ix = HNSWIndex(16, space=space, m=16, ef_construction=200)
    ix.add(np.arange(len(vecs), dtype=np.int64), vecs)
    got, _ = ix.search(queries, k, ef=100)

    if space == "l2":
        d = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    elif space == "cosine":
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        d = -(qn @ vn.T)
    else:
        d = -(queries @ vecs.T)
    ref = np.argsort(d, axis=1)[:, :k]
    recall = np.mean([len(set(got[i]) & set(ref[i])) / k for i in range(len(queries))])
    assert recall >= 0.9, (space, recall)


def test_delete_and_upsert(corpus):
    vecs, queries = corpus
    ix = HNSWIndex(16, space="ip")
    ix.add(np.arange(200, dtype=np.int64), vecs[:200])
    assert len(ix) == 200
    top, _ = ix.search(queries[:1], 1)
    winner = int(top[0][0])
    assert ix.mark_deleted(winner)
    assert not ix.mark_deleted(10_000)  # unknown label
    assert len(ix) == 199
    top2, _ = ix.search(queries[:1], 5)
    assert winner not in top2[0]
    # re-adding the same label undeletes (upsert)
    ix.add(np.asarray([winner], dtype=np.int64), vecs[winner : winner + 1])
    assert len(ix) == 200
    top3, _ = ix.search(queries[:1], 1)
    assert int(top3[0][0]) == winner


def test_save_load_roundtrip(tmp_path, corpus):
    vecs, queries = corpus
    ix = HNSWIndex(16, space="ip")
    ix.add(np.arange(500, dtype=np.int64), vecs[:500])
    before, _ = ix.search(queries[:10], 5)
    path = tmp_path / ("ix.bin" if native_available() else "ix.npz")
    ix.save(path)
    ix2 = HNSWIndex.load(path, 16, "ip")
    after, _ = ix2.search(queries[:10], 5)
    assert np.array_equal(before, after)
    assert len(ix2) == 500


def test_hnsw_vector_store_rejects_quantization():
    from gorse_tpu.storage.vectors import HNSWVectorStore

    store = HNSWVectorStore()
    with pytest.raises(ValueError):
        store.create_collection("q", 8, quantization="sq", bits=8)


def test_search_oversamples_past_deletes(tmp_path):
    """After deleting many near neighbors, search must still return k live
    results when they exist (review finding: ef was not widened)."""
    import numpy as np

    from gorse_tpu.native.hnsw import HNSWIndex

    rng = np.random.default_rng(0)
    dim, n = 16, 2000
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(dim, space="l2", m=16, ef_construction=100)
    idx.add(np.arange(n, dtype=np.int64), vecs)
    q = vecs[0:1]
    # delete the 60 nearest to the query, then ask for 50 with small ef
    labels, dists = idx.search(q, k=60, ef=100)
    for l in labels[0]:
        if l >= 0:
            idx.mark_deleted(int(l))
    labels2, dists2 = idx.search(q, k=50, ef=60)
    live = [l for l in labels2[0] if l >= 0]
    assert len(live) == 50, f"only {len(live)} live results returned"
