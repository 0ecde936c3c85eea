"""Vector-store quantization + collection metadata tests (reference analogs:
storage/vectors/database_test.go testQuantization, master CF collection
init/check master/master.go:424-478)."""

import numpy as np
import pytest

from gorse_tpu.storage.vectors import (
    MemoryVectorStore,
    SQLiteVectorStore,
    _quantize_sq,
)


def test_quantize_sq_round_trip():
    rng = np.random.default_rng(0)
    vec = rng.normal(size=64).astype(np.float32)
    codes, scale, lo = _quantize_sq(vec)
    approx = lo + scale * codes.astype(np.float32)
    # 8-bit scalar quantization: max error is half a step
    assert np.max(np.abs(approx - vec)) <= scale / 2 + 1e-6
    # constant vectors don't divide by zero
    codes, scale, lo = _quantize_sq(np.full(8, 3.0, dtype=np.float32))
    assert np.allclose(lo + scale * codes, 3.0)


@pytest.fixture(params=["memory", "sqlite"])
def store(request, tmp_path):
    if request.param == "memory":
        return MemoryVectorStore()
    return SQLiteVectorStore(str(tmp_path / "v.db"))


def test_collection_metadata(store):
    store.create_collection("a", 8, distance="cosine", quantization="sq", bits=8)
    store.create_collection("b", 4)
    assert store.list_collections() == ["a", "b"]
    info = store.describe_collection("a")
    assert info["dimension"] == 8 and info["distance"] == "cosine"
    assert info["quantization"] == "sq" and info["bits"] == 8
    assert store.describe_collection("missing") is None
    with pytest.raises(ValueError):
        store.create_collection("bad", 4, distance="hamming")
    with pytest.raises(ValueError):
        store.create_collection("bad", 4, quantization="pq")


def test_sq_query_matches_exact(store):
    """Quantized top-k recalls what exact search finds (the reference's
    testQuantization recall assertion, database_test.go:167)."""
    rng = np.random.default_rng(1)
    n, dim, k = 300, 16, 10
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]

    store.create_collection("exact", dim)
    store.add("exact", ids, vectors)
    store.create_collection("quant", dim, quantization="sq", bits=8)
    store.add("quant", ids, vectors)

    queries = rng.normal(size=(5, dim)).astype(np.float32)
    exact = store.query("exact", queries, k)
    quant = store.query("quant", queries, k)
    for e_row, q_row in zip(exact, quant):
        e_ids = {s.id for s in e_row}
        q_ids = {s.id for s in q_row}
        # >= 80% recall@10 under 8-bit quantization
        assert len(e_ids & q_ids) >= 8
        # scores stay close
        assert abs(e_row[0].score - q_row[0].score) < 0.05 * abs(e_row[0].score) + 0.1


def test_euclidean_and_cosine_distances(store):
    store.create_collection("euc", 2, distance="euclidean")
    store.add("euc", ["near", "far"], np.asarray([[1.0, 1.0], [10.0, 10.0]], dtype=np.float32))
    hits = store.query("euc", np.asarray([[1.2, 1.0]], dtype=np.float32), 2)[0]
    assert hits[0].id == "near" and hits[0].score > hits[1].score

    store.create_collection("cos", 2, distance="cosine")
    # same direction at different magnitudes ties under cosine
    store.add("cos", ["dir", "scaled", "ortho"], np.asarray(
        [[1.0, 0.0], [100.0, 0.0], [0.0, 1.0]], dtype=np.float32))
    hits = store.query("cos", np.asarray([[2.0, 0.0]], dtype=np.float32), 3)[0]
    assert {hits[0].id, hits[1].id} == {"dir", "scaled"}
    assert abs(hits[0].score - hits[1].score) < 1e-5
    assert hits[2].id == "ortho"


def test_sqlite_persistence_requantizes(tmp_path):
    path = str(tmp_path / "persist.db")
    s1 = SQLiteVectorStore(path)
    s1.create_collection("c", 4, quantization="sq", bits=8)
    s1.add("c", ["x"], np.asarray([[1.0, 2.0, 3.0, 4.0]], dtype=np.float32))
    s1.close()
    s2 = SQLiteVectorStore(path)
    assert s2.describe_collection("c")["quantization"] == "sq"
    hits = s2.query("c", np.asarray([[1.0, 2.0, 3.0, 4.0]], dtype=np.float32), 1)[0]
    assert hits[0].id == "x"
    s2.close()


def test_master_syncs_cf_collection(tmp_path):
    from gorse_tpu.serve.master import Master
    from gorse_tpu.storage import BlobStore, Feedback, MemoryCacheStore, MemoryDataStore, MetaStore
    from gorse_tpu.utils.config import Config

    config = Config()
    config.database.vector_quantization_type = "sq"
    config.recommend.ranker.type = "none"
    data = MemoryDataStore()
    rng = np.random.default_rng(2)
    for u in range(30):
        for i in rng.choice(40, size=8, replace=False):
            data.insert_feedback([Feedback("like", f"u{u}", f"i{i}", timestamp=1.0)])
    vectors = MemoryVectorStore()
    # a stale collection with the wrong dimension must be recreated
    vectors.create_collection(Master.CF_COLLECTION, 3)
    master = Master(config, data, MemoryCacheStore(), BlobStore(tmp_path / "b"), MetaStore(),
                    vector_store=vectors)
    master.run_tasks_once()
    info = vectors.describe_collection(Master.CF_COLLECTION)
    assert info["quantization"] == "sq"
    assert info["dimension"] == int(np.asarray(master.cf_index.item_factors).shape[1])
    # every item's factors are queryable
    q = np.asarray(master.cf_index.item_factors)[:1]
    hits = vectors.query(Master.CF_COLLECTION, q, 5)[0]
    assert len(hits) == 5
