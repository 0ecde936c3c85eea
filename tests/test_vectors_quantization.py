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
        store.create_collection("bad", 4, quantization="vq")
    with pytest.raises(ValueError):  # 4 dims at 1 bit/dim -> half a code
        store.create_collection("bad", 4, quantization="pq", bits=1)
    with pytest.raises(ValueError):
        store.create_collection("bad", 4, quantization="rq", bits=8)


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


@pytest.mark.parametrize(
    "quantization,bits,min_recall",
    [("pq", 8, 8), ("pq", 4, 6), ("rq", 4, 7), ("rq", 2, 5), ("rq", 1, 3)],
)
def test_pq_rq_recall(quantization, bits, min_recall):
    """Approximate quantized top-k overlaps exact search (the reference's
    testQuantization pattern, storage/vectors/database_test.go)."""
    store = MemoryVectorStore()
    rng = np.random.default_rng(3)
    n, dim, k = 400, 16, 10
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    store.create_collection("exact", dim)
    store.add("exact", ids, vectors)
    store.create_collection("quant", dim, quantization=quantization, bits=bits)
    store.add("quant", ids, vectors)
    assert store.describe_collection("quant")["bits"] == bits

    queries = rng.normal(size=(5, dim)).astype(np.float32)
    exact = store.query("exact", queries, k)
    quant = store.query("quant", queries, k)
    total = 0
    for e_row, q_row in zip(exact, quant):
        total += len({s.id for s in e_row} & {s.id for s in q_row})
    assert total >= min_recall * len(exact)


@pytest.mark.parametrize("quantization,bits", [("pq", 8), ("rq", 4)])
def test_pq_rq_mutations_and_metrics(quantization, bits):
    """The encoded cache rebuilds after add/delete; cosine/euclidean work."""
    store = MemoryVectorStore()
    rng = np.random.default_rng(4)
    dim = 8
    for dist in ("dot", "cosine", "euclidean"):
        name = f"c-{dist}"
        store.create_collection(name, dim, distance=dist,
                                quantization=quantization, bits=bits)
        vecs = rng.normal(size=(50, dim)).astype(np.float32)
        store.add(name, [f"v{i}" for i in range(50)], vecs)
        target = vecs[7] * (1.0 if dist != "cosine" else 3.0)
        hits = store.query(name, target[None, :], 3)[0]
        assert hits[0].id == "v7", f"{dist}: {hits}"
        # delete the best hit: it must vanish from subsequent queries
        store.delete(name, ["v7"])
        hits = store.query(name, target[None, :], 3)[0]
        assert all(h.id != "v7" for h in hits)
        # adding new rows invalidates the cache too
        store.add(name, ["back"], target[None, :])
        hits = store.query(name, target[None, :], 3)[0]
        assert hits[0].id == "back"


def test_rq_encode_round_trip():
    """Packed b-bit rotated codes dequantize to within a quantization step."""
    from gorse_tpu.storage.vectors import _encode_rq, _rotation

    rng = np.random.default_rng(5)
    n, d = 20, 12
    matrix = rng.normal(size=(n, d)).astype(np.float32)
    rot = _rotation(d, seed=1)
    assert np.allclose(rot @ rot.T, np.eye(d), atol=1e-5)
    for bits in (1, 2, 4):
        packed, scale, lo, norms2 = _encode_rq(matrix, rot, bits)
        per_byte = 8 // bits
        assert packed.shape == (n, -(-d // per_byte))
        # unpack the way the kernel does
        shifts = (np.arange(per_byte, dtype=np.uint8) * bits)[None, None, :]
        vals = (packed[:, :, None] >> shifts) & ((1 << bits) - 1)
        codes = vals.reshape(n, -1)[:, :d].astype(np.float32)
        rhat = lo[:, None] + scale[:, None] * codes
        r = matrix @ rot.T
        assert np.max(np.abs(rhat - r)) <= np.max(scale) / 2 + 1e-5
        assert np.allclose(norms2, (rhat**2).sum(1), rtol=1e-4)


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
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
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
    # a bits-only config change recreates the collection (tracked via the
    # meta-store record, since backends normalize described bits differently)
    master.config.database.vector_quantization_type = "rq"
    master.config.database.vector_quantization_bits = 2
    master._sync_cf_vectors()
    info = vectors.describe_collection(Master.CF_COLLECTION)
    assert info["quantization"] == "rq" and info["bits"] == 2
    master.config.database.vector_quantization_bits = 4
    master._sync_cf_vectors()
    info = vectors.describe_collection(Master.CF_COLLECTION)
    assert info["bits"] == 4
    # unchanged config does not recreate (no spurious drops)
    before = vectors.query(Master.CF_COLLECTION, q, 1)[0]
    master._sync_cf_vectors()
    assert vectors.query(Master.CF_COLLECTION, q, 1)[0][0].id == before[0].id


@pytest.mark.parametrize("quantization,bits", [("sq", 8), ("pq", 8), ("rq", 4)])
def test_device_serving_path_matches_xla(monkeypatch, quantization, bits):
    """The TPU serving paths (PreparedSQ Pallas kernel for sq; the sq
    decode-cache for pq/rq) must rank like the XLA formulations — forced on
    via the _device_serving_enabled gate and run in interpret mode."""
    import gorse_tpu.storage.vectors as V

    rng = np.random.default_rng(9)
    n, dim, k = 300, 16, 10
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    queries = rng.normal(size=(4, dim)).astype(np.float32)

    store = MemoryVectorStore()
    store.create_collection("c", dim, quantization=quantization, bits=bits)
    store.add("c", ids, vectors)
    xla_rows = store.query("c", queries, k)

    monkeypatch.setattr(V, "_device_serving_enabled", lambda n_rows: True)
    # fresh store so the decode cache is built under the patched gate
    store2 = MemoryVectorStore()
    store2.create_collection("c", dim, quantization=quantization, bits=bits)
    store2.add("c", ids, vectors)
    dev_rows = store2.query("c", queries, k)

    for xr, dr in zip(xla_rows, dev_rows):
        overlap = len({s.id for s in xr} & {s.id for s in dr})
        assert overlap >= k - 2, (quantization, overlap)
        assert abs(xr[0].score - dr[0].score) < 0.05 * abs(xr[0].score) + 0.15

    # cache reuse: second query hits the prepared layout (no rebuild)
    again = store2.query("c", queries, k)
    assert [s.id for s in again[0]] == [s.id for s in dev_rows[0]]

    # mutation invalidates: add a dominant vector, it must appear
    big = (queries[0] / np.linalg.norm(queries[0]) * 10).astype(np.float32)
    store2.add("c", ["vbig"], big[None, :])
    after = store2.query("c", queries[:1], k)
    assert after[0][0].id == "vbig"


def test_concurrent_mutation_during_cache_build_not_masked(monkeypatch):
    """ADVICE r3 #1 regression: an add() landing while another thread builds
    the sq serving cache (outside the lock) must not be masked by the cache
    publish — the build is version-stamped and discarded if stale."""
    import gorse_tpu.storage.vectors as V
    from gorse_tpu.ops import topk as T

    rng = np.random.default_rng(11)
    n, dim, k = 64, 16, 5
    store = MemoryVectorStore()
    store.create_collection("c", dim, quantization="sq")
    store.add("c", [f"v{i}" for i in range(n)], rng.normal(size=(n, dim)).astype(np.float32))
    monkeypatch.setattr(V, "_device_serving_enabled", lambda n_rows: True)

    q = rng.normal(size=(1, dim)).astype(np.float32)
    big = (q[0] / np.linalg.norm(q[0]) * 10).astype(np.float32)
    real_prepare = T.prepare_sq_items
    fired = {"done": False}

    def racing_prepare(*args, **kwargs):
        # simulate a concurrent writer landing mid-build (the build runs
        # without the store lock, so a real thread could do exactly this)
        if not fired["done"]:
            fired["done"] = True
            store.add("c", ["vbig"], big[None, :])
        return real_prepare(*args, **kwargs)

    monkeypatch.setattr(T, "prepare_sq_items", racing_prepare)
    first = store.query("c", q, k)  # builds from the pre-add snapshot
    # the racing add MUST be visible on the next query (old code cleared the
    # dirty flag over it and served the stale cache forever)
    after = store.query("c", q, k)
    assert after[0][0].id == "vbig", [s.id for s in after[0]]
    assert first is not None
