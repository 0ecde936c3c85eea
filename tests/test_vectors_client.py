"""Vector store + Python SDK client tests (reference analogs:
storage/vectors/*_test.go, client/client_test.go)."""

import socket

import numpy as np
import pytest

from gorse_tpu.client import GorseClient
from gorse_tpu.serve import InOneNode
from gorse_tpu.storage.types import Feedback, Item, User
from gorse_tpu.storage.vectors import (
    MemoryVectorStore,
    SQLiteVectorStore,
    open_vector_store,
)
from gorse_tpu.utils.config import Config


@pytest.fixture(
    params=[
        "memory", "sqlite", "hnsw", "qdrant", "weaviate", "milvus",
        "qdrant-real", "weaviate-real", "milvus-real",
    ]
)
def vstore(request, tmp_path):
    if request.param.endswith("-real"):
        # identical test bodies against a REAL engine, env-gated like the
        # reference's CI services (build_test.yml:21-147); e.g.
        # GORSE_TEST_QDRANT_URI=http://127.0.0.1:6333 (?api_key=...),
        # GORSE_TEST_WEAVIATE_URI=http://127.0.0.1:8080,
        # GORSE_TEST_MILVUS_URI=http://127.0.0.1:9091 (?token=...)
        import os
        import urllib.parse

        env = f"GORSE_TEST_{request.param.split('-')[0].upper()}_URI"
        uri = os.environ.get(env, "")
        if not uri:
            pytest.skip(f"{env} not set")
        from gorse_tpu.storage.vectordb import (
            MilvusVectorStore,
            QdrantVectorStore,
            WeaviateVectorStore,
        )

        p = urllib.parse.urlparse(uri)
        qs = dict(urllib.parse.parse_qsl(p.query))
        if request.param == "qdrant-real":
            store = QdrantVectorStore(p.hostname, p.port, api_key=qs.get("api_key", ""))
        elif request.param == "weaviate-real":
            store = WeaviateVectorStore(p.hostname, p.port, api_key=qs.get("api_key", ""))
        else:
            store = MilvusVectorStore(p.hostname, p.port, token=qs.get("token", ""))
        if store.has_collection("cf"):
            store.drop_collection("cf")
        yield store
        store.close()
        return
    if request.param == "memory":
        yield MemoryVectorStore()
        return
    if request.param == "sqlite":
        yield SQLiteVectorStore(str(tmp_path / "vec.db"))
        return
    if request.param == "hnsw":
        from gorse_tpu.storage.vectors import HNSWVectorStore

        yield HNSWVectorStore()
        return
    # REST clients against engine-semantics mocks (the reference's env-gated
    # Qdrant/Weaviate/Milvus CI services, build_test.yml)
    from gorse_tpu.storage.minivector import MiniMilvus, MiniQdrant, MiniWeaviate
    from gorse_tpu.storage.vectordb import (
        MilvusVectorStore,
        QdrantVectorStore,
        WeaviateVectorStore,
    )

    if request.param == "qdrant":
        mini = MiniQdrant().start()
        store = QdrantVectorStore("127.0.0.1", mini.port, api_key=mini.api_key)
    elif request.param == "weaviate":
        mini = MiniWeaviate().start()
        store = WeaviateVectorStore("127.0.0.1", mini.port, api_key=mini.api_key)
    else:
        mini = MiniMilvus().start()
        store = MilvusVectorStore("127.0.0.1", mini.port, token=mini.token)
    yield store
    store.close()
    mini.stop()


def test_vector_store_crud_and_query(vstore):
    vstore.create_collection("cf", 4)
    assert vstore.has_collection("cf")
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 4)).astype(np.float32)
    ids = [f"v{i}" for i in range(20)]
    vstore.add("cf", ids, vecs)
    q = vecs[3:5]
    results = vstore.query("cf", q, k=3)
    # exact top-k by dot product matches brute force for every query
    for b in range(2):
        ref = vecs @ q[b]
        order = np.argsort(-ref)[:3]
        assert [r.id for r in results[b]] == [f"v{i}" for i in order]
    # delete removes from queries
    vstore.delete("cf", ["v3"])
    results = vstore.query("cf", q[:1], k=3)
    assert all(r.id != "v3" for r in results[0])
    vstore.drop_collection("cf")
    assert not vstore.has_collection("cf")


def test_sqlite_vector_store_persists(tmp_path):
    path = str(tmp_path / "v.db")
    s1 = SQLiteVectorStore(path)
    s1.create_collection("c", 2)
    s1.add("c", ["a", "b"], np.asarray([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32))
    s1.close()
    s2 = SQLiteVectorStore(path)
    assert s2.has_collection("c")
    out = s2.query("c", np.asarray([[1.0, 0.1]], dtype=np.float32), k=1)
    assert out[0][0].id == "a"


def test_open_vector_store():
    assert open_vector_store("memory://") is not None
    with pytest.raises(ValueError):
        open_vector_store("pinecone://nope")


def test_external_backends_distance_parity():
    """cosine + euclidean orderings from the REST backends match the native
    MemoryVectorStore exactly (the engines' native distance semantics differ;
    vectordb.py converts them back to this framework's score convention)."""
    from gorse_tpu.storage.minivector import MiniMilvus, MiniQdrant, MiniWeaviate
    from gorse_tpu.storage.vectordb import (
        MilvusVectorStore,
        QdrantVectorStore,
        WeaviateVectorStore,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 6)).astype(np.float32)
    ids = [f"v{i}" for i in range(30)]
    q = rng.normal(size=(1, 6)).astype(np.float32)

    minis = [MiniQdrant().start(), MiniWeaviate().start(), MiniMilvus().start()]
    stores = [
        QdrantVectorStore("127.0.0.1", minis[0].port, api_key=minis[0].api_key),
        WeaviateVectorStore("127.0.0.1", minis[1].port, api_key=minis[1].api_key),
        MilvusVectorStore("127.0.0.1", minis[2].port, token=minis[2].token),
    ]
    try:
        for distance in ("cosine", "euclidean"):
            ref = MemoryVectorStore()
            ref.create_collection(f"c_{distance}", 6, distance=distance)
            ref.add(f"c_{distance}", ids, vecs)
            want = ref.query(f"c_{distance}", q, k=5)[0]
            for store in stores:
                store.create_collection(f"c_{distance}", 6, distance=distance)
                store.add(f"c_{distance}", ids, vecs)
                got = store.query(f"c_{distance}", q, k=5)[0]
                assert [s.id for s in got] == [s.id for s in want], (
                    type(store).__name__, distance,
                )
                # score VALUES match the native convention too (euclidean =
                # negative squared distance), not just the ordering
                np.testing.assert_allclose(
                    [s.score for s in got], [s.score for s in want],
                    rtol=2e-3, atol=1e-4,
                    err_msg=f"{type(store).__name__} {distance}",
                )
    finally:
        for m in minis:
            m.stop()


def test_external_backends_quantization_round_trip():
    """pq/rq/sq configs map to each engine's quantization scheme and parse
    back through describe_collection (reference: qdrantQuantizationConfig
    qdrant.go:153-199, milvusIndex milvus.go:327-356, weaviateApplyQuantization
    weaviate.go:172-199)."""
    import pytest

    from gorse_tpu.storage.minivector import MiniMilvus, MiniQdrant, MiniWeaviate
    from gorse_tpu.storage.vectordb import (
        MilvusVectorStore,
        QdrantVectorStore,
        WeaviateVectorStore,
    )

    minis = [MiniQdrant().start(), MiniWeaviate().start(), MiniMilvus().start()]
    qdrant = QdrantVectorStore("127.0.0.1", minis[0].port, api_key=minis[0].api_key)
    weaviate = WeaviateVectorStore("127.0.0.1", minis[1].port, api_key=minis[1].api_key)
    milvus = MilvusVectorStore("127.0.0.1", minis[2].port, token=minis[2].token)
    try:
        cases = [  # (store, quantization, bits, described bits)
            (qdrant, "sq", 0, 8), (qdrant, "pq", 4, 4), (qdrant, "rq", 2, 2),
            (weaviate, "sq", 0, 0), (weaviate, "pq", 0, 0), (weaviate, "rq", 2, 2),
            (milvus, "sq", 8, 8), (milvus, "pq", 4, 4), (milvus, "rq", 0, 0),
        ]
        for i, (store, quant, bits, want_bits) in enumerate(cases):
            name = f"q{i}"
            store.create_collection(name, 16, quantization=quant, bits=bits)
            info = store.describe_collection(name)
            assert info["quantization"] == quant, (type(store).__name__, quant)
            assert info["bits"] == want_bits, (type(store).__name__, quant, info)
        # invalid combinations are rejected client-side like the reference
        with pytest.raises(ValueError):
            qdrant.create_collection("bad", 16, quantization="pq", bits=3)
        with pytest.raises(ValueError):
            milvus.create_collection("bad", 16, quantization="rq", bits=2)
        with pytest.raises(ValueError):
            weaviate.create_collection("bad", 16, quantization="pq", bits=4)
    finally:
        for m in minis:
            m.stop()


def test_external_backends_reject_bad_auth():
    from gorse_tpu.storage.minivector import MiniQdrant
    from gorse_tpu.storage.vectordb import QdrantVectorStore

    mini = MiniQdrant().start()
    try:
        bad = QdrantVectorStore("127.0.0.1", mini.port, api_key="wrong")
        with pytest.raises(IOError):
            bad.create_collection("x", 4)
        assert not bad.ping()
    finally:
        mini.stop()


@pytest.fixture
def sdk(tmp_path):
    config = Config()
    config.recommend.ranker.type = "none"
    config.recommend.data_source.positive_feedback_types = ["star"]
    node = InOneNode(config, workdir=str(tmp_path))
    node.seed_playground(n_users=20, n_items=30, seed=1)
    node.run_once()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    node.serve("127.0.0.1", port, background_loop=False)
    yield GorseClient(f"http://127.0.0.1:{port}")
    node.shutdown()


def test_sdk_client_end_to_end(sdk):
    assert sdk.health_ready()
    sdk.insert_user(User("sdk-user", labels=["x"]))
    assert sdk.get_user("sdk-user").labels == ["x"]
    sdk.insert_item(Item("sdk-item", categories=["ai"], timestamp=99.0))
    assert sdk.get_item("sdk-item").categories == ["ai"]
    sdk.insert_feedback([Feedback("star", "sdk-user", "repo1")])
    fb = sdk.get_user_feedback("sdk-user", "star")
    assert fb and fb[0].item_id == "repo1"
    recs = sdk.get_recommend("user3", n=5)
    assert len(recs) == 5
    assert sdk.get_latest(n=3)
    assert sdk.get_popular(n=3)
    users, cursor = sdk.get_users(n=5)
    assert len(users) == 5 and cursor
    items, icursor = sdk.get_items(n=5)
    assert len(items) == 5 and icursor
    # partial updates (reference SDK: UpdateUser/UpdateItem -> PATCH)
    sdk.update_user("sdk-user", {"Labels": ["y"]})
    assert sdk.get_user("sdk-user").labels == ["y"]
    sdk.update_item("sdk-item", {"Categories": ["ml"]})
    assert sdk.get_item("sdk-item").categories == ["ml"]
    # feedback listing + typed/untyped deletes (ListFeedbacks/DeleteFeedback(s))
    fbs, _ = sdk.list_feedbacks("star", n=5)
    assert fbs and all(f.feedback_type == "star" for f in fbs)
    sdk.delete_feedback("star", "sdk-user", "repo1")
    assert sdk.get_user_feedback("sdk-user", "star") == []
    sdk.insert_feedback([Feedback("star", "sdk-user", "repo2")])
    sdk.delete_feedbacks("sdk-user", "repo2")
    assert sdk.get_user_feedback("sdk-user", "star") == []
    sdk.delete_item("sdk-item")
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        sdk.get_item("sdk-item")


def test_playground_seeding(tmp_path):
    config = Config()
    config.recommend.data_source.positive_feedback_types = ["star"]
    node = InOneNode(config, workdir=str(tmp_path))
    node.seed_playground(n_users=15, n_items=25)
    assert node.data.count_users() == 15
    assert node.data.count_items() == 25
    assert node.data.count_feedback() > 0
    out = node.run_once()
    assert out["cf_model_id"]
    assert out["users_refreshed"] == 15
