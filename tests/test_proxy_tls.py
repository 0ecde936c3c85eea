"""Storage proxy + mutual-TLS tests.

Reference patterns: storage/*/proxy_test.go (in-process proxy servers) and
the mTLS material common/util/tls.go loads for the gRPC control plane.
"""

import json

import grpc
import numpy as np
import pytest

from gorse_tpu.protocol import MasterGrpcClient, serve_master_grpc
from gorse_tpu.serve.master import Master
from gorse_tpu.storage import (
    BlobStore,
    Feedback,
    Item,
    MemoryCacheStore,
    MemoryDataStore,
    MetaStore,
    ProxyVectorStore,
    Score,
    User,
    add_storage_proxy,
    open_cache_store,
    open_data_store,
)
from gorse_tpu.storage.vectors import MemoryVectorStore, open_vector_store
from gorse_tpu.utils.config import Config
from gorse_tpu.utils.tls import generate_test_certs


def _proxy_server(**stores):
    from concurrent.futures import ThreadPoolExecutor

    server = grpc.server(ThreadPoolExecutor(max_workers=4))
    add_storage_proxy(server, **stores)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    return server, f"127.0.0.1:{port}"


def test_vector_proxy_round_trip():
    backing = MemoryVectorStore()
    server, target = _proxy_server(vectors=backing)
    try:
        store = ProxyVectorStore(target)
        store.create_collection("cf", 4)
        assert store.has_collection("cf")
        assert not store.has_collection("nope")
        vecs = np.eye(4, dtype=np.float32)
        store.add("cf", ["a", "b", "c", "d"], vecs)
        hits = store.query("cf", np.asarray([[1.0, 0, 0, 0]], dtype=np.float32), 2)
        assert hits[0][0].id == "a"
        store.delete("cf", ["a"])
        hits = store.query("cf", np.asarray([[1.0, 0, 0, 0]], dtype=np.float32), 1)
        assert hits[0][0].id != "a"
        store.drop_collection("cf")
        assert not backing.has_collection("cf")
        store.close()
    finally:
        server.stop(None)


def test_open_stores_by_proxy_url():
    data, cache, vectors = MemoryDataStore(), MemoryCacheStore(), MemoryVectorStore()
    server, target = _proxy_server(data=data, cache=cache, vectors=vectors)
    try:
        d = open_data_store(f"proxy://{target}")
        d.insert_users([User("u1")])
        assert data.get_user("u1") is not None
        assert d.ping()
        c = open_cache_store(f"proxy://{target}")
        c.add_scores("recommend", "u1", [Score("i1", 0.9)])
        assert [s.id for s in cache.search_scores("recommend", "u1")] == ["i1"]
        v = open_vector_store(f"proxy://{target}")
        v.create_collection("x", 2)
        assert vectors.has_collection("x")
        for s in (d, c, v):
            s.close()
    finally:
        server.stop(None)


def test_proxy_streaming_chunks():
    """Row streams cross the chunk boundary (>512 rows per message)."""
    data = MemoryDataStore()
    data.insert_feedback(
        [Feedback("like", f"u{i}", f"i{i % 50}", timestamp=float(i)) for i in range(1300)]
    )
    server, target = _proxy_server(data=data)
    try:
        d = open_data_store(f"proxy://{target}")
        users = list(d.get_users())
        assert len(users) == 1300
        feedback = list(d.get_feedback(begin_time=100.0))
        assert len(feedback) == 1200
        d.close()
    finally:
        server.stop(None)


def test_proxy_error_surfacing():
    server, target = _proxy_server(data=MemoryDataStore())
    try:
        c = open_cache_store(f"proxy://{target}")  # cache NOT proxied
        with pytest.raises(grpc.RpcError):
            c.set("k", "v")
        assert not c.ping()
        c.close()
    finally:
        server.stop(None)


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    return generate_test_certs(tmp_path_factory.mktemp("certs"))


def test_mtls_control_plane(tmp_path, certs):
    server_tls, client_tls = certs
    config = Config()
    data = MemoryDataStore()
    data.insert_items([Item("i1", timestamp=1.0)])
    master = Master(config, data, MemoryCacheStore(), BlobStore(tmp_path / "b"), MetaStore())
    server, port = serve_master_grpc(master, master.blob, port=0, tls=server_tls)
    try:
        client = MasterGrpcClient(f"localhost:{port}", "worker", node_id="tls-w1", tls=client_tls)
        meta = client.get_meta()
        assert "tls-w1" in meta["workers"]
        client.close()

        # a client without credentials must be rejected
        bare = MasterGrpcClient(f"localhost:{port}", "worker", node_id="intruder")
        with pytest.raises(grpc.RpcError):
            bare.get_meta()
        bare.close()
    finally:
        server.stop(None)


def test_meta_rewrites_local_store_urls(tmp_path):
    """A master proxying node-local stores hands out proxy:// URLs
    (reference: server/server.go:177-226 store selection)."""
    config = Config()
    config.database.data_store = f"sqlite://{tmp_path}/data.db"
    data = open_data_store(config.database.data_store)
    data.insert_users([User("u-remote")])
    cache = MemoryCacheStore()
    master = Master(config, data, cache, BlobStore(tmp_path / "b"), MetaStore())
    server, port = serve_master_grpc(
        master, master.blob, port=0, data_store=data, cache_store=cache
    )
    try:
        meta = master.get_meta()
        db = json.loads(meta["config"])["database"]
        assert db["data_store"].startswith("proxy://")
        assert db["cache_store"].startswith("proxy://")
        remote = open_data_store(db["data_store"])
        assert remote.get_user("u-remote") is not None
        remote.close()
    finally:
        server.stop(None)
