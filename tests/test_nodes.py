"""Multi-process-shaped node tests: a real master HTTP endpoint with server
and worker nodes syncing against it in-process (the reference's mockMaster
pattern, worker/worker_test.go:571-640, over HTTP instead of gRPC)."""

import socket

import numpy as np
import pytest

from gorse_tpu.serve.dashboard import MasterRestServer
from gorse_tpu.serve.master import Master
from gorse_tpu.serve.nodes import MasterClient, ServerNode, WorkerNode
from gorse_tpu.storage import BlobStore, Feedback, Item, MetaStore
from gorse_tpu.storage import cache as ck
from gorse_tpu.storage.cache import open_cache_store
from gorse_tpu.storage.data import open_data_store
from gorse_tpu.utils.config import Config


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture
def master_env(tmp_path):
    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    # shared sqlite files so other "processes" see the same state
    config.database.data_store = f"sqlite://{tmp_path}/data.db"
    config.database.cache_store = f"sqlite://{tmp_path}/cache.db"
    config.database.blob_store = str(tmp_path / "blobs")
    config.recommend.ranker.type = "none"
    config.recommend.ranker.recommenders = ["collaborative"]
    data = open_data_store(config.database.data_store)
    cache = open_cache_store(config.database.cache_store)
    blob = BlobStore(config.database.blob_store)
    meta = MetaStore()
    rng = np.random.default_rng(0)
    data.insert_items([Item(f"i{k}", timestamp=float(k)) for k in range(30)])
    fbs = []
    for u in range(12):
        for i in rng.choice(30, size=5, replace=False):
            fbs.append(Feedback("like", f"u{u}", f"i{i}", timestamp=float(rng.integers(1, 100))))
    data.insert_feedback(fbs)
    master = Master(config, data, cache, blob, meta)
    master.run_tasks_once()
    rest = MasterRestServer(master)
    port = _free_port()
    rest.serve("127.0.0.1", port)
    yield master, f"http://127.0.0.1:{port}", cache
    rest.shutdown()


def test_worker_node_syncs_over_http(master_env):
    master, url, cache = master_env
    w1 = WorkerNode(url, meta_timeout=0.1)
    n = w1.sync_once()
    assert n == 12  # only worker -> owns every user
    assert cache.search_scores(ck.RECOMMEND, "u3", None, 0, 5)
    # worker progress arrived at the master
    tasks = master.progress.list()
    assert any(t.get("Node") == w1.client.node_id for t in tasks)


def test_two_workers_split_users(master_env):
    master, url, cache = master_env
    # pinned ids: a pair under which the 12 users rendezvous-split non-trivially
    # (random ids can legitimately send all 12 to one node at these tiny scales)
    w1 = WorkerNode(url, meta_timeout=0.1, node_id="worker-a")
    w2 = WorkerNode(url, meta_timeout=0.1, node_id="worker-b")
    # both register first so the peer list contains both
    w1.client.get_meta()
    w2.client.get_meta()
    n1 = w1.sync_once()
    n2 = w2.sync_once()
    assert n1 + n2 == 12 and n1 > 0 and n2 > 0  # disjoint shards cover all


def test_server_node_serves_recommendations(master_env):
    import json
    import urllib.request

    master, url, cache = master_env
    WorkerNode(url, meta_timeout=0.1).sync_once()
    server = ServerNode(url, meta_timeout=0.1)
    port = _free_port()
    server.serve("127.0.0.1", port)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/recommend/u3?n=5") as resp:
            recs = json.loads(resp.read().decode())
        assert len(recs) == 5
    finally:
        server.shutdown()


def test_master_client_registration(master_env):
    master, url, _ = master_env
    c = MasterClient(url, "worker", node_id="w-test")
    meta = c.get_meta()
    assert "w-test" in meta["workers"]
    assert meta["cf_model_id"]


def test_worker_http_health_and_metrics(master_env):
    import json
    import urllib.request

    master, url, cache = master_env
    w = WorkerNode(url, meta_timeout=0.1)
    w.sync_once()
    httpd = w.serve_http()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(base + "/api/health/live") as r:
            assert json.loads(r.read())["status"] == "live"
        with urllib.request.urlopen(base + "/api/health/ready") as r:
            assert json.loads(r.read())["status"] == "ready"
        with urllib.request.urlopen(base + "/metrics") as r:
            body = r.read()
            assert b"gorse_worker_tasks_complete" in body
            # reference worker gauges (worker/metrics.go:28-47)
            assert b"gorse_worker_update_user_recommend_total" in body
            assert b"gorse_worker_offline_recommend_total_seconds" in body
    finally:
        w.shutdown()
