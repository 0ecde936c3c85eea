"""gRPC control-plane tests: in-process Master service + blob streaming
(the reference's mockMaster pattern, worker/worker_test.go:571-640)."""

import numpy as np
import pytest

from gorse_tpu.protocol import BlobStoreClient, MasterGrpcClient, serve_master_grpc
from gorse_tpu.serve.master import Master
from gorse_tpu.storage import BlobStore, Feedback, Item, MemoryCacheStore, MemoryDataStore, MetaStore
from gorse_tpu.utils.config import Config


@pytest.fixture
def grpc_master(tmp_path):
    config = Config()
    config.recommend.ranker.type = "none"
    data = MemoryDataStore()
    data.insert_items([Item(f"i{k}", timestamp=float(k)) for k in range(10)])
    data.insert_feedback([
        Feedback("like", f"u{u}", f"i{(u * 3 + j) % 10}", timestamp=1.0)
        for u in range(5) for j in range(3)
    ])
    blob = BlobStore(tmp_path / "blobs")
    master = Master(config, data, MemoryCacheStore(), blob, MetaStore())
    server, port = serve_master_grpc(master, blob, port=0)
    yield master, blob, f"127.0.0.1:{port}"
    server.stop(0)


def test_get_meta_and_registration(grpc_master):
    master, blob, target = grpc_master
    client = MasterGrpcClient(target, "worker", node_id="grpc-w1")
    meta = client.get_meta()
    assert "grpc-w1" in meta["workers"]
    import json

    assert json.loads(meta["config"])["recommend"]["cache_size"] == 100
    # second client sees the first in the peer list
    client2 = MasterGrpcClient(target, "worker", node_id="grpc-w2")
    meta2 = client2.get_meta()
    assert set(meta2["workers"]) >= {"grpc-w1", "grpc-w2"}
    client.close()
    client2.close()


def test_push_progress(grpc_master):
    master, blob, target = grpc_master
    client = MasterGrpcClient(target, "worker", node_id="grpc-w3")
    client.push_progress([
        {"Name": "recommend", "Total": 10, "Count": 5, "Status": "running",
         "StartTime": 1.0, "FinishTime": 0.0, "Error": ""}
    ])
    tasks = master.progress.list()
    assert any(t.get("Node") == "grpc-w3" and t["Count"] == 5 for t in tasks)
    client.close()


def test_blob_streaming_round_trip(grpc_master, tmp_path):
    master, blob, target = grpc_master
    # create a local artifact with a nested file and a large file
    src = tmp_path / "model-src"
    (src / "sub").mkdir(parents=True)
    rng = np.random.default_rng(0)
    big = rng.bytes(3 * (1 << 20) + 17)  # crosses chunk boundaries
    (src / "weights.bin").write_bytes(big)
    (src / "sub" / "meta.json").write_text('{"a": 1}')
    client = BlobStoreClient(target)
    n = client.upload("m123", src)
    assert n == len(big) + len('{"a": 1}')
    assert "m123" in client.list()
    # download into a fresh dir and compare
    dst = tmp_path / "model-dst"
    client.download("m123", dst)
    assert (dst / "weights.bin").read_bytes() == big
    assert (dst / "sub" / "meta.json").read_text() == '{"a": 1}'
    client.close()
