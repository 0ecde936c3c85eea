"""Full-cluster integration test: real master/server/worker PROCESSES.

The analog of the reference's client/ integration harness, which boots a
docker-compose cluster and drives the public REST API through the Go SDK
(/root/reference/client/client_test.go, client/setup-test.sh). Here the three
node binaries run as actual subprocesses — the master owns sqlite stores and
proxies them to the other nodes over its gRPC storage proxy (the reference's
node-local-store path, master/master.go:391-393) — and the Python SDK drives
the server's REST API end to end: ingest → train → offline pipeline →
online serving with fallbacks.
"""

import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

from gorse_tpu.client import GorseClient
from gorse_tpu.storage.types import Feedback, Item


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_http(url: str, timeout: float = 90.0) -> None:
    deadline = time.time() + timeout
    last = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url, timeout=2):
                return
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(0.5)
    raise TimeoutError(f"{url} not up: {last}")


@pytest.fixture
def cluster(tmp_path):
    http_port, grpc_port, server_port = _free_port(), _free_port(), _free_port()
    cfg_path = tmp_path / "config.toml"
    cfg_path.write_text(
        f"""
[database]
data_store = "sqlite://{tmp_path}/data.db"
cache_store = "sqlite://{tmp_path}/cache.db"
blob_store = "{tmp_path}/blobs"
meta_store = "sqlite://{tmp_path}/meta.db"

[master]
host = "127.0.0.1"
port = {grpc_port}
http_host = "127.0.0.1"
http_port = {http_port}

[recommend.collaborative]
model = "bpr"

[recommend.ranker]
type = "none"
recommenders = ["collaborative"]

[recommend.fallback]
recommenders = ["latest"]
"""
    )
    import gorse_tpu

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(gorse_tpu.__file__)))
    pythonpath = repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=pythonpath.rstrip(os.pathsep),
    )
    procs: list[subprocess.Popen] = []
    logs = open(tmp_path / "cluster.log", "wb")

    def spawn(cmd):
        p = subprocess.Popen(
            cmd, env=env, cwd=str(tmp_path),
            stdout=logs, stderr=subprocess.STDOUT, start_new_session=True,
        )
        procs.append(p)
        return p

    master_url = f"http://127.0.0.1:{http_port}"
    spawn([sys.executable, "-m", "gorse_tpu.cmd._spawn", "master",
           "--config", str(cfg_path)])
    _wait_http(f"{master_url}/api/health/live")
    spawn([sys.executable, "-m", "gorse_tpu.cmd._spawn", "server",
           "--master", master_url, "--port", str(server_port)])
    spawn([sys.executable, "-m", "gorse_tpu.cmd._spawn", "worker",
           "--master", master_url, "--meta-timeout", "1"])
    _wait_http(f"http://127.0.0.1:{server_port}/api/health/live")
    yield master_url, f"http://127.0.0.1:{server_port}", tmp_path
    for p in procs:
        try:
            os.killpg(p.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
    for p in procs:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            os.killpg(p.pid, signal.SIGKILL)
    logs.close()


def test_cluster_end_to_end(cluster):
    master_url, server_url, tmp_path = cluster
    client = GorseClient(server_url)

    # ingest a small catalog through the public REST API (via gRPC proxy
    # to the master's sqlite underneath)
    rng = np.random.default_rng(0)
    for k in range(40):
        client.insert_item(Item(f"i{k}", timestamp=float(k)))
    fbs = [
        Feedback("like", f"u{u}", f"i{i}", timestamp=1.0)
        for u in range(15)
        for i in rng.choice(40, size=6, replace=False)
    ]
    client.insert_feedback(fbs, overwrite=True)
    assert client.get_item("i3").item_id == "i3"

    # trigger a master training cycle via the dashboard API
    req = urllib.request.Request(
        f"{master_url}/api/dashboard/schedule", data=b"{}", method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200

    # the worker refreshes on its 1s cadence; poll until recommendations land
    deadline = time.time() + 240
    recs = []
    while time.time() < deadline:
        try:
            recs = client.get_recommend("u3", n=5)
            if recs:
                break
        except Exception:
            pass
        time.sleep(1.0)
    assert len(recs) == 5, (recs, (tmp_path / "cluster.log").read_text()[-2000:])

    # cold user goes through the fallback chain (latest)
    cold = client.get_recommend("brand-new-user", n=3)
    assert len(cold) == 3
