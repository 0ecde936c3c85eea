"""Admin CLI tests against a live in-one node (reference analog: the
gorse-cli commands driven over the admin HTTP API)."""

import json
import socket

import numpy as np
import pytest

from gorse_tpu.cmd.cli import _json_patch, main
from gorse_tpu.serve import InOneNode
from gorse_tpu.storage import Feedback, Item
from gorse_tpu.utils.config import Config


@pytest.fixture(scope="module")
def node(tmp_path_factory):
    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    config.recommend.ranker.type = "none"
    node = InOneNode(config, workdir=str(tmp_path_factory.mktemp("cli")))
    rng = np.random.default_rng(0)
    node.data.insert_items([Item(f"i{k}", timestamp=float(k), categories=["c"]) for k in range(12)])
    pairs = [(u, i) for u in range(6) for i in range(12)]
    rng.shuffle(pairs)
    node.data.insert_feedback([
        Feedback("like", f"u{u}", f"i{i}", timestamp=float(t))
        for t, (u, i) in enumerate(pairs[:40])
    ])
    node.run_once()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    node.serve("127.0.0.1", port, background_loop=False)
    yield node, f"http://127.0.0.1:{port}"
    node.shutdown()


def _run(capsys, base, *argv) -> str:
    assert main(["--url", base, *argv]) == 0
    return capsys.readouterr().out


def test_json_patch():
    doc = {"cache_size": 100, "data_source": {"item_ttl": 0}, "xs": [1, 2, 3]}
    out = _json_patch(doc, [
        {"op": "replace", "path": "/cache_size", "value": 500},
        {"op": "replace", "path": "/data_source/item_ttl", "value": 72},
        {"op": "remove", "path": "/xs/1"},
        {"op": "add", "path": "/extra", "value": "x"},
    ])
    assert out["cache_size"] == 500
    assert out["data_source"]["item_ttl"] == 72
    assert out["xs"] == [1, 3] and out["extra"] == "x"
    with pytest.raises(ValueError):
        _json_patch({}, [{"op": "test", "path": "/a", "value": 1}])


def test_cli_reads(node, capsys):
    _, base = node
    assert json.loads(_run(capsys, base, "stats"))
    assert "u1" in _run(capsys, base, "get", "user", "u1")
    users = json.loads(_run(capsys, base, "get", "users", "-n", "3"))
    assert len(users["Users"]) == 3
    cats = json.loads(_run(capsys, base, "get", "categories"))
    assert "c" in cats
    recs = json.loads(_run(capsys, base, "recommend", "u1", "-n", "5"))
    assert len(recs) == 5
    # per-recommender preview goes through the dashboard route
    preview = json.loads(_run(capsys, base, "item-to-user", "u1", "collaborative", "-n", "3"))
    assert preview and "ItemId" in preview[0]


def test_cli_pipeline(node, capsys):
    _, base = node
    cfg = json.loads(_run(capsys, base, "pipeline", "show"))
    assert "recommend" in cfg
    schema = json.loads(_run(capsys, base, "pipeline", "schema"))
    assert schema
    old = cfg["recommend"]["cache_size"]
    _run(capsys, base, "pipeline", "patch",
         json.dumps([{"op": "replace", "path": "/cache_size", "value": old + 7}]))
    cfg2 = json.loads(_run(capsys, base, "pipeline", "show"))
    assert cfg2["recommend"]["cache_size"] == old + 7
    _run(capsys, base, "pipeline", "reset", "-y")


def test_bench_reranker_and_embedding(capsys):
    """gorse-tpu-bench reranker/embedding (reference: EvaluateReranker /
    EvaluateEmbedding, cmd/gorse-bench/main.go:209,322) run offline against
    the embedded fake-OpenAI server and print one JSON line."""
    import json

    from gorse_tpu.cmd.bench import main as bench_main

    assert bench_main([
        "reranker", "--dataset", "synthetic://60,40,4,0.1,0",
        "--users", "4", "--candidates", "5", "--context", "3",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["users"] == 4 and "AUC" in out

    assert bench_main([
        "embedding", "--dataset", "synthetic://60,40,4,0.1,0", "--k", "3", "--dim", "16",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["items"] == 40 and 0.0 <= out["recall_vs_coconsumption"] <= 1.0


def test_cli_contexts(tmp_path, capsys, monkeypatch):
    """Named endpoint contexts (reference: cmd/gorse-cli/context.go)."""
    import os

    from gorse_tpu.cmd.cli import Contexts, _resolve_endpoint

    store = tmp_path / "contexts.json"
    monkeypatch.setenv("GORSE_CLI_CONTEXTS", str(store))
    monkeypatch.delenv("GORSE_ADMIN_ENDPOINT", raising=False)
    monkeypatch.delenv("GORSE_ADMIN_API_KEY", raising=False)

    assert main(["context", "list"]) == 0
    assert "No contexts configured" in capsys.readouterr().out
    assert main(["context", "add", "prod", "--endpoint",
                 "http://prod:8087", "--key", "k1"]) == 0
    assert main(["context", "add", "dev", "--endpoint",
                 "http://dev:8087", "--key", "k2"]) == 0
    assert oct(os.stat(store).st_mode & 0o777) == "0o600"
    capsys.readouterr()

    # add selects: dev is current
    assert main(["context", "current"]) == 0
    assert "dev" in capsys.readouterr().out
    assert main(["context", "use", "prod"]) == 0
    assert main(["context", "list"]) == 0
    out = capsys.readouterr().out
    assert "* prod" in out and "http://dev:8087" in out

    # resolution order: flags > env > --context > current
    class A:
        url, api_key, context = "", "", ""
    assert _resolve_endpoint(A()) == ("http://prod:8087", "k1")
    A.context = "dev"
    assert _resolve_endpoint(A()) == ("http://dev:8087", "k2")
    # endpoint from env/flag must NOT borrow a stored context's API key
    # (credential-mixing would leak the saved admin key to another host)
    monkeypatch.setenv("GORSE_ADMIN_ENDPOINT", "http://env:1")
    assert _resolve_endpoint(A()) == ("http://env:1", "")
    A.url = "http://flag:1"
    assert _resolve_endpoint(A()) == ("http://flag:1", "")

    # delete falls back to the next name; unknown context errors
    assert main(["context", "delete", "prod"]) == 0
    assert main(["context", "current"]) == 0
    assert "dev" in capsys.readouterr().out
    assert main(["context", "use", "ghost"]) == 1
    assert main(["context", "add", "bad name", "--endpoint", "x", "--no-prompt"]) == 1
    assert main(["context", "delete", "dev"]) == 0
    assert main(["context", "current"]) == 0
    assert "No current context" in capsys.readouterr().out

    # with no flags/env/contexts the default endpoint applies
    class B:
        url, api_key, context = "", "", ""
    monkeypatch.delenv("GORSE_ADMIN_ENDPOINT", raising=False)
    assert _resolve_endpoint(B()) == ("http://127.0.0.1:8087", "")
