"""LLM integration tests against the in-process fake OpenAI server
(reference pattern: common/mock/openai.go + logics/chat_test.go,
logics/item_to_item_test.go)."""

import numpy as np
import pytest

from gorse_tpu.llm import MockOpenAIServer, OpenAIClient, hash_embedding, parse_array_from_completion, strip_think
from gorse_tpu.logics.chat import ChatItemToItem, LLMReranker
from gorse_tpu.logics.item_to_item import ItemToItemConfig
from gorse_tpu.parallel.ratelimit import TokenBucket
from gorse_tpu.storage.types import Item, Score, User


@pytest.fixture(scope="module")
def mock_server():
    server = MockOpenAIServer(dimensions=16).start()
    yield server
    server.close()


@pytest.fixture
def client(mock_server):
    mock_server.completions.clear()
    mock_server.requests.clear()
    return OpenAIClient(
        base_url=mock_server.base_url,
        auth_token=mock_server.auth_token,
        chat_model="test-model",
        embedding_model="test-embed",
        embedding_dimensions=16,
    )


def test_chat_completion_echo(client):
    assert client.chat_completion("hello world") == "hello world"


def test_think_stripping(client, mock_server):
    out = client.chat_completion("the prompt", model="deepseek-r1")
    assert "<think>" in out
    assert strip_think(out) == "the prompt"


def test_embeddings_deterministic(client):
    e1 = client.embedding("movie about space")
    e2 = client.embedding("movie about space")
    e3 = client.embedding("cooking show")
    assert e1 == e2 and e1 != e3 and len(e1) == 16
    assert hash_embedding("movie about space", 16) == e1


def test_parse_array_from_completion():
    assert parse_array_from_completion('["a", "b"]') == ["a", "b"]
    assert parse_array_from_completion('Here you go:\n```json\n["x"]\n```') == ["x"]
    assert parse_array_from_completion('<think>hmm</think>["y"]') == ["y"]
    assert parse_array_from_completion("plain text") == ["plain text"]
    assert parse_array_from_completion('[{"id": 1}]') == ['{"id": 1}']
    assert parse_array_from_completion("") == []


def test_token_bucket():
    tb = TokenBucket(60, period=60.0)  # 1/s
    assert tb.take(1) == 0.0  # bucket starts full
    tb.tokens = 0
    delay = tb.take(2)
    assert 1.9 < delay < 2.1


def test_chat_item_to_item(mock_server, client):
    cfg = ItemToItemConfig(
        name="chat", type="chat", column="embedding",
        prompt="queries for {{ item.item_id }}",
    )
    engine = ChatItemToItem(cfg, n=2, openai_client=client)
    rng = np.random.default_rng(0)
    # corpus vectors: the mock embeds query strings deterministically; plant
    # one item whose stored vector equals the embedding of a known query
    planted = np.asarray(hash_embedding("queries for a", 16), dtype=np.float32)
    vectors = {
        "a": rng.normal(size=16).astype(np.float32),
        "b": planted,  # nearest neighbor of item a's generated query
        "c": rng.normal(size=16).astype(np.float32) * 10,
    }
    for iid, v in vectors.items():
        engine.push(Item(iid, labels={"embedding": v.tolist()}), [])
    # the echo mock returns the prompt; make it a JSON array of one query
    mock_server.completions.extend(
        ['["queries for a"]', '["queries for b"]', '["queries for c"]']
    )
    out = dict(engine.pop_all())
    assert out["a"][0].id == "b"  # planted vector wins


def test_llm_reranker(client, mock_server):
    reranker = LLMReranker(client)
    candidates = [Score("i1", 0.1), Score("i2", 0.2), Score("i3", 0.3)]
    mock_server.queue_completion('["i3", "i1"]')
    out = reranker.rank(
        User("u1"), [], candidates, {s.id: Item(s.id) for s in candidates}
    )
    assert [s.id for s in out][:2] == ["i3", "i1"]
    assert out[0].score > out[1].score
    assert {s.id for s in out} == {"i1", "i2", "i3"}  # unranked kept


def test_llm_reranker_survives_api_failure():
    dead = OpenAIClient(base_url="http://127.0.0.1:1", max_retries=1, timeout=0.2)
    reranker = LLMReranker(dead)
    candidates = [Score("i1", 0.5)]
    out = reranker.rank(None, [], candidates, {})
    assert out == candidates  # graceful degradation


def test_worker_llm_ranking(tmp_path, mock_server, client):
    from gorse_tpu.serve import Master, Worker
    from gorse_tpu.storage import BlobStore, Feedback, MemoryCacheStore, MemoryDataStore, MetaStore
    from gorse_tpu.storage import cache as ck
    from gorse_tpu.storage import Item as SItem
    from gorse_tpu.utils.config import Config

    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    config.recommend.ranker.type = "llm"
    config.recommend.ranker.recommenders = ["collaborative"]
    data = MemoryDataStore()
    rng = np.random.default_rng(1)
    data.insert_items([SItem(f"i{k}", timestamp=float(k)) for k in range(20)])
    fbs = [
        Feedback("like", f"u{u}", f"i{i}", timestamp=float(rng.integers(1, 100)))
        for u in range(10)
        for i in rng.choice(20, size=5, replace=False)
    ]
    data.insert_feedback(fbs)
    cache = MemoryCacheStore()
    blob = BlobStore(tmp_path / "blobs")
    meta = MetaStore()
    master = Master(config, data, cache, blob, meta)
    master.run_tasks_once()
    worker = Worker(config, data, cache, blob, node_id="w0", openai_client=client)
    n = worker.sync_and_recommend(master)
    assert n == 10
    assert cache.search_scores(ck.RECOMMEND, "u1", None, 0, 5)


def test_worker_reranker_api_without_openai(tmp_path):
    """ranker.type=llm with [reranker_api] configured ranks through the
    reranker HTTP API and needs no OpenAI client (reference:
    NewChatReranker worker/pipeline.go:233-242)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from gorse_tpu.serve import Master, Worker
    from gorse_tpu.storage import BlobStore, Feedback, MemoryCacheStore, MemoryDataStore, MetaStore
    from gorse_tpu.storage import cache as ck
    from gorse_tpu.storage import Item as SItem
    from gorse_tpu.utils.config import Config

    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            seen["query"] = body["query"]
            seen["auth"] = self.headers.get("Authorization")
            # reverse order, descending relevance
            results = [
                {"index": i, "relevance_score": float(i)}
                for i in range(len(body["documents"]) - 1, -1, -1)
            ]
            payload = _json.dumps({"results": results}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        config = Config()
        config.recommend.collaborative.type = "mf"  # CF is opt-in by default
        config.recommend.ranker.type = "llm"
        config.recommend.ranker.recommenders = ["collaborative"]
        config.recommend.ranker.reranker_api.url = f"http://127.0.0.1:{httpd.server_port}/rerank"
        config.recommend.ranker.reranker_api.auth_token = "sekret"
        config.recommend.ranker.query_template = "user={{ user.user_id }}"
        config.recommend.ranker.document_template = "doc={{ item.item_id }}"
        data = MemoryDataStore()
        rng = np.random.default_rng(1)
        data.insert_items([SItem(f"i{k}", timestamp=float(k)) for k in range(20)])
        data.insert_feedback(
            [
                Feedback("like", f"u{u}", f"i{i}", timestamp=float(rng.integers(1, 100)))
                for u in range(5)
                for i in rng.choice(20, size=5, replace=False)
            ]
        )
        cache = MemoryCacheStore()
        blob = BlobStore(tmp_path / "blobs")
        master = Master(config, data, cache, blob, MetaStore())
        master.run_tasks_once()
        worker = Worker(config, data, cache, blob, node_id="w0")  # no openai client
        n = worker.sync_and_recommend(master)
        assert n == 5
        assert cache.search_scores(ck.RECOMMEND, "u1", None, 0, 5)
        assert seen["query"] == "user=u1" or seen["query"].startswith("user=u")
        assert seen["auth"] == "Bearer sekret"
    finally:
        httpd.shutdown()


def test_llm_reranker_leftovers_rank_below(client, mock_server):
    """Candidates the LLM omits must score BELOW every ranked item — the
    serving cache orders by score (review finding)."""
    from gorse_tpu.storage.types import Score

    mock_server.queue_completion('["b", "a"]')
    reranker = LLMReranker(client)
    candidates = [
        Score("a", 5.0, [], 0.0),
        Score("b", 3.0, [], 0.0),
        Score("omitted", 1.7e9, [], 0.0),  # timestamp-scale score
    ]
    out = reranker.rank(None, [], candidates, {})
    order = [s.id for s in sorted(out, key=lambda s: -s.score)]
    assert order == ["b", "a", "omitted"]
