"""Dashboard/admin API, dump/restore, CSV import/export, metrics, online
evaluator tests (reference analogs: master/rest_test.go, master/metrics.go)."""

import io
import json
import time
import urllib.request

import numpy as np
import pytest

from gorse_tpu.serve import InOneNode
from gorse_tpu.serve.dump import (
    dump,
    export_feedback,
    export_items,
    export_users,
    import_feedback,
    import_items,
    import_users,
    restore,
)
from gorse_tpu.serve.metrics import MetricsRegistry, OnlineEvaluator
from gorse_tpu.storage import Feedback, Item, MemoryDataStore, User
from gorse_tpu.utils.config import Config


def test_dump_restore_round_trip():
    src = MemoryDataStore()
    src.insert_users([User("u1", labels={"a": 1}), User("u2")])
    src.insert_items([Item("i1", categories=["x"], timestamp=5.0)])
    src.insert_feedback([Feedback("like", "u1", "i1", timestamp=7.0)])
    buf = io.BytesIO()
    counts = dump(src, buf)
    assert counts == {"users": 2, "items": 1, "feedback": 1}
    dst = MemoryDataStore()
    buf.seek(0)
    counts2 = restore(dst, buf)
    assert counts2 == counts
    assert dst.get_user("u1").labels == {"a": 1}
    assert dst.get_item("i1").categories == ["x"]
    assert dst.get_user_feedback("u1")[0].timestamp == 7.0
    with pytest.raises(ValueError):
        restore(dst, io.BytesIO(b"garbage"))


def test_csv_round_trip():
    src = MemoryDataStore()
    src.insert_users([User("u1", labels=["l1"])])
    src.insert_items([Item("i1", is_hidden=True, categories=["a", "b"], timestamp=3.0)])
    src.insert_feedback([Feedback("star", "u1", "i1", timestamp=9.0)])
    ubuf, ibuf, fbuf = io.StringIO(), io.StringIO(), io.StringIO()
    assert export_users(src, ubuf) == 1
    assert export_items(src, ibuf) == 1
    assert export_feedback(src, fbuf) == 1
    dst = MemoryDataStore()
    assert import_users(dst, io.StringIO(ubuf.getvalue())) == 1
    assert import_items(dst, io.StringIO(ibuf.getvalue())) == 1
    assert import_feedback(dst, io.StringIO(fbuf.getvalue())) == 1
    item = dst.get_item("i1")
    assert item.is_hidden and item.categories == ["a", "b"] and item.timestamp == 3.0
    assert dst.get_user("u1").labels == ["l1"]


def test_metrics_registry():
    reg = MetricsRegistry(namespace="gorse")
    reg.gauge_set("master_users_total", 5, help="number of users")
    reg.counter_inc("requests", labels={"path": "/api/recommend"})
    reg.counter_inc("requests", labels={"path": "/api/recommend"})
    reg.observe_seconds("master_load_dataset", 1.5)
    text = reg.render()
    assert "# TYPE gorse_master_users_total gauge" in text
    assert "gorse_master_users_total 5.0" in text
    assert 'gorse_requests{path="/api/recommend"} 2.0' in text
    assert "gorse_master_load_dataset_seconds 1.5" in text


def test_metrics_histogram():
    """Prometheus histogram exposition (reference:
    gorse_server_rest_api_request_seconds HistogramVec, server/metrics.go)."""
    reg = MetricsRegistry(namespace="gorse")
    for v in (0.003, 0.02, 0.02, 7.0, 99.0):
        reg.histogram_observe(
            "server_rest_api_request_seconds", v, labels={"api": "/api/recommend/{user-id}"}
        )
    text = reg.render()
    assert "# TYPE gorse_server_rest_api_request_seconds histogram" in text
    assert 'le="0.005"} 1' in text          # 0.003
    assert 'le="0.025"} 3' in text          # + two 0.02s
    assert 'le="10.0"} 4' in text           # + 7.0
    assert 'le="+Inf"} 5' in text           # + 99.0
    assert 'gorse_server_rest_api_request_seconds_count{api="/api/recommend/{user-id}"} 5' in text
    total = 0.003 + 0.02 + 0.02 + 7.0 + 99.0
    assert f'gorse_server_rest_api_request_seconds_sum{{api="/api/recommend/{{user-id}}"}} {total}' in text


def test_online_evaluator():
    ev = OnlineEvaluator(positive_types=["like"], read_types=["read"])
    now = time.time()
    # user 0 read items 1,2 today; liked item 1 -> ratio 0.5
    ev.add("read", 0, 0, 1, now)
    ev.add("read", 0, 0, 2, now)
    ev.add("like", 0, 0, 1, now)
    # user 1 read item 3, no likes -> excluded (reference skips users with
    # no positive feedback at all, master/metrics.go:287-289)
    ev.add("read", 0, 1, 3, now)
    points = ev.evaluate()
    overall = [p for p in points if p.name == "positive_feedback_ratio"]
    assert overall and abs(overall[0].value - 0.5) < 1e-9
    typed = [p for p in points if p.name == "positive_feedback_ratio_like"]
    assert typed and abs(typed[0].value - 0.5) < 1e-9
    # user 1 likes something else -> now counted with ratio 0 for reads
    ev.add("like", 0, 1, 9, now)
    points = ev.evaluate()
    overall = [p for p in points if p.name == "positive_feedback_ratio"]
    assert abs(overall[0].value - 0.25) < 1e-9  # mean(0.5, 0)


@pytest.fixture
def node(tmp_path):
    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    config.recommend.ranker.type = "none"
    node = InOneNode(config, workdir=str(tmp_path))
    rng = np.random.default_rng(0)
    node.data.insert_items([Item(f"i{k}", timestamp=float(k), categories=["c"]) for k in range(15)])
    pairs = [(u, i) for u in range(8) for i in range(15)]
    rng.shuffle(pairs)
    node.data.insert_feedback([
        Feedback("like", f"u{u}", f"i{i}", timestamp=float(t))
        for t, (u, i) in enumerate(pairs[:60])
    ])
    node.run_once()
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    node.serve("127.0.0.1", port, background_loop=False)
    yield node, f"http://127.0.0.1:{port}"
    node.shutdown()


def _get_raw(base, path, headers=None):
    req = urllib.request.Request(base + path, headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), resp.headers.get("Content-Type", "")


def _get(base, path):
    status, body, _ = _get_raw(base, path)
    return status, json.loads(body.decode())


def _post(base, path, data, content_type="application/json"):
    if isinstance(data, (dict, list)):
        data = json.dumps(data).encode()
    req = urllib.request.Request(
        base + path, data=data, method="POST", headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_dashboard_endpoints(node):
    n, base = node
    status, stats = _get(base, "/api/dashboard/stats")
    assert stats["NumUsers"] == 8 and stats["NumItems"] == 15
    assert stats["CFModel"]
    _, tasks = _get(base, "/api/dashboard/tasks")
    assert any(t["Name"] == "fit_cf_model" for t in tasks)
    _, cats = _get(base, "/api/dashboard/categories")
    assert cats == ["c"]
    _, cfg = _get(base, "/api/dashboard/config")
    assert cfg["recommend"]["cache_size"] == 100
    # config override persists + applies
    _post(base, "/api/dashboard/config", {"recommend": {"cache_size": 55}})
    _, cfg2 = _get(base, "/api/dashboard/config")
    assert cfg2["recommend"]["cache_size"] == 55
    assert n.master.meta.get("RECOMMEND_CONFIG")
    _, schema = _get(base, "/api/dashboard/config/schema")
    assert "recommend" in schema["properties"]
    # timeseries recorded during training
    _, ts = _get(base, "/api/dashboard/timeseries/cf_ndcg")
    assert ts and "Value" in ts[0]
    # schedule triggers the loop flag
    _post(base, "/api/dashboard/schedule", {})
    assert n.master._trigger.is_set()


def test_metrics_endpoint(node):
    _, base = node
    status, body, ctype = _get_raw(base, "/metrics")
    text = body.decode()
    assert "gorse_master_users_total 8.0" in text
    # request histogram appears once an API route has been observed
    _get_raw(base, "/api/users")
    _, body, _ = _get_raw(base, "/metrics")
    text = body.decode()
    assert "gorse_server_rest_api_request_seconds_bucket" in text
    assert 'api="/api/users"' in text
    assert ctype.startswith("text/plain")


def test_http_dump_restore_and_csv(node):
    n, base = node
    status, blob, _ = _get_raw(base, "/api/dump")
    assert blob.startswith(b"GTPU1")
    # wipe and restore over HTTP
    n.data.purge()
    assert n.data.count_users() == 0
    status, counts = _post(base, "/api/restore", blob, content_type="application/octet-stream")
    assert counts["users"] == 8 and counts["feedback"] == 60
    # CSV export/import
    status, csv_body, ctype = _get_raw(base, "/api/export/feedback")
    assert ctype.startswith("text/csv")
    n.data.purge()
    status, out = _post(base, "/api/import/feedback", csv_body, content_type="text/csv")
    assert out["RowAffected"] == 60
    assert n.data.count_feedback() == 60


def test_admin_meta_sync(node):
    n, base = node
    status, meta = _post(base, "/api/admin/meta", {
        "uuid": "w-remote", "hostname": "h1", "type": "worker", "version": "0.1",
    })
    assert "w-remote" in meta["workers"]
    assert json.loads(meta["config"])["recommend"]
    _, cluster = _get(base, "/api/dashboard/cluster")
    assert any(c["UUID"] == "w-remote" for c in cluster)
    _post(base, "/api/admin/progress", {"uuid": "w-remote", "spans": [
        {"Name": "recommend", "Status": "running", "Count": 5, "Total": 10}
    ]})
    _, tasks = _get(base, "/api/dashboard/tasks")
    assert any(t.get("Node") == "w-remote" for t in tasks)


def test_dashboard_previews(node):
    """Dashboard preview routes return entity details alongside scores
    (reference: master/rest.go dashboard routes)."""
    import base64

    n, base = node
    # users list + detail with activity timestamps
    status, users = _get(base, "/api/dashboard/users?n=3")
    assert status == 200 and len(users["Users"]) == 3 and users["Cursor"]
    status, user = _get(base, "/api/dashboard/user/u1")
    assert status == 200 and user["UserId"] == "u1"
    assert "LastActiveTime" in user and "LastUpdateTime" in user
    # feedback with full item objects
    status, fb = _get(base, "/api/dashboard/user/u1/feedback/like")
    assert status == 200 and fb and fb[0]["Item"]["ItemId"].startswith("i")
    # global feedback browser: offset-cursor pagination, item join, type filter
    status, page1 = _get(base, "/api/dashboard/feedback?n=10")
    assert status == 200 and len(page1["Feedback"]) == 10 and page1["Cursor"] == "10"
    assert page1["Feedback"][0]["Item"]["ItemId"].startswith("i")
    status, page2 = _get(base, f"/api/dashboard/feedback?n=10&cursor={page1['Cursor']}")
    assert status == 200 and page2["Feedback"]
    k1 = {(f["UserId"], f["Item"]["ItemId"]) for f in page1["Feedback"]}
    k2 = {(f["UserId"], f["Item"]["ItemId"]) for f in page2["Feedback"]}
    assert not (k1 & k2), "pages overlap"
    status, typed = _get(base, "/api/dashboard/feedback/like?n=5")
    assert status == 200 and all(f["FeedbackType"] == "like" for f in typed["Feedback"])
    # recommendation preview with item details
    status, recs = _get(base, "/api/dashboard/recommend/u1?n=5")
    assert status == 200 and len(recs) == 5
    assert all("ItemId" in r and "Score" in r for r in recs)
    # drill into a single source
    status, recs = _get(base, "/api/dashboard/recommend/u1/collaborative?n=5")
    assert status == 200 and len(recs) == 5
    # latest preview scores by timestamp
    status, latest = _get(base, "/api/dashboard/latest?n=4")
    assert status == 200 and len(latest) == 4
    assert latest[0]["Score"] >= latest[-1]["Score"]
    # ranker prompt rendering
    q = base64.b64encode(b"history: {% for t, item in feedback %}{{ item.item_id }} {% endfor %}").decode()
    d = base64.b64encode(b"doc {{ item.item_id }}").decode()
    status, prompt = _get(
        base, f"/api/dashboard/ranker/prompt?query-template={q}&document-template={d}&user-id=u1"
    )
    assert status == 200 and prompt["query"].startswith("history: i")
    assert prompt["documents"] and prompt["documents"][0].startswith("doc i")
    # external preview with a registered callable
    from gorse_tpu.logics.external import register_external

    register_external("dash-preview", lambda uid: [f"{uid}-a", f"{uid}-b"])
    spec = base64.b64encode(b"dash-preview").decode()
    status, ext = _get(base, f"/api/dashboard/external?script={spec}&user-id=u1")
    assert status == 200 and ext == ["u1-a", "u1-b"]


def test_typed_feedback_route(node):
    n, base = node
    status, out = _get(base, "/api/feedback/like?n=5")
    assert status == 200 and len(out["Feedback"]) == 5
    assert all(f["FeedbackType"] == "like" for f in out["Feedback"])
    status, out = _get(base, "/api/feedback/nosuch?n=5")
    assert status == 200 and out["Feedback"] == []


def test_dashboard_ui_served(node):
    """GET / serves the embedded single-file UI, public even with an API key
    (the reference serves the dashboard frontend from the master)."""
    rest = node[0].rest
    rest.api_key = "sekret"
    try:
        status, body = rest.dispatch("GET", "/", {}, None, {})
    finally:
        rest.api_key = ""
    assert status == 200
    html = body.body.decode()
    assert "<!DOCTYPE html>" in html and "gorse_tpu dashboard" in html
    # the UI binds these endpoints; they must all exist in the route table
    for path in (
        "/api/dashboard/stats", "/api/dashboard/cluster", "/api/dashboard/tasks",
        "/api/dashboard/users", "/api/dashboard/config", "/api/dashboard/schedule",
    ):
        assert any(p == path for _, p, _ in rest._route_templates), path


def test_bulk_jsonl_round_trip(node):
    """JSONL bulk export/import on /api/bulk/* (reference:
    master/rest.go:1280-1501): GET streams JSON lines, POST accepts raw JSONL
    or a multipart `file` part, validates ids with line numbers."""
    n, base = node
    status, blob, ctype = _get_raw(base, "/api/bulk/feedback")
    assert status == 200 and ctype.startswith("application/jsonl")
    lines = [json.loads(l) for l in blob.decode().splitlines()]
    assert len(lines) == 60 and {"FeedbackType", "UserId", "ItemId"} <= set(lines[0])
    status, ublob, _ = _get_raw(base, "/api/bulk/users")
    status, iblob, _ = _get_raw(base, "/api/bulk/items")
    n.data.purge()
    # raw-body import
    status, out = _post(base, "/api/bulk/users", ublob, content_type="application/jsonl")
    assert out["RowAffected"] == 8
    # multipart import (the reference's FormFile("file") path)
    boundary = "XBOUND"
    part = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="items.jsonl"\r\n'
        "Content-Type: application/jsonl\r\n\r\n"
    ).encode() + iblob + f"\r\n--{boundary}--\r\n".encode()
    status, out = _post(
        base, "/api/bulk/items", part,
        content_type=f"multipart/form-data; boundary={boundary}",
    )
    assert out["RowAffected"] == 15
    status, out = _post(base, "/api/bulk/feedback", blob, content_type="application/jsonl")
    assert out["RowAffected"] == 60 and n.data.count_feedback() == 60
    # id validation with line info
    bad = json.dumps({"UserId": "has/slash"}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/bulk/users", bad, content_type="application/jsonl")
    assert e.value.code == 400
    assert "has/slash" in json.loads(e.value.read().decode())["error"]


def test_purge_endpoint(node):
    """POST /api/purge requires a dashboard password and the full
    confirmation checklist (reference: master/rest.go:1630-1670)."""
    n, base = node
    # no dashboard password configured -> refused
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/purge", {"check_list": "delete_users,delete_items,delete_feedback,delete_cache"})
    assert e.value.code == 401
    n.master.config.master.dashboard_password = "pw"
    try:
        # incomplete checklist -> refused
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/api/purge", {"check_list": "delete_users"})
        assert e.value.code == 401
        assert n.data.count_users() > 0
        # form-encoded confirmation (what the reference dashboard sends)
        status, out = _post(
            base, "/api/purge",
            b"check_list=delete_users,delete_items,delete_feedback,delete_cache",
            content_type="application/x-www-form-urlencoded",
        )
        assert status == 200
        assert n.data.count_users() == 0 and n.data.count_feedback() == 0
    finally:
        n.master.config.master.dashboard_password = ""


def test_chat_completions_proxy(node):
    """POST /api/chat/completions proxies to the configured OpenAI endpoint,
    with SSE framing for stream:true (reference: master/rest.go:2042-2127)."""
    from gorse_tpu.llm import MockOpenAIServer

    n, base = node
    # unconfigured -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/chat/completions", {"messages": [{"role": "user", "content": "hi"}]})
    assert e.value.code == 400
    server = MockOpenAIServer().start()
    n.master.config.openai.base_url = server.base_url
    n.master.config.openai.chat_completion_model = "test-model"
    try:
        server.queue_completion("hello from the proxy")
        status, resp = _post(
            base, "/api/chat/completions",
            {"messages": [{"role": "user", "content": "hi"}]},
        )
        assert resp["choices"][0]["message"]["content"] == "hello from the proxy"
        # streaming: SSE-framed chunks ending with [DONE]
        server.queue_completion("streamed")
        req = urllib.request.Request(
            base + "/api/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "hi"}], "stream": True}).encode(),
            method="POST", headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Content-Type", "").startswith("text/event-stream")
            body = r.read().decode()
        events = [l[len("data: "):] for l in body.splitlines() if l.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunk = json.loads(events[0])
        assert chunk["object"] == "chat.completion.chunk"
        assert chunk["choices"][0]["delta"]["content"] == "streamed"
    finally:
        n.master.config.openai.base_url = ""
        n.master.config.openai.chat_completion_model = ""
        server.close()


def test_dashboard_redacted_config(node):
    """dashboard_redacted hides the database section (reference:
    master/rest.go:594-601)."""
    n, base = node
    status, cfg = _get(base, "/api/dashboard/config")
    assert status == 200 and "database" in cfg
    n.config.master.dashboard_redacted = True
    status, cfg = _get(base, "/api/dashboard/config")
    assert status == 200 and "database" not in cfg
    n.config.master.dashboard_redacted = False


def test_admin_meta_requires_auth_when_login_configured(tmp_path):
    """/api/admin/* is login/admin-key gated: the full config (passwords,
    DSNs) must not be readable anonymously when a dashboard login exists
    (review finding)."""
    import urllib.error

    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    config.master.dashboard_user_name = "admin"
    config.master.dashboard_password = "hunter2"
    config.master.admin_api_key = "adminkey"
    node = InOneNode(config, workdir=str(tmp_path))
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    node.serve("127.0.0.1", port, background_loop=False)
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(base + "/api/admin/meta", data=b"{}")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("anonymous /api/admin/meta should be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # the admin API key authenticates node sync
        req = urllib.request.Request(
            base + "/api/admin/meta", data=b"{}", headers={"X-API-Key": "adminkey"}
        )
        with urllib.request.urlopen(req) as resp:
            meta = json.loads(resp.read().decode())
        assert "config" in meta
    finally:
        node.shutdown()


def test_login_msg_escaped(node):
    """Reflected XSS: /login?msg= must escape HTML (review finding)."""
    n, base = node
    n.config.master.dashboard_user_name = "admin"
    n.config.master.dashboard_password = "pw"
    try:
        status, body, _ = _get_raw(
            base, "/login?msg=%3Cscript%3Ealert(1)%3C/script%3E"
        )
        assert status == 200
        assert b"<script>" not in body
        assert b"&lt;script&gt;" in body
    finally:
        n.config.master.dashboard_user_name = ""
        n.config.master.dashboard_password = ""


def test_recommend_config_override_survives_restart(tmp_path):
    """POST /api/dashboard/config persists and re-applies after a master
    restart (reference: master/master.go:160-172; review finding)."""
    from gorse_tpu.serve import Master
    from gorse_tpu.storage import BlobStore, MemoryCacheStore, MemoryDataStore, MetaStore
    from gorse_tpu.storage.meta import RECOMMEND_CONFIG

    config = Config()
    config.recommend.collaborative.type = "mf"  # CF is opt-in by default
    meta = MetaStore()
    meta.put(RECOMMEND_CONFIG, json.dumps({"recommend": {"cache_size": 42}}))
    master = Master(config, MemoryDataStore(), MemoryCacheStore(), BlobStore(tmp_path / "b"), meta)
    assert master.config.recommend.cache_size == 42


def test_stats_reference_fields(node):
    """getStats payload carries the reference's field set, populated from the
    global_meta cache keys (master/rest.go:638-730)."""
    _, base = node
    _, stats = _get(base, "/api/dashboard/stats")
    assert stats["BinaryVersion"]
    assert stats["NumUsers"] == 8 and stats["NumItems"] == 15
    assert stats["NumValidPosFeedback"] > 0
    assert stats["NumTotalPosFeedback"] >= stats["NumValidPosFeedback"]
    assert stats["PopularItemsUpdateTime"] > 0
    assert stats["LatestItemsUpdateTime"] > 0
    assert stats["MatchingModelFitTime"] > 0
    assert "NDCG" in stats["MatchingModelScore"]
    assert stats["NumServers"] == 0 and stats["NumWorkers"] == 0


def test_dashboard_ui_routes_exist(node):
    """Route-drift guard: every /api path the SPA's JavaScript references
    must resolve to a registered route (UI and API live in different files;
    a rename on either side should fail here, not at click time)."""
    import re
    from pathlib import Path

    html = (
        Path(__file__).parent.parent / "gorse_tpu" / "serve" / "dashboard.html"
    ).read_text()
    # literal path prefixes up to the first template interpolation / query
    refs = set()
    for m in re.finditer(r'["`](/api/[a-zA-Z0-9/_.-]*)', html):
        refs.add(m.group(1).rstrip("/"))
    assert len(refs) > 15, refs  # the SPA genuinely binds the API surface
    rest = node[0].rest
    templates = [p for _, p, _ in rest._route_templates]

    def resolves(ref: str) -> bool:
        for t in templates:
            # prefix match with {param} segments wildcarded
            t_parts = t.strip("/").split("/")
            r_parts = ref.strip("/").split("/")
            if len(r_parts) > len(t_parts):
                continue
            if all(
                tp.startswith("{") or tp == rp
                for tp, rp in zip(t_parts, r_parts)
            ):
                return True
        return False

    missing = sorted(r for r in refs if not resolves(r))
    assert not missing, f"SPA references unregistered API paths: {missing}"
