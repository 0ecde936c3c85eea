"""External JS recommender tests — the analog of the reference's
logics/external_test.go (TestFetch / TestPull): user-supplied JavaScript run
with an injected synchronous ``fetch``, returning a JSON array of item ids."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from gorse_tpu.logics.external import External, ExternalConfig, register_external
from gorse_tpu.utils import minijs


@pytest.fixture
def http_server():
    """In-process HTTP server recording the last request (the httptest.Server
    analog, external_test.go:35-42)."""
    state = {"requests": []}

    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length).decode() if length else ""
            state["requests"].append({
                "method": self.command,
                "path": self.path,
                "headers": dict(self.headers),
                "body": body,
            })
            if self.path.startswith("/recs"):
                payload = json.dumps({"items": [
                    {"id": "i2", "score": 1.0},
                    {"id": "i7", "score": 9.0},
                    {"id": "i5", "score": 4.0},
                ]}).encode()
            else:
                payload = b"Hello, client\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        do_GET = do_POST = do_PUT = _handle

        def log_message(self, *args):  # silence
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, state
    server.shutdown()
    thread.join(timeout=5)


class TestFetch:
    """Mirrors TestFetch (external_test.go:30-96): the three fetch call
    forms and the Response shape."""

    def _interp(self, timeout=5.0):
        from gorse_tpu.logics.external import _js_fetch

        i = minijs.Interpreter()
        i.register("fetch", _js_fetch(timeout))
        return i

    def test_fetch_url(self, http_server):
        url, state = http_server
        resp = self._interp().eval(f'fetch("{url}")')
        assert state["requests"][-1]["method"] == "GET"
        assert resp["ok"] is True
        assert resp["status"] == 200.0
        assert resp["statusText"] == "200 OK"
        assert resp["body"] == "Hello, client\n"
        assert "Content-Type" in resp["headers"]

    def test_fetch_request_object(self, http_server):
        url, state = http_server
        self._interp().eval(f'fetch({{method: "POST", url: "{url}"}})')
        assert state["requests"][-1]["method"] == "POST"

    def test_fetch_url_and_options(self, http_server):
        url, state = http_server
        self._interp().eval(f'''fetch("{url}", {{
            method: "PUT",
            headers: {{ "Content-Type": "application/json" }},
            body: JSON.stringify({{message: "Hello, server"}})
        }})''')
        req = state["requests"][-1]
        assert req["method"] == "PUT"
        assert req["headers"]["Content-Type"] == "application/json"
        assert json.loads(req["body"]) == {"message": "Hello, server"}

    def test_fetch_bad_args(self, http_server):
        with pytest.raises(minijs.JSThrow):
            self._interp().eval("fetch(42)")
        with pytest.raises(minijs.JSThrow):
            self._interp().eval('fetch("ftp://nope")')
        # catchable from inside the script
        out = self._interp().eval(
            'try { fetch("http://127.0.0.1:1/unreachable") } catch (e) { "caught" }')
        assert out == "caught"


class TestPull:
    def test_pull_js_script(self, http_server):
        """The reference's Pull contract (external.go:60-101): user_id global,
        script completion value is a JSON array string."""
        url, state = http_server
        script = """
        var resp = fetch('%s/recs?user_id=' + encodeURIComponent(user_id));
        var items = JSON.parse(resp.body).items;
        items.sort((a, b) => b.score - a.score);
        JSON.stringify(items.map(it => it.id))
        """ % url
        ext = External(ExternalConfig(name="my-js", type="js", script=script))
        assert ext.pull("user 1") == ["i7", "i5", "i2"]
        assert "user_id=user%201" in state["requests"][-1]["path"]

    def test_pull_returns_array_object(self):
        ext = External(ExternalConfig(
            name="arr", type="js",
            script="['a', 'b'].map(x => x + user_id)"))
        assert ext.pull("1") == ["a1", "b1"]

    def test_pull_rejects_non_array(self):
        ext = External(ExternalConfig(name="bad", type="js", script="42"))
        with pytest.raises(TypeError):
            ext.pull("u")

    def test_script_type_defaults_to_js(self):
        ext = External(ExternalConfig(name="x", type="", script="JSON.stringify(['only'])"))
        assert ext.pull("u") == ["only"]

    def test_pull_python_registered(self):
        register_external("py-ext", lambda uid: [f"{uid}-x"])
        ext = External(ExternalConfig(name="py-ext", type="python"))
        assert ext.pull("u9") == ["u9-x"]

    def test_pull_http(self, http_server):
        url, state = http_server
        ext = External(ExternalConfig(name="h", type="http", url=f"{url}/recs"))
        # /recs returns an object, not a bare array → treated as no results
        assert ext.pull("u") == []
        assert "user_id=u" in state["requests"][-1]["path"]

    def test_infinite_script_bounded(self):
        ext = External(ExternalConfig(name="spin", type="js",
                                      script="while (true) {}"))
        with pytest.raises(minijs.JSError, match="budget"):
            ext.pull("u")


def test_config_entry_defaults_js_when_script_set():
    from gorse_tpu.utils.config import ExternalConfigEntry

    e = ExternalConfigEntry(name="n", script="1")
    assert e.type == "js"
    assert ExternalConfigEntry(name="n").type == "python"
    # digests differ when scripts differ
    assert e.digest() != ExternalConfigEntry(name="n", script="2").digest()


def test_recommender_chain_external_js(http_server):
    """external/<name> source in the recommender chain runs the JS script."""
    url, _ = http_server
    from gorse_tpu.logics.recommend import Recommender
    from gorse_tpu.storage.cache import open_cache_store
    from gorse_tpu.storage.data import open_data_store
    from gorse_tpu.storage.types import Item
    from gorse_tpu.utils.config import Config, ExternalConfigEntry

    data = open_data_store("memory://")
    cache = open_cache_store("memory://")
    data.insert_items([Item(i) for i in ("i2", "i5", "i7")])
    cfg = Config()
    cfg.recommend.external = [ExternalConfigEntry(
        name="up",
        script=f"""
        var resp = fetch('{url}/recs?user_id=' + user_id);
        JSON.stringify(JSON.parse(resp.body).items
            .sort((a, b) => b.score - a.score)
            .map(it => it.id))
        """,
    )]
    rec = Recommender(
        config=cfg.recommend, cache_client=cache, data_client=data,
        online=True, user_id="u1",
    )
    scores, _digest = rec._recommend_external("up")
    assert [s.id for s in scores] == ["i7", "i5", "i2"]
