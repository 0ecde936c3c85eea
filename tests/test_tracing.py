"""Tracing shim tests (reference analog: the otel TracingConfig wiring)."""

from gorse_tpu.utils.tracing import configure, tracer


def test_span_nesting_and_export():
    t = configure(enabled=True)
    with t.span("parent") as parent:
        with t.span("child", user="u1") as child:
            assert child.trace_id == parent.trace_id
            assert child.parent_id == parent.span_id
    spans = t.export()
    assert [s["name"] for s in spans] == ["child", "parent"]
    assert spans[0]["attrs"]["user"] == "u1"
    assert spans[1]["duration_ms"] is not None
    configure(enabled=False)


def test_traceparent_propagation():
    t = configure(enabled=True)
    with t.span("upstream") as up:
        header = up.traceparent()
    with t.span("downstream", traceparent=header) as down:
        assert down.trace_id == up.trace_id
        assert down.parent_id == up.span_id
    configure(enabled=False)


def test_disabled_tracer_is_noop():
    t = configure(enabled=False)
    with t.span("x") as s:
        assert s is None
    assert t.export() == []


def test_error_status():
    t = configure(enabled=True)
    try:
        with t.span("boom"):
            raise ValueError("nope")
    except ValueError:
        pass
    assert "error" in t.export()[0]["status"]
    configure(enabled=False)


def test_sample_ratio_zero_drops_roots():
    t = configure(enabled=True, sample_ratio=0.0)
    with t.span("root") as s:
        assert s is None
    assert t.export() == []
    # upstream-context spans are always kept
    with t.span("child", traceparent="00-" + "a" * 32 + "-" + "b" * 16 + "-01") as s:
        assert s is not None
    configure(enabled=False)


def test_configure_from_config():
    from gorse_tpu.utils.config import Config
    from gorse_tpu.utils.tracing import configure_from, tracer

    cfg = Config()
    cfg.tracing.enable = True
    cfg.tracing.sampler = "ratio"
    cfg.tracing.ratio = 0.5
    t = configure_from(cfg)
    assert tracer() is t and t.enabled and t.sample_ratio == 0.5
    cfg.tracing.enable = False
    assert not configure_from(cfg).enabled


class _Collector:
    """In-process HTTP collector capturing POSTed trace payloads."""

    def __init__(self):
        import http.server
        import threading

        collector = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                collector.requests.append(
                    (self.path, self.rfile.read(length))
                )
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.requests = []
        self.server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_otlp_http_export_wire_format():
    import json

    from gorse_tpu.utils.tracing import Tracer, OTLPHTTPExporter

    col = _Collector()
    try:
        t = Tracer(
            enabled=True,
            exporter=OTLPHTTPExporter(f"http://127.0.0.1:{col.port}"),
            batch_size=2,
        )
        with t.span("parent", kind="train") as parent:
            with t.span("child", step=3):
                pass
        # batch_size=2 -> exported on the second finished span, on the
        # background thread; flush() joins the export queue
        t.flush()
        assert len(col.requests) == 1
        path, body = col.requests[0]
        assert path == "/v1/traces"
        doc = json.loads(body)
        rs = doc["resourceSpans"][0]
        svc = rs["resource"]["attributes"][0]
        assert svc["key"] == "service.name"
        spans = rs["scopeSpans"][0]["spans"]
        names = {s["name"] for s in spans}
        assert names == {"parent", "child"}
        child = next(s for s in spans if s["name"] == "child")
        par = next(s for s in spans if s["name"] == "parent")
        assert child["traceId"] == par["traceId"] == parent.trace_id
        assert child["parentSpanId"] == par["spanId"]
        assert int(child["endTimeUnixNano"]) >= int(child["startTimeUnixNano"])
        assert child["attributes"] == [{"key": "step", "value": {"intValue": "3"}}]
        assert child["status"] == {"code": 1}
    finally:
        col.close()


def test_zipkin_export_wire_format():
    import json

    from gorse_tpu.utils.tracing import Tracer, ZipkinExporter

    col = _Collector()
    try:
        t = Tracer(
            enabled=True,
            exporter=ZipkinExporter(f"http://127.0.0.1:{col.port}/api/v2/spans"),
            batch_size=64,
        )
        with t.span("load", table="users"):
            pass
        with t.span("boom") as s:
            s.status = "error: db down"
        t.flush()
        assert len(col.requests) == 1
        path, body = col.requests[0]
        assert path == "/api/v2/spans"
        docs = json.loads(body)
        assert {d["name"] for d in docs} == {"load", "boom"}
        load = next(d for d in docs if d["name"] == "load")
        assert load["localEndpoint"] == {"serviceName": "gorse_tpu"}
        assert load["tags"] == {"table": "users"}
        assert load["duration"] >= 1
        boom = next(d for d in docs if d["name"] == "boom")
        assert boom["tags"]["error"] == "error: db down"
    finally:
        col.close()


def test_export_failure_never_raises():
    from gorse_tpu.utils.tracing import Tracer, OTLPHTTPExporter

    t = Tracer(
        enabled=True,
        exporter=OTLPHTTPExporter("http://127.0.0.1:1"),  # nothing listens
        batch_size=1,
    )
    with t.span("still-works"):
        pass  # export fails internally; span code must be unaffected
    assert t.export()[0]["name"] == "still-works"


def test_configure_from_collector_endpoint():
    from gorse_tpu.utils.config import Config
    from gorse_tpu.utils.tracing import ZipkinExporter, configure, configure_from

    cfg = Config()
    cfg.tracing.enable = True
    cfg.tracing.exporter = "zipkin"
    cfg.tracing.collector_endpoint = "http://example:9411/api/v2/spans"
    t = configure_from(cfg)
    assert isinstance(t.exporter, ZipkinExporter)
    assert t.exporter.endpoint == "http://example:9411/api/v2/spans"
    cfg.tracing.exporter = "otlphttp"
    cfg.tracing.collector_endpoint = "http://example:4318"
    t = configure_from(cfg)
    assert t.exporter.endpoint == "http://example:4318/v1/traces"
    configure(enabled=False)
