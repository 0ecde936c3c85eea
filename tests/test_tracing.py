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


def _pb_parse(data: bytes) -> list:
    """Minimal protobuf wire parser: [(field, wire_type, value), ...]."""
    import struct

    out, i = [], 0
    while i < len(data):
        tag, shift = 0, 0
        while True:
            b = data[i]; i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, shift = 0, 0
            while True:
                b = data[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            out.append((field, wt, v))
        elif wt == 1:
            out.append((field, wt, struct.unpack("<Q", data[i:i + 8])[0])); i += 8
        elif wt == 2:
            ln, shift = 0, 0
            while True:
                b = data[i]; i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            out.append((field, wt, data[i:i + ln])); i += ln
        else:
            raise AssertionError(f"unexpected wire type {wt}")
    return out


def test_otlp_grpc_export_wire_format():
    """OTLP/gRPC exporter (the reference's `otlp` variant,
    config/config.go:407-413): spans reach an in-process gRPC TraceService
    as a valid opentelemetry-proto ExportTraceServiceRequest."""
    import grpc
    from concurrent import futures

    from gorse_tpu.utils.tracing import OTLPGRPCExporter, Tracer

    received = []

    def export_handler(request: bytes, context) -> bytes:
        received.append(request)
        return b""  # empty ExportTraceServiceResponse

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
    handler = grpc.method_handlers_generic_handler(
        "opentelemetry.proto.collector.trace.v1.TraceService",
        {"Export": grpc.unary_unary_rpc_method_handler(
            export_handler,
            request_deserializer=lambda b: b,
            response_serializer=lambda b: b,
        )},
    )
    server.add_generic_rpc_handlers((handler,))
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    try:
        t = Tracer(
            enabled=True,
            exporter=OTLPGRPCExporter(f"127.0.0.1:{port}"),
            batch_size=2,
        )
        with t.span("parent", kind="train") as parent:
            with t.span("child", step=3):
                pass
        t.flush()
        assert len(received) == 1
        # ExportTraceServiceRequest -> resource_spans(1)
        req = _pb_parse(received[0])
        rs = _pb_parse([v for f, _, v in req if f == 1][0])
        resource = _pb_parse([v for f, _, v in rs if f == 1][0])
        kv = _pb_parse(resource[0][2])
        assert kv[0][2] == b"service.name"
        scope_spans = _pb_parse([v for f, _, v in rs if f == 2][0])
        spans = [_pb_parse(v) for f, _, v in scope_spans if f == 2]
        assert len(spans) == 2
        by_name = {dict((f, v) for f, _, v in s)[5]: dict((f, v) for f, _, v in s) for s in spans}
        assert set(by_name) == {b"parent", b"child"}
        child, par = by_name[b"child"], by_name[b"parent"]
        assert child[1].hex() == par[1].hex() == parent.trace_id  # trace_id
        assert child[4].hex() == par[2].hex()  # parent_span_id == parent.span_id
        assert len(child[1]) == 16 and len(child[2]) == 8
        assert child[8] >= child[7]  # end >= start (fixed64 nanos)
        attr = _pb_parse(child[9])
        assert attr[0][2] == b"step"
        any_v = _pb_parse([v for f, _, v in attr if f == 2][0])
        assert any_v[0] == (3, 0, 3)  # int_value = 3
        status = _pb_parse(child[15])
        assert (3, 0, 1) in status  # STATUS_CODE_OK
    finally:
        server.stop(0)
