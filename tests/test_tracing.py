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
