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
