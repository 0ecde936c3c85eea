"""Lightweight distributed tracing.

Covers the reference's OpenTelemetry integration (TracingConfig,
config/config.go:407-413; provider install master/master.go:119-125) with a
dependency-free tracer: spans with W3C ``traceparent`` propagation, exported
to an in-memory buffer and/or the log. The exporter interface matches what
an OTLP exporter would plug into if the otel SDK is added later.
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import random
import secrets
import threading
import time

logger = logging.getLogger(__name__)

_current_span: contextvars.ContextVar["Span | None"] = contextvars.ContextVar(
    "gorse_tpu_span", default=None
)


class Span:
    __slots__ = (
        "trace_id", "span_id", "parent_id", "name", "start", "end", "attrs", "status",
    )

    def __init__(self, name: str, trace_id: str, parent_id: str | None) -> None:
        self.name = name
        self.trace_id = trace_id
        self.span_id = secrets.token_hex(8)
        self.parent_id = parent_id
        self.start = time.time()
        self.end: float | None = None
        self.attrs: dict = {}
        self.status = "ok"

    def set_attribute(self, k: str, v) -> None:
        self.attrs[k] = v

    def traceparent(self) -> str:
        return f"00-{self.trace_id}-{self.span_id}-01"

    def to_dict(self) -> dict:
        return {
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "parent_id": self.parent_id,
            "name": self.name,
            "start": self.start,
            "end": self.end,
            "duration_ms": None if self.end is None else (self.end - self.start) * 1e3,
            "attrs": self.attrs,
            "status": self.status,
        }


class Tracer:
    def __init__(self, enabled: bool = True, sample_ratio: float = 1.0, keep: int = 512) -> None:
        self.enabled = enabled
        self.sample_ratio = sample_ratio
        self.keep = keep
        self._lock = threading.Lock()
        self.finished: list[Span] = []

    @contextlib.contextmanager
    def span(self, name: str, traceparent: str | None = None, **attrs):
        if not self.enabled:
            yield None
            return
        parent = _current_span.get()
        # head sampling: root spans without an upstream context are sampled
        # at sample_ratio; children of sampled traces are always recorded
        if parent is None and not traceparent and random.random() >= self.sample_ratio:
            yield None
            return
        if traceparent:
            parts = traceparent.split("-")
            trace_id = parts[1] if len(parts) >= 3 else secrets.token_hex(16)
            parent_id = parts[2] if len(parts) >= 3 else None
        elif parent is not None:
            trace_id, parent_id = parent.trace_id, parent.span_id
        else:
            trace_id, parent_id = secrets.token_hex(16), None
        span = Span(name, trace_id, parent_id)
        span.attrs.update(attrs)
        token = _current_span.set(span)
        try:
            yield span
        except Exception as e:
            span.status = f"error: {e}"
            raise
        finally:
            span.end = time.time()
            _current_span.reset(token)
            with self._lock:
                self.finished.append(span)
                self.finished = self.finished[-self.keep:]

    def export(self) -> list[dict]:
        with self._lock:
            return [s.to_dict() for s in self.finished]


_tracer = Tracer(enabled=False)


def configure(enabled: bool, sample_ratio: float = 1.0) -> Tracer:
    global _tracer
    _tracer = Tracer(enabled=enabled, sample_ratio=sample_ratio)
    return _tracer


def configure_from(config) -> Tracer:
    """Install the tracer from a utils.config.Config (reference: provider
    install at node start, master/master.go:119-125)."""
    tc = config.tracing
    ratio = tc.ratio if tc.sampler in ("ratio", "traceidratio") else 1.0
    return configure(enabled=tc.enable, sample_ratio=ratio)


def tracer() -> Tracer:
    return _tracer
