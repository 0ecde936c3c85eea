"""utils tests: log redaction, event recorder."""

import logging

from gorse_tpu.utils.events import MemoryRecorder, NopRecorder, get_recorder, set_recorder
from gorse_tpu.utils.log import RedactingFormatter, redact, setup_logging


def test_redact():
    assert redact("mysql://user:hunter2@db:3306/gorse") == "mysql://user:xxxxx@db:3306/gorse"
    assert "hunter2" not in redact('{"api_key": "hunter2"}')
    assert "hunter2" not in redact("auth_token=hunter2 other=ok")
    assert redact("nothing secret here") == "nothing secret here"


def test_redacting_formatter():
    fmt = RedactingFormatter("%(message)s")
    record = logging.LogRecord("t", logging.INFO, "", 0, "dsn redis://a:pw@h", None, None)
    assert "pw" not in fmt.format(record)


def test_setup_logging_openai_file(tmp_path):
    log_file = tmp_path / "openai.log"
    setup_logging(openai_log_file=str(log_file))
    logging.getLogger("gorse_tpu.openai").info("prompt=%r", "hello")
    for h in logging.getLogger("gorse_tpu.openai").handlers:
        h.flush()
    assert "hello" in log_file.read_text()
    # reset to default handlers for other tests
    setup_logging()


def test_event_recorder():
    rec = MemoryRecorder()
    set_recorder(rec)
    try:
        get_recorder().record_api("GET", "/api/recommend/u1", 200, 0.01)
        get_recorder().record_storage("data", "get_user_feedback", 0.002)
        assert rec.api_events[0]["path"] == "/api/recommend/u1"
        assert rec.storage_events[0]["op"] == "get_user_feedback"
    finally:
        set_recorder(NopRecorder())
