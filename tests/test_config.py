"""Config system tests (reference analog: config/config_test.go)."""

import time

import pytest

from gorse_tpu.utils.config import Config, ConfigWatcher, load_config
from gorse_tpu.utils.expression import FeedbackTypeExpression, match_any
from gorse_tpu.utils.safe_expr import SafeExpression

TOML = """
[database]
data_store = "sqlite://"
cache_store = "memory://"

[master]
port = 9000
n_jobs = 4

[recommend]
cache_size = 50

[recommend.data_source]
positive_feedback_types = ["star", "like>3"]
negative_feedback_types = ["hate"]

[[recommend.non_personalized]]
name = "popular"
score = "len(feedback)"

[[recommend.item_to_item]]
name = "similar"
type = "tags"

[recommend.collaborative]
model = "bpr"

[recommend.ranker]
type = "fm"
"""


def test_load_config(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(TOML)
    cfg = load_config(p)
    assert cfg.master.port == 9000
    assert cfg.master.n_jobs == 4
    assert cfg.recommend.cache_size == 50
    assert cfg.recommend.data_source.positive_feedback_types == ["star", "like>3"]
    assert cfg.recommend.non_personalized[0].name == "popular"
    assert cfg.recommend.item_to_item[0].type == "tags"
    # defaults survive
    assert cfg.server.http_port == 8087


def test_validation_rejects_bad_config(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text('[recommend.ranker]\ntype = "bogus"\n')
    with pytest.raises(ValueError):
        load_config(p)
    p.write_text('[[recommend.item_to_item]]\nname = "x"\ntype = "wrong"\n')
    with pytest.raises(ValueError):
        load_config(p)
    p.write_text('[recommend.data_source]\npositive_feedback_types = ["a b c >"]\n')
    with pytest.raises(ValueError):
        load_config(p)


def test_json_round_trip():
    cfg = Config()
    cfg.recommend.cache_size = 123
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.recommend.cache_size == 123
    assert cfg.offline_recommend_digest() == cfg2.offline_recommend_digest()
    cfg2.recommend.cache_size = 456
    assert cfg.offline_recommend_digest() != cfg2.offline_recommend_digest()


def test_hot_reload(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text("[recommend]\ncache_size = 1\n")
    seen = []
    w = ConfigWatcher(p, seen.append, interval=0.05)
    w.start()
    time.sleep(0.1)
    p.write_text("[recommend]\ncache_size = 2\n")
    deadline = time.time() + 5
    while not seen and time.time() < deadline:
        time.sleep(0.05)
    w.stop()
    assert seen and seen[-1].recommend.cache_size == 2


def test_feedback_type_expressions():
    e = FeedbackTypeExpression.parse("like>3")
    assert e.match("like", 4) and not e.match("like", 3) and not e.match("star", 9)
    assert str(e) == "like>3"
    bare = FeedbackTypeExpression.parse("star")
    assert bare.match("star", -5)
    assert match_any(["a", "b>1"], "b", 2)
    assert not match_any(["a", "b>1"], "b", 0)
    with pytest.raises(ValueError):
        FeedbackTypeExpression.parse(">>=3")


def test_safe_expression_blocks_evil():
    assert SafeExpression("1 + 2")() == 3
    assert SafeExpression("len(feedback)")(feedback=[1, 2]) == 2
    assert SafeExpression("item.timestamp * 2")(item=type("I", (), {"timestamp": 5})()) == 10
    for evil in (
        "__import__('os')",
        "().__class__",
        "open('/etc/passwd')",
        "lambda: 1",
        "[x for x in ().__class__.__mro__]",
    ):
        with pytest.raises((ValueError, NameError, TypeError)):
            SafeExpression(evil)()
