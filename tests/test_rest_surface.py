"""Endpoint-level coverage for the REST routes not exercised elsewhere
(reference analog: server/rest_test.go drives every route): entity feedback
reads, neighbors aliases, category add/remove, measurements, HTTP CSV
import/export, and the dashboard preview routes."""

import io
import json
import socket
import urllib.error
import urllib.request

import numpy as np
import pytest

from gorse_tpu.serve import InOneNode
from gorse_tpu.storage import Feedback, Item, User
from gorse_tpu.utils.config import (
    Config,
    ItemToItemConfigEntry,
    NonPersonalizedConfigEntry,
    UserToUserConfigEntry,
)


@pytest.fixture(scope="module")
def node(tmp_path_factory):
    config = Config()
    config.recommend.ranker.type = "none"
    config.recommend.item_to_item = [ItemToItemConfigEntry(name="similar", type="users")]
    config.recommend.user_to_user = [UserToUserConfigEntry(name="peers", type="items")]
    config.recommend.non_personalized = [
        NonPersonalizedConfigEntry(name="trending", score="len(feedback)")
    ]
    node = InOneNode(config, workdir=str(tmp_path_factory.mktemp("surface")))
    node.data.insert_users([User(f"u{u}") for u in range(8)])
    node.data.insert_items(
        [Item(f"i{k}", timestamp=float(k), categories=["even"] if k % 2 == 0 else [])
         for k in range(16)]
    )
    rng = np.random.default_rng(3)
    fbs = []
    for u in range(8):
        for i in rng.choice(16, size=6, replace=False):
            fbs.append(Feedback("like", f"u{u}", f"i{i}", timestamp=float(u * 16 + i)))
    fbs.append(Feedback("read", "u0", "i1", timestamp=1.0))
    node.data.insert_feedback(fbs)
    node.run_once()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    node.serve("127.0.0.1", port, background_loop=False)
    yield node, f"http://127.0.0.1:{port}"
    node.shutdown()


def _req(base, path, method="GET", data=None, content_type="application/json"):
    if isinstance(data, (dict, list)):
        data = json.dumps(data).encode()
    r = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"Content-Type": content_type} if data else {},
    )
    with urllib.request.urlopen(r) as resp:
        body = resp.read()
        ctype = resp.headers.get("Content-Type", "")
        return resp.status, json.loads(body) if "json" in ctype else body


def test_entity_feedback_reads(node):
    _, base = node
    _, rows = _req(base, "/api/user/u0/feedback")
    assert rows and all(r["UserId"] == "u0" for r in rows)
    _, typed = _req(base, "/api/user/u0/feedback/read")
    assert [r["ItemId"] for r in typed] == ["i1"]
    _, irows = _req(base, "/api/item/i1/feedback")
    assert irows and all(r["ItemId"] == "i1" for r in irows)
    _, ityped = _req(base, "/api/item/i1/feedback/read")
    assert [r["UserId"] for r in ityped] == ["u0"]
    # unknown type -> empty, not an error
    _, none = _req(base, "/api/item/i1/feedback/ghost-type")
    assert none == []


def test_neighbors_aliases(node):
    """/neighbors routes alias the FIRST configured i2i/u2u engine
    (reference: getItemNeighbors server/rest.go)."""
    _, base = node
    _, via_name = _req(base, "/api/item-to-item/similar/i1")
    _, via_alias = _req(base, "/api/item/i1/neighbors")
    assert via_alias == via_name and via_alias
    _, by_cat = _req(base, "/api/item/i1/neighbors/even")
    assert by_cat
    ids = {r["Id"] for r in by_cat}
    assert ids <= {f"i{k}" for k in range(0, 16, 2)}  # category filter applied
    _, u_via_name = _req(base, "/api/user-to-user/peers/u0")
    _, u_via_alias = _req(base, "/api/user/u0/neighbors")
    assert u_via_alias == u_via_name and u_via_alias


def test_non_personalized_and_measurements(node):
    _, base = node
    _, rows = _req(base, "/api/non-personalized/trending")
    assert rows and rows[0]["Score"] >= rows[-1]["Score"]
    # measurements mirror the dashboard time-series under reference names
    _, points = _req(base, "/api/measurements/num_users")
    assert points and points[-1]["Value"] == 8.0
    _, empty = _req(base, "/api/measurements/no_such_series")
    assert empty == []


def test_item_category_add_remove(node):
    n, base = node
    _, out = _req(base, "/api/item/i3/category/featured", method="PUT")
    assert out["RowAffected"] == 1
    assert "featured" in n.data.get_item("i3").categories
    # idempotent
    _req(base, "/api/item/i3/category/featured", method="PUT")
    assert n.data.get_item("i3").categories.count("featured") == 1
    _, out = _req(base, "/api/item/i3/category/featured", method="DELETE")
    assert out["RowAffected"] == 1
    assert "featured" not in n.data.get_item("i3").categories
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/api/item/ghost/category/x", method="PUT")
    assert e.value.code == 404


def test_http_csv_export_import(node):
    n, base = node
    _, csv_users = _req(base, "/api/export/users")
    assert csv_users.decode().count("\n") >= 8
    _, csv_items = _req(base, "/api/export/items")
    assert b"i1" in csv_items
    # import new users through the HTTP surface
    extra = "user_id,labels\nnew-user-a,\nnew-user-b,\n"
    _, out = _req(base, "/api/import/users", method="POST",
                  data=extra.encode(), content_type="text/csv")
    assert n.data.get_user("new-user-a") is not None


def test_dashboard_previews(node):
    _, base = node
    _, i2i = _req(base, "/api/dashboard/item-to-item/similar/i1")
    assert i2i and "Score" in i2i[0] and "ItemId" in i2i[0]
    _, u2u = _req(base, "/api/dashboard/user-to-user/peers/u0")
    assert u2u and "Score" in u2u[0]
    _, np_rows = _req(base, "/api/dashboard/non-personalized/trending")
    assert np_rows and "ItemId" in np_rows[0]
    _, fb = _req(base, "/api/dashboard/user/u0/feedback")
    assert fb
    _, fb_read = _req(base, "/api/dashboard/user/u0/feedback/read")
    assert len(fb_read) == 1


def test_visibility_end_to_end(tmp_path):
    """Deleted, patched-hidden, and overwritten-hidden items vanish from
    latest/neighbors/recommend immediately and return when restored
    (reference: ServerTestSuite.TestVisibility, server/rest_test.go:1660)."""
    from gorse_tpu.storage import cache as ck
    from gorse_tpu.storage.cache import key as ckey
    from gorse_tpu.storage.types import Score

    config = Config()
    config.recommend.item_to_item = [ItemToItemConfigEntry(name="similar", type="users")]
    config.recommend.ranker.type = "fm"  # online recommend reads the cache
    n = InOneNode(config, workdir=str(tmp_path))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    n.serve("127.0.0.1", port, background_loop=False)
    base = f"http://127.0.0.1:{port}"
    try:
        items = [
            {"ItemId": str(i), "Categories": ["a"], "Timestamp": float(i + 1)}
            for i in range(5)
        ]
        _req(base, "/api/items", method="POST", data=items)
        docs = [Score(id=str(i), score=float(i + 1), categories=["", "a"]) for i in range(5)]
        docs.reverse()  # descending score: 4, 3, 2, 1, 0
        n.cache.add_scores(ck.ITEM_TO_ITEM, ckey("similar", "100"), docs)
        n.cache.add_scores(ck.RECOMMEND, "100", docs)

        _req(base, "/api/item/0", method="DELETE")
        _req(base, "/api/item/1", method="PATCH", data={"IsHidden": True})
        _req(base, "/api/item", method="POST", data={"ItemId": "2", "IsHidden": True})

        _, latest = _req(base, "/api/latest?n=10")
        assert [d["Id"] for d in latest] == ["4", "3"]
        _, nb = _req(base, "/api/item/100/neighbors?n=10")
        assert [d["Id"] for d in nb] == ["4", "3"]
        _, recs = _req(base, "/api/recommend/100?n=10")
        assert recs == ["4", "3"]

        # restore: re-insert 0, unhide 1, overwrite 2 visible
        _req(base, "/api/item", method="POST",
             data={"ItemId": "0", "Categories": ["a"], "Timestamp": 1.0})
        _req(base, "/api/item/1", method="PATCH", data={"IsHidden": False})
        _req(base, "/api/item", method="POST",
             data={"ItemId": "2", "Categories": ["a"], "Timestamp": 3.0})

        _, latest = _req(base, "/api/latest?n=10")
        assert [d["Id"] for d in latest] == ["4", "3", "2", "1", "0"]
        _, nb = _req(base, "/api/item/100/neighbors?n=10")
        assert [d["Id"] for d in nb] == ["4", "3", "2", "1", "0"]
        _, recs = _req(base, "/api/recommend/100?n=10")
        assert recs == ["4", "3", "2", "1", "0"]
    finally:
        n.shutdown()
