"""Wire-protocol details: auth failures, SCRAM, BSON codec, interpolation.

The CRUD surface of these backends is covered by the backend-matrix fixtures
in test_storage.py; this file exercises the protocol layers themselves.
"""

import pytest

from gorse_tpu.storage import bson
from gorse_tpu.storage.minimongo import MiniMongo
from gorse_tpu.storage.minisql import MiniClickHouse, MiniMySQL, MiniPostgres
from gorse_tpu.storage.mongowire import MongoConnection, MongoError
from gorse_tpu.storage.mysqlwire import MySQLConnection, MySQLError
from gorse_tpu.storage.pgwire import PGConnection, PGError
from gorse_tpu.storage.chhttp import ClickHouseConnection, ClickHouseError
from gorse_tpu.storage.sqlstores import sql_interpolate


def test_postgres_scram_rejects_bad_password():
    mini = MiniPostgres().start()
    try:
        with pytest.raises(PGError):
            PGConnection("127.0.0.1", mini.port, user=mini.user, password="wrong")
        conn = PGConnection(
            "127.0.0.1", mini.port, user=mini.user, password=mini.password
        )
        assert conn.query("SELECT 1 AS one") == [("1",)]
        assert conn.ping()
        conn.close()
    finally:
        mini.stop()


def test_mysql_native_password_rejects_bad_password():
    mini = MiniMySQL().start()
    try:
        with pytest.raises(MySQLError):
            MySQLConnection("127.0.0.1", mini.port, user=mini.user, password="wrong")
        conn = MySQLConnection(
            "127.0.0.1", mini.port, user=mini.user, password=mini.password
        )
        conn.query("CREATE TABLE t (a TEXT, b DOUBLE)")
        conn.query("INSERT INTO t VALUES ('it''s', 1.5)")
        assert conn.query("SELECT a, b FROM t") == [("it's", "1.5")]
        assert conn.ping()
        conn.close()
    finally:
        mini.stop()


def test_clickhouse_rejects_bad_key():
    mini = MiniClickHouse().start()
    try:
        bad = ClickHouseConnection("127.0.0.1", mini.port, password="wrong")
        with pytest.raises(ClickHouseError):
            bad.query("SELECT 1")
        good = ClickHouseConnection(
            "127.0.0.1", mini.port, user=mini.user, password=mini.password
        )
        assert good.query("SELECT 1") == [(1,)]
    finally:
        mini.stop()


def test_mongo_scram_rejects_bad_password():
    mini = MiniMongo().start()
    try:
        with pytest.raises(MongoError):
            MongoConnection(
                "127.0.0.1", mini.port, user=mini.state.user, password="wrong"
            )
        conn = MongoConnection(
            "127.0.0.1", mini.port, user=mini.state.user, password=mini.state.password
        )
        conn.command("db", {"insert": "c", "documents": [{"_id": i, "v": i} for i in range(10)]})
        # 10 docs with batch size 3 forces three getMore round trips
        docs = conn.find_all("db", "c", sort={"_id": 1})
        assert [d["v"] for d in docs] == list(range(10))
        conn.close()
    finally:
        mini.stop()


def test_bson_roundtrip():
    doc = {
        "str": "héllo",
        "int32": 42,
        "int64": 1 << 40,
        "neg": -7,
        "float": 3.25,
        "bool_t": True,
        "bool_f": False,
        "null": None,
        "bin": b"\x00\x01\xff",
        "doc": {"nested": ["a", 1, 2.0, None]},
        "arr": [1, "two", {"three": 3}],
    }
    assert bson.decode(bson.encode(doc)) == doc


def test_sql_interpolate_escapes():
    out = sql_interpolate("INSERT INTO t VALUES (?, ?, ?, ?)", ("o'brien", None, 1.5, True))
    assert out == "INSERT INTO t VALUES ('o''brien', NULL, 1.5, 1)"
    with pytest.raises(ValueError):
        sql_interpolate("SELECT ?", ())
