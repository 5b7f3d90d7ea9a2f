"""JDBC sink e2e against EMBEDDED Derby (VERDICT r8 #3).

The reference's storage leg is a live SQL database
(internal/storage/storage.go:87-151: typed create, sorted insert
columns, identifier gate). No Postgres runs in this sandbox, but Spark
bundles Apache Derby for its Hive metastore — an in-process JDBC
database needing no network — so the `MultiTableWriter` jdbc path gets
a REAL end-to-end: write two tables through the engine's sink, read
them back over jdbc, and confirm the reference's column-order and
identifier semantics survived the trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_multi_table_jdbc_write_and_readback(spark, derby_url):
    """Two branches → two Derby tables; rows, types, and the sorted
    column order (storage.go:97-106) all verified by jdbc read-back."""
    from hermod_spark.sinks.writer import MultiTableWriter

    w = MultiTableWriter(
        jdbc_url=derby_url, jdbc_options={"driver": DERBY_DRIVER}
    )
    sensor = spark.createDataFrame(
        [("kitchen", 21.5, 1), ("lab", 19.0, 2)],
        "room STRING, temp_c DOUBLE, seq BIGINT",
    )
    events = spark.createDataFrame(
        [("boot", "ok"), ("shutdown", "ok")], "kind STRING, status STRING"
    )
    results = w.write({"sensor_data": sensor, "sys_events": events})
    assert {r["table"] for r in results} == {"sensor_data", "sys_events"}
    assert {r["table"]: r["n_rows"] for r in results} == {
        "sensor_data": 2,
        "sys_events": 2,
    }
    # insert used sorted column order, like the reference
    assert results[0]["columns"] == sorted(results[0]["columns"])

    back = _read(spark, derby_url, "sensor_data")
    rows = {r["room"]: r for r in back.collect()}
    assert rows["kitchen"]["temp_c"] == 21.5 and rows["lab"]["seq"] == 2
    assert _read(spark, derby_url, "sys_events").count() == 2


def test_jdbc_append_accumulates(spark, derby_url):
    """mode=append, the reference's insert semantics: a second batch
    lands alongside the first, never truncating."""
    from hermod_spark.sinks.writer import MultiTableWriter

    w = MultiTableWriter(
        jdbc_url=derby_url, jdbc_options={"driver": DERBY_DRIVER}
    )
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("seq"), (F.col("id") * 2).alias("val")
    )
    w.write({"acc": mk(0, 3)})
    w.write({"acc": mk(3, 5)})
    back = _read(spark, derby_url, "acc")
    assert back.count() == 5
    assert {r["seq"] for r in back.collect()} == {0, 1, 2, 3, 4}


def test_jdbc_labeled_fanout_and_identifier_gate(spark, derby_url):
    """write_labeled routes one labeled frame into per-table jdbc
    appends; a hostile table label is refused by the identifier gate
    (storage.go:31-36) BEFORE any SQL touches the database."""
    from hermod_spark.sinks.writer import MultiTableWriter

    w = MultiTableWriter(
        jdbc_url=derby_url, jdbc_options={"driver": DERBY_DRIVER}
    )
    labeled = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), ("alpha", 3)], "_table STRING, v INT"
    )
    results = w.write_labeled(labeled)
    assert [r["table"] for r in results] == ["alpha", "beta"]
    assert _read(spark, derby_url, "alpha").count() == 2
    assert _read(spark, derby_url, "beta").count() == 1

    with pytest.raises(ValueError):
        w.write({"bad-name; DROP TABLE alpha": labeled.drop("_table")})
    # and the gate fired before any connection: table 'alpha' intact
    assert _read(spark, derby_url, "alpha").count() == 2


def test_jdbc_schema_validation_gate(spark, derby_url):
    """With a Schema attached, an undeclared column is rejected before
    the write — the engine-side half of the typed-create contract."""
    from hermod_spark.plans.schema import Schema
    from hermod_spark.sinks.writer import MultiTableWriter

    schema = Schema.declare({"typed": {"a": "bigint", "b": "text"}})
    w = MultiTableWriter(
        jdbc_url=derby_url,
        jdbc_options={"driver": DERBY_DRIVER},
        schema=schema,
    )
    ok = spark.createDataFrame([(1, "x")], "a BIGINT, b STRING")
    w.write({"typed": ok})
    assert _read(spark, derby_url, "typed").count() == 1
    bad = spark.createDataFrame([(1, "x", 2.0)], "a BIGINT, b STRING, c DOUBLE")
    with pytest.raises(Exception):
        w.write({"typed": bad})


def test_jdbc_typed_create_and_complex_marshaling(spark, derby_url):
    """The last reference sink behavior (VERDICT r9 #3): declared SQL
    types reach the CREATE TABLE (schema.go:136-161 →
    createTableColumnTypes) and map/array/struct values are JSON-
    marshaled before the insert (storage.go:118-128). e2e: write a
    route-shaped frame with a nested struct + array column through the
    jdbc sink, read it back as JSON strings, and assert the created
    column types from Derby's catalog."""
    import datetime as dt
    import json

    from hermod_spark.plans.schema import Schema
    from hermod_spark.sinks.writer import MultiTableWriter

    schema = Schema.declare(
        {
            "typed_nested": {
                "t": "timestamptz",
                "topic": "text",
                "meta": "jsonb",
                "readings": "jsonb",
                "n": "bigint",
            }
        }
    )
    w = MultiTableWriter(
        jdbc_url=derby_url,
        jdbc_options={"driver": DERBY_DRIVER},
        schema=schema,
    )
    t0 = dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [
            (t0, "sensors/a", {"unit": "C", "site": "lab"}, [1.5, 2.5], 2),
            (t0, "sensors/b", {"unit": "F"}, [], 0),
        ],
        "t TIMESTAMP, topic STRING, meta MAP<STRING,STRING>, "
        "readings ARRAY<DOUBLE>, n BIGINT",
    )
    [res] = w.write({"typed_nested": df})
    assert res["n_rows"] == 2

    back = _read(spark, derby_url, "typed_nested")
    # nested values came back as the JSON text the reference stores
    assert dict(back.dtypes)["meta"] == "string"
    row = {r["topic"]: r for r in back.collect()}
    assert json.loads(row["sensors/a"]["meta"]) == {"unit": "C", "site": "lab"}
    assert json.loads(row["sensors/a"]["readings"]) == [1.5, 2.5]
    assert row["sensors/b"]["n"] == 0

    # the CREATE used the declared types: text/jsonb pinned VARCHAR
    # (Derby's default for StringType is CLOB), timestamptz→TIMESTAMP,
    # bigint→BIGINT — asserted from Derby's own catalog
    cat = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("driver", DERBY_DRIVER)
        .option(
            "query",
            "SELECT c.COLUMNNAME, CAST(c.COLUMNDATATYPE AS VARCHAR(64)) "
            "AS dtype FROM SYS.SYSCOLUMNS c JOIN SYS.SYSTABLES t ON "
            "c.REFERENCEID = t.TABLEID WHERE t.TABLENAME = 'TYPED_NESTED'",
        )
        .load()
    )
    types = {r["COLUMNNAME"].lower(): r["DTYPE"] for r in cat.collect()}
    # Derby gets VARCHAR at its 32672 maximum (the widest indexable
    # string Derby has — the reference's text/jsonb are unbounded, and
    # the old 8192 cap failed inserts of longer payloads)
    assert types["meta"] == "VARCHAR(32672)"
    assert types["readings"] == "VARCHAR(32672)"
    assert types["topic"] == "VARCHAR(32672)"
    assert types["t"].startswith("TIMESTAMP")
    assert types["n"].startswith("BIGINT")


def test_engine_route_plan_lands_in_derby(spark, derby_url):
    """The reference main loop's shape against a REAL database:
    config-driven routes -> Engine.plan -> MultiTableWriter(jdbc) ->
    rows readable back over jdbc, per route table."""
    import datetime as dt

    from hermod_spark import config as C
    from hermod_spark.engine import Engine
    from hermod_spark.sinks.writer import MultiTableWriter

    eng = Engine(C.loads(
        '[[routes]]\nfilter = "sensors/temp/#"\ntable = "temps_raw"\n'
        '[[routes]]\nfilter = "sensors/#"\ntable = "sensor_raw"\n'
    ))
    t0 = dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc)
    msgs = spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, '{"temperature": 7}'),
            (t0, "sensors/hum/b", 0, False, '{"humidity": 40}'),
            (t0, "other/x", 0, False, '{"z": 1}'),
        ],
        "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING",
    )
    w = MultiTableWriter(jdbc_url=derby_url, jdbc_options={"driver": DERBY_DRIVER})
    results = {r["table"]: r["n_rows"] for r in w.write(dict(eng.plan(msgs)))}
    assert results == {"temps_raw": 1, "sensor_raw": 1, "iot_raw": 1}
    assert _read(spark, derby_url, "temps_raw").count() == 1
    back = _read(spark, derby_url, "sensor_raw").first()
    assert back["topic"] == "sensors/hum/b"


def test_engine_config_builds_jdbc_writer():
    """With a [database] section and no base_path, Engine.writer()
    targets jdbc with the configured credentials — the wiring the
    reference's storage.Connect does (storage.go:41-66)."""
    from hermod_spark import config as C
    from hermod_spark.engine import Engine

    eng = Engine(C.loads(
        "[database]\nhost = \"db.example\"\nport = 5432\n"
        "user = \"u\"\npassword = \"p\"\ndatabase = \"metrics\"\n"
        "sslmode = \"disable\"\npool_size = 4\n"
        '[[routes]]\nfilter = "s/#"\ntable = "t"\n'
    ))
    w = eng.writer()
    assert w.jdbc_url == "jdbc:postgresql://db.example:5432/metrics?sslmode=disable"
    assert w.jdbc_options == {"user": "u", "password": "p"}
    assert w.base_path is None


def test_text_payload_over_8k_survives_jdbc_insert(spark, derby_url):
    """r11 regression proof for the VARCHAR(8192) cap (ADVICE r10):
    the reference's text/jsonb are unbounded, so a 20 KB payload must
    insert and read back byte-identical — under the old fixed
    VARCHAR(8192) DDL this write failed with value-too-long."""
    import datetime as dt
    import json

    from hermod_spark.plans.schema import Schema
    from hermod_spark.sinks.writer import MultiTableWriter

    schema = Schema.declare(
        {"big_payloads": {"t": "timestamptz", "topic": "text",
                          "payload": "jsonb"}}
    )
    w = MultiTableWriter(
        jdbc_url=derby_url,
        jdbc_options={"driver": DERBY_DRIVER},
        schema=schema,
    )
    t0 = dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc)
    big = json.dumps({"blob": "x" * 20000, "n": 1})
    assert len(big) > 8192
    df = spark.createDataFrame(
        [(t0, "sensors/big", big)],
        "t TIMESTAMP, topic STRING, payload STRING",
    )
    [res] = w.write({"big_payloads": df})
    assert res["n_rows"] == 1
    back = _read(spark, derby_url, "big_payloads").collect()
    assert len(back) == 1
    assert back[0]["payload"] == big  # byte-identical round trip
