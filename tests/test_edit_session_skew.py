"""Tests: interactive edit-session facade (record/replay/rollback/save) and
skew-safe salted aggregation/join equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row, functions as F

from h2outility_spark.edit_session import EditSession
from h2outility_spark.operators import skew
from h2outility_spark.sources.parquet import load_table
from tests.conftest import SF_DIR

T0 = datetime(2024, 1, 1)


DV_TEST_SCHEMA = (
    "ValueID long, SiteID int, VariableID int, MethodID int, SourceID int, "
    "QualityControlLevelID int, LocalDateTime timestamp, DataValue double, QualifierID int"
)


def dv_frame(spark):
    rows = [
        (i, 1, 7, 1, 1, 0, T0 + timedelta(hours=i), v, None)
        for i, v in enumerate([10.0, 300.0, 310.0, 12.0, 11.0])
    ]
    return spark.createDataFrame(rows, DV_TEST_SCHEMA)


KEYS = ["SiteID", "VariableID", "MethodID", "SourceID", "QualityControlLevelID"]


def test_session_edit_rollback_save(spark):
    store = dv_frame(spark)
    s = EditSession(store, KEYS)
    s.select_value_threshold(">", 100.0).change_value("-", 250.0).flag(4)
    edited = {r["ValueID"]: r for r in s.frame().collect()}
    assert edited[1]["DataValue"] == 50.0 and edited[1]["QualifierID"] == 4
    assert edited[0]["DataValue"] == 10.0 and edited[0]["QualifierID"] is None

    # W9: rollback is free — source never mutated
    assert s.recorded_script()[0]["op"] == "select_value_threshold"
    s.restore()
    assert [r["DataValue"] for r in s.frame().orderBy("ValueID").collect()][1] == 300.0

    # Save: edits replace rows in the store by logical id
    s.select_value_threshold(">", 100.0).change_value("=", -1.0)
    new_store, catalog = s.save(store)
    vals = {r["ValueID"]: r["DataValue"] for r in new_store.collect()}
    assert vals[1] == -1.0 and vals[2] == -1.0 and vals[0] == 10.0
    cat = catalog.collect()[0]
    assert cat["ValueCount"] == 5
    s.close()


def test_session_save_as_new_series(spark):
    store = dv_frame(spark)
    s = EditSession(store, KEYS)
    s.select_value_threshold(">", 100.0).interpolate()
    new_store, catalog = s.save(store, new_keys={"QualityControlLevelID": 1})
    # W8 re-version: original 5 rows intact + 5 new QC-1 rows
    assert new_store.count() == 10
    assert new_store.filter(F.col("QualityControlLevelID") == 1).count() == 5
    assert catalog.collect()[0]["QualityControlLevelID"] == 1
    s.close()


def test_session_save_to_txtable_with_history(spark, tmp_path):
    """W8/W9 with real commit semantics: save commits a MERGE version,
    a bad save is rolled back with restore(), and history records both."""
    from h2outility_spark.storage_tx import TxTable

    store = dv_frame(spark)
    table = TxTable(spark, str(tmp_path / "dv"), key_cols=["ValueID"])
    table.append(store)

    s = EditSession(store, KEYS)
    s.select_value_threshold(">", 100.0).change_value("=", -1.0)
    v = s.save_to_table(table)
    vals = {r["ValueID"]: r["DataValue"] for r in table.snapshot().collect()}
    assert vals[1] == -1.0 and vals[2] == -1.0 and vals[0] == 10.0
    assert table.snapshot().count() == 5  # merge, not append

    # the pre-save state is still readable, and restore() rolls back
    prev = {r["ValueID"]: r["DataValue"] for r in table.snapshot(version=v - 1).collect()}
    assert prev[1] == 300.0
    table.restore(v - 1)
    assert {r["ValueID"]: r["DataValue"] for r in table.snapshot().collect()}[1] == 300.0
    assert [h["op"] for h in table.history()] == ["append", "merge", "restore"]
    s.close()


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for r in ev.groupBy("event_type").agg(F.count("value").alias("n"), F.sum("value").alias("s")).collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for r in skew.salted_agg(
            ev, ["event_type"], {"n": ("count", "value"), "s": ("sum", "value")}, F.col("event_id"), 16
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_matches_plain(spark):
    fact = spark.createDataFrame([Row(k=i % 2, v=i) for i in range(100)])
    dim = spark.createDataFrame([Row(k=0, name="a"), Row(k=1, name="b")])
    plain = fact.join(dim, "k").groupBy("name").count().collect()
    salted = (
        skew.salted_broadcast_join(fact, dim, "k", F.col("v"), n_salts=4)
        .groupBy("name")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
