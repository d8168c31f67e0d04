"""Edge-case unit tests for the QC window operators (SURVEY.md §5:
runs touching series ends, single-island drift, both-endpoint gap
selection, island numbering, composition semantics)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row, functions as F

from h2outility_spark.operators import qc

T0 = datetime(2024, 1, 1, 0, 0, 0)


def series(spark, values, gaps_hours=None, key=("s1",)):
    """One series: values at hourly cadence (or custom per-row gaps)."""
    rows = []
    t = T0
    for i, v in enumerate(values):
        if gaps_hours and i > 0:
            t = t + timedelta(hours=gaps_hours[i - 1])
        elif i > 0:
            t = t + timedelta(hours=1)
        rows.append(Row(sid=key[0], vid=1, ts=t, value=float(v), value_id=i))
    return spark.createDataFrame(rows)


KEYS = ["sid", "vid"]


def collected(df, col="value"):
    return [r[col] for r in df.orderBy("value_id").collect()]


def test_gap_selects_both_endpoints(spark):
    df = series(spark, [1, 2, 3, 4], gaps_hours=[1, 5, 1])
    out = qc.select_data_gaps(df, KEYS, amount=4, period="hour", ts="ts")
    assert collected(out, qc.SEL) == [False, True, True, False]


def test_value_change_selects_both_rows(spark):
    df = series(spark, [10.0, 10.5, 50.0, 50.2])
    out = qc.select_value_change(df, KEYS, threshold=30.0, value="value", ts="ts")
    assert collected(out, qc.SEL) == [False, True, True, False]


def test_islands_are_dense_per_series(spark):
    df = series(spark, [0, 100, 100, 0, 100, 0, 100, 100])
    sel = qc.select_value_threshold(df, ">", 50.0, value="value")
    out = qc.selection_groups(sel, KEYS, ts="ts")
    assert collected(out, "group_id") == [None, 0, 0, None, 1, None, 2, 2]


def test_interpolate_interior_run(spark):
    # anchors at 10 (t=0h) and 40 (t=3h); selected rows at 1h and 2h
    df = series(spark, [10.0, -1.0, -1.0, 40.0])
    sel = df.withColumn(qc.SEL, F.col("value") < 0)
    out = qc.interpolate_selected(sel, KEYS, ts="ts", value="value")
    assert collected(out) == [10.0, 20.0, 30.0, 40.0]


def test_interpolate_skips_runs_touching_ends(spark):
    # selected run at the start (no left anchor) and at the end (no right
    # anchor) must be left unchanged — edit_service.py:289-290 semantics
    df = series(spark, [-1.0, 10.0, -1.0, 20.0, -1.0])
    sel = df.withColumn(qc.SEL, F.col("value") < 0)
    out = qc.interpolate_selected(sel, KEYS, ts="ts", value="value")
    assert collected(out) == [-1.0, 10.0, 15.0, 20.0, -1.0]


def test_drift_ramps_within_single_island(spark):
    # island spans t=1h..3h (x_l = 2h); G=10 → +0, +5, +10
    df = series(spark, [0.0, 100.0, 100.0, 100.0, 0.0])
    sel = df.withColumn(qc.SEL, F.col("value") > 50)
    out = qc.drift_correct(sel, KEYS, gap_width=10.0, ts="ts", value="value")
    assert collected(out) == [0.0, 100.0, 105.0, 110.0, 0.0]


def test_drift_leaves_single_point_island_unchanged(spark):
    df = series(spark, [0.0, 100.0, 0.0])
    sel = df.withColumn(qc.SEL, F.col("value") > 50)
    out = qc.drift_correct(sel, KEYS, gap_width=10.0, ts="ts", value="value")
    assert collected(out) == [0.0, 100.0, 0.0]


def test_change_value_ops(spark):
    df = series(spark, [1.0, 2.0])
    sel = df.withColumn(qc.SEL, F.col("value") > 1.5)
    assert collected(qc.change_value(sel, "+", 10, value="value")) == [1.0, 12.0]
    assert collected(qc.change_value(sel, "*", 3, value="value")) == [1.0, 6.0]
    assert collected(qc.change_value(sel, "=", 7, value="value")) == [1.0, 7.0]


def test_filter_composition_ands_with_previous(spark):
    df = series(spark, [10.0, 60.0, 90.0])
    first = qc.select_value_threshold(df, ">", 50.0, value="value")
    composed = qc.select_value_threshold(first, "<", 80.0, value="value", compose=True)
    assert collected(composed, qc.SEL) == [False, True, False]
    # without compose, the new filter replaces the mask
    replaced = qc.select_value_threshold(first, "<", 80.0, value="value", compose=False)
    assert collected(replaced, qc.SEL) == [True, True, False]


def test_ops_are_per_series(spark):
    a = series(spark, [0.0, 100.0, 0.0], key=("a",))
    b = series(spark, [100.0, 0.0, 100.0], key=("b",))
    df = a.unionByName(b)
    sel = df.withColumn(qc.SEL, F.col("value") > 50)
    out = qc.selection_groups(sel, KEYS, ts="ts")
    rows = {(r["sid"], r["value_id"]): r["group_id"] for r in out.collect()}
    assert rows[("a", 1)] == 0
    assert rows[("b", 0)] == 0 and rows[("b", 2)] == 1


def test_reversion_series_changes_keys(spark):
    df = series(spark, [1.0])
    out = qc.reversion_series(df, {"vid": 99})
    assert out.collect()[0]["vid"] == 99
