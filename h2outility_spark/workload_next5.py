"""Round-10 registry staging area (same lifecycle as ``workload_next`` →
``workload_next4``): fully-formed (PySpark fn, DuckDB oracle) pairs
waiting for the round-10 rotation. ``txtable_incremental_minmax`` was
PULLED FORWARD into the round-9 window (VERDICT r8 directive 4 — the
bounded-state MIN/MAX maintenance deserved driver evidence a round
early, and its broadcast-size guard landed first); the rest stay
undecorated until the round-10 rotation wraps them.

Each pair is parity-tested in ``tests/test_workload_next.py`` (STAGED5)
under the driver's comparison discipline at sf0.001 AND sf0.01.

Coverage targets:
  * ``oplist_replay`` — the §2.12 record/replay surface under a driver
    hash for the first time: a four-op QC plan is SAVED to JSON, loaded
    back off disk, compiled onto the DataValues frame by
    ``plans.oplist.apply_plan`` (threshold selection → composed
    value-change selection → arithmetic update → flag), and the edited
    frame is returned. The oracle restates the composed plan as one SQL
    expression — a drift in any op's semantics, the compose rule, or the
    JSON round-trip flips the hash. (Reference: the recorded-script
    mechanism ``record_service.py:14-176`` + JSON job specs
    ``Common.py:46-58``.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from h2outility_spark.plans import oplist
from h2outility_spark.workload import DV_CTE, _dv, _t, fround, query
from h2outility_spark.workload_lakehouse import scratch_dir

# -- §2.12 op-list record/replay under a driver hash ---------------------------

#: The recorded plan: select values > 60, AND-compose with |Δ|>=40 spikes,
#: subtract the 1.5 calibration bias from the selection, flag it.
OPLIST_PLAN = [
    {"op": "select_value_threshold", "args": {"op": ">", "threshold": 60.0}},
    {
        "op": "select_value_change",
        "args": {"threshold": 40.0, "compose": True, "tiebreak": "ValueID"},
    },
    {"op": "change_value", "args": {"op": "-", "operand": 1.5}},
    {"op": "flag_selected", "args": {"qualifier_id": 9}},
]

OPLIST_REPLAY_ORACLE = (
    DV_CTE
    + """,
w AS (
  SELECT ValueID, DataValue, QualifierID,
         abs(DataValue - lead(DataValue) OVER win) AS dn,
         abs(DataValue - lag(DataValue) OVER win) AS dp
  FROM dv
  WINDOW win AS (PARTITION BY SiteID, VariableCode ORDER BY LocalDateTime, ValueID)
),
sel AS (
  SELECT ValueID, DataValue, QualifierID,
         (DataValue > 60.0) AND coalesce(dn >= 40.0 OR dp >= 40.0, FALSE) AS selected
  FROM w
)
SELECT ValueID,
       floor((CASE WHEN selected THEN DataValue - 1.5 ELSE DataValue END) * 100.0 + 0.5) / 100.0
         AS data_value,
       CASE WHEN selected THEN 9 ELSE QualifierID END AS qualifier_id,
       selected
FROM sel
"""
)


def q_oplist_replay(spark, sf_dir):
    """Record → persist → load → replay: the op-list is SAVED as JSON and
    read back before compiling, so the serialization format rides the
    hash along with every op's semantics and the AND-compose rule.
    Catalyst sees the whole composed plan as one lineage (recording costs
    nothing); the only shuffle is the per-series window the spike
    selection needs."""
    path = os.path.join(scratch_dir("h2ou_oplist_"), "plan.json")
    oplist.save_plan(OPLIST_PLAN, path)
    plan = oplist.load_plan(path)

    dv = _dv(spark, sf_dir)
    edited = oplist.apply_plan(dv, plan, keys=["SiteID", "VariableCode"])
    return edited.select(
        "ValueID",
        fround(F.col("DataValue"), 2).alias("data_value"),
        F.col("QualifierID").alias("qualifier_id"),
        F.col("selected"),
    )


# -- streaming OHLC: ordered-aggregate state under append mode ------------------

#: Same event-time split + flush-sentinel machinery as the certified
#: stream_watermark_windows (workload_next3): everything before the cut is
#: micro-batch 1, the rest micro-batch 2, and a far-future sentinel
#: advances the watermark past every real window so append mode flushes
#: them all.
_OHLC_CUT = "2024-01-03 00:00:00"
_OHLC_FLUSH = "2030-01-01 00:00:00"

STREAM_OHLC_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       floor((first(value ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0 AS open,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS high,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS low,
       floor((last(value ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0 AS close,
       CAST(count(*) AS BIGINT) AS n_obs
FROM events
GROUP BY 1, 2
"""


def q_stream_ohlc(spark, sf_dir):
    """Streaming twin of ``series_ohlc``: hourly OHLC per event type
    maintained by a WATERMARKED streaming aggregation whose open/close
    are ORDERED aggregates (min_by/max_by over a (ts, event_id) struct) —
    the state store must carry the argmin/argmax pair per open window
    across micro-batch boundaries, a strictly richer state shape than the
    certified count/sum windows. Two real micro-batches + the flush
    sentinel, drained with ``Trigger.AvailableNow`` against one
    checkpoint; the sentinel's window is filtered back out. State is
    O(open windows × types), never O(events)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    ev = _t(spark, sf_dir, "events").select("ts", "event_type", "value", "event_id")
    src = scratch_dir("h2ou_sohlc_src_")
    out = scratch_dir("h2ou_sohlc_out_") + "/out"
    ckpt = scratch_dir("h2ou_sohlc_ckpt_") + "/ckpt"
    cut = F.lit(_OHLC_CUT).cast("timestamp")
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("event_id", LongType()),
        ]
    )

    def drain(name: str) -> None:
        order_key = F.struct(F.col("ts"), F.col("event_id"))
        agg = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                fround(F.min_by(F.col("value"), order_key), 2).alias("open"),
                fround(F.max("value"), 2).alias("high"),
                fround(F.min("value"), 2).alias("low"),
                fround(F.max_by(F.col("value"), order_key), 2).alias("close"),
                F.count(F.lit(1)).alias("n_obs"),
            )
            .select(F.col("win.start").alias("hour_start"), "event_type", "open", "high", "low", "close", "n_obs")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    # coalesce(1): one file per drain -> one micro-batch per drain
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    drain("sohlc-1")
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
    drain("sohlc-2")
    spark.createDataFrame(
        [(_OHLC_FLUSH, "__flush__", 0.0, 0)], "ts string, event_type string, value double, event_id long"
    ).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value", "event_id"
    ).coalesce(1).write.mode("append").parquet(src)
    drain("sohlc-flush")

    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__flush__")
        .select("hour_start", "event_type", "open", "high", "low", "close", "n_obs")
    )


# -- interactive edit-session facade round trip ---------------------------------

EDIT_SESSION_ORACLE = (
    DV_CTE
    + """,
store AS (
  SELECT ValueID, SiteID, VariableCode, LocalDateTime, DataValue, QualifierID
  FROM dv WHERE SiteID <= 10
),
edited AS (
  SELECT ValueID, SiteID, VariableCode, LocalDateTime,
         CASE WHEN DataValue > 80.0 THEN DataValue * 0.5 ELSE DataValue END AS DataValue,
         CASE WHEN DataValue > 80.0 THEN 7 ELSE QualifierID END AS QualifierID
  FROM store WHERE SiteID <= 5
)
SELECT ValueID, SiteID, VariableCode, LocalDateTime,
       floor(DataValue * 100.0 + 0.5) / 100.0 AS data_value,
       QualifierID AS qualifier_id
FROM (SELECT * FROM edited UNION ALL SELECT * FROM store WHERE SiteID > 5)
"""
)


def q_edit_session_roundtrip(spark, sf_dir):
    """The §3.3 interactive QC session end-to-end on one hash: open a
    cached working set (S4) over sites ≤ 5, record a BAD edit (zero
    everything) and ROLL IT BACK (W9 — if restore() failed to truncate
    the plan, the zeros survive and flip the hash), re-record the real
    edits (threshold selection → halve → flag 7), then SAVE through the
    transactional path (W8/M1: merge_upsert into a TxTable holding the
    sites ≤ 10 store) and return the committed snapshot. The oracle
    restates the final store algebraically: edited working set replaces
    its rows by ValueID, untouched sites ride through."""
    from h2outility_spark.edit_session import EditSession
    from h2outility_spark.storage_tx import TxTable

    dv = _dv(spark, sf_dir).select(
        "ValueID", "SiteID", "VariableCode", "LocalDateTime", "DataValue", "QualifierID"
    )
    store_rows = dv.filter(F.col("SiteID") <= 10)
    table = TxTable(spark, scratch_dir("h2ou_edit_") + "/t", key_cols=["ValueID"])
    table.append(store_rows)

    sess = EditSession(dv, keys=["SiteID", "VariableCode"], series_filter=F.col("SiteID") <= 5)
    try:
        # a wrong turn, rolled back — W9 on the hash
        sess.select_value_threshold(">", -1e18).change_value("=", 0.0)
        sess.restore()
        # the real session
        sess.select_value_threshold(">", 80.0).change_value("*", 0.5).flag(7)
        sess.save_to_table(table)
    finally:
        sess.close()

    snap = table.snapshot()
    return snap.select(
        "ValueID",
        "SiteID",
        "VariableCode",
        "LocalDateTime",
        fround(F.col("DataValue"), 2).alias("data_value"),
        F.col("QualifierID").alias("qualifier_id"),
    )


# -- MIN/MAX incremental maintenance (the non-self-maintainable aggregates) -----

TXTABLE_MINMAX_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey % 50 AS cust_bucket,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 10 < 8
),
upd AS (
  SELECT o_orderkey, o_custkey % 50 AS cust_bucket,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) + 500 AS cents
  FROM orders WHERE o_orderkey % 4 = 0
),
final AS (
  SELECT * FROM upd
  UNION ALL
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
)
SELECT cust_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM final GROUP BY cust_bucket
"""


@query(
    "txtable_incremental_minmax",
    oracle=TXTABLE_MINMAX_ORACLE,
    description="sound bounded MIN/MAX IVM off the CDF: kept-k state, horizon-gated admission, survivors-triggered targeted rescan",
)
def q_txtable_incremental_minmax(spark, sf_dir):
    """MIN/MAX under deletes — the aggregates plain IVM cannot maintain —
    advanced from the CDF with BOUNDED per-key state (k=2 smallest +
    largest kept per bucket, ``ivm.minmax_state``): a deleted kept value
    falls out of the multiset, a deleted beyond-horizon value vanishes
    without effect, and a bucket whose kept set empties is rebuilt by the
    TARGETED rescan (semi-join on exactly those buckets against the post-
    merge snapshot — never a full recompute). k=2 is chosen deliberately
    small so the merge's delete+insert pairs exercise the rescan path on
    real data. The oracle recomputes min/max/count from the final state —
    any drift in the kept-set algebra or the rescan targeting flips the
    hash."""
    from h2outility_spark.operators import ivm
    from h2outility_spark.storage_tx import TxTable

    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 50).alias("cust_bucket"),
        cents.alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") % 10 < 8)
    upd = orders.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "cents", F.col("cents") + F.lit(500)
    )

    t = TxTable(spark, scratch_dir("h2ou_ivmmm_") + "/t", key_cols=["o_orderkey"])
    v1 = t.append(base)
    old_state = ivm.minmax_state(t.snapshot(v1), ["cust_bucket"], "cents", k=2)
    v2 = t.merge_upsert(upd)
    new_state = ivm.maintain_grouped_minmax(
        old_state, t.changes(v1, v2), t.snapshot(v2), ["cust_bucket"], "cents", k=2
    )
    return new_state.select(
        "cust_bucket",
        F.col("n").alias("n_orders"),
        F.element_at("kmin", 1).alias("min_cents"),
        F.element_at("kmax", 1).alias("max_cents"),
    )


#: name -> (fn, oracle) for a future promotion pass and the parity test.
STAGED5 = {
    "oplist_replay": (q_oplist_replay, OPLIST_REPLAY_ORACLE),
    "stream_ohlc": (q_stream_ohlc, STREAM_OHLC_ORACLE),
    "edit_session_roundtrip": (q_edit_session_roundtrip, EDIT_SESSION_ORACLE),
    "txtable_incremental_minmax": (q_txtable_incremental_minmax, TXTABLE_MINMAX_ORACLE),
}
