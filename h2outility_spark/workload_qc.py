"""QC-engine workload queries (SURVEY.md §2.8: W1–W11) with DuckDB oracles.

Each query applies a QC operator from h2outility_spark.operators.qc over the
``events`` table, treating (user_id, event_type) as the series key — the
operators themselves are generic over key/ts/value columns and run all
series at once (the reference edited one series at a time:
``edit_service.py`` in /root/reference).

Oracle-parity conventions: integer-microsecond time arithmetic
(``unix_micros`` / ``epoch_us``), identical IEEE expression shapes on both
sides, floor-formula rounding (see workload.fround).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from h2outility_spark.operators import qc
from h2outility_spark.workload import _t, fround, query

KEYS = ["user_id", "event_type"]

# event_id is the deterministic tiebreak for duplicate timestamps within a
# series — mirrored in every Spark window via tiebreak="event_id".
SQL_WINDOW = "PARTITION BY user_id, event_type ORDER BY ts, event_id"


def _ev(spark, sf_dir):
    return _t(spark, sf_dir, "events")


@query(
    "qc_gaps",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER ({SQL_WINDOW}) AS gp,
             lead(epoch_us(ts)) OVER ({SQL_WINDOW}) - epoch_us(ts) AS gn
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM t
    WHERE coalesce(gn >= 259200000000, FALSE) OR coalesce(gp >= 259200000000, FALSE)
    """,
    description="W1: data-gap detection — both endpoints of every >=3-day gap per series",
)
def q_qc_gaps(spark, sf_dir):
    ev = qc.select_data_gaps(_ev(spark, sf_dir), KEYS, amount=3, period="day", ts="ts", tiebreak="event_id")
    return ev.filter(F.col(qc.SEL)).select("event_id", "user_id", "event_type", "ts")


@query(
    "qc_value_change",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, ts, value,
             abs(value - lag(value) OVER ({SQL_WINDOW})) AS dp,
             abs(value - lead(value) OVER ({SQL_WINDOW})) AS dn
      FROM events
    )
    SELECT event_id, user_id, event_type, ts, value
    FROM t
    WHERE coalesce(dn >= 100.0, FALSE) OR coalesce(dp >= 100.0, FALSE)
    """,
    description="W2: value-change threshold — both rows of every |delta| >= 100 step",
)
def q_qc_value_change(spark, sf_dir):
    ev = qc.select_value_change(_ev(spark, sf_dir), KEYS, threshold=100.0, value="value", ts="ts", tiebreak="event_id")
    return ev.filter(F.col(qc.SEL)).select("event_id", "user_id", "event_type", "ts", "value")


# Islands: selection mask = value in [20, 60]; group consecutive selected
# rows, summarize each island. The cumulative-sum-of-run-starts formulation
# is identical on both sides.
_ISLANDS_CTE = f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts, value,
             value BETWEEN 20.0 AND 60.0 AS sel
      FROM events
    ),
    p AS (
      SELECT *,
             CASE WHEN sel AND NOT coalesce(lag(sel) OVER ({SQL_WINDOW}), FALSE)
                  THEN 1 ELSE 0 END AS run_start
      FROM s
    ),
    r AS (
      SELECT *,
             sum(run_start)
               OVER ({SQL_WINDOW} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
               AS run_idx
      FROM p
    )
"""


@query(
    "qc_islands",
    oracle=_ISLANDS_CTE
    + """
    SELECT user_id, event_type, CAST(run_idx AS BIGINT) AS group_id,
           CAST(count(*) AS BIGINT) AS n_points,
           min(ts) AS island_start, max(ts) AS island_end
    FROM r WHERE sel
    GROUP BY 1, 2, 3
    """,
    description="W3: gaps-and-islands — consecutive-run grouping of the selection mask",
)
def q_qc_islands(spark, sf_dir):
    ev = _ev(spark, sf_dir).withColumn(qc.SEL, F.col("value").between(20.0, 60.0))
    grouped = qc.selection_groups(ev, KEYS, ts="ts", out="group_id", tiebreak="event_id")
    return (
        grouped.filter(F.col(qc.SEL))
        .groupBy("user_id", "event_type", "group_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
        )
    )


@query(
    "qc_interpolate",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts, value,
             value BETWEEN 20.0 AND 60.0 AS sel,
             CAST(epoch_us(ts) AS DOUBLE) AS td
      FROM events
    ),
    t AS (
      SELECT *,
        last_value(CASE WHEN NOT sel THEN value END IGNORE NULLS)
          OVER ({SQL_WINDOW} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        last_value(CASE WHEN NOT sel THEN td END IGNORE NULLS)
          OVER ({SQL_WINDOW} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        first_value(CASE WHEN NOT sel THEN value END IGNORE NULLS)
          OVER ({SQL_WINDOW} ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN NOT sel THEN td END IGNORE NULLS)
          OVER ({SQL_WINDOW} ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM s
    )
    SELECT event_id, user_id, event_type, ts,
           floor((CASE WHEN sel AND pv IS NOT NULL AND nv IS NOT NULL
                       THEN pv + (td - pt) / (nt - pt) * (nv - pv)
                       ELSE value END) * 10000.0 + 0.5) / 10000.0 AS value_interp
    FROM t
    """,
    description=(
        "W4: linear interpolation of selected runs between nearest unselected anchors; "
        "runs touching a series end are left unchanged"
    ),
    bench=True,
)
def q_qc_interpolate(spark, sf_dir):
    ev = _ev(spark, sf_dir).withColumn(qc.SEL, F.col("value").between(20.0, 60.0))
    out = qc.interpolate_selected(ev, KEYS, ts="ts", value="value", tiebreak="event_id")
    return out.select(
        "event_id", "user_id", "event_type", "ts", fround(F.col("value"), 4).alias("value_interp")
    )


@query(
    "qc_drift",
    oracle=_ISLANDS_CTE.replace("value BETWEEN 20.0 AND 60.0", "value > 50.0")
    + """
    , d AS (
      SELECT *,
             CAST(epoch_us(ts) AS DOUBLE) AS td,
             CASE WHEN sel THEN run_idx END AS island
      FROM r
    ),
    e AS (
      SELECT *,
             min(td) OVER (PARTITION BY user_id, event_type, island) AS x0,
             max(td) OVER (PARTITION BY user_id, event_type, island) -
               min(td) OVER (PARTITION BY user_id, event_type, island) AS xl
      FROM d
    )
    SELECT event_id, user_id, event_type, ts,
           floor((CASE WHEN sel AND island IS NOT NULL AND xl > 0
                       THEN value + 25.0 * (td - x0) / xl
                       ELSE value END) * 10000.0 + 0.5) / 10000.0 AS value_drifted
    FROM e
    """,
    description="W5: drift correction y_i += G * (x_i/x_l) per selected island (G=25)",
)
def q_qc_drift(spark, sf_dir):
    ev = _ev(spark, sf_dir).withColumn(qc.SEL, F.col("value") > 50.0)
    out = qc.drift_correct(ev, KEYS, gap_width=25.0, ts="ts", value="value", tiebreak="event_id")
    return out.select(
        "event_id", "user_id", "event_type", "ts", fround(F.col("value"), 4).alias("value_drifted")
    )


@query(
    "qc_change_value",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 20.0 THEN value + 100.0 ELSE value END AS value_new
    FROM events
    """,
    description="W6: arithmetic update (+100) over the selection (value < 20)",
)
def q_qc_change_value(spark, sf_dir):
    ev = qc.select_value_threshold(_ev(spark, sf_dir), "<", 20.0, value="value")
    return qc.change_value(ev, "+", 100.0, value="value").select("event_id", F.col("value").alias("value_new"))


@query(
    "qc_flag",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 10.0 THEN 9 END AS QualifierID
    FROM events
    """,
    description="W7: qualifier flag assignment over the selection (value < 10)",
)
def q_qc_flag(spark, sf_dir):
    ev = qc.select_value_threshold(_ev(spark, sf_dir), "<", 10.0, value="value")
    flagged = qc.flag_selected(ev, qualifier_id=9, qual_col="QualifierID")
    return flagged.select("event_id", F.col("QualifierID").cast("int").alias("QualifierID"))


@query(
    "season_rollup",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mth,
           CAST(quarter(ts) AS INT) AS season,
           CAST(count(*) AS BIGINT) AS n,
           floor((avg(value)) * 100.0 + 0.5) / 100.0 AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    description="W11/F1/F10: season derivation (quarter boundaries) + month/year rollup",
)
def q_season_rollup(spark, sf_dir):
    from h2outility_spark.functions import season

    ev = _ev(spark, sf_dir)
    return ev.groupBy(
        F.year("ts").alias("yr"), F.month("ts").alias("mth"), season(F.col("ts")).alias("season")
    ).agg(F.count(F.lit(1)).alias("n"), fround(F.avg("value"), 2).alias("avg_value"))


@query(
    "sessionization",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tu,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ptu
      FROM events
    ),
    s AS (
      SELECT *,
             sum(CASE WHEN ptu IS NULL OR tu - ptu > 21600000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM t
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(((max(tu) - min(tu)) / 1000000.0) * 100.0 + 0.5) / 100.0 AS duration_sec
    FROM s
    GROUP BY 1, 2
    """,
    description="Extension (I-family analog): sessionization via lag-gap cumsum (6h inactivity gap)",
    bench=True,
)
def q_sessionization(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tu = F.unix_micros(F.col("ts"))
    ptu = F.lag(tu).over(w)
    new_sess = F.when(ptu.isNull() | ((tu - ptu) > 21_600_000_000), 1).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        fround((F.max(tu) - F.min(tu)) / F.lit(1_000_000.0), 2).alias("duration_sec"),
    )


@query(
    "event_time_windows",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(value)) * 100.0 + 0.5) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="I-family extension: tumbling 1-hour event-time window aggregation (batch form)",
)
def q_event_time_windows(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), fround(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@query(
    "qc_resample_ffill",
    oracle="""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS slot, avg(value) AS slot_v
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS slot FROM spans),
    j AS (SELECT g.user_id, g.slot, o.slot_v
          FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.slot = o.slot),
    f AS (SELECT user_id, slot,
                 last_value(slot_v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
                 slot_v IS NOT NULL AS observed
          FROM j)
    SELECT user_id, make_timestamp(slot * 3600000000) AS ts,
           floor((v) * 10000.0 + 0.5) / 10000.0 AS value, observed
    FROM f
    """,
    description=(
        "Time-regularization: resample each user's click series onto an hourly grid "
        "(per-slot mean, forward-filled empty slots, observed flag) — sequence()-"
        "generated grid per series, no driver loop; the step every downstream "
        "window/rollup assumes"
    ),
)
def q_qc_resample_ffill(spark, sf_dir):
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "click")
    out = qc.resample_grid(ev, keys=["user_id"], interval_seconds=3600, ts="ts", value="value")
    return out.select("user_id", "ts", fround(F.col("value"), 4).alias("value"), "observed")


@query(
    "qc_median_despike",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) AS win
      FROM events WHERE event_type = 'click'
    )
    SELECT event_id, user_id, ts, value,
           win[(len(win) + 1) // 2] AS median_val,
           abs(value - win[(len(win) + 1) // 2]) > 40.0 AS is_spike
    FROM w
    """,
    description=(
        "Rolling-median despike (W2's robust sibling): flag values deviating > 40 from "
        "the 5-point window median — sort_array(collect_list) lower-median, exact and "
        "identical in both engines (no engine median() semantics involved)"
    ),
)
def q_qc_median_despike(spark, sf_dir):
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = qc.median_despike(
        ev, keys=["user_id"], threshold=40.0, window=2, ts="ts", value="value", tiebreak="event_id"
    )
    return out.select("event_id", "user_id", "ts", "value", "median_val", "is_spike")


@query(
    "qc_rolling_zscore",
    oracle="""
    SELECT event_id, user_id, ts, value,
           floor((mu) * 10000.0 + 0.5) / 10000.0 AS mu,
           CASE WHEN sd > 0 THEN abs(value - mu) / sd > 3.0 ELSE FALSE END AS is_anomaly
    FROM (
      SELECT event_id, user_id, ts, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd
      FROM events WHERE event_type = 'click'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    """,
    description=(
        "Rolling z-score anomaly flag: |value - trailing(10) mean| > 3 sigma of the "
        "same trailing window (strictly-preceding frame, so the point can't mask "
        "itself); the parametric sibling of the median despike"
    ),
)
def q_qc_rolling_zscore(spark, sf_dir):
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, -1)
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    out = ev.withColumn("mu", mu).withColumn("sd", sd)
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        fround(F.col("mu"), 4).alias("mu"),
        F.when(F.col("sd") > 0, F.abs(F.col("value") - F.col("mu")) / F.col("sd") > 3.0)
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
