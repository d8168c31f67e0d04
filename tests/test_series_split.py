"""Hot-series block splitting with halo rows: bounded-frame window results
must be exactly identical to the unsplit computation, on a frame dominated
by one giant series (the qc.py skew hazard made concrete)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Window as W, functions as F

from h2outility_spark.operators import skew

T0 = datetime(2024, 1, 1)
HALO = 3


def _frame(spark):
    # one hot series (5000 rows, 1 per minute) + two tiny ones
    rows = [(1, T0 + timedelta(minutes=i), float(i % 97)) for i in range(5000)]
    rows += [(2, T0 + timedelta(minutes=i * 7), float(i)) for i in range(20)]
    rows += [(3, T0 + timedelta(minutes=i * 11), float(-i)) for i in range(10)]
    return spark.createDataFrame(rows, "series_id int, ts timestamp, v double")


def _bounded_exprs(w):
    return [
        F.avg("v").over(w.rowsBetween(-HALO, 0)).alias("roll_avg"),
        (F.col("v") - F.lag("v", 1).over(w)).alias("diff1"),
        F.lead("v", HALO).over(w).alias("lead3"),
    ]


def test_blocked_windows_match_unsplit_exactly(spark):
    df = _frame(spark)

    w_full = W.partitionBy("series_id").orderBy("ts")
    want = {
        (r["series_id"], r["ts"]): (r["roll_avg"], r["diff1"], r["lead3"])
        for r in df.select("series_id", "ts", *_bounded_exprs(w_full)).collect()
    }

    split = skew.split_series_blocks(
        df, ["series_id"], "ts", halo=HALO, block_seconds=6 * 3600
    )
    w_blk = W.partitionBy("series_id", "__blk").orderBy("ts")
    got_df = skew.finish_series_blocks(
        split.select("series_id", "ts", "__blk", "__halo", *_bounded_exprs(w_blk))
    )
    got = {
        (r["series_id"], r["ts"]): (r["roll_avg"], r["diff1"], r["lead3"])
        for r in got_df.collect()
    }
    assert got == want


def test_split_actually_splits_the_hot_series(spark):
    df = _frame(spark)
    split = skew.split_series_blocks(df, ["series_id"], "ts", halo=HALO, block_seconds=6 * 3600)
    n_blocks = (
        split.filter((F.col("series_id") == 1) & ~F.col("__halo"))
        .select("__blk")
        .distinct()
        .count()
    )
    # 5000 minutes / 6h blocks ~ 14 blocks: the giant series is now parallel
    assert n_blocks >= 10
