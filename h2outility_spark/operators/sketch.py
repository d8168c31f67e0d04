"""Frequency sketches built from plain DataFrame aggregates.

A Count-Min Sketch (Cormode & Muthukrishnan 2005) is a d×w grid of
counters; item x increments cell (j, h_j(x)) for each of the d hash
rows, and its estimate is the MIN over the d cells — always an
OVER-estimate (collisions only add), with error ≤ ε·N at ≥ 1−δ
probability for w = e/ε, d = ln(1/δ).

Expressed Spark-first the sketch is nothing exotic: ONE explode(d) +
ONE groupBy((j, bucket)) — fully combiner-friendly (map-side partial
aggregation does the heavy counting before the shuffle), output is the
fixed d·w-row grid regardless of input size, and grids from different
days/shards MERGE by cell-wise addition (a union + re-groupBy), which
is the property that makes it a 100 TB streaming/heavy-hitter tool.
The hashes are md5-derived (``conv(substr(md5(item || ':' || j)))``),
so the grid is deterministic across runs, partitionings AND engines —
a DuckDB oracle can rebuild the exact same grid in SQL.

Reference parity note: the reference has no sketch surface; this is
part of the beyond-reference large-scale pipeline toolkit (same family
as the HLL++/quantile-sketch certificates already certified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(item: str, j: str, width: int) -> str:
    """Deterministic row-j hash bucket (portable: md5 + base-16 conv)."""
    return (
        f"CAST(conv(substr(md5(concat(CAST({item} AS STRING), ':', "
        f"CAST({j} AS STRING))), 1, 8), 16, 10) AS BIGINT) % {width}"
    )


def count_min_table(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Build the d×w Count-Min grid: (j, bucket, c) rows, one per
    non-empty cell. One narrow explode (×depth) + one hash aggregate;
    the result is bounded by depth·width rows however large the input.
    """
    rows = items.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    return (
        rows.withColumn("bucket", F.expr(_bucket_expr(item_col, "j", width)))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_estimate(
    cms: DataFrame, queries: DataFrame, item_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Point-query the grid for each row of ``queries``: re-derive the d
    buckets, join the (tiny, broadcast) grid, take the MIN — the CMS
    estimate, guaranteed ≥ the true count. ``depth``/``width`` must match
    the build call."""
    probes = queries.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr(item_col, "j", width)))
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left").fillna({"c": 0})
    return joined.groupBy(item_col).agg(F.min("c").alias("est_n"))
