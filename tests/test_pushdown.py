"""Plan-shape regression tests: predicate pushdown and column pruning must
reach the parquet scan (the README's 'Pushdown verified' claim, kept true
by CI rather than by a one-off audit)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from h2outility_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def _scans(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one blob per FileScan node
    return re.findall(r"FileScan parquet[^\n]*", plan) or [plan]


def test_filter_pushdown_reaches_lineitem_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00")) & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_extendedprice")
    plan = "\n".join(_scans(q))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_discount)" in plan or "l_discount" in plan.split("PushedFilters")[1]


def test_column_pruning_reads_only_projected_columns(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = "\n".join(_scans(q))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}


def test_in_list_pushdown(spark):
    part = load_table(spark, SF_DIR, "part")
    q = part.filter(F.col("p_size").isin(1, 5, 10)).select("p_partkey")
    plan = "\n".join(_scans(q))
    assert "PushedFilters: [" in plan
    assert "In(p_size" in plan


def test_documents_scan_prunes_text_pipeline(spark):
    docs = load_table(spark, SF_DIR, "documents")
    q = docs.select("doc_id", F.length("text").alias("n"))
    plan = "\n".join(_scans(q))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}
