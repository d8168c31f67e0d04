"""ABBA A/B for tpch_q21_waiting_supplier: old semi/anti form vs the
current single-scan stacked-aggregate form (VERDICT r14 "Next round" #1).

Methodology = bench.py's: noop sink, clearCache before every attempt,
order alternated every round (ABBA) so within-session drift cannot favor
one variant. Also verifies the two forms return identical rows.

Usage: python scripts/ab_q21.py [rounds] [sf_dir ...]
Env: SPARK_GRAFT_SF_DIR unused; pass dirs explicitly (default sf0.1 + the
synthetic sf1 via bench._ensure_sf1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from h2outility_spark import workload  # noqa: E402
from h2outility_spark.session import get_spark  # noqa: E402
from h2outility_spark.workload import _t  # noqa: E402


def q21_old_semi_anti(spark, sf_dir):
    """The pre-r14 form: 3 lineitem scans, semi + anti joins."""
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    l1 = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(F.col("l_shipdate") > late_cut)
    l2 = li.select(F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2"))
    has_other = l1.join(
        l2, (F.col("l_orderkey") == F.col("__ok2")) & (F.col("l_suppkey") != F.col("__sk2")), "left_semi"
    )
    l3 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select(F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3"))
    )
    sole_late = has_other.join(
        l3, (F.col("l_orderkey") == F.col("__ok3")) & (F.col("l_suppkey") != F.col("__sk3")), "left_anti"
    )
    return (
        sole_late.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dirs = sys.argv[2:]
    spark = get_spark("ab-q21")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if not dirs:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
        import bench

        sf1 = bench._ensure_sf1("/root/testdata/sf0.1")
        dirs = ["/root/testdata/sf0.1"] + ([sf1] if sf1 else [])

    new_fn = workload.REGISTRY["tpch_q21_waiting_supplier"].fn

    for sf_dir in dirs:
        # warm the scans untimed
        for t in ("lineitem", "orders", "supplier"):
            _t(spark, sf_dir, t).selectExpr("count(*)").collect()

        # result equality first
        old_rows = sorted(map(tuple, q21_old_semi_anti(spark, sf_dir).collect()))
        new_rows = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
        assert old_rows == new_rows, f"RESULT MISMATCH at {sf_dir}"
        print(f"{sf_dir}: results identical ({len(old_rows)} rows)", flush=True)

        def timed(fn):
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # untimed warm pass of both
        timed(q21_old_semi_anti)
        timed(new_fn)
        samples = {"old": [], "new": []}
        for r in range(rounds):
            order = [("old", q21_old_semi_anti), ("new", new_fn)]
            if r % 2 == 1:
                order.reverse()
            for label, fn in order:
                samples[label].append(round(timed(fn), 3))
        summary = {
            k: {
                "min": min(v),
                "median": round(statistics.median(v), 3),
                "samples": v,
            }
            for k, v in samples.items()
        }
        print(json.dumps({"sf_dir": sf_dir, **summary}), flush=True)


if __name__ == "__main__":
    main()
