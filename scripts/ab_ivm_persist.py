"""ABBA A/B: persist the CDF (and old state) consumed multiple times by
ivm.maintain_grouped_minmax's plan — the maintain plan references `changes`
>=5x (delta_ins x2 sides, delta_del, dn) and `old_state` ~4x; without a
persist each reference re-executes the exceptAll CDF diff / state scan
(guide §5; the r14 #7 CDC-handler discipline applied to the IVM family).

Usage: python scripts/ab_ivm_persist.py [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from h2outility_spark import workload  # noqa: E402
from h2outility_spark.operators import ivm  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

ORIG = ivm.maintain_grouped_minmax
MODE = {"v": "orig"}


def maintain_v2(old_state, changes, base_after, keys, value_col, **kw):
    if MODE["v"] in ("changes", "both"):
        changes = changes.persist()
    if MODE["v"] == "both":
        old_state = old_state.persist()
    return ORIG(old_state, changes, base_after, keys, value_col, **kw)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or ["txtable_incremental_minmax", "stream_minmax_ivm"]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-ivm-persist")
        .config("spark.sql.session.timeZone", "America/Denver")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ivm.maintain_grouped_minmax = maintain_v2
    # the workload modules captured the module attr at import? they import
    # `from h2outility_spark.operators import ivm` and call
    # ivm.maintain_grouped_minmax at run time — the patch reaches them.
    reg = workload.registry()
    for name in names:
        spec = reg[name]

        def run_rows(mode: str):
            MODE["v"] = mode
            spark.catalog.clearCache()
            return sorted(map(tuple, spec.fn(spark, SF_DIR).collect()))

        ra = run_rows("orig")
        rb = run_rows("changes")
        rc = run_rows("both")
        assert ra == rb == rc, f"{name}: variant changed results"
        print(f"{name}: all variants identical ({len(ra)} rows)", flush=True)

        def timed(mode: str) -> float:
            MODE["v"] = mode
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        variants = ["orig", "changes", "both"]
        for v in variants:
            timed(v)  # warm untimed
        samples = {v: [] for v in variants}
        for r in range(rounds):
            order = list(variants)
            if r % 2 == 1:
                order.reverse()
            for v in order:
                samples[v].append(round(timed(v), 3))
        print(
            json.dumps(
                {
                    "query": name,
                    **{
                        k: {"min": min(s), "median": round(statistics.median(s), 3), "samples": s}
                        for k, s in samples.items()
                    },
                }
            ),
            flush=True,
        )
    MODE["v"] = "orig"


if __name__ == "__main__":
    main()
