"""Per-VERB job-count/wall breakdown for a TxTable query (VERDICT r14 #6).
Wraps every public TxTable verb with (jobs, wall) deltas and prints the
call log for one query execution under a driver-shaped session.

Usage: python scripts/profile_txtable_verbs.py [query]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from h2outility_spark import storage_tx, workload  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
LOG: list[dict] = []

VERBS = [
    "append",
    "overwrite",
    "merge_upsert",
    "delete_keys",
    "restore",
    "changes",
    "clone",
    "branch",
    "merge_from_branch",
    "resolve_from_branch",
    "branch_conflicts",
    "compact_files",
    "vacuum",
    "snapshot",
    "history",
]


def instrument(spark) -> None:
    def n_jobs() -> int:
        return int(spark._jsc.sc().dagScheduler().nextJobId())

    for verb in VERBS:
        orig = getattr(storage_tx.TxTable, verb)

        def wrapped(self, *a, _orig=orig, _verb=verb, **kw):
            j0, t0 = n_jobs(), time.perf_counter()
            out = _orig(self, *a, **kw)
            LOG.append(
                {
                    "verb": _verb,
                    "jobs": n_jobs() - j0,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
            )
            return out

        setattr(storage_tx.TxTable, verb, wrapped)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "txtable_resolve_ours"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("profile-txtable-verbs")
        .config("spark.sql.session.timeZone", "America/Denver")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    instrument(spark)
    spec = workload.registry()[name]
    for attempt in range(2):
        spark.catalog.clearCache()
        LOG.clear()
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        # nested verb calls double-count (resolve_from_branch calls others);
        # the log order makes the nesting readable
        print(json.dumps({"query": name, "attempt": attempt, "wall_s": round(wall, 3), "calls": LOG}), flush=True)


if __name__ == "__main__":
    main()
