"""Profile the TxTable commit path's fixed costs (VERDICT r14 "Next round"
#6, read-side only): per-verb Spark-JOB counts, manifest/segment read
counts and their cumulative IO time, under a driver-shaped session
(local[8], 200 shuffle partitions, hostile tz) — then A/B a same-snapshot
manifest-read memo to see whether manifest IO is worth eliminating.

Usage: python scripts/profile_txtable.py [query ...] (default: the txtable
driver-wall leaders)
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

COUNTS = {"manifest": 0, "segment": 0, "io_s": 0.0}
_orig_manifest = storage_tx.TxTable.manifest
_orig_read_segment = storage_tx.TxTable._read_segment


def _counting_manifest(self, version=None):
    t0 = time.perf_counter()
    out = _orig_manifest(self, version)
    COUNTS["manifest"] += 1
    COUNTS["io_s"] += time.perf_counter() - t0
    return out


def _counting_read_segment(self, name):
    t0 = time.perf_counter()
    out = _orig_read_segment(self, name)
    COUNTS["segment"] += 1
    COUNTS["io_s"] += time.perf_counter() - t0
    return out


def n_jobs(spark) -> int:
    # DAGScheduler's nextJobId counter = total jobs submitted so far
    # (py4j auto-unwraps the AtomicInteger to an int)
    return int(spark._jsc.sc().dagScheduler().nextJobId())


def main() -> None:
    names = sys.argv[1:] or [
        "txtable_resolve_ours",
        "txtable_stream_tail",
        "txtable_incremental_minmax",
        "stream_cdc_evolve_replica",
        "txtable_snapshot_as_of",
    ]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("profile-txtable")
        .config("spark.sql.session.timeZone", "America/Denver")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    storage_tx.TxTable.manifest = _counting_manifest
    storage_tx.TxTable._read_segment = _counting_read_segment

    reg = workload.registry()
    for name in names:
        spec = reg[name]
        for attempt in range(2):
            spark.catalog.clearCache()
            COUNTS.update(manifest=0, segment=0, io_s=0.0)
            j0 = n_jobs(spark)
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "query": name,
                        "attempt": attempt,
                        "wall_s": round(wall, 3),
                        "build_s": round(t_build, 3),
                        "n_jobs": n_jobs(spark) - j0,
                        "n_manifest_reads": COUNTS["manifest"],
                        "n_segment_reads": COUNTS["segment"],
                        "manifest_io_s": round(COUNTS["io_s"], 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
