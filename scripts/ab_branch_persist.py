"""ABBA A/B (VERDICT r14 #6): persist the DERIVED tombstone/insert frames
inside merge_from_branch / resolve_from_branch before the delete_keys /
merge_upsert verbs consume them 2-4x — the same discipline the CDC apply
handlers adopted in r14 (#7). Current code persists only `net` and
`conflicts`; the joins deriving tombstones/inserts re-run per verb-internal
action (profiled: delete_keys inside resolve_from_branch = 26 jobs / 4.0 s
vs 6 jobs / 0.5 s standalone).

Usage: python scripts/ab_branch_persist.py [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from h2outility_spark import storage_tx, workload  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

ORIG_MERGE = storage_tx.TxTable.merge_from_branch
ORIG_RESOLVE = storage_tx.TxTable.resolve_from_branch


def merge_from_branch_v2(self, other, since_version=0, propagate_deletes=False):
    net = other.changes(since_version).persist()
    extra = []
    try:
        inserts = net.filter(F.col("_change_type") == "insert").drop("_change_type")
        if propagate_deletes:
            tombstones = (
                net.filter(F.col("_change_type") == "delete")
                .select(*self.key_cols)
                .join(inserts.select(*self.key_cols).distinct(), self.key_cols, "left_anti")
                .distinct()
                .persist()
            )
            extra.append(tombstones)
            self.delete_keys(tombstones)
        return self.merge_upsert(inserts)
    finally:
        net.unpersist()
        for f in extra:
            f.unpersist()


def resolve_from_branch_v2(
    self, other, since_self, since_other=0, prefer="branch", propagate_deletes=False
):
    if prefer not in ("branch", "main"):
        raise ValueError(f"prefer must be 'branch' or 'main', got {prefer!r}")
    if prefer == "branch":
        return self.merge_from_branch(
            other, since_version=since_other, propagate_deletes=propagate_deletes
        )
    net = other.changes(since_other).persist()
    conflicts = (
        self.changes(since_self)
        .select(*self.key_cols)
        .distinct()
        .join(net.select(*self.key_cols).distinct(), self.key_cols, "semi")
        .persist()
    )
    extra = []
    try:
        all_inserts = net.filter(F.col("_change_type") == "insert").drop("_change_type")
        inserts = all_inserts.join(conflicts, self.key_cols, "left_anti").persist()
        extra.append(inserts)
        if propagate_deletes:
            tombstones = (
                net.filter(F.col("_change_type") == "delete")
                .select(*self.key_cols)
                .join(all_inserts.select(*self.key_cols).distinct(), self.key_cols, "left_anti")
                .join(conflicts, self.key_cols, "left_anti")
                .distinct()
                .persist()
            )
            extra.append(tombstones)
            self.delete_keys(tombstones)
        return self.merge_upsert(inserts)
    finally:
        net.unpersist()
        conflicts.unpersist()
        for f in extra:
            f.unpersist()


def set_variant(v2: bool) -> None:
    storage_tx.TxTable.merge_from_branch = merge_from_branch_v2 if v2 else ORIG_MERGE
    storage_tx.TxTable.resolve_from_branch = resolve_from_branch_v2 if v2 else ORIG_RESOLVE


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or [
        "txtable_resolve_ours",
        "txtable_branch_tombstones",
    ]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-branch-persist")
        .config("spark.sql.session.timeZone", "America/Denver")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = workload.registry()
    for name in names:
        spec = reg[name]

        def run(v2: bool):
            set_variant(v2)
            try:
                spark.catalog.clearCache()
                df = spec.fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                # wall includes build (commits happen at build time for
                # these scenario queries), so time the whole thing
                return time.perf_counter() - t0, df
            finally:
                set_variant(False)

        # result equality
        set_variant(False)
        spark.catalog.clearCache()
        rows_a = sorted(map(tuple, reg[name].fn(spark, SF_DIR).collect()))
        set_variant(True)
        spark.catalog.clearCache()
        rows_b = sorted(map(tuple, reg[name].fn(spark, SF_DIR).collect()))
        set_variant(False)
        assert rows_a == rows_b, f"{name}: variant changed results"
        print(f"{name}: results identical ({len(rows_a)} rows)", flush=True)

        def timed(v2: bool) -> float:
            set_variant(v2)
            try:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = spec.fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0
            finally:
                set_variant(False)

        timed(False)
        timed(True)  # untimed warm passes
        samples = {"orig": [], "persist": []}
        for r in range(rounds):
            order = [("orig", False), ("persist", True)]
            if r % 2 == 1:
                order.reverse()
            for label, v2 in order:
                samples[label].append(round(timed(v2), 3))
        print(
            json.dumps(
                {
                    "query": name,
                    **{
                        k: {"min": min(v), "median": round(statistics.median(v), 3), "samples": v}
                        for k, v in samples.items()
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
