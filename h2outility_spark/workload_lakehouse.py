"""TxTable (transactional lakehouse) workload queries: drive the
merge/commit/time-travel/change-feed machinery end to end inside a driver
query and check the resulting FRAMES against a DuckDB oracle that states
the expected table algebraically over ``orders``.

Each query builds a fresh deterministic table in a temp dir from the
``orders`` parquet at the given sf_dir (append -> merge -> merge), then
reads it back through the surface under test. The oracle never sees the
table — it recomputes what the lakehouse semantics REQUIRE the result to
be, so a green row certifies copy-on-write merge, manifest versioning and
the read surface together, not just parquet round-tripping.

Reference parity: the commit/rollback semantics mirror the reference's
edit-session save/restore discipline
(``src/GAMUTRawData/odmservices/edit_service.py:371-443``), re-expressed
as an immutable-manifest lakehouse rather than an ORM transaction.

Scale notes: fixture subsets are ~10% of ``orders`` (no collect; bounds
discovery inside merge_upsert is the one 1-row collect the operator
always does). ``changes()`` is manifest-diff pruned — O(changed files),
not O(table) — which is exactly what the 100 TB shape needs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from h2outility_spark.storage_tx import TxTable
from h2outility_spark.workload import _t, query


def scratch_dir(prefix: str) -> str:
    """Temp dir for a fixture table, reclaimed at interpreter exit. The
    returned DataFrames read the table's parquet LAZILY (the driver
    collects after the query fn returns), so the dir cannot be deleted
    inside the query — atexit is the earliest safe point, and it keeps
    repeated driver/test runs from accumulating fixture tables in /tmp."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _orders_base(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "txtable_changes",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice,
           'insert' AS _change_type
    FROM base WHERE o_orderkey % 100 < 2
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'insert' AS _change_type
    FROM base WHERE o_orderkey % 100 = 10
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'delete' AS _change_type
    FROM base WHERE o_orderkey % 100 < 2
    """,
    description=(
        "Row-level change feed (Delta CDF shape) between an append and a "
        "copy-on-write merge: updated keys appear as delete+insert pairs, new "
        "keys as inserts, rewritten-but-identical rows cancel; oracle states the "
        "expected feed algebraically over orders"
    ),
)
def q_txtable_changes(spark, sf_dir):
    base = _orders_base(spark, sf_dir)
    t = TxTable(spark, scratch_dir("h2ou_txchanges_"), key_cols=["o_orderkey"])
    v1 = t.append(base.filter(F.col("o_orderkey") % 100 < 10))
    updates = base.filter(F.col("o_orderkey") % 100 < 2).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = base.filter(F.col("o_orderkey") % 100 == 10)
    v2 = t.merge_upsert(updates.unionByName(inserts))
    return t.changes(v1, v2).select(
        "o_orderkey", "o_custkey", "o_totalprice", "_change_type"
    )


@query(
    "txtable_snapshot_as_of",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CASE WHEN o_orderkey % 100 < 1 THEN o_totalprice * 3
                     ELSE o_totalprice END AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey % 100 < 3
    """,
    description=(
        "Timestamp time travel: snapshot_as_of at the target version's own "
        "manifest commit stamp reproduces exactly the mid-history table state "
        "(append + first merge, untouched by the later merge); oracle restates "
        "that state over orders"
    ),
)
def q_txtable_snapshot_as_of(spark, sf_dir):
    base = _orders_base(spark, sf_dir)
    t = TxTable(spark, scratch_dir("h2ou_txasof_"), key_cols=["o_orderkey"])
    t.append(base.filter(F.col("o_orderkey") % 100 < 3))
    t.merge_upsert(
        base.filter(F.col("o_orderkey") % 100 < 1).withColumn(
            "o_totalprice", F.col("o_totalprice") * 3
        )
    )
    # The cut is the TARGET VERSION'S OWN manifest stamp — no wall-clock
    # read, so no VM stall or clock skew can move the cut relative to the
    # history. The only requirement is that the NEXT commit stamps strictly
    # later; spin on the same clock the manifests use until that holds
    # (nanoseconds in practice; a fixed sleep was the old, stall-fragile
    # form of this guarantee).
    cut = t.history()[-1]["committed_at"]
    while time.time() <= cut:
        time.sleep(0.001)
    t.merge_upsert(base.filter(F.col("o_orderkey") % 100 >= 97))
    return t.snapshot_as_of(cut).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "txtable_compact_snapshot",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(TRUE AS BOOLEAN) AS compacted
    FROM orders WHERE o_orderkey % 100 < 8
    """,
    description=(
        "OPTIMIZE invariant: four small appends, then compact_files rewrites "
        "them into fewer range-clustered files while the SNAPSHOT stays "
        "row-identical (the oracle states the union of the appends); the "
        "compacted flag carries the measured file-count drop into the hash"
    ),
)
def q_txtable_compact_snapshot(spark, sf_dir):
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 100 < 8)
    t = TxTable(spark, scratch_dir("h2ou_txcompact_"), key_cols=["o_orderkey"])
    for k in range(4):
        t.append(base.filter(F.col("o_orderkey") % 4 == k))
    n_before = len(t.files())
    t.compact_files(target_rows=10_000_000, small_rows=10_000_000)
    n_after = len(t.files())
    return t.snapshot().select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.lit(bool(n_after < n_before)).alias("compacted"),
    )


@query(
    "txtable_evolve_schema",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_band
    FROM orders WHERE o_orderkey % 100 < 5
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'late' AS o_band
    FROM orders WHERE o_orderkey % 100 = 5
    """,
    description=(
        "ADD-COLUMN schema evolution: a merge with evolve_schema=True appends a "
        "new column to the table schema; carried-over files are never rewritten "
        "and surface the new column as NULL, which the oracle states exactly"
    ),
)
def q_txtable_evolve_schema(spark, sf_dir):
    base = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = TxTable(spark, scratch_dir("h2ou_txevolve_"), key_cols=["o_orderkey"])
    t.append(base.filter(F.col("o_orderkey") % 100 < 5))
    late = base.filter(F.col("o_orderkey") % 100 == 5).withColumn("o_band", F.lit("late"))
    t.merge_upsert(late, evolve_schema=True)
    return t.snapshot().select("o_orderkey", "o_totalprice", "o_band")


@query(
    "txtable_restore",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 100 < 4
    """,
    description=(
        "Forward rollback: after a merge mutates the table, restore(v1) commits "
        "a NEW version carrying v1's file list — the snapshot is exactly the "
        "pre-merge state (stated by the oracle) and history stays append-only"
    ),
)
def q_txtable_restore(spark, sf_dir):
    base = _orders_base(spark, sf_dir)
    t = TxTable(spark, scratch_dir("h2ou_txrestore_"), key_cols=["o_orderkey"])
    v1 = t.append(base.filter(F.col("o_orderkey") % 100 < 4))
    t.merge_upsert(
        base.filter(F.col("o_orderkey") % 100 < 2).withColumn(
            "o_totalprice", F.col("o_totalprice") * 5
        )
    )
    t.restore(v1)
    return t.snapshot().select("o_orderkey", "o_custkey", "o_totalprice")
