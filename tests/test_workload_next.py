"""Staged queries: parity against their DuckDB oracles under the
driver's comparison discipline, at sf0.001 AND the driver's sf0.01 —
promotion to the registry is then a decorator change, not new
verification. Earlier areas (STAGED..STAGED9, promoted in rounds 6-14)
keep pinning the promoted queries' sf0.01 behavior; the newest areas
hold candidates that are NOT yet registered (STAGED10 → r15 promotions,
STAGED11 → r16 replacements, STAGED12 → r17 replacements). ONE
parametrized test covers every area so the comparison discipline cannot
drift between copies (round-14 self-review)."""

from __future__ import annotations

import pytest

# Staged-pair parity scenarios: heavyweight multi-drain/commit runs, in the
# full lane only (pytest.ini tiering).
pytestmark = pytest.mark.slow

import duckdb

from h2outility_spark.sources.parquet import TABLES
from h2outility_spark.workload_next import STAGED
from h2outility_spark.workload_next2 import STAGED2
from h2outility_spark.workload_next3 import STAGED3
from h2outility_spark.workload_next4 import STAGED4
from h2outility_spark.workload_next5 import STAGED5
from h2outility_spark.workload_next6 import STAGED6
from h2outility_spark.workload_next7 import STAGED7
from h2outility_spark.workload_next8 import STAGED8
from h2outility_spark.workload_next9 import STAGED9
from h2outility_spark.workload_next10 import STAGED10
from h2outility_spark.workload_next11 import STAGED11
from h2outility_spark.workload_next12 import STAGED12
from h2outility_spark.workload_next13 import STAGED13

from tests.conftest import SF_DIR, SF_DIR_MED


from h2outility_spark.oracle_compare import normalize_rows as _normalize

_STAGED_AREAS = {
    "STAGED": STAGED,
    "STAGED2": STAGED2,
    "STAGED3": STAGED3,
    "STAGED4": STAGED4,
    "STAGED5": STAGED5,
    "STAGED6": STAGED6,
    "STAGED7": STAGED7,
    "STAGED8": STAGED8,
    "STAGED9": STAGED9,
    "STAGED10": STAGED10,
    "STAGED11": STAGED11,
    "STAGED12": STAGED12,
    "STAGED13": STAGED13,
}

_STAGED_CASES = [
    (area, name) for area, d in _STAGED_AREAS.items() for name in sorted(d)
]


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize(
    "area,name", _STAGED_CASES, ids=[f"{a}-{n}" for a, n in _STAGED_CASES]
)
def test_staged_query_matches_oracle(spark, area, name, sf_dir):
    fn, oracle = _STAGED_AREAS[area][name]
    sdf = fn(spark, sf_dir)
    s_cols, s_rows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.sql(oracle)
    o_cols, o_rows = _normalize(res.fetchall(), [d[0] for d in res.description])

    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    assert s_rows == o_rows, f"{name}: value mismatch"


def test_txtable_prune_scan_reads_one_file(spark):
    """The pruning economics behind txtable_prune_scan: a [250, 499]
    range over four bucket-disjoint files must plan exactly ONE file into
    the scan (manifest stats answer the file-level question)."""
    from h2outility_spark.workload_next3 import q_txtable_prune_scan

    df = q_txtable_prune_scan(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re as _re

    m = _re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m, f"no file index in plan: {plan[:500]}"
    assert m.group(1) == "1", f"expected 1 pruned file, scan reads {m.group(1)}"
    # and the residual range filter still reaches the parquet reader
    assert "GreaterThanOrEqual(key_bucket" in plan and "LessThanOrEqual(key_bucket" in plan


def test_bucketed_join_plans_without_exchange_on_join_inputs(spark):
    """The layout economics behind bucketed_join_orders: with broadcast
    disabled, the bucketed fact-dim join must sort-merge WITHOUT an
    Exchange on either input (bucket-to-bucket reads) — the only
    exchange in the whole plan is the tiny post-join rollup's."""
    from h2outility_spark.workload_next5 import q_bucketed_join_orders

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_bucketed_join_orders(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan[:800]
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1, f"expected <=1 Exchange (rollup only), got {n_exchange}:\n{plan[:1200]}"
