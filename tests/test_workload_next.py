"""Staged queries: parity against their DuckDB oracles under the
driver's comparison discipline, at sf0.001 AND the driver's sf0.01 —
promotion to the registry is then a decorator change, not new
verification. STAGED (round-4 pairs, registered in the round-6 rotation)
STAGED2 (round-6 pairs, registered in the round-7 rotation) and STAGED3
(round-7 pairs, registered in the round-8 rotation) keep pinning the
promoted queries' sf0.01 behavior; STAGED4 holds the round-9 candidates,
which are NOT yet registered."""

from __future__ import annotations

import duckdb
import pytest

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

from tests.conftest import SF_DIR, SF_DIR_MED


from h2outility_spark.oracle_compare import normalize_rows as _normalize


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED[name]
    sdf = fn(spark, sf_dir)
    s_cols, s_rows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.sql(oracle)
    o_cols, o_rows = _normalize(res.fetchall(), [d[0] for d in res.description])

    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    assert s_rows == o_rows, f"{name}: value mismatch (first diff: "


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED2))
def test_staged2_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED2[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED3))
def test_staged3_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED3[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED4))
def test_staged4_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED4[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED6))
def test_staged6_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED6[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED7))
def test_staged7_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED7[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED5))
def test_staged5_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED5[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED8))
def test_staged8_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED8[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED9))
def test_staged9_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED9[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED10))
def test_staged10_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED10[name]
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

@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED11))
def test_staged11_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED11[name]
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MED])
@pytest.mark.parametrize("name", sorted(STAGED12))
def test_staged12_query_matches_oracle(spark, name, sf_dir):
    fn, oracle = STAGED12[name]
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
