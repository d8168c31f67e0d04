"""CSV / JSON-lines sources: schema-pinned round trip, corrupt-row
quarantine instead of job failure."""

from __future__ import annotations

from pyspark.sql import functions as F

from h2outility_spark.sources.files import load_csv, load_jsonl, quarantine_split
from h2outility_spark.sources.parquet import load_table
from tests.conftest import SF_DIR

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def test_csv_round_trip(spark, tmp_path):
    src = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_csv")
    src.write.option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    back = load_csv(spark, path, SCHEMA)
    clean, corrupt = quarantine_split(back)
    assert corrupt.count() == 0
    assert clean.count() == src.count()
    a = src.agg(F.sum("value"), F.max("ts")).collect()[0]
    b = clean.agg(F.sum("value"), F.max("ts")).collect()[0]
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1]


def test_jsonl_round_trip_and_quarantine(spark, tmp_path):
    src = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_json")
    src.write.json(path)
    # inject malformed lines
    with open(f"{path}/part-zz-malformed.json", "w") as f:
        f.write('{"event_id": not valid json\n{"also: broken\n')
    back = load_jsonl(spark, path, SCHEMA)
    clean, corrupt = quarantine_split(back)
    assert corrupt.count() == 2  # quarantined, not fatal
    assert clean.count() == src.count()


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC: write → read round-trips values, and filters/projections push
    into the stripe reader like parquet (FileScan orc + PushedFilters)."""
    import re

    from pyspark.sql import functions as F

    from h2outility_spark.sources.files import load_orc, write_orc
    from h2outility_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    src = load_table(spark, SF_DIR, "orders").limit(500)
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)

    back = load_orc(spark, path)
    assert back.count() == 500
    a = sorted(map(tuple, src.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, back.select("o_orderkey", "o_totalprice").collect()))
    assert a == b

    q = back.filter(F.col("o_custkey") < 100).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = re.search(r"FileScan orc[^\n]*", plan)
    assert scan, plan
    assert "PushedFilters: [" in scan.group(0)
    assert "LessThan(o_custkey,100)" in scan.group(0)
