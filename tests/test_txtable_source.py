"""Custom Python DataSource: streaming a TxTable's append tail with table
versions as offsets (exactly-once via immutable files + manifest log)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from h2outility_spark.sources.txtable_source import TxTableStreamDataSource
from h2outility_spark.storage_tx import TxTable


def kv(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs], "k int, v string")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TxTableStreamDataSource)


def test_append_tail_streams_versions(spark, registered, tmp_path):
    tdir = str(tmp_path / "tail")
    table = TxTable(spark, tdir, key_cols=["k"])
    table.append(kv(spark, [(1, "a"), (2, "b")]))

    stream = spark.readStream.format("txtable_stream").option("path", tdir).load()
    assert stream.schema.fieldNames() == ["k", "v"]
    q = (
        stream.writeStream.outputMode("append").format("memory").queryName("tail1")
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    try:
        q.processAllAvailable()
        got = {(r["k"], r["v"]) for r in spark.sql("SELECT * FROM tail1").collect()}
        assert got == {(1, "a"), (2, "b")}

        # a running query picks up NEW versions; compaction emits nothing new
        table.append(kv(spark, [(3, "c")]))
        table.append(kv(spark, [(4, "d")]))
        table.compact_files(target_rows=1000, small_rows=1_000_000)
        q.processAllAvailable()
        got = {(r["k"], r["v"]) for r in spark.sql("SELECT * FROM tail1").collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
        assert spark.sql("SELECT * FROM tail1").count() == 4  # no re-emission
    finally:
        q.stop()


def test_append_tail_rejects_merge_tables(spark, registered, tmp_path):
    tdir = str(tmp_path / "merged")
    table = TxTable(spark, tdir, key_cols=["k"])
    table.append(kv(spark, [(1, "a")]))
    table.merge_upsert(kv(spark, [(1, "A2")]))

    stream = spark.readStream.format("txtable_stream").option("path", tdir).load()
    q = (
        stream.writeStream.outputMode("append").format("memory").queryName("tail2")
        .option("checkpointLocation", str(tmp_path / "ckpt2")).start()
    )
    try:
        with pytest.raises(Exception, match="append-only"):
            q.processAllAvailable()
    finally:
        q.stop()
