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


def test_fresh_stream_on_vacuumed_table_bootstraps(spark, registered, tmp_path):
    """Review regression: a table whose early manifests were vacuumed must
    still serve a NEW reader — the first batch bootstraps from the oldest
    retained snapshot instead of chasing deleted manifests."""
    tdir = str(tmp_path / "vac")
    table = TxTable(spark, tdir, key_cols=["k"])
    for i in range(5):
        table.append(kv(spark, [(i, f"v{i}")]))
    table.vacuum(keep_versions=2, retention_seconds=0)  # manifests v0-v2 gone

    stream = spark.readStream.format("txtable_stream").option("path", tdir).load()
    q = (
        stream.writeStream.outputMode("append").format("memory").queryName("vtail")
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
        got = {(r["k"], r["v"]) for r in spark.sql("SELECT * FROM vtail").collect()}
        assert got == {(i, f"v{i}") for i in range(5)}  # full current content

        table.append(kv(spark, [(9, "new")]))  # tail keeps flowing after bootstrap
        q.processAllAvailable()
        assert (9, "new") in {
            (r["k"], r["v"]) for r in spark.sql("SELECT * FROM vtail").collect()
        }
    finally:
        q.stop()


def test_lagging_checkpoint_past_retention_errors_clearly(spark, registered, tmp_path):
    from h2outility_spark.sources.txtable_source import _added_files

    tdir = str(tmp_path / "lag")
    table = TxTable(spark, tdir, key_cols=["k"])
    for i in range(5):
        table.append(kv(spark, [(i, "x")]))
    table.vacuum(keep_versions=1, retention_seconds=0)
    with pytest.raises(ValueError, match="vacuum has"):
        _added_files(tdir, 1)  # a checkpointed offset pointing at a gone version


def test_image_dhash_respects_custom_id_col(spark):
    from pyspark.sql import Row

    from h2outility_spark.codecs import encode_bmp
    from h2outility_spark.operators.multimodal import image_dhash, image_neardup_pairs

    rows = [[(x * 14, x * 14, x * 14) for x in range(18)]] * 16
    img = bytearray(encode_bmp(rows))
    assets = spark.createDataFrame(
        [Row(image_id=1, data=img), Row(image_id=2, data=img)]
    )
    hashes = image_dhash(assets, id_col="image_id")
    assert hashes.columns == ["image_id", "dhash"]
    pairs = image_neardup_pairs(assets, id_col="image_id").collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_checkpointed_reader_never_rebootstraps_after_vacuum(spark, registered, tmp_path):
    """Review regression (exactly-once hole): a CHECKPOINTED reader whose
    offset's successor lost its parent manifest to vacuum must ERROR, not
    silently re-emit the whole table as duplicates. Only a fresh reader
    (offset minted by initialOffset, bootstrap flag set) may take the
    full-snapshot branch."""
    from h2outility_spark.sources.txtable_source import _TxAppendTailReader

    tdir = str(tmp_path / "dupvac")
    table = TxTable(spark, tdir, key_cols=["k"])
    for i in range(6):
        table.append(kv(spark, [(i, "x")]))
    table.vacuum(keep_versions=2, retention_seconds=0)  # manifests v0-v3 gone

    reader = _TxAppendTailReader(tdir, ["k", "v"])
    # Checkpointed offset {version: 3}: v4 exists but its parent v3 is gone.
    # Pre-fix this emitted v4's FULL snapshot (rows 0..4 again) = duplicates.
    with pytest.raises(ValueError, match="duplicates"):
        reader.partitions({"version": 3}, {"version": 5})

    # The same gap IS servable to a genuinely fresh reader: initialOffset
    # carries the bootstrap flag and the first batch snapshots v4.
    start = reader.initialOffset()
    assert start == {"version": 3, "bootstrap": True}
    parts = reader.partitions(start, {"version": 5})
    rows = set()
    for p in parts:
        rows.update(reader.read(p))
    assert rows == {(i, "x") for i in range(6)}  # snapshot(v4) + v5's append
