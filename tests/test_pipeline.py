"""End-to-end corpus construction (pipeline.build_corpus): stage counts
narrow monotonically, the committed TxTable matches the surviving set,
re-running is an atomic replace with history, and decontamination drops
exactly the overlapping docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from h2outility_spark import pipeline
from h2outility_spark.storage_tx import TxTable

from tests.conftest import SF_DIR


def test_build_corpus_end_to_end(spark, tmp_path):
    tdir = str(tmp_path / "corpus")
    stats = pipeline.build_corpus(spark, SF_DIR, tdir)

    assert stats["input"] >= stats["quality_gated"] >= stats["exact_unique"] >= stats["near_canonical"]
    assert stats["committed"] == stats["near_canonical"]  # no benchmark given
    assert stats["version"] == 0
    # quality gate keeps ~70% per source (ceil rounding)
    assert 0.65 <= stats["quality_gated"] / stats["input"] <= 0.75

    table = TxTable(spark, tdir, key_cols=["doc_id"])
    snap = table.snapshot()
    assert snap.count() == stats["committed"]
    assert set(snap.columns) == {"doc_id", "text", "lang", "source", "n_tokens", "shard"}
    shards = [r["shard"] for r in snap.select("shard").distinct().collect()]
    assert all(0 <= s < 16 for s in shards)
    assert snap.filter(F.col("n_tokens") <= 0).count() == 0

    # rebuild: atomic replace, previous corpus still time-travelable
    stats2 = pipeline.build_corpus(spark, SF_DIR, tdir)
    assert stats2["version"] == 1
    assert stats2["committed"] == stats["committed"]
    assert table.snapshot(version=0).count() == stats["committed"]


def test_build_corpus_decontaminates(spark, tmp_path):
    """Benchmark = a slice of the corpus itself: every benchmark doc that
    survives to the decontamination stage shares all its trigrams with the
    benchmark, so it must be dropped there."""
    from h2outility_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id", "text")

    tdir = str(tmp_path / "clean")
    stats = pipeline.build_corpus(spark, SF_DIR, tdir, benchmark=bench)
    assert stats["decontaminated"] < stats["near_canonical"]
    assert stats["committed"] == stats["decontaminated"]

    # no committed doc shares a trigram with the benchmark
    from h2outility_spark.operators import text as t

    table = TxTable(spark, tdir, key_cols=["doc_id"])
    leftover = t.contamination_overlap(table.snapshot(), bench)
    assert leftover.count() == 0


def test_cli_build_corpus(spark, tmp_path, capsys):
    from h2outility_spark.__main__ import main

    tdir = str(tmp_path / "cli-corpus")
    rc = main(["build-corpus", "--data", SF_DIR, "--table", tdir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "committed:" in out and "version: 0" in out


def test_cli_build_corpus_json(spark, tmp_path, capsys):
    import json

    from h2outility_spark.__main__ import main

    tdir = str(tmp_path / "jc")
    rc = main(["build-corpus", "--data", SF_DIR, "--table", tdir, "--json"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out)
    assert d["version"] == 0 and d["committed"] <= d["input"]
