"""Incremental (batch-vs-corpus) dedup: crafted cases for the exact and
near paths; corpus-level parity lives in test_oracle_parity via the
dedup_incremental registered query."""

from __future__ import annotations

from pyspark.sql import Row

from h2outility_spark.operators.dedup import incremental_neardup_filter


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_exact_duplicate_of_corpus_dropped(spark):
    existing = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    batch = _docs(
        spark,
        [
            (10, "  alpha   beta gamma delta epsilon "),  # normalized-exact dup
            (11, "totally different words here now"),
        ],
    )
    kept = {r["doc_id"] for r in incremental_neardup_filter(batch, existing).collect()}
    assert kept == {11}


def test_near_duplicate_of_corpus_dropped(spark):
    base = "one two three four five six seven eight nine ten"
    existing = _docs(spark, [(1, base)])
    batch = _docs(
        spark,
        [
            (10, base + " eleven"),  # high Jaccard with doc 1
            (11, "unrelated content entirely separate vocabulary set"),
        ],
    )
    kept = {r["doc_id"] for r in incremental_neardup_filter(batch, existing).collect()}
    assert kept == {11}


def test_batch_internal_duplicates_both_survive(spark):
    # Scope contract: the incremental filter only deduplicates AGAINST the
    # corpus — identical batch docs both pass (corpus-wide pipeline's job).
    existing = _docs(spark, [(1, "corpus words that do not collide")])
    dup = "same new document text repeated twice exactly"
    batch = _docs(spark, [(10, dup), (11, dup)])
    kept = {r["doc_id"] for r in incremental_neardup_filter(batch, existing).collect()}
    assert kept == {10, 11}
