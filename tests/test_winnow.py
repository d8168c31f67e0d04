"""Winnowing fingerprint properties: the paper's coverage guarantee (any
shared token run of >= w+k-1 tokens yields a shared fingerprint), short-doc
degeneration, and the giant-bucket cap on the pair join."""

from __future__ import annotations

from pyspark.sql import functions as F

from h2outility_spark.operators import dedup

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_shared_long_run_guarantees_shared_fingerprint(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens >= w+k-1=6
    docs = _docs(
        spark,
        [
            (1, f"unrelated prefix one {shared} totally different tail here"),
            (2, f"other words {shared} and another ending entirely"),
        ],
    )
    fps = dedup.winnow_fingerprints(docs, k=K, w=W)
    pairs = dedup.winnow_neardup_pairs(fps, min_shared=1).collect()
    assert len(pairs) == 1 and (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)


def test_short_docs_degenerate_sanely(spark):
    docs = _docs(
        spark,
        [
            (1, "only two"),            # < k tokens: no fingerprints
            (2, "just three tokens"),   # exactly k: one k-gram -> one fp
            (3, "   "),                 # blank: dropped
        ],
    )
    fps = {r["doc_id"]: r["fp"] for r in dedup.winnow_fingerprints(docs, k=K, w=W).collect()}
    assert 1 not in fps and 3 not in fps
    assert 2 in fps


def test_disjoint_docs_share_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "one two three four five six seven eight"),
        ],
    )
    fps = dedup.winnow_fingerprints(docs, k=K, w=W)
    assert dedup.winnow_neardup_pairs(fps, min_shared=1).count() == 0


def test_giant_bucket_cap_bounds_pairs(spark):
    # 30 docs all containing the same boilerplate run -> one hot fingerprint
    # bucket; the cap must drop it while distinct small-bucket pairs survive
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [(i, f"doc number {i} says {boiler}") for i in range(30)]
    rows += [(100, "rare shared secret phrase appears here today friends"),
             (101, "rare shared secret phrase appears here today friends")]
    docs = _docs(spark, rows)
    fps = dedup.winnow_fingerprints(docs, k=K, w=W)

    uncapped = dedup.winnow_neardup_pairs(fps, min_shared=1)
    capped = dedup.winnow_neardup_pairs(fps, min_shared=1, max_bucket=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_uncapped >= 30 * 29 / 2  # boilerplate cluster exploded
    assert n_capped < n_uncapped
    # the small-bucket pair is unaffected by quarantine
    assert capped.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1
