"""Micro-tests for helpers not covered elsewhere: narrow column shape,
sentinel drop, unpivot, catalog enrichment, series_exists, k-means."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import Row, functions as F

from h2outility_spark.operators.catalog import derive_catalog, enrich_catalog
from h2outility_spark.operators.extract import NARROW_COLUMNS, drop_no_data, get_values_by_filters
from h2outility_spark.operators.kmeans import inertia, kmeans
from h2outility_spark.operators.mutation import series_exists
from h2outility_spark.operators.reshape import MAX_PIVOT_WIDTH, PivotWidthError, pivot_wide, unpivot_long
from h2outility_spark.schema import events_as_datavalues
from h2outility_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def test_narrow_query_shape(spark):
    dv = events_as_datavalues(load_table(spark, SF_DIR, "events"))
    narrow = get_values_by_filters(dv, narrow=True, qc_id=0)
    assert narrow.columns == [c for c in NARROW_COLUMNS if c in dv.columns]
    wide = get_values_by_filters(dv, narrow=False, qc_id=0)
    assert "CensorCode" in wide.columns and "QualifierID" in wide.columns


def test_drop_no_data(spark):
    df = spark.createDataFrame(
        [Row(DataValue=v, LocalDateTime=datetime(2024, 1, 1 + i)) for i, v in enumerate([1.0, -9999.0, 2.0])]
    )
    out = drop_no_data(df, -9999.0, start=datetime(2024, 1, 1), end=datetime(2024, 1, 2))
    assert [r["DataValue"] for r in out.collect()] == [1.0]


@pytest.mark.slow
def test_pivot_width_cap_fails_fast(spark):
    """SURVEY §7.4-1 cap-and-warn: an unfiltered catalog must not silently
    generate a 10k-column plan — it fails before any Spark job runs."""
    import pytest

    dv = spark.createDataFrame([Row(ts=1, VariableCode="v0", MethodID=0, DataValue=1.0)])
    pairs = [(f"v{i}", 0) for i in range(MAX_PIVOT_WIDTH + 1)]
    with pytest.raises(PivotWidthError, match="catalog was not"):
        pivot_wide(dv, ["ts"], pairs)
    # at the cap itself the plan is still constructed (no job run here)
    assert len(pivot_wide(dv, ["ts"], pairs[:MAX_PIVOT_WIDTH]).columns) == MAX_PIVOT_WIDTH + 1


def test_unpivot_roundtrip(spark):
    wide = spark.createDataFrame([Row(ts=1, a=1.0, b=2.0)])
    long = unpivot_long(wide, ["ts"], ["a", "b"])
    assert sorted((r["VariableCode"], r["DataValue"]) for r in long.collect()) == [("a", 1.0), ("b", 2.0)]


def test_enrich_catalog_and_exists(spark):
    dv = events_as_datavalues(load_table(spark, SF_DIR, "events"))
    keys = ["SiteID", "VariableCode", "MethodID", "SourceID", "QualityControlLevelID"]
    cat = derive_catalog(dv, keys=keys)
    dim = spark.createDataFrame([Row(VariableCode=c, NoDataValue=-9999.0) for c in
                                 ["click", "error", "purchase", "signup", "view"]])
    enriched = enrich_catalog(cat, {"VariableCode": dim})
    assert "NoDataValue" in enriched.columns
    assert enriched.filter(F.col("NoDataValue").isNull()).count() == 0
    row = cat.limit(1).collect()[0]
    assert series_exists(cat, {k: row[k] for k in keys})
    assert not series_exists(cat, {"SiteID": -42})


def test_kmeans_reduces_inertia(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    one_step = kmeans(emb, k=4, max_iter=1)
    five_step = kmeans(emb, k=4, max_iter=5)
    i1 = inertia(emb, one_step)
    i5 = inertia(emb, five_step)
    assert i5 <= i1 + 1e-6
    assert five_step.count() == 4 * 64


def test_lsh_bucket_quarantine(spark):
    """A boilerplate cluster (many docs sharing one band key) must be
    quarantined, bounding pairs volume; pairs outside it are unchanged."""
    from h2outility_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_quarantined,
    )

    # 30 boilerplate docs share signature "HOT" in band 0; 4 normal docs
    # form two small colliding groups; nothing else collides.
    rows = [Row(doc_id=i, mh0="HOT", mh1=f"u{i}") for i in range(30)]
    rows += [
        Row(doc_id=100, mh0="aa", mh1="x1"),
        Row(doc_id=101, mh0="aa", mh1="x2"),
        Row(doc_id=102, mh0="bb", mh1="y1"),
        Row(doc_id=103, mh0="bb", mh1="y1"),
    ]
    sigs = spark.createDataFrame(rows)
    bands = [[0], [1]]

    uncapped = lsh_candidate_pairs(sigs, bands)
    # HOT k^2 + (100,101) + (102,103) (distinct across its two bands)
    assert uncapped.count() == 30 * 29 // 2 + 1 + 1

    pairs, quarantined = lsh_candidate_pairs_quarantined(sigs, bands, max_bucket=10)
    q = quarantined.collect()
    assert [(r["band"], r["band_key"], r["n_docs"]) for r in q] == [(0, "HOT", 30)]
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(100, 101), (102, 103)]  # bounded, non-quarantined recall unchanged

    # same cap through the single-return API
    capped = lsh_candidate_pairs(sigs, bands, max_bucket=10)
    assert sorted((r["id_a"], r["id_b"]) for r in capped.collect()) == got


def test_rp_lsh_bucket_cap(spark):
    """A degenerate direction (many near-identical vectors) is dropped from
    pairing when max_bucket is set; distinct directions still pair."""
    import numpy as np

    from h2outility_spark.operators.similarity import rp_lsh_candidate_pairs

    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    rows = []
    # 40 near-identical "boilerplate" vectors -> one giant bucket per band
    for i in range(40):
        rows.append((i, (base + rng.normal(scale=1e-3, size=64)).tolist()))
    # 6 random vectors
    for i in range(100, 106):
        rows.append((i, rng.normal(size=64).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = rp_lsh_candidate_pairs(emb)
    capped = rp_lsh_candidate_pairs(emb, max_bucket=20)
    boiler_pairs_un = uncapped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count()
    boiler_pairs_cap = capped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count()
    assert boiler_pairs_un == 40 * 39 // 2  # every boilerplate pair collides somewhere
    # giant buckets contribute nothing; the few surviving pairs come from
    # small variant buckets (borderline bits flipped by the noise), which
    # the cap correctly leaves alone
    assert boiler_pairs_cap <= 10
    # pairs not involving the boilerplate cluster are identical
    other_un = sorted((r["id_a"], r["id_b"]) for r in uncapped.filter(F.col("id_a") >= 100).collect())
    other_cap = sorted((r["id_a"], r["id_b"]) for r in capped.filter(F.col("id_a") >= 100).collect())
    assert other_un == other_cap


def test_rp_band_keys_match_string_signature(spark):
    """The folded int64 band keys (r14 optimization: one long per band,
    band index in the high bits) must encode EXACTLY the same buckets as
    the string signature sliced per band — the equivalence the candidate
    self-join's result-identity rests on."""
    import numpy as np

    from h2outility_spark.operators.similarity import (
        random_hyperplanes,
        rp_band_udf,
        rp_sig_udf,
    )

    n_bits, n_bands, dim = 4, 8, 64
    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=dim).tolist()) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    planes = random_hyperplanes(n_bits * n_bands, dim)
    sig = rp_sig_udf(planes)
    bu = rp_band_udf(planes, n_bits, n_bands)
    both = emb.select(
        "vec_id", sig(F.col("embedding")).alias("s"), bu(F.col("embedding")).alias("k")
    ).collect()
    for r in both:
        for j in range(n_bands):
            block = r["s"][j * n_bits : (j + 1) * n_bits]
            assert r["k"][j] == int(block, 2) + (j << n_bits), (r["vec_id"], j)

    import pytest

    with pytest.raises(ValueError, match="overflow"):
        rp_band_udf(planes, 60, 32)


def test_approx_percentile_accuracy_vs_exact(spark):
    """The 100 TB twin of the staged grouped_percentiles query:
    approx_percentile (mergeable sketch, one pass, no per-group sort) must
    land within the accuracy contract of the exact interpolated
    percentile. Not oracle-hashable — sketch merge order is partition-
    dependent — so the accuracy bound is pinned here instead."""
    from pyspark.sql import functions as F

    from h2outility_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.9))").alias("exact"),
        F.expr("approx_percentile(value, array(0.25, 0.5, 0.9), 1000)").alias("approx"),
        F.expr("percentile(value, 0.5)").alias("med"),
        (F.max("value") - F.min("value")).alias("spread"),
    ).collect()
    assert rows
    for r in rows:
        for e, a in zip(r["exact"], r["approx"]):
            # approx_percentile's contract is RANK error (<= n/accuracy
            # positions); translate to value space via the group spread
            assert abs(e - a) <= max(0.02 * r["spread"], 1e-9), (r["event_type"], e, a)
