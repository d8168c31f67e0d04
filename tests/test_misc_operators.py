"""Micro-tests for helpers not covered elsewhere: narrow column shape,
sentinel drop, unpivot, catalog enrichment, series_exists, k-means."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row, functions as F

from h2outility_spark.operators.catalog import derive_catalog, enrich_catalog
from h2outility_spark.operators.extract import NARROW_COLUMNS, drop_no_data, get_values_by_filters
from h2outility_spark.operators.kmeans import inertia, kmeans
from h2outility_spark.operators.mutation import series_exists
from h2outility_spark.operators.reshape import unpivot_long
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
