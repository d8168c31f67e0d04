"""CSV / JSON-lines file sources — the flat-file side of the reference's
multi-dialect scan surface (S1–S3; the reference also round-trips its own
CSV exports, ``DatasetUtilities.py:277`` reads the last line of a CSV to
find the watermark).

Both loaders REQUIRE an explicit schema: schema inference is a full extra
pass over the data (at 100 TB, a second 100 TB scan) and silently types
columns from whatever the sample contained. Timestamps are parsed with an
explicit format; malformed rows land in a quarantine column instead of
killing the job (PERMISSIVE + columnNameOfCorruptRecord), which is the
only sane failure mode on petabyte-scale third-party data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema):
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def load_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    **options,
) -> DataFrame:
    reader = (
        spark.read.format("csv")
        .schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("timestampFormat", timestamp_format)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def load_jsonl(spark: SparkSession, path: str, schema, **options) -> DataFrame:
    """JSON-lines (one object per line — the only JSON layout that splits
    across workers; a single giant array/object is one unsplittable task)."""
    reader = (
        spark.read.format("json")
        .schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows) — corrupt rows keep only the raw record
    for repair/audit; clean rows drop the quarantine column.

    The parsed frame is cached first: Spark refuses queries that reference
    only the corrupt-record column of an uncached text scan (it would have
    to re-parse just to find failures). Split one ingestion batch at a
    time — the cache is the batch, not the table.
    """
    from pyspark.sql import functions as F

    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


# ---------------------------------------------------------------------------
# ORC (columnar alternative to parquet — Spark-native, zero extra deps)
# ---------------------------------------------------------------------------


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """Write as ORC. Same columnar properties as parquet (stripe-level
    min/max statistics, predicate pushdown, column pruning) — the choice
    between the two is an ecosystem question, not a capability one; the
    engine supports both so existing ORC estates can be read in place."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.orc(path)


def load_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """Read an ORC table. Filters and projections push into the stripe
    reader exactly as with parquet (PushedFilters in the scan node)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)
