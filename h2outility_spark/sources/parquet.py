"""Parquet sources for the driver test tables.

Reference analog: the multi-dialect relational scan (S1/S2,
``src/GAMUTRawData/odmservices/service_manager.py:121-171`` and
``series_service.py:432-434`` in /root/reference). Here the storage layer is
columnar parquet; Catalyst gives predicate pushdown + column pruning on every
scan, which replaces the reference's hand-embedded SQL filters (SURVEY.md §4).

Scale notes: at 100 TB the fact tables (``lineitem``, ``events``,
``documents``) arrive as directory trees partitioned by date/key — the same
``spark.read.parquet(path)`` call handles both, and partition pruning kicks in
when queries filter on partition columns. Never infer schemas in production
(we read parquet, whose footer carries the schema).
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to always broadcast (reference always fetched
# them whole and joined client-side — DatasetUtilities.py:183-189).
BROADCAST_DIMS = {"region", "nation", "supplier", "customer", "part"}


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Detected from one file footer (cheap — metadata only)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    sample = path
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not files:
            return ()
        sample = files[0]
    try:
        schema = pq.read_schema(sample)
    except Exception:
        return ()
    return tuple(f.name for f in schema if pt.is_timestamp(f.type) and f.type.unit == "ns")


def _denullify_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (session tz is pinned UTC,
    so the naive values become the UTC instants they represent).

    Spark ≥4 infers tz-less parquet timestamps as TIMESTAMP_NTZ
    (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true), which
    breaks ``unix_micros`` and friends at analysis time. The engine's data
    model (like the reference's — timestamps are typed DB columns,
    ``odmdata/data_value.py:43-45``) owns type normalization at the scan
    boundary: everything downstream sees TIMESTAMP, matching the DuckDB
    oracle's naive-UTC read of the same files.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    # Defense-in-depth for the NTZ quirk: prefer reading tz-less parquet
    # timestamps directly as TIMESTAMP (keeps filters pushed down to the
    # scan — a cast on top of the scan column would block pushdown)...
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_ts_columns(path)
    if not ns_cols:
        # ...and cast any NTZ column that still surfaced (caller overrode
        # the conf, or the file carries explicit NTZ annotation).
        return _denullify_ntz(spark.read.parquet(path))
    # Read nanos as raw int64 and truncate to microsecond timestamps with
    # integer division — bit-identical to how DuckDB surfaces the same file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return _denullify_ntz(df)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def load_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """JDBC scan (S1–S3).

    The reference built dialect-specific connection strings and read via
    ``pandas.read_sql_query`` with a vestigial 250k-row chunk size
    (``series_service.py:388,436-441``). Spark's partitioned JDBC read is the
    scalable form of that chunking: ``numPartitions`` concurrent range scans
    bounded by ``partitionColumn``. Smoke-tested end-to-end against
    embedded Apache Derby (tests/test_jdbc_derby.py): full read,
    partitioned read, and query-as-source pushdown.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table_or_query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------------------
# Multi-dialect JDBC URL construction (S1)
# ---------------------------------------------------------------------------

#: engine -> (jdbc url template, driver class). The reference assembled
#: SQLAlchemy connection strings per engine
#: (service_manager.py:121-159 __build_connection_string — mssql via
#: pyodbc/FreeTDS, mysql via pymysql, postgresql via psycopg2, sqlite by
#: file path); the Spark-native form is a JDBC url + driver class handed to
#: the DataSource V1 jdbc reader. Driver JARS are deployment artifacts
#: (none ship in this container — the jdbc PATH itself is proven against
#: embedded Derby in tests/test_jdbc_derby.py); url construction is pure
#: string logic and fully testable.
JDBC_DIALECTS: dict[str, tuple[str, str]] = {
    "mssql": (
        "jdbc:sqlserver://{host}:{port};databaseName={db}",
        "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    ),
    "mysql": ("jdbc:mysql://{host}:{port}/{db}", "com.mysql.cj.jdbc.Driver"),
    "postgresql": ("jdbc:postgresql://{host}:{port}/{db}", "org.postgresql.Driver"),
    "sqlite": ("jdbc:sqlite:{db}", "org.sqlite.JDBC"),
    "derby": ("jdbc:derby:{db};create=true", "org.apache.derby.jdbc.EmbeddedDriver"),
}


def jdbc_url(engine: str, db: str, host: str = "localhost", port: int | None = None) -> tuple[str, str]:
    """(url, driver_class) for a dialect. File-backed engines (sqlite,
    derby) take ``db`` as a path and ignore host/port."""
    if engine not in JDBC_DIALECTS:
        raise ValueError(f"unknown JDBC dialect {engine!r}; known: {sorted(JDBC_DIALECTS)}")
    template, driver = JDBC_DIALECTS[engine]
    default_ports = {"mssql": 1433, "mysql": 3306, "postgresql": 5432}
    port = port if port is not None else default_ports.get(engine, 0)
    return template.format(host=host, port=port, db=db), driver


def load_dialect_table(
    spark: SparkSession,
    engine: str,
    db: str,
    table_or_query: str,
    host: str = "localhost",
    port: int | None = None,
    user: str | None = None,
    password: str | None = None,
    **partition_kwargs,
) -> DataFrame:
    """Dialect-addressed JDBC scan: build the url/driver for ``engine`` and
    read through load_jdbc (credentials go through reader options, never
    into the url)."""
    url, driver = jdbc_url(engine, db, host, port)
    props = {"driver": driver}
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    return load_jdbc(spark, url, table_or_query, properties=props, **partition_kwargs)
