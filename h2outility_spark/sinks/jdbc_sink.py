"""JDBC append sink (SURVEY.md §2.1 S9; reference ``series_service.py:746-752``
— ``df.to_sql("datavalues", if_exists='append')``).

Smoke-tested against embedded Apache Derby (the JDBC driver that ships on
Spark's own classpath) in tests/test_jdbc_derby.py; the production path for
writing back to an ODM relational store. Partitioned writes: each executor
opens its own connection and appends its partitions — set
``numPartitions``/``batchsize`` to respect the target DB's write throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    out = df.repartition(num_partitions) if num_partitions else df
    writer = out.write.mode("append").format("jdbc").option("url", url).option("dbtable", table).option(
        "batchsize", str(batchsize)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def append_dialect_table(
    df: DataFrame,
    engine: str,
    db: str,
    table: str,
    host: str = "localhost",
    port: int | None = None,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Dialect-addressed JDBC append: the write-side twin of
    ``sources.parquet.load_dialect_table``. Builds the url/driver pair for
    ``engine`` (mssql/mysql/postgresql/sqlite/derby — the reference's
    service_manager dialect set) and appends through ``append_jdbc``.
    Credentials travel as writer options, never inside the url."""
    from h2outility_spark.sources.parquet import jdbc_url

    url, driver = jdbc_url(engine, db, host, port)
    props = {"driver": driver}
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    append_jdbc(df, url, table, properties=props, batchsize=batchsize, num_partitions=num_partitions)
