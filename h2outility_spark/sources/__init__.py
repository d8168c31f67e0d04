from h2outility_spark.sources.parquet import TABLES, load_table, load_tables, register_views  # noqa: F401
