"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``h2outility_spark`` — this module only adapts the
workload registry (h2outility_spark/workload.py) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from h2outility_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's reason to exist — filtered extraction
    pivoted to a wide per-site matrix with sentinel fill (SURVEY.md §3.1)."""
    return workload.registry()["wide_export"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in workload.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in workload.registry().items() if spec.oracle is not None}
