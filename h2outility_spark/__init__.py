"""h2outility_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of UCHIC/h2outility (reference surveyed in
SURVEY.md), rebuilt Spark-first for 100 TB scale.

Design stance (SURVEY.md §7.0):
  * DataFrame API only — declarative plans so Catalyst does pushdown,
    pruning, broadcast selection, and AQE re-planning for free.
  * Explicit StructType schemas, never inference.
  * Series identity = a tuple of key columns everywhere
    (``Window.partitionBy``) so every QC operator is multi-series and
    distributed even though the reference ran one series at a time.
  * No RDDs, no custom Catalyst rules; Pandas UDFs only where built-in
    expressions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from h2outility_spark.session import get_spark  # noqa: F401
