"""Filtered extraction — the ``get_values_by_filters`` equivalent
(SURVEY.md §2.2: P1–P11, O6; reference ``series_service.py:387-454``).

Everything here is a pure declarative predicate build: Catalyst pushes the
conjunction down to the parquet scan (check ``PushedFilters`` in
``.explain("formatted")``), so at 100 TB only matching row groups are read.
This replaces the reference's hand-embedded SQL WHERE clauses.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame, functions as F


def build_predicate(
    site_id=None,
    qc_id=None,
    source_id=None,
    variable_ids: Sequence | None = None,
    variable_codes: Sequence | None = None,
    method_ids: Sequence | None = None,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    after: datetime | str | None = None,
    ts_col: str = "LocalDateTime",
) -> Column:
    """Conjunctive predicate with IN-lists and date bounds (P2–P5).

    Mirrors ``series_service.py:400-430``: equality on site/qc/source,
    IN-lists for variables/methods, BETWEEN for a year window, and the
    open-ended ``> after`` incremental form (I2 watermark).
    """
    pred = F.lit(True)
    if site_id is not None:
        pred = pred & (F.col("SiteID") == F.lit(site_id))
    if qc_id is not None:
        pred = pred & (F.col("QualityControlLevelID") == F.lit(qc_id))
    if source_id is not None:
        pred = pred & (F.col("SourceID") == F.lit(source_id))
    if variable_ids:
        pred = pred & F.col("VariableID").isin(list(variable_ids))
    if variable_codes:
        pred = pred & F.col("VariableCode").isin(list(variable_codes))
    if method_ids:
        pred = pred & F.col("MethodID").isin(list(method_ids))
    if start is not None and end is not None:
        pred = pred & F.col(ts_col).between(F.lit(start), F.lit(end))
    elif start is not None:
        pred = pred & (F.col(ts_col) >= F.lit(start))
    elif end is not None:
        pred = pred & (F.col(ts_col) <= F.lit(end))
    if after is not None:
        pred = pred & (F.col(ts_col) > F.lit(after))
    return pred


# Query-shape specialization (O6; series_service.py:390-398): the QC-0
# multi-variable path selects a narrow 6-column shape, all others 8 columns.
# Catalyst prunes either way; we keep both shapes for output-contract parity.
NARROW_COLUMNS = ["DateTimeUTC", "LocalDateTime", "UTCOffset", "DataValue", "VariableID", "MethodID"]
WIDE_COLUMNS = NARROW_COLUMNS + ["CensorCode", "QualifierID"]


def get_values_by_filters(dv: DataFrame, narrow: bool = False, **filters) -> DataFrame:
    cols = [c for c in (NARROW_COLUMNS if narrow else WIDE_COLUMNS) if c in dv.columns]
    return dv.filter(build_predicate(**filters)).select(*cols)


def drop_no_data(dv: DataFrame, no_data_value: float, start=None, end=None, ts_col: str = "LocalDateTime") -> DataFrame:
    """Sentinel + range row filter (P11; series_service.py:642-647)."""
    out = dv.filter(F.col("DataValue") != F.lit(no_data_value))
    if start is not None and end is not None:
        out = out.filter(F.col(ts_col).between(F.lit(start), F.lit(end)))
    return out
