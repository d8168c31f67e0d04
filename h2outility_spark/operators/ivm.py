"""Incremental view maintenance (IVM) over the TxTable change feed.

The 100 TB reason to have a CDF at all: a materialized per-key aggregate
over a 100 TB table must NOT be recomputed because one merge touched 0.1%
of the rows. COUNT/SUM are self-maintainable aggregates (in the classic
materialized-view sense): the new view equals the old view plus a delta
computed from the CHANGES ONLY —

    delta(key)  = Σ (+1/+value for inserts, −1/−value for deletes)
    new(key)    = old(key) ⊕ delta(key), dropping keys whose count hits 0

so maintenance cost is O(|changes|) + one join keyed on the CHANGED keys,
never O(table). An update rides the CDF as its delete+insert pair and
cancels to the right delta automatically; rows merely rewritten by
compaction/copy-on-write never reach the feed (storage_tx.changes cancels
them manifest-side).

Exactness contract: for float measures, old ⊕ delta differs from a
from-scratch recompute in accumulation order (last-ulp drift). Callers
that need HASH-exact equivalence with a recompute (the driver's oracle
gate, bank-grade ledgers) should maintain integer measures (e.g. cents) —
integer addition is associative, so maintained ≡ recomputed bit-for-bit.

AVG/stddev are derived, not maintained: keep (count, sum[, sum_sq]) in the
view and divide at read time. MIN/MAX are NOT self-maintainable under
deletes (a retracted minimum needs the base table) — out of scope here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def aggregate_state(
    rows: DataFrame,
    keys: list[str],
    value_col: str,
    count_alias: str = "n",
    sum_alias: str = "total",
) -> DataFrame:
    """The materializable (count, sum) state of a grouped aggregate — the
    shape :func:`maintain_grouped_agg` knows how to advance."""
    return rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_alias),
        F.sum(value_col).alias(sum_alias),
    )


def maintain_grouped_agg(
    old_agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    count_alias: str = "n",
    sum_alias: str = "total",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Advance a (count, sum) grouped aggregate using a CDF frame
    (``storage_tx.TxTable.changes`` shape: destination schema +
    ``_change_type`` in {'insert','delete'}).

    Plan shape: one groupBy over the changes (small), one full-outer join
    against the view keyed on the group key — at scale the view is
    key-partitioned storage, so the join touches only changed keys'
    partitions. Keys whose maintained count reaches zero leave the view.
    """
    sign = F.when(F.col(change_type_col) == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias("__dn"),
        F.sum(sign * F.col(value_col)).alias("__dsum"),
    )
    joined = old_agg.join(delta, keys, "full_outer")
    n = F.coalesce(F.col(count_alias), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
    total = F.coalesce(F.col(sum_alias), F.lit(0)) + F.coalesce(F.col("__dsum"), F.lit(0))
    return (
        joined.select(*keys, n.alias(count_alias), total.alias(sum_alias))
        .filter(F.col(count_alias) > 0)
    )
