"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join handling (on in session.py) covers sort-merge joins; these
helpers cover the two cases it does not:

  * **Salted two-phase aggregation**: a groupBy on a key where one value
    holds a large share of all rows (one sensor, one boilerplate document
    cluster) puts that key's entire volume through a single reducer.
    Salting splits each key into ``n_salts`` partial groups (map-side
    random-ish salt from a hash of a row id), aggregates partials, then
    re-aggregates without the salt. Works for any algebraic aggregate
    (sum/count/min/max); averages must be carried as (sum, count).
  * **Salted broadcast-side explosion** for joining a skewed fact key
    against a small dim: replicate the dim ``n_salts`` times with salt ids
    so the fact's salted key still hash-joins evenly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salt_source: Column, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``salt_source``
    (a unique-ish column — deterministic so retries/regeneration are
    stable, unlike rand())."""
    return df.withColumn(salt_col, F.pmod(F.hash(salt_source), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_source: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (op, column) with op in {sum, count, min,
    max}. Phase 1 groups by (keys + salt); phase 2 merges partials: count
    partials merge by sum, the rest by their own op.
    """
    phase1_ops = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_ops = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, salt_source, n_salts)
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[phase1_ops[op](col).alias(name) for name, (op, col) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge_ops[op](name).alias(name) for name, (op, _) in aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Join a skew-keyed fact to a small dim with the dim exploded across
    salt ids, so no single post-shuffle partition carries a hot key alone.
    (With a broadcastable dim, prefer plain ``F.broadcast`` — this exists
    for when the engine chooses a shuffle join anyway, e.g. dim just over
    the broadcast threshold.)"""
    salted_fact = with_salt(fact, salt_source, n_salts)
    exploded_dim = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return salted_fact.join(exploded_dim, [key, "__salt"]).drop("__salt")
