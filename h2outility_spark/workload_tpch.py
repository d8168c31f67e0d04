"""Additional TPC-H-flavored analytics (adapted to the driver's slimmer
star schema) — broadens the G/J/O/P coverage with correlated-exists,
conditional bucketing, ratio-of-sums, OR-of-ANDs pushdown, cube, and regex
extraction, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from h2outility_spark.workload import _t, fround, query


@query(
    "tpch_q4_late_orders",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
    description="Q4-style: correlated EXISTS (semi join with cross-table predicate) per priority",
)
def q_tpch_q4_late_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q12_priority_buckets",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    description="Q12-style: conditional bucketing aggregation across a fact-fact join",
)
def q_tpch_q12_priority_buckets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    description="Q14-style: promo revenue share (ratio of conditional sums, broadcast dim join)",
)
def q_tpch_q14_promo_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00")) & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        fround(
            F.lit(100.0) * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev), 4
        ).alias("promo_revenue_pct")
    )


@query(
    "tpch_q19_or_of_ands",
    oracle="""
    SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    description="Q19-style: disjunction of conjunctive predicates across join sides",
)
def q_tpch_q19_or_of_ands(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    cond = b("Brand#12", 15, 1, 21) | b("Brand#23", 25, 10, 30) | b("Brand#34", 35, 20, 40)
    return j.filter(cond).agg(
        fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "tpch_q10_returned",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    description="Q10-style: revenue lost to returns per customer, top-10 with deterministic tiebreak",
)
def q_tpch_q10_returned(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="Full cube over two dimensions (all 4 grouping sets)",
)
def q_cube_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), fround(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "regexp_extract_props",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE regexp_matches(props, '"k":\\s*\\d{2}')
    GROUP BY 1
    """,
    description="F7: regex extraction + rlike filtering over the JSON props column",
)
def q_regexp_extract_props(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    return (
        ev.filter(F.col("props").rlike(r'"k":\s*\d{2}'))
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
