"""Runtime bloom-filter join pruning: when the build side of a shuffle join
carries a selective filter, Spark injects a bloom filter on the probe side
so most probe rows die at the SCAN, before the shuffle. At 100 TB this is
the difference between shuffling the full fact table and shuffling only the
~1% of it that can possibly match — free with AQE-era Catalyst, but only if
the join is expressed declaratively (which every registered query does).

The default thresholds (creation side <= 10 MB, application side >= 10 GB
scanned) are cluster-scale; the test lowers the application-side floor to
prove the rewrite fires, then restores every conf it touched."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from h2outility_spark.sources.parquet import load_table
from tests.conftest import SF_DIR_MED


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_bloom_filter_injected_on_selective_dim_join(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        # force a shuffle join — broadcast joins get no runtime filter
        # (they prune via the broadcast hash table itself)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    with _confs(spark, **{k.replace(".", "__"): v for k, v in confs.items()}):
        li = load_table(spark, SF_DIR_MED, "lineitem")
        orders = load_table(spark, SF_DIR_MED, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_orderpriority"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, f"no bloom filter in plan:\n{plan[:2000]}"
        # the filter must sit on the PROBE (lineitem) side scan subtree
        probe_side = plan[: plan.index("might_contain") + 2000]
        assert "l_orderkey" in probe_side


def test_bloom_filter_join_results_unchanged(spark):
    """The rewrite is a pure optimization: row set identical with the
    filter forced on vs off."""
    li = load_table(spark, SF_DIR_MED, "lineitem")
    orders = load_table(spark, SF_DIR_MED, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def run():
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
            .collect()
        )

    base = run()
    forced = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    with _confs(spark, **{k.replace(".", "__"): v for k, v in forced.items()}):
        assert sorted(map(tuple, run())) == sorted(map(tuple, base))
