"""ANN recall thresholds: the approximate paths must provably beat chance,
the production configuration must reach recall@10 >= 0.9, and the LSH
prefilter must not lose true pairs.

Measured at sf0.1 (scripts/ann_recall.py -> RECALL.json): kmeans16-IVF
recall@10 = 0.428/0.526/0.676 at probe 1/2/4 (scan fraction 1/16 = 0.0625,
so ~7x chance); kmeans64-IVF reaches 0.922 at probe 16 (25% scan) — the
production config; RP-LSH pair recall = 1.0 over 144 true pairs at
cos>=0.45. Everything here is deterministic (fixed-seed k-means, exact
brute force), so thresholds are stable, not flaky.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from h2outility_spark.operators import similarity as sim
from h2outility_spark.operators.kmeans import kmeans
from h2outility_spark.sources.parquet import load_table

SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR_MED, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


def test_rp_lsh_prefilter_recall_is_total(spark, emb):
    """The banded RP-LSH prefilter keeps every true near-dup pair at the
    registered threshold — recall 1.0, same property the oracle-equality of
    neardup_embedding_lsh proves, here as an explicit metric."""
    truth = sim.cosine_neardup_pairs(emb, 0.45).select("id_a", "id_b")
    cand = sim.rp_lsh_candidate_pairs(emb, n_bits=4, n_bands=32).select("id_a", "id_b")
    assert truth.count() > 0
    assert sim.pair_recall(cand, truth) == 1.0


def test_ivf_kmeans_recall_beats_chance_and_probe_scales(spark, emb):
    k = 10
    queries = emb.filter(F.col("vec_id") < 30)
    exact = sim.brute_force_topk(emb, queries, k=k).select("query_id", "cand_id").cache()
    exact.count()

    cent = kmeans(emb, k=16, max_iter=3).withColumnRenamed("cluster", "label")
    assign = sim.ivf_assign(emb, cent).withColumnRenamed("cell", "km_cell")
    emb_km = (
        emb.join(assign, "vec_id")
        .select("vec_id", "embedding", F.col("km_cell").alias("label"))
        .cache()
    )
    emb_km.count()
    q_km = emb_km.filter(F.col("vec_id") < 30)

    r1 = sim.recall_at_k(
        sim.ivf_search(emb_km, q_km, k=k, n_probe=1).select("query_id", "cand_id"), exact
    )
    r4 = sim.recall_at_k(
        sim.ivf_search(emb_km, q_km, k=k, n_probe=4).select("query_id", "cand_id"), exact
    )
    # scan fraction at probe1 is 1/16; require >= 4x chance, and the
    # probe dial must actually buy recall
    assert r1 >= 0.25, r1
    assert r4 >= r1
    assert r4 >= 0.45, r4


def test_ivf_production_config_reaches_090(spark, emb):
    """The production IVF configuration (64 cells, 5 Lloyd's iterations,
    multiprobe) must hit recall@10 >= 0.9. At this corpus size (500
    vectors, ~8/cell) that takes probe=24; at sf0.1 (2000 vectors) probe=16
    of 64 suffices (RECALL.json). Deterministic, so exact thresholds."""
    k = 10
    queries = emb.filter(F.col("vec_id") < 30)
    exact = sim.brute_force_topk(emb, queries, k=k).select("query_id", "cand_id").cache()
    exact.count()

    cent = kmeans(emb, k=64, max_iter=5).withColumnRenamed("cluster", "label")
    assign = sim.ivf_assign(emb, cent).withColumnRenamed("cell", "km_cell")
    emb_km = (
        emb.join(assign, "vec_id")
        .select("vec_id", "embedding", F.col("km_cell").alias("label"))
        .cache()
    )
    emb_km.count()
    q_km = emb_km.filter(F.col("vec_id") < 30)

    r16 = sim.recall_at_k(
        sim.ivf_search(emb_km, q_km, k=k, n_probe=16).select("query_id", "cand_id"), exact
    )
    r24 = sim.recall_at_k(
        sim.ivf_search(emb_km, q_km, k=k, n_probe=24).select("query_id", "cand_id"), exact
    )
    assert r16 >= 0.85, r16
    assert r24 >= 0.90, r24
