"""Round-16 registry staging area (STAGED11): fully-formed (PySpark fn,
DuckDB oracle) pairs seeded by VERDICT r13 #8 — compositions of two
already-certified families each. The registry-capacity policy applies
(tests/test_checked_window.py::test_registry_capacity_policy_freeze_at_234):
the registry freezes at 234 after the r15 STAGED10 promotion, so these
pairs land in r16 only as REPLACEMENTS — each promotion must retire a
near-redundant registered entry in the same commit (retirement
candidates are pinned in NOTES_NEXT_ROUND).

  * ``bm25_cdc_index`` — BM25 with INCREMENTAL index maintenance through
    the CDC feed: the postings state (term, doc_id) -> tf lives in a
    TxTable and is advanced ONLY by ``txtable_cdc`` micro-batches (the
    certified ``stream_cdc_replica`` discipline applied to derived
    state). Each batch's net changes are tokenized — delete rows carry
    the full removed document, so the handler derives exactly which
    postings to retract from the tombstoned text itself — and applied
    delete-then-upsert under a replay-safe batch marker. Serving (the
    certified ``bm25_topk_docs`` scoring, Lucene +1 idf, k1=1.2, b=0.75)
    reads ONLY the stored postings: doc lengths, N, avgdl, df and the
    corpus's own top-3 query terms are all derived from index state —
    the source rows are never rescanned. The oracle rebuilds BM25 from
    the FINAL document set, so hash equality certifies that incremental
    maintenance converged to the batch-rebuild answer; the pinned
    ``n_index_batches = 2`` certifies it actually arrived in two
    micro-batches (bootstrap + telescoped catch-up), not one rebuild.
    Reference frame: the reference's cron-refresh jobs rebuild derived
    tables from scratch each run (src/SilentUpdater.py:10-21); this is
    the same maintenance contract at O(changed docs' tokens) cost.

  * ``semantic_dedup_ivf`` — per-cell parallel SemDeDup at k=64 with the
    model STORED in a TxTable: the ``semantic_dedup_parallel`` pipeline
    (centroids as DataFrames end to end, min(struct) argmin, no collect)
    except the trained centroids are persisted transactionally and the
    serving assignment reads them back from the table snapshot — the
    100 TB shape, where the IVF model is shared distributed state that
    scheduled Lloyd jobs advance through merge_upsert and every consumer
    (dedup, ANN search, drift monitors) loads by snapshot. k=64 (vs the
    staged k=16) drives per-cell pair cost down another 4x: candidate
    pairs are sum n_c^2 over cells, never n^2.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Window as W, functions as F

from h2outility_spark.workload import _t, fround, sql_round
from h2outility_spark.workload_lakehouse import scratch_dir
from h2outility_spark.workload_next9 import neardup_strict_corpus, _SEM_TAU
from h2outility_spark.workload_next10 import _assign_cells, _sem_parallel_oracle
from h2outility_spark.workload_text import toks_cte

# -- BM25 with incremental index maintenance through the CDC feed -------------------------

_BMI_K1, _BMI_B, _BMI_TOPK = 1.2, 0.75, 20
_BMI_N_BATCHES = 2  # bootstrap drain + one telescoped catch-up drain

BM25_CDC_ORACLE = (
    # The final document set after the three source commits: slice A
    # (doc_id % 3 == 1) appended, slice B (% 3 == 2) appended, the % 5
    # keys deleted. The oracle scores it from scratch — hash equality is
    # the incremental-maintenance == batch-rebuild law.
    "WITH fdocs AS (SELECT * FROM documents "
    "WHERE doc_id % 3 IN (1, 2) AND doc_id % 5 <> 0), "
    + toks_cte("fdocs")
    + f""",
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
freq AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
qterms AS (SELECT w FROM freq ORDER BY c DESC, w LIMIT 3),
tf AS (
  SELECT t.doc_id, t.w, CAST(count(*) AS BIGINT) AS tf
  FROM toks t JOIN qterms q ON t.w = q.w
  GROUP BY 1, 2
),
dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tf AS DOUBLE) * ({_BMI_K1} + 1.0))
           / (CAST(tf.tf AS DOUBLE)
              + {_BMI_K1} * (1.0 - {_BMI_B} + {_BMI_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))
         ) AS score
  FROM tf
  JOIN dfreq d ON d.w = tf.w
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {sql_round("score", 6)} AS bm25,
       CAST({_BMI_N_BATCHES} AS INT) AS n_index_batches
FROM scored
ORDER BY {sql_round("score", 6)} DESC, doc_id
LIMIT {_BMI_TOPK}
"""
)


def q_bm25_cdc_index(spark, sf_dir):
    """BM25 index maintained INCREMENTALLY through the ``txtable_cdc``
    feed, served from stored postings alone — see the module docstring.

    Maintenance cost per batch is O(changed docs' tokens): the handler
    tokenizes only the batch's net rows (CDC delete rows carry the full
    removed document, so retractions never consult the source table),
    retracts the tombstoned postings by (term, doc_id) key, then upserts
    the inserted docs' term frequencies. The postings TxTable's pruned
    MERGE carries untouched segments by name; at 100 TB the same state
    would be bucketed by term hash so each merge touches only its
    buckets — the (term, doc_id) key layout here is that design at test
    scale. Serving is the certified bm25_topk_docs plan shape with the
    token explode REPLACED by postings reads: dl = sum(tf) per doc, the
    query terms = top-3 by total tf, df/tf straight from the index, one
    1-row stats broadcast (the allowlisted scalar-BNLJ shape)."""
    from h2outility_spark.operators.text import tokens
    from h2outility_spark.sources.txtable_source import (
        TxTableCdcDataSource,
        net_changes,
    )
    from h2outility_spark.storage_tx import TxTable

    spark.dataSource.register(TxTableCdcDataSource)
    root = scratch_dir("h2ou_bm25cdc_")
    src_dir, ckpt = root + "/src", root + "/ckpt"
    applied_dir = root + "/applied"
    os.makedirs(applied_dir, exist_ok=True)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    src = TxTable(spark, src_dir, key_cols=["doc_id"])
    post = TxTable(spark, root + "/post", key_cols=["w", "doc_id"])

    def postings_of(rows):
        return (
            rows.filter(F.length(F.trim(F.col("text"))) > 0)
            .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
            .groupBy("w", "doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )

    def apply_batch(batch_df, batch_id: int) -> None:
        marker = os.path.join(applied_dir, f"applied_{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch: already applied
        if batch_df.isEmpty():
            return  # no-data heartbeat: no state change, no marker
        # Persist the bounded net CDF once: delete_keys/merge_upsert each
        # action their input several times (bounds, anti-join, staged
        # write) and would otherwise re-run the batch-source read + the
        # net_changes aggregate per action (same fix as _cdc_replica_runner).
        cdf = net_changes(batch_df).persist()
        try:
            ins = cdf.filter(F.col("_change_type") == "insert").drop("_change_type")
            dels = cdf.filter(F.col("_change_type") == "delete").drop("_change_type")
            # Delete-then-upsert: a replaced document's old terms retract
            # first, then its new frequencies land — terms present in both
            # versions end at the new tf. Retraction keys come from the
            # tombstoned TEXT itself (the feed carries full rows).
            if post.latest_version() is not None:
                post.delete_keys(postings_of(dels).select("w", "doc_id"))
            post.merge_upsert(postings_of(ins))
        finally:
            cdf.unpersist()
        tmp = os.path.join(applied_dir, f".tmp_{batch_id}")
        with open(tmp, "w") as f:
            f.write("applied")
        os.replace(tmp, marker)

    def drain() -> None:
        from h2outility_spark.streaming.incremental import micro_batch_shuffle

        # bounded-batch shuffle pin: AQE cannot coalesce micro-batch plans
        with micro_batch_shuffle(spark):
            q = (
                spark.readStream.format("txtable_cdc").option("path", src_dir).load()
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    src.append(docs.filter(F.col("doc_id") % 3 == 1))
    drain()  # index batch 1: the bootstrap slice
    src.append(docs.filter(F.col("doc_id") % 3 == 2))  # missed commit
    src.delete_keys(  # missed commit: retention erasure of the %5 keys
        docs.filter(
            ((F.col("doc_id") % 3).isin(1, 2)) & (F.col("doc_id") % 5 == 0)
        ).select("doc_id")
    )
    drain()  # index batch 2: ONE drain telescopes append+delete to the net
    n_batches = len(glob.glob(os.path.join(applied_dir, "applied_*")))

    # -- serving: every statistic from the stored postings, no row rescans
    p = post.snapshot()  # (w, doc_id, tf)
    dl = p.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    freq = p.groupBy("w").agg(F.sum("tf").alias("c"))
    qterms = freq.orderBy(F.desc("c"), "w").limit(3).select("w")
    tf = p.join(F.broadcast(qterms), "w")
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    k1, b = F.lit(_BMI_K1), F.lit(_BMI_B)
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (F.col("tf").cast("double") * (k1 + F.lit(1.0))) / (
        F.col("tf").cast("double")
        + k1 * (F.lit(1.0) - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    return (
        scored.select(
            "doc_id",
            fround(F.col("score"), 6).alias("bm25"),
            F.lit(n_batches).cast("int").alias("n_index_batches"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BMI_TOPK)
    )


# -- SemDeDup at k=64 with the model stored in a TxTable ----------------------------------

_SIV_K = 64

SEM_IVF_ORACLE = _sem_parallel_oracle(k=_SIV_K)


def q_semantic_dedup_ivf(spark, sf_dir):
    """``semantic_dedup_parallel`` at k=64 with the trained centroids
    PERSISTED in a TxTable and the serving assignment reading them back
    from the snapshot — see the module docstring. The stored model is a
    k-row (cluster, cvec) table: tiny to broadcast, transactional to
    advance (a scheduled Lloyd job is one merge_upsert), and shared —
    this query's serving path deliberately re-reads it from disk so the
    certified hash covers the store/load roundtrip, not just the
    in-session lineage. Assignment stays the allowlisted broadcast-argmin
    shape (min(struct(dist, cluster, v)) — map-side partial, no window
    sort); within-cell pair search costs sum n_c^2, which k=64 drives
    4x below the staged k=16 form."""
    from h2outility_spark.operators.similarity import dot
    from h2outility_spark.storage_tx import TxTable

    corpus = neardup_strict_corpus(spark, sf_dir)
    e = corpus.select("vec_id", F.col("embedding").alias("v"))
    seeds = (
        e.orderBy("vec_id")
        .limit(_SIV_K)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cluster"),
            F.col("v").alias("cvec"),
        )
    )
    a1 = _assign_cells(e, seeds)
    updated = (
        a1.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        # 12-dp round on BOTH engines before the final assignment (the
        # r12 cross-engine tie-surface discipline).
        .agg(fround(F.avg("x"), 12).alias("cv"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
        .select("cluster", F.expr("transform(pairs, p -> p.cv)").alias("cvec_new"))
    )
    c1 = seeds.join(updated, "cluster", "left").select(
        "cluster", F.coalesce("cvec_new", "cvec").alias("cvec")
    )

    # Persist the model, then serve FROM THE STORE: the IVF-stored step.
    model = TxTable(spark, scratch_dir("h2ou_semivf_") + "/model", key_cols=["cluster"])
    model.merge_upsert(
        c1.select(F.col("cluster").cast("int").alias("cluster"), "cvec")
    )
    stored = model.snapshot().select(
        F.col("cluster").cast("bigint").alias("cluster"), "cvec"
    )
    cells = _assign_cells(e, stored)

    a = cells.select(
        F.col("vec_id").alias("id_a"), F.col("cluster").alias("ca"), F.col("v").alias("va")
    )
    b = cells.select(
        F.col("vec_id").alias("id_b"), F.col("cluster").alias("cb"), F.col("v").alias("vb")
    )
    sim = dot(F.col("va"), F.col("vb")) / F.sqrt(
        dot(F.col("va"), F.col("va")) * dot(F.col("vb"), F.col("vb"))
    )
    dup = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b")))
        .filter(sim >= F.lit(_SEM_TAU))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return cells.join(dup.withColumn("__dup", F.lit(True)), "vec_id", "left").select(
        "vec_id",
        F.col("cluster").cast("int").alias("cell"),
        (~F.coalesce(F.col("__dup"), F.lit(False))).alias("is_canonical"),
    )


#: name -> (fn, oracle) for the r16 replacement promotions and the parity test.
STAGED11 = {
    "bm25_cdc_index": (q_bm25_cdc_index, BM25_CDC_ORACLE),
    "semantic_dedup_ivf": (q_semantic_dedup_ivf, SEM_IVF_ORACLE),
}
