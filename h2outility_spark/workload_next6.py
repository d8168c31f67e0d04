"""Round-11 registry staging area (same lifecycle as ``workload_next`` →
``workload_next5``): fully-formed (PySpark fn, DuckDB oracle) pairs that
cannot enter the registry yet — the round-10 rotation will consume the
``workload_next5`` pairs first. Deliberately NOT decorated with
``@query``; a future rotation wraps them.

Each pair is parity-tested in ``tests/test_workload_next.py`` (STAGED6)
under the driver's comparison discipline at sf0.001 AND sf0.01.

Coverage targets:
  * ``dedup_incremental_lsh`` — the near-dup ingest shape at 100 TB: a
    NEW document batch is MinHash-signed and probed against the existing
    corpus's banded index (``dedup.lsh_candidate_pairs_between``), then
    the candidates are exact-Jaccard verified. Only the batch is signed
    fresh; the corpus is never re-paired against itself. (The exact-hash
    sibling ``dedup_incremental`` is certified; this is its near-dup
    twin.)
  * ``neardup_ensemble_agree`` — the cross-modal dedup policy real
    pipelines run before deleting anything: every text-leg near-dup
    pair (MinHash bands → Jaccard ≥ 0.2) is re-scored with its exact
    embedding cosine and flagged where the second modality confirms.
    The oracle recomputes both legs independently; cosine values AND
    flags ride the hash.
  * ``quality_drift_weekly`` — the monitoring shape: per-series weekly
    median plus its week-over-week delta (lag window), the drift alarm a
    production corpus pipeline watches per source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from h2outility_spark.operators import dedup, similarity
from h2outility_spark.workload import _t, fround
from h2outility_spark.workload_text import JACCARD_TAIL, MINHASH_K, mh_cte

# -- incremental near-dup: new batch vs existing corpus ------------------------

_BATCH_PRED_SQL = "doc_id % 5 = 0"  # the "newly ingested" slice

DEDUP_INCR_LSH_ORACLE = (
    "WITH "
    + mh_cte()
    + f""",
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mh a JOIN mh b
        ON a.{_BATCH_PRED_SQL} AND NOT (b.{_BATCH_PRED_SQL})
       AND ("""
    + " OR ".join(f"a.mh{i} = b.mh{i}" for i in range(MINHASH_K))
    + """)
    ),
"""
    + JACCARD_TAIL
)


def q_dedup_incremental_lsh(spark, sf_dir):
    """Near-dup dedup for a daily ingest batch: sign ONLY the new slice,
    probe the existing corpus's banded MinHash index, verify candidates
    with exact 3-gram Jaccard ≥ 0.2. The corpus is never self-paired and
    never re-signed — per-batch cost is O(batch) + one hash join against
    the (stored, in production) band index. Oracle mirrors the banding +
    verification with the batch/corpus split stated as predicates."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    sigs_new = dedup.minhash_signatures(new, num_hashes=MINHASH_K)
    sigs_old = dedup.minhash_signatures(old, num_hashes=MINHASH_K)
    pairs = dedup.lsh_candidate_pairs_between(
        sigs_new, sigs_old, bands=[[i] for i in range(MINHASH_K)]
    )
    jac = dedup.jaccard_for_pairs(pairs, docs)
    return jac.filter(F.col("jaccard") >= 0.2).select(
        "id_a", "id_b", fround(F.col("jaccard"), 4).alias("jaccard")
    )


# -- cross-modal ensemble agreement ----------------------------------------------

_COS_SQL = (
    "list_inner_product(ea.v, eb.v) "
    "/ sqrt(list_inner_product(ea.v, ea.v) * list_inner_product(eb.v, eb.v))"
)

ENSEMBLE_AGREE_ORACLE = (
    "WITH "
    + mh_cte()
    + """,
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mh a JOIN mh b
        ON a.doc_id < b.doc_id
       AND ("""
    + " OR ".join(f"a.mh{i} = b.mh{i}" for i in range(MINHASH_K))
    + f""")
    ),
    dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS ni
      FROM cand c
      JOIN dsh s1 ON s1.doc_id = c.id_a
      JOIN dsh s2 ON s2.doc_id = c.id_b AND s2.shingle = s1.shingle
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT i.id_a, i.id_b,
             floor((CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
               AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE) >= 0.2
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT jp.id_a, jp.id_b, jp.jaccard,
           floor(({_COS_SQL}) * 10000.0 + 0.5) / 10000.0 AS cos_sim,
           floor(({_COS_SQL}) * 10000.0 + 0.5) / 10000.0 >= 0.25 AS emb_confirms
    FROM jp
    JOIN e ea ON ea.vec_id = jp.id_a
    JOIN e eb ON eb.vec_id = jp.id_b
"""
)


def q_neardup_ensemble_agree(spark, sf_dir):
    """Two-modality dedup scoring — the confirm-before-delete policy for
    destructive dedup: every TEXT-leg near-dup pair (MinHash bands →
    exact Jaccard ≥ 0.2) is re-scored on the EMBEDDING side with its
    exact cosine and flagged when the second modality confirms
    (cos ≥ 0.25). Both the cosine VALUES and the flags ride the hash, so
    the pair set is never vacuous even when no pair clears the
    confirmation bar at some scale. The cosine is computed only for the
    (tiny) verified text-pair set — two hash joins against the embedding
    table, never a second O(n²) pass. doc_id ≡ vec_id in the corpus."""
    from h2outility_spark.operators.similarity import as_double, dot

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    sigs = dedup.minhash_signatures(docs, num_hashes=MINHASH_K)
    text_pairs = dedup.jaccard_for_pairs(
        dedup.lsh_candidate_pairs(sigs, bands=[[i] for i in range(MINHASH_K)]), docs
    ).filter(F.col("jaccard") >= 0.2)
    e = emb.select(F.col("vec_id"), as_double(F.col("embedding")).alias("v"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = dot(F.col("va"), F.col("vb")) / F.sqrt(
        dot(F.col("va"), F.col("va")) * dot(F.col("vb"), F.col("vb"))
    )
    return (
        text_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            fround(F.col("jaccard"), 4).alias("jaccard"),
            fround(cos, 4).alias("cos_sim"),
            # flag off the ROUNDED cosine: Spark and DuckDB sum the dot
            # product in different orders, so a raw cosine landing on the
            # threshold boundary could flip the boolean on one engine only
            # (ADVICE r9) — the 4-dp round collapses that ULP gap
            (fround(cos, 4) >= F.lit(0.25)).alias("emb_confirms"),
        )
    )


# -- weekly quality drift monitor -------------------------------------------------

QUALITY_DRIFT_ORACLE = """
WITH w AS (
  SELECT event_type, date_trunc('week', ts) AS week_start,
         quantile_cont(value, 0.50) AS p50
  FROM events GROUP BY 1, 2
)
SELECT event_type, week_start,
       floor(p50 * 10000.0 + 0.5) / 10000.0 AS p50,
       floor((p50 - lag(p50) OVER (PARTITION BY event_type ORDER BY week_start))
             * 10000.0 + 0.5) / 10000.0 AS drift
FROM w
"""


def q_quality_drift_weekly(spark, sf_dir):
    """Per-series weekly median and its week-over-week delta — the drift
    alarm a production corpus pipeline watches per source/series. One
    hash aggregate to the weekly grain, then a lag window over the
    (tiny) weekly frame; the first week's drift is NULL by contract.
    At 100 TB the weekly rollup is the only pass over the facts."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    # DuckDB's date_trunc('week', ts) yields DATE; Spark's yields
    # TIMESTAMP — cast to date so the grain (and the hash) agree
    w = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("date").alias("week_start")
    ).agg(F.expr("percentile(value, 0.50)").alias("__p50"))
    win = W.partitionBy("event_type").orderBy("week_start")
    return w.select(
        "event_type",
        "week_start",
        fround(F.col("__p50"), 4).alias("p50"),
        fround(F.col("__p50") - F.lag("__p50").over(win), 4).alias("drift"),
    )


#: name -> (fn, oracle) for a future promotion pass and the parity test.
STAGED6 = {
    "dedup_incremental_lsh": (q_dedup_incremental_lsh, DEDUP_INCR_LSH_ORACLE),
    "neardup_ensemble_agree": (q_neardup_ensemble_agree, ENSEMBLE_AGREE_ORACLE),
    "quality_drift_weekly": (q_quality_drift_weekly, QUALITY_DRIFT_ORACLE),
}
