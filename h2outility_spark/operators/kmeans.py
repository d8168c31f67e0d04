"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern (driver-side loop over a broadcast-size model, distributed
assignment + re-estimation per iteration).

Spark shape per iteration:
  assign:   narrow map — each vector scores k broadcast centroids (no
            shuffle, no UDF: zip_with/aggregate fold);
  update:   posexplode + groupBy(cluster, pos) — one shuffle whose volume
            is k×dim partial sums (map-side combined), NOT the corpus.

The model (k×dim doubles) lives on the driver between iterations — the
only thing collected. Deterministic: seeds are the first k vectors by id,
ties broken by cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from h2outility_spark.operators.similarity import as_double, dot


def _assign(vectors: DataFrame, centroids: list[tuple[int, list[float]]], id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid by squared L2 — argmin over k small literals."""
    v = as_double(F.col(vec_col))
    best_id, best_d = None, None
    for cid, cvec in centroids:
        carr = F.array(*[F.lit(x) for x in cvec])
        # ||v - c||^2 = v·v - 2 v·c + c·c ; v·v constant per row → drop it
        d = F.lit(sum(x * x for x in cvec)) - F.lit(2.0) * dot(v, carr)
        if best_id is None:
            best_id, best_d = F.lit(cid), d
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return vectors.select(F.col(id_col), v.alias("__v"), best_id.alias("cluster"), best_d.alias("__part_d"))


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (cluster, pos, centroid_val) rows for the final model."""
    seeds = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]
    for _ in range(max_iter):
        assigned = _assign(embeddings, centroids, id_col, vec_col)
        new_rows = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("cv"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
            .select("cluster", F.expr("transform(pairs, p -> p.cv)").alias("cvec"))
            .collect()
        )
        updated = {r["cluster"]: list(r["cvec"]) for r in new_rows}
        centroids = [(cid, updated.get(cid, cvec)) for cid, cvec in centroids]
    out = [(cid, pos, val) for cid, cvec in centroids for pos, val in enumerate(cvec)]
    return embeddings.sparkSession.createDataFrame(out, "cluster int, pos int, centroid_val double")


def inertia(embeddings: DataFrame, centroids_df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Sum of squared distances to the assigned centroid (fit metric)."""
    rows = (
        centroids_df.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))).alias("p"))
        .select("cluster", F.expr("transform(p, x -> x.centroid_val)").alias("cvec"))
        .collect()
    )
    cents = [(r["cluster"], list(r["cvec"])) for r in rows]
    assigned = _assign(embeddings, cents, id_col, vec_col)
    vv = F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)
    return assigned.select(F.sum(vv + F.col("__part_d")).alias("s")).collect()[0]["s"]
