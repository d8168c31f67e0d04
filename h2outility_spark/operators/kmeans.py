"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern (driver-side loop over a broadcast-size model, distributed
assignment + re-estimation per iteration).

Spark shape per iteration:
  assign:   broadcast join against the k-row centroid frame, squared-L2
            via zip_with/aggregate fold, argmin as groupBy(min(struct)) —
            data-side expressions stay small and constant-size no matter
            how large k or dim get (a literal-array when-chain variant
            measured 20x slower purely in plan/codegen compilation);
  update:   posexplode + groupBy(cluster, pos) — one shuffle whose volume
            is k×dim partial sums (map-side combined), NOT the corpus.

The model (k×dim doubles) lives on the driver between iterations — the
only thing collected. Deterministic: seeds are the first k vectors by id,
ties broken by cluster id (min-struct ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from h2outility_spark.operators.similarity import as_double, dot


def _centroid_frame(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    rows = [(cid, cvec, sum(x * x for x in cvec)) for cid, cvec in centroids]
    return spark.createDataFrame(rows, "cluster int, cvec array<double>, cc double")


def _assign(vectors: DataFrame, centroids: list[tuple[int, list[float]]], id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid by squared L2 (v·v dropped — constant per row):
    one broadcast join + one groupBy argmin."""
    spark = vectors.sparkSession
    cents = _centroid_frame(spark, centroids)
    v = as_double(F.col(vec_col))
    scored = (
        vectors.select(F.col(id_col), v.alias("__v"))
        .join(F.broadcast(cents))
        .select(
            F.col(id_col),
            "__v",
            "cluster",
            (F.col("cc") - F.lit(2.0) * dot(F.col("__v"), F.col("cvec"))).alias("__d"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct(F.col("__d"), F.col("cluster"))).alias("__m"), F.first("__v").alias("__v"))
        .select(F.col(id_col), F.col("__m.cluster").alias("cluster"), "__v", F.col("__m.__d").alias("__part_d"))
    )


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


def kmeans_grouped(
    subspaces: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    group_col: str = "s",
    vec_col: str = "vs",
) -> DataFrame:
    """Independent Lloyd k-means per GROUP, all groups in one distributed
    pipeline per iteration — the m-subspace PQ trainer without m separate
    driver loops.

    The per-group runs are computationally the per-group restriction of
    :func:`kmeans`: seeds are each group's first k vectors by id (cluster
    id = rank order), assignment argmin is ``c·c − 2·v·c`` with the same
    sequential-fold dot and min-struct tie-break, update is the same
    ``avg`` per (group, cluster, pos), and empty clusters keep their
    previous centroid. What changes is the JOB STRUCTURE: one assignment +
    update job per iteration covering every group (2 + max_iter driver
    round-trips total), instead of per-group loops whose job count grows
    linearly with m — at m=8, max_iter=2 that is 3 collect-jobs instead
    of 24, a pure scheduling win (the r14 pq_* driver-wall fix; the
    joint-grouped shape is exactly how the pq oracle CTEs compute it).

    Model size on the driver: groups × k × dim doubles — same broadcast
    regime as :func:`kmeans`. Returns (group, cluster, pos, centroid_val).
    """
    from pyspark.sql import Window as W

    spark = subspaces.sparkSession
    v = as_double(F.col(vec_col))
    seed_rows = (
        subspaces.select(F.col(group_col), F.col(id_col), v.alias("__v"))
        .withColumn("__rk", F.row_number().over(W.partitionBy(group_col).orderBy(id_col)))
        .filter(F.col("__rk") <= k)
        .select(group_col, (F.col("__rk") - 1).alias("cluster"), "__v")
        .collect()
    )
    cents = {(r[group_col], r["cluster"]): list(r["__v"]) for r in seed_rows}
    for _ in range(max_iter):
        rows = [(g, c, cv, sum(x * x for x in cv)) for (g, c), cv in cents.items()]
        cf = spark.createDataFrame(
            rows, f"{group_col} int, cluster int, cvec array<double>, cc double"
        )
        assigned = (
            subspaces.select(F.col(group_col), F.col(id_col), v.alias("__v"))
            .join(F.broadcast(cf), group_col)
            .select(
                id_col,
                group_col,
                "__v",
                "cluster",
                (F.col("cc") - F.lit(2.0) * dot(F.col("__v"), F.col("cvec"))).alias("__d"),
            )
            .groupBy(id_col, group_col)
            .agg(F.min(F.struct(F.col("__d"), F.col("cluster"))).alias("__m"), F.first("__v").alias("__v"))
        )
        new_rows = (
            assigned.select(
                F.col(group_col),
                F.col("__m.cluster").alias("cluster"),
                F.posexplode("__v").alias("pos", "x"),
            )
            .groupBy(group_col, "cluster", "pos")
            .agg(F.avg("x").alias("cv"))
            .groupBy(group_col, "cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
            .select(group_col, "cluster", F.expr("transform(pairs, p -> p.cv)").alias("cvec"))
            .collect()
        )
        for r in new_rows:
            cents[(r[group_col], r["cluster"])] = list(r["cvec"])
    out = [
        (g, c, pos, val) for (g, c), cv in sorted(cents.items()) for pos, val in enumerate(cv)
    ]
    return spark.createDataFrame(
        out, f"{group_col} int, cluster int, pos int, centroid_val double"
    )


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
