"""Similarity search over embedding columns (array<float>).

Extension surface (BASELINE.json north star) — brute-force cosine top-k as
the exactness baseline, and an IVF-style (inverted-file / centroid-bucketed)
variant as the scale path.

Scale design:
  * Brute force is a broadcast nested-loop: broadcast the (small) query set
    against the (huge) candidate table — no shuffle of the candidates, one
    TakeOrdered per query via window top-k. Cost O(|C|·|Q|·d) FLOPs but
    embarrassingly parallel; it is the correct baseline and the verifier
    for approximate methods.
  * IVF: k centroids (from labels or k-means elsewhere) are broadcast;
    each candidate is assigned to its nearest centroid once (narrow map);
    a query probes only its top-n_probe centroid cells → the scan
    touches |C|·n_probe/k rows. At 100 TB the candidate table is
    partitioned by cell id so probing is partition pruning, not a scan.
  * Arithmetic: dot products via ``F.zip_with`` + ``F.aggregate`` fold —
    JVM-side, sequential accumulation (bit-identical to DuckDB's
    list_inner_product on the same doubles, which the oracle exploits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (left-to-right, like the oracle's)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against all candidates (self-match
    excluded). Queries are broadcast; ranking is a window top-k partitioned
    by query id with a deterministic tie-break on candidate id."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(F.col(id_col).alias("cand_id"), as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def centroids_by_label(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Element-wise mean vector per label — the IVF coarse quantizer when a
    clustering (or class label) already exists. posexplode → groupBy
    (label, pos) keeps the agg combiner-friendly at any dimensionality."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(as_double(F.col(vec_col))).alias("pos", "x")
    )
    return exploded.groupBy(label_col, "pos").agg(F.avg("x").alias("centroid_val"))


def _round_half_up(col: Column, n: int) -> Column:
    factor = float(10**n)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def pack_centroids(centroids: DataFrame, label_col: str = "label", round_dp: int | None = 6) -> DataFrame:
    """(label, pos, centroid_val) rows → (cell, cvec array<double>).

    Centroid components are rounded (default 6 dp) so that cell-assignment
    comparisons are reproducible across engines — partial-aggregation order
    makes raw averages differ in the last ulp.
    """
    val = F.col("centroid_val")
    if round_dp is not None:
        val = _round_half_up(val, round_dp)
    return (
        centroids.select(F.col(label_col).alias("cell"), "pos", val.alias("cv"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
        .select("cell", F.expr("transform(pairs, p -> p.cv)").alias("cvec"))
    )


def ivf_search(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: each query probes only its nearest centroid cell
    (n_probe=1); exact cosine top-k within the cell.

    At scale the candidate table is partitioned by cell, so the in-cell
    join is partition-pruned — the query never scans the full corpus. The
    centroids (k rows) are always broadcast.
    """
    from pyspark.sql import Window as W

    cents = pack_centroids(centroids_by_label(embeddings, label_col, vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    scored_cells = q.join(F.broadcast(cents)).select(
        "query_id", "qv", "cell", cosine(F.col("qv"), F.col("cvec")).alias("cell_sim")
    )
    wc = W.partitionBy("query_id").orderBy(F.col("cell_sim").desc(), F.col("cell"))
    best_cell = (
        scored_cells.withColumn("rk", F.row_number().over(wc)).filter(F.col("rk") == 1).select("query_id", "qv", "cell")
    )
    cands = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(label_col).alias("cell"), as_double(F.col(vec_col)).alias("cv2")
    )
    scored = (
        cands.join(F.broadcast(best_cell), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("cv2")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine ≥
    threshold.

    This is the exact O(n²) verifier, run as a broadcast nested-loop join
    (one side broadcast, candidates streamed). At corpus scale it is never
    run globally — candidates come from an LSH/IVF prefilter
    (rp_lsh_signatures / ivf cells) and this join verifies within buckets,
    exactly like the minhash→jaccard two-stage in dedup.py."""
    a = embeddings.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def random_hyperplanes(n_planes: int, dim: int, seed: str = "h") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — plain Python
    constants, so the SAME numbers can be inlined into the DuckDB oracle
    (no cross-engine randomness)."""
    import hashlib

    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}{j}_{d}".encode()).hexdigest()
            row.append(int(h[:2], 16) - 127.5)
        planes.append(row)
    return planes


def rp_lsh_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH signature: one bit per
    hyperplane = sign of the dot product. Vectors with high cosine land in
    the same bucket with probability 1 − θ/π per bit — the bucket-join
    prefilter for cosine near-dup at corpus scale. Narrow map, no shuffle."""
    planes = random_hyperplanes(n_planes, dim)
    v = as_double(F.col(vec_col))
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(x) for x in row])
        bits.append(F.when(dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select(F.col(id_col), F.concat(*bits).alias("rp_sig"))


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast join
    against the collected centroid vectors). Output: (id, cell)."""
    packed = (
        centroids.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))).alias("pairs"))
        .select(F.col(label_col).alias("cell"), F.expr("transform(pairs, p -> p.centroid_val)").alias("cv"))
    )
    v = embeddings.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    scored = v.join(F.broadcast(packed)).select(
        id_col, "cell", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).select(id_col, "cell")
