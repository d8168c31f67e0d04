"""sf1 scale evidence for the r14 keep decisions (VERDICT r14 "Next round"
#5): (a) RP-LSH band keys str vs int64 (and the banded persist), on the
strict-threshold pair with occupancy-matched bits; (b) minhash R2
min-over-hex-string vs min-over-numeric, on minhash_signatures.

ABBA order-alternated, bench methodology (noop sink, clearCache per
attempt). Result equality asserted per variant pair.

Usage: python scripts/ab_sf1.py [rounds] [block ...]   (blocks: bands, minhash)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from h2outility_spark.operators import dedup, similarity  # noqa: E402
from h2outility_spark.operators.similarity import as_double, dot  # noqa: E402
from h2outility_spark.session import get_spark  # noqa: E402
from h2outility_spark.workload import _t, fround  # noqa: E402
from h2outility_spark.workload_next9 import (  # noqa: E402
    _STRICT_BANDS,
    _STRICT_THRESHOLD,
    neardup_strict_corpus,
)


def _str_sig_udf(planes):
    """The r13-shipped string signature kernel (pre-30dbecb)."""
    import numpy as np

    mat = np.asarray(planes, dtype=np.float64).T

    @F.pandas_udf("string")
    def sig(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ mat) > 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return sig


def _lsh_pairs_str(embeddings, n_bits, n_bands, threshold):
    """r13-shipped candidate path: string band keys, no persist."""
    planes = similarity.random_hyperplanes(n_bits * n_bands, 64)
    sig = _str_sig_udf(planes)
    sigs = embeddings.select(F.col("vec_id"), sig(F.col("embedding")).alias("sig"))
    banded = sigs.select(
        F.col("vec_id"),
        F.posexplode(
            F.expr(f"transform(sequence(0, {n_bands - 1}), j -> substr(sig, j*{n_bits}+1, {n_bits}))")
        ).alias("band", "bkey"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("id_a"), F.col("r.vec_id").alias("id_b"))
        .distinct()
    )
    return _verify(embeddings, cand, threshold)


def _lsh_pairs_int64(embeddings, n_bits, n_bands, threshold, persist: bool):
    """Current candidate path, optionally without the banded persist."""
    planes = similarity.random_hyperplanes(n_bits * n_bands, 64)
    bu = similarity.rp_band_udf(planes, n_bits, n_bands)
    banded = embeddings.select(F.col("vec_id"), F.explode(bu(F.col("embedding"))).alias("bkey"))
    if persist:
        banded = banded.persist()
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.bkey") == F.col("r.bkey")) & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("id_a"), F.col("r.vec_id").alias("id_b"))
        .distinct()
    )
    return _verify(embeddings, cand, threshold)


def _verify(embeddings, cand, threshold):
    v = as_double(F.col("embedding"))
    a = embeddings.select(F.col("vec_id").alias("id_a"), v.alias("va"), dot(v, v).alias("na"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), v.alias("vb"), dot(v, v).alias("nb"))
    sim = dot(F.col("va"), F.col("vb")) / F.sqrt(F.col("na") * F.col("nb"))
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    return out.select("id_a", "id_b", fround(F.col("cos_sim"), 4).alias("cos_sim"))


def _minhash_numeric(docs, num_hashes=8):
    """R2 variant: min over BIGINT with hex re-format (HashAggregate-able)."""
    sh = dedup.doc_shingles(docs, "doc_id", "text", 3)
    aggs = [
        F.expr(
            f"format_string('%08x', min(CAST(conv({dedup.minhash_hash_sql(i)}, 16, 10) AS BIGINT)))"
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_string(docs, num_hashes=8):
    return dedup.minhash_signatures(docs, num_hashes=num_hashes)


def run_ab(spark, label, variants, rounds, check_equal=True):
    """variants: list of (name, build_fn). ABBA across the variant list."""
    if check_equal:
        ref_name, ref_rows = None, None
        for name, fn in variants:
            rows = sorted(map(tuple, fn().collect()))
            if ref_rows is None:
                ref_name, ref_rows = name, rows
            else:
                assert rows == ref_rows, f"{label}: {name} != {ref_name}"
        print(f"{label}: all {len(variants)} variants identical ({len(ref_rows)} rows)", flush=True)

    def timed(fn):
        spark.catalog.clearCache()
        df = fn()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _, fn in variants:  # untimed warm pass
        timed(fn)
    samples = {name: [] for name, _ in variants}
    for r in range(rounds):
        order = list(variants)
        if r % 2 == 1:
            order.reverse()
        for name, fn in order:
            samples[name].append(round(timed(fn), 3))
    summary = {
        k: {"min": min(v), "median": round(statistics.median(v), 3), "samples": v}
        for k, v in samples.items()
    }
    print(json.dumps({"block": label, **summary}), flush=True)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    blocks = sys.argv[2:] or ["bands", "minhash"]
    spark = get_spark("ab-sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import bench

    sf1 = bench._ensure_sf1("/root/testdata/sf0.1")
    assert sf1, "sf1 fixtures unavailable"
    for t in ("documents", "embeddings"):
        _t(spark, sf1, t).selectExpr("count(*)").collect()

    if "bands" in blocks:
        corpus = neardup_strict_corpus(spark, sf1)
        n_rows = corpus.count()
        n_bits = similarity.auto_n_bits(n_rows + n_rows // 20)
        print(f"bands: n_rows={n_rows} auto n_bits={n_bits}", flush=True)
        run_ab(
            spark,
            f"strict_lsh_sf1(bits={n_bits},bands={_STRICT_BANDS})",
            [
                ("str_nopersist", lambda: _lsh_pairs_str(
                    neardup_strict_corpus(spark, sf1), n_bits, _STRICT_BANDS, _STRICT_THRESHOLD)),
                ("int64_nopersist", lambda: _lsh_pairs_int64(
                    neardup_strict_corpus(spark, sf1), n_bits, _STRICT_BANDS, _STRICT_THRESHOLD, False)),
                ("int64_persist", lambda: _lsh_pairs_int64(
                    neardup_strict_corpus(spark, sf1), n_bits, _STRICT_BANDS, _STRICT_THRESHOLD, True)),
            ],
            rounds,
        )

    if "minhash" in blocks:
        docs = _t(spark, sf1, "documents")
        run_ab(
            spark,
            "minhash_signatures_sf1",
            [
                ("min_hex_string", lambda: _minhash_string(docs)),
                ("min_numeric", lambda: _minhash_numeric(docs)),
            ],
            rounds,
        )


if __name__ == "__main__":
    main()
