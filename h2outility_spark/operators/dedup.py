"""Deduplication operators for training-data pipelines: exact (hash-groupBy),
MinHash + LSH banding, SimHash, and n-gram Jaccard verification.

Extension surface beyond the reference (its only dedup is the UNIQUE
constraint, SURVEY.md §2.7 U5); designed 100 TB-first:

  * Exact dedup: one shuffle on a 16-byte fingerprint — the canonical
    hash-groupBy. At scale, pre-partition by fingerprint prefix.
  * MinHash: signatures are computed in a single explode→groupBy pass
    (shuffle keyed by doc_id, combiner-friendly ``min`` aggregates).
    Portability trick: each hash is ``substr(md5(shingle || '#' || seed),
    1, 8)`` kept as a HEX STRING — lexicographic min == numeric min for
    fixed-width hex, and md5 is identical in Spark and DuckDB, so the
    DuckDB oracle reproduces signatures exactly.
  * LSH: band keys = concatenated signature slices; candidate pairs come
    from a self-join on (band_idx, band_key) — the join explodes only
    within buckets, never O(n²). Skew hazard: a boilerplate band key with
    k docs makes k² pairs; cap bucket width upstream (filter giant
    buckets into a quarantine list) on real data.
  * Jaccard verify: exact n-gram Jaccard only for candidate pairs.
  * SimHash: 64-bit signature as 16 hex chars via per-bit majority vote,
    computed with portable arithmetic (hex-digit lookup + div/mod) so the
    oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from h2outility_spark.operators.text import WS_CLASS_EXPR, fingerprint, normalize_ws, shingles_expr

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by content fingerprint; one representative (min id) per group
    plus the group size. ``n_dups > 1`` rows are duplicate clusters."""
    fp = fingerprint(F.col(text_col)).alias("fp")
    return (
        docs.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Exploded (id, shingle) pairs; documents with < n tokens drop out.

    Formulated as posexplode(tokens) + lead() windows rather than a
    slice-per-position lambda: the lambda form re-evaluates the tokenizer
    split per shingle (O(tokens²) per document — measured 3x slower), while
    this tokenizes once per document and the window's doc-id shuffle is
    reused verbatim by the downstream signature groupBy (no extra
    exchange).
    """
    from pyspark.sql import Window as W

    from h2outility_spark.operators.text import tokens

    toks = docs.select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("i", "w")).filter(
        F.length("w") > 0
    )
    w = W.partitionBy(id_col).orderBy("i")
    parts = [F.col("w")] + [F.lead("w", k).over(w) for k in range(1, n)]
    return (
        toks.select(F.col(id_col), *[p.alias(f"__w{k}") for k, p in enumerate(parts)])
        .filter(F.col(f"__w{n - 1}").isNotNull())
        .select(F.col(id_col), F.concat_ws(" ", *[F.col(f"__w{k}") for k in range(n)]).alias("shingle"))
    )


def minhash_hash_sql(i: int, shingle_sql: str = "shingle") -> str:
    """Portable SQL for the i-th minhash hash of a shingle: an 8-hex-char
    slice of md5(shingle || '#' || seed), where one md5 digest (32 hex
    chars) serves FOUR hash functions — 4x fewer md5 evaluations than one
    digest per hash, the dominant cost of signature computation."""
    seed, slot = divmod(i, 4)
    suffix = "" if seed == 0 else f" || '#{seed}'"
    return f"substr(md5({shingle_sql}{suffix}), {8 * slot + 1}, 8)"


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """One row per doc: mh0..mh{k-1} columns, each the min over shingles of
    an md5-derived 32-bit hex hash (4 hashes per digest, seed-suffixed
    digests beyond the first four)."""
    sh = doc_shingles(docs, id_col, text_col, n)
    aggs = [F.min(F.expr(minhash_hash_sql(i))).alias(f"mh{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def _banded(signatures: DataFrame, bands: list[list[int]], id_col: str) -> DataFrame:
    """(id, band, band_key) rows from ONE posexplode over an array of band
    keys — not a per-band union, which would re-evaluate the whole signature
    DAG once per band."""
    band_keys = [F.concat_ws("|", *[F.col(f"mh{i}") for i in cols]) for cols in bands]
    return signatures.select(
        F.col(id_col), F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )


def _pairs_from_banded(banded: DataFrame, id_col: str) -> DataFrame:
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs_between(
    sigs_new: DataFrame,
    sigs_old: DataFrame,
    bands: list[list[int]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingest candidate pairs: band the NEW batch's signatures
    and probe the EXISTING corpus's banded index — (id_a = new, id_b =
    old) pairs whose band keys collide. At 100 TB the old side is a
    STORED band index (signatures are computed once at ingest and kept),
    so a daily batch costs O(batch) signing + one hash join against the
    index, never a corpus re-scan; here both sides are banded from their
    signatures, which is the same plan shape."""
    bn = _banded(sigs_new, bands, id_col).withColumnRenamed(id_col, "id_a")
    bo = _banded(sigs_old, bands, id_col).withColumnRenamed(id_col, "id_b")
    return bn.join(bo, ["band", "band_key"]).select("id_a", "id_b").distinct()


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: list[list[int]],
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Self-join signatures on per-band keys → distinct candidate (a, b)
    pairs with a < b. ``bands`` lists the signature indices in each band.

    ``max_bucket`` caps the k²-pairs explosion of a boilerplate bucket
    (one hot band key with k members turns the self-join cartesian within
    that bucket): buckets wider than the cap contribute NO pairs. Use
    ``lsh_candidate_pairs_quarantined`` to also get the skipped buckets for
    upstream triage. None (default) disables the width scan entirely — no
    extra shuffle."""
    banded = _banded(signatures, bands, id_col)
    if max_bucket is not None:
        banded = _without_giant_buckets(banded, id_col, max_bucket)
    return _pairs_from_banded(banded, id_col)


def _bucket_widths(banded: DataFrame) -> DataFrame:
    return banded.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("n_docs"))


def _without_giant_buckets(banded: DataFrame, id_col: str, max_bucket: int) -> DataFrame:
    """Drop band rows belonging to over-wide buckets via a broadcast
    anti-join against the (tiny) giant-bucket list — the width count is one
    combiner-friendly aggregation, and the anti-join adds no shuffle of the
    banded rows."""
    giants = _bucket_widths(banded).filter(F.col("n_docs") > max_bucket).select("band", "band_key")
    return banded.join(F.broadcast(giants), ["band", "band_key"], "left_anti")


def lsh_candidate_pairs_quarantined(
    signatures: DataFrame,
    bands: list[list[int]],
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Capped LSH candidates plus the quarantine report.

    Returns ``(pairs, quarantined_buckets)`` where the second frame is
    (band, band_key, n_docs) for every bucket wider than ``max_bucket``.
    Those buckets contribute no pairs; route their members to an upstream
    triage (they are near-certain boilerplate clusters — at corpus scale a
    single hot shingle-set otherwise costs k² pairs and one straggler
    reducer). Pairs for docs that ALSO co-occur in a small bucket are
    unaffected (recall outside quarantined buckets is unchanged)."""
    banded = _banded(signatures, bands, id_col)
    quarantined = _bucket_widths(banded).filter(F.col("n_docs") > F.lit(max_bucket))
    pairs = _pairs_from_banded(
        banded.join(F.broadcast(quarantined.select("band", "band_key")), ["band", "band_key"], "left_anti"),
        id_col,
    )
    return pairs, quarantined


def jaccard_for_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for the given (id_a, id_b) pairs.

    |A∩B| via a join of the two docs' distinct shingle sets; |A∪B| =
    |A| + |B| − |A∩B|. Only candidate pairs are touched — the expensive
    exact check never runs O(n²) at scale.
    """
    sh = doc_shingles(docs, id_col, text_col, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double")).alias(
                "jaccard"
            ),
        )
    )


def containment_for_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exact DIRECTED n-gram containment for the given (id_a, id_b) pairs:
    C(a→b) = |A∩B| / |A| and C(b→a) = |A∩B| / |B|.

    The asymmetric complement to Jaccard for SUB-DOCUMENT duplication: a
    short document pasted verbatim into a long one scores a low Jaccard
    (the union is dominated by the long side) but containment ≈ 1 in the
    short→long direction — the measure real pipelines use to catch
    boilerplate inclusion and quote-expansion dups. Same candidates-only
    cost shape as :func:`jaccard_for_pairs` (the exact check never runs
    O(n²); candidates come from the banded signature join).
    """
    sh = doc_shingles(docs, id_col, text_col, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double") / F.col("sz_a").cast("double")).alias("cont_ab"),
            (F.col("n_inter").cast("double") / F.col("sz_b").cast("double")).alias("cont_ba"),
        )
    )


# ---------------------------------------------------------------------------
# Connected components: near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve verified near-dup PAIRS into CLUSTERS: (node, cluster_id)
    where cluster_id = min doc id reachable through any chain of pairs —
    the last stage of a real dedup pipeline (A~B and B~C must collapse to
    ONE keeper even when A~C was never emitted as a pair).

    Algorithm: min-label propagation with pointer jumping. Each round
    (1) takes the min label over the node's neighbors and itself (one
    join + combiner-friendly groupBy min, both shuffles keyed by node id),
    then (2) pointer-jumps ``lab = label[label[node]]`` so labels hop
    across whole resolved chains at once. The jump makes convergence
    ~O(log(longest chain)) rounds instead of O(chain length); each round
    is a bounded number of node-keyed shuffles, nothing is ever collected
    to the driver, and ``localCheckpoint`` truncates the per-round lineage
    (the same iterative discipline as operators/kmeans.py). This is the
    alternating-contraction shape of Kiveris et al., "Connected Components
    in MapReduce and Beyond" (SOCC'14), simplified to min-label form.

    Convergence is detected by counting changed labels (a count on a
    |nodes|-sized frame per round — the only driver-visible value).
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).unionByName(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    edges = edges.localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn("lab", F.col("node"))
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), F.col("lab")
        )
        stepped = (
            labels.unionByName(nbr).groupBy("node").agg(F.min("lab").alias("lab"))
        )
        jump = stepped.select(F.col("node").alias("__jn"), F.col("lab").alias("__jl"))
        jumped = (
            stepped.join(jump, stepped.lab == jump["__jn"], "left")
            .select("node", F.least(F.col("lab"), F.coalesce("__jl", "lab")).alias("lab"))
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("lab").alias("cluster_id"))


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one document per near-dup cluster (the min-id member) plus all
    unclustered documents: a broadcastable anti-join against the (tiny
    relative to the corpus) set of non-canonical cluster members."""
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Winnowing (rolling local-min fingerprints; Schleimer et al. 2003 / MOSS)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints: hash every word k-gram, slide a
    w-wide window over the hash sequence, keep the minimum hash of each
    window — the guaranteed-coverage selection of the winnowing paper
    (any shared run of >= w+k-1 tokens shares at least one fingerprint).

    Output: distinct (id, fp) rows; fp is an 8-hex-char md5 slice, so
    lexicographic min == numeric min and DuckDB reproduces it exactly.

    Scale shape: everything through fingerprint selection is a NARROW map
    over per-document arrays (tokenize once into a materialized column,
    then k-gram hash + sliding min as array transforms) — zero shuffles,
    embarrassingly parallel at any corpus size. Documents shorter than k
    tokens contribute nothing; shorter than w+k-1 tokens get one
    fingerprint (the global min), the standard short-document degeneration.
    """
    d = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.expr(f"split(trim(regexp_replace({text_col}, '{WS_CLASS_EXPR}+', ' ')), ' ')").alias("__toks"),
    )
    # guard size < k explicitly: sequence(1, stop) flips to descending when
    # stop < start, which would fabricate bogus window starts
    kgram_hashes = F.expr(
        f"transform(sequence(1, size(__toks) - {k - 1}), "
        f"i -> substr(md5(array_join(slice(__toks, i, {k}), ' ')), 1, 8))"
    )
    d = d.select(
        F.col(id_col),
        F.when(F.size("__toks") >= k, kgram_hashes).otherwise(F.expr("array()")).alias("__h"),
    ).filter(F.size("__h") > 0)
    wins = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(__h) - {w - 1}, 1)), "
        f"i -> array_min(slice(__h, i, {w}))))"
    )
    return d.select(F.col(id_col), F.explode(wins).alias("fp"))


def winnow_neardup_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints: join
    documents on fp (bucketed by fingerprint — the shuffle is keyed by fp,
    never O(n²)), count shared fingerprints per (a < b) pair, keep pairs
    sharing >= ``min_shared``.

    Same giant-bucket hazard as LSH banding (one boilerplate fingerprint
    shared by m docs makes m² pairs): ``max_bucket`` drops over-wide
    fingerprint buckets via a broadcast anti-join, exactly like
    lsh_candidate_pairs.
    """
    if max_bucket is not None:
        giants = (
            fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > max_bucket).select("fp")
        )
        fps = fps.join(F.broadcast(giants), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# SimHash (portable 64-bit, emitted as 16 hex chars)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _bit_of_hex_digit(digit_col_sql: str, bit_in_digit: int) -> str:
    """SQL for bit ``bit_in_digit`` (0 = MSB) of one hex digit, portable
    across Spark SQL and DuckDB: hex-digit value via instr lookup, then
    div/mod arithmetic."""
    val = f"(instr('{_HEX}', {digit_col_sql}) - 1)"
    shift = 3 - bit_in_digit
    return f"(CAST(floor({val} / {2 ** shift}) AS INT) % 2)"


def simhash_bit_vote_sql(token_hash_sql: str, bit_index: int) -> str:
    """SQL for the ±1 vote of one token on one of the 64 signature bits."""
    digit = f"substr({token_hash_sql}, {bit_index // 4 + 1}, 1)"
    return f"(2 * {_bit_of_hex_digit(digit, bit_index % 4)} - 1)"


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc as a 16-hex-char string.

    Tokens vote ±1 on each bit of their md5-derived 64-bit hash; the
    signature bit is 1 where the sum is positive. One explode + one
    groupBy(doc) with 64 sum aggregates — combiner-friendly, single
    shuffle keyed by doc id.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(normalize_ws(F.lower(F.col(text_col))), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    hashed = toks.select(F.col(id_col), F.expr("substr(md5(encode(tok, 'UTF-8')), 1, 16)").alias("th"))
    votes = [F.expr(simhash_bit_vote_sql("th", b)).alias(f"v{b}") for b in range(64)]
    voted = hashed.select(F.col(id_col), *votes)
    sums = voted.groupBy(id_col).agg(*[F.sum(f"v{b}").alias(f"s{b}") for b in range(64)])
    # assemble hex: each output digit from 4 bit-majorities
    digit_exprs = []
    for d in range(16):
        bits = [f"(CASE WHEN s{4 * d + i} > 0 THEN {2 ** (3 - i)} ELSE 0 END)" for i in range(4)]
        digit_exprs.append(f"substr('{_HEX}', ({' + '.join(bits)}) + 1, 1)")
    sig = F.expr("concat(" + ", ".join(digit_exprs) + ")").alias("simhash")
    return sums.select(F.col(id_col), sig)


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: banded blocking + exact Hamming
    verify — the third dedup family (vs. shingle-set MinHash and
    embedding-cosine RP-LSH), cheapest per doc of the three.

    The 64-bit signature splits into 4 bands of 16 bits; candidates must
    share at least one band verbatim. For ``max_hamming <= 3`` this is
    EXACT by pigeonhole — 3 flipped bits cannot touch all 4 bands — so the
    blocked join provably loses no qualifying pair (the brute-force oracle
    equality in the registry demonstrates it). Shuffle is keyed by
    (band, value): ~4n rows; corpus-wide boilerplate concentrates in hot
    buckets, the same hazard (and quarantine treatment) as the MinHash
    path.

    Hamming itself is two 32-bit ``bit_count(a ^ b)`` terms (the hex
    signature parsed in halves — a full 64-bit parse would overflow signed
    BIGINT for high signatures).
    """
    sigs = simhash_signatures(docs, id_col, text_col)
    banded = sigs.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.expr("transform(sequence(0, 3), j -> substr(simhash, j*4+1, 4))")
        ).alias("band", "bval"),
    )
    if max_bucket is not None:
        # corpus-wide boilerplate makes one (band, value) bucket k-wide and
        # its candidate pairs k² — quarantine such buckets, same treatment
        # as the MinHash and RP-LSH paths (exactness then holds only for
        # pairs outside quarantined buckets; boilerplate needs the exact-
        # dedup pass first anyway)
        giants = (
            banded.groupBy("band", "bval")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "bval")
        )
        banded = banded.join(F.broadcast(giants), ["band", "bval"], "left_anti")
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col("l.simhash").alias("sig_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )

    def half(sig: str, off: int) -> str:
        return f"CAST(conv(substr({sig}, {off}, 8), 16, 10) AS BIGINT)"

    ham = F.expr(
        f"CAST(bit_count({half('sig_a', 1)} ^ {half('sig_b', 1)}) "
        f"+ bit_count({half('sig_a', 9)} ^ {half('sig_b', 9)}) AS INT)"
    )
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------


def incremental_neardup_filter(
    batch: DataFrame,
    existing: DataFrame,
    num_hashes: int = 8,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_registry: list | None = None,
) -> DataFrame:
    """The daily-ingest shape of dedup: keep only batch docs that are
    neither EXACT duplicates (normalized fingerprint seen in the corpus)
    nor NEAR duplicates (minhash band collision against a corpus doc,
    verified by exact n-gram Jaccard >= threshold) of the existing corpus.
    Batch and existing id sets must be disjoint. Batch-internal duplicates
    are out of scope here (run the batch through the corpus-wide pipeline
    for that).

    Scale: the exact pass is one anti join keyed by fingerprint. The near
    pass band-joins BATCH signatures against CORPUS signatures — cost is
    |batch| x collision rate, never corpus x corpus; at 100 TB the corpus
    signature/fingerprint tables are precomputed once and appended per
    ingest, so each day pays only its own batch. Returns surviving batch
    rows as (id, fp).

    Caching contract: ``survivors`` is cached here because three branches
    reuse it (signatures, the shingle union, the final anti join) — one
    batch-sized frame. Pass ``cache_registry`` (a list) to receive the
    cached frame handle and ``unpersist()`` it precisely once the result
    is consumed — the right pattern for a caller looping over many batches
    in one session. Without it the cache lives for the session (the
    one-shot cron-job shape).
    """
    from h2outility_spark.operators.text import fingerprint

    bfp = batch.select(F.col(id_col), F.col(text_col), fingerprint(F.col(text_col)).alias("fp"))
    efp = existing.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    survivors = bfp.join(efp, "fp", "left_anti").cache()
    if cache_registry is not None:
        cache_registry.append(survivors)

    bands = [[i] for i in range(num_hashes)]
    bs = minhash_signatures(survivors, num_hashes, id_col, text_col)
    es = minhash_signatures(existing, num_hashes, id_col, text_col)
    bb = _banded(bs, bands, id_col).alias("b")
    eb = _banded(es, bands, id_col).alias("e")
    cand = (
        eb.join(bb, ["band", "band_key"])
        .select(F.col(f"e.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    docs_all = existing.select(F.col(id_col), F.col(text_col)).unionByName(
        survivors.select(F.col(id_col), F.col(text_col))
    )
    jac = jaccard_for_pairs(cand, docs_all, id_col, text_col)
    drops = (
        jac.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return survivors.join(drops, id_col, "left_anti").select(id_col, "fp")


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (the "Deduplicating Training Data Makes
# Language Models Better" recipe, window-hashed instead of suffix-arrayed)
# ---------------------------------------------------------------------------


def duplicated_spans(
    docs: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal per-document spans of text whose every ``window``-token
    substring also occurs elsewhere in the corpus (another doc, or another
    position of the same doc) — the exact-substring-duplication signal
    Lee et al. remove with a suffix array. A window-hash formulation
    distributes better than suffix arrays: any duplicated substring of
    length >= window contains only duplicated windows, so the union of
    duplicated windows covers it; consecutive covered positions then merge
    into maximal spans (gaps-and-islands on the position sequence).

    Output: (id, span_start, span_end, span_tokens) per maximal span,
    positions 0-based token indices, end exclusive.

    Scale: |tokens| window rows -> one count-keyed groupBy (combiner
    collapses per-partition repeats) -> a broadcast-or-shuffle semi join
    back, island merge per doc. No suffix sorting, no corpus x corpus.
    """
    from pyspark.sql import Window as W

    from h2outility_spark.operators.text import tokens

    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("i", "w"))
    )
    win = W.partitionBy(id_col).orderBy("i")
    parts = [F.col("w")] + [F.lead("w", k).over(win) for k in range(1, window)]
    wins = (
        toks.select(F.col(id_col), F.col("i"), *[p.alias(f"__w{k}") for k, p in enumerate(parts)])
        .filter(F.col(f"__w{window - 1}").isNotNull())
        .select(
            F.col(id_col),
            F.col("i"),
            F.md5(F.encode(F.concat_ws(" ", *[F.col(f"__w{k}") for k in range(window)]), "UTF-8")).alias("h"),
        )
    )
    dup_hashes = wins.groupBy("h").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 2).select("h")
    dup_starts = wins.join(dup_hashes, "h").select(id_col, "i")
    covered = (
        dup_starts.select(
            F.col(id_col), F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(window - 1))).alias("pos")
        )
        .distinct()
    )
    # gaps-and-islands: consecutive covered positions merge into one span
    wisl = W.partitionBy(id_col).orderBy("pos")
    islands = covered.withColumn(
        "grp", F.col("pos") - F.row_number().over(wisl)
    )
    return (
        islands.groupBy(id_col, "grp")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("span_end_incl"))
        .select(
            id_col,
            F.col("span_start").cast("long"),
            (F.col("span_end_incl") + 1).cast("long").alias("span_end"),
            (F.col("span_end_incl") + 1 - F.col("span_start")).cast("long").alias("span_tokens"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The removal stage on top of duplicated_spans' detection: keep the
    FIRST corpus occurrence (by doc id, then position) of every duplicated
    ``window``-token substring and delete the positions covered by every
    LATER occurrence, then reassemble documents. This is the suffix-dedup
    policy (all-but-one occurrence removed) at window granularity.

    Output: (id, clean_text, n_removed); a fully-duplicated doc
    disappears. Same scale shape as duplicated_spans plus one rank over
    the (tiny) duplicated-window set.
    """
    from pyspark.sql import Window as W

    from h2outility_spark.operators.text import tokens

    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("i", "w"))
    )
    win = W.partitionBy(id_col).orderBy("i")
    parts = [F.col("w")] + [F.lead("w", k).over(win) for k in range(1, window)]
    wins = (
        toks.select(F.col(id_col), F.col("i"), *[p.alias(f"__w{k}") for k, p in enumerate(parts)])
        .filter(F.col(f"__w{window - 1}").isNotNull())
        .select(
            F.col(id_col),
            F.col("i"),
            F.md5(F.encode(F.concat_ws(" ", *[F.col(f"__w{k}") for k in range(window)]), "UTF-8")).alias("h"),
        )
    )
    wrank = W.partitionBy("h").orderBy(id_col, "i")
    later = wins.withColumn("rn", F.row_number().over(wrank)).filter(F.col("rn") > 1)
    covered = (
        later.select(
            F.col(id_col), F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(window - 1))).alias("i")
        )
        .distinct()
    )
    kept = toks.join(covered, [id_col, "i"], "left_anti")
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_tok"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("i", "w"))), lambda s: s["w"]),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("__n_kept"),
        )
        .join(totals, id_col)
        .select(
            id_col,
            "clean_text",
            (F.col("__n_tok") - F.col("__n_kept")).cast("long").alias("n_removed"),
        )
    )
