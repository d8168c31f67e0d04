"""Round-9 staging area, PROMOTED to the registry in the round-9 window
rotation (same lifecycle as ``workload_next`` → ``workload_next3``): each
(fn, oracle) pair waited fully formed with parity proven at sf0.001,
sf0.01 AND sf0.1 (``tests/test_workload_next.py`` STAGED4), so promotion
was the decorator change below plus window slots — zero new verification
work. With this promotion every sink family S5–S12 is driver
hash-certified.

Coverage targets (VERDICT r7 "stage the round-9 window"):
  * ``jdbc_roundtrip`` — the S9 SQL append sink + S3 partitioned JDBC
    read on ONE driver hash (embedded Derby, the only JDBC engine whose
    driver ships on Spark's classpath): base write, a second APPEND, then
    a 4-partition range read back. Generalizes the
    ``annotated_export_roundtrip`` in-query side-effect pattern to the
    relational sink (reference: ``series_service.py:746-752`` append,
    ``service_manager.py:121-159`` dialect URLs).
  * ``xml_metadata_roundtrip`` — the S8 XML metadata export re-parsed
    and hash-checked against the catalog SQL (reference:
    ``odmservices/export_service.py:120-389``).
  * ``export_rows_roundtrip`` — the S7 flag-gated DISTRIBUTED row export
    (multi-part ``df.write.csv``) read back whole: flag→column-set
    contract, distributed write path, and CSV type round-trip on one
    hash (reference: ``odmservices/export_service.py:15-118``).
  * ``rest_ingest_roundtrip`` — the S12 REST sink's distributed
    foreachPartition JSON posting against a local HTTP server, returning
    exactly what the server received.
  * ``annotated_export_fanout`` — EVERY per-site chunk of the wide
    matrix written executor-side (``write_annotated_chunks_distributed``,
    atomic tmp+rename per file), read back whole against the certified
    wide_export matrix — the 100 TB shape of the S5 batch export.
  * ``asof_join_nearest`` — the NEW nearest-direction as-of operator
    (min |Δt| either way, backward wins ties, tolerance + tiebreak),
    completing the as-of family; oracle is a per-row LATERAL nearest
    lookup.
  * ``grouped_percentiles`` — exact linear-interpolation percentiles per
    group (Spark ``percentile`` vs DuckDB ``quantile_cont``), the
    distribution-shape summary the QC rollups lean on.
  * ``rolling_corr`` — ±5-row value-vs-time Pearson window (local trend),
    zero-variance frames folded NaN→NULL for cross-engine parity.
  * ``chunk_sliding`` — NEW operator: sliding-window RAG chunking with
    overlap (pure built-ins, zero shuffles).
  * ``series_ohlc`` — hourly open/high/low/close per series via
    min_by/max_by over a (ts, event_id) struct ≡ DuckDB ordered
    first/last; one map-side-partial hash aggregate.
  * ``txtable_incremental_agg`` — incremental view maintenance: a
    materialized (count, sum) aggregate advanced from the v1→v2 change
    feed ONLY (``operators/ivm.py``), hash-matched against a from-scratch
    recompute of the final state (integer-cents measures make the
    equivalence exact).
  * ``winsorize_values`` — per-group [p05, p95] clipping, bounds
    broadcast back onto the fact stream (the fact table never shuffles).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from h2outility_spark.operators import asof
from h2outility_spark.operators.catalog import derive_catalog
from h2outility_spark.sinks.csv_sink import export_series_rows
from h2outility_spark.sinks.jdbc_sink import append_jdbc
from h2outility_spark.sinks.xml_metadata import export_series_metadata
from h2outility_spark.sources.parquet import load_jdbc
from h2outility_spark.workload import DV_CTE, _dv, _t, fround, query
from h2outility_spark.workload_lakehouse import scratch_dir

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# -- S9 + S3: JDBC append sink and partitioned read, one hash -----------------

JDBC_ROUNDTRIP_ORACLE = """
SELECT event_id AS value_id, ts AS local_dt, value AS data_value
FROM events
"""


@query(
    "jdbc_roundtrip",
    oracle=JDBC_ROUNDTRIP_ORACLE,
    description="S9+S3: Derby JDBC append sink (two commits) + 4-partition chunked range read-back on one hash",
)
def q_jdbc_roundtrip(spark, sf_dir):
    """Append 80% of the DataValues to an embedded-Derby table through the
    S9 JDBC sink (2 writer partitions), APPEND the remaining 20% in a
    second commit, then read the table back as a 4-partition range scan
    (S3 — the reference's vestigial 250k-row chunked fetch done right) and
    return it. Losing a row in either append, double-writing one, or a
    partition-boundary bug in the chunked read all flip the driver hash.
    """
    dv = _dv(spark, sf_dir).select(
        F.col("ValueID").alias("value_id"),
        F.col("LocalDateTime").alias("local_dt"),
        F.col("DataValue").alias("data_value"),
    )
    url = f"jdbc:derby:{scratch_dir('h2ou_jdbcrt_')}/db;create=true"
    props = {"driver": _DERBY_DRIVER}
    append_jdbc(dv.filter(F.col("value_id") % 10 < 8), url, "datavalues", properties=props, num_partitions=2)
    append_jdbc(dv.filter(F.col("value_id") % 10 >= 8), url, "datavalues", properties=props)
    bounds = dv.agg(F.min("value_id").alias("lo"), F.max("value_id").alias("hi")).collect()[0]
    return load_jdbc(
        spark,
        url,
        "datavalues",
        partition_column="value_id",
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=4,
        properties=props,
    )


# -- S8: XML metadata export round trip ---------------------------------------

_CATALOG_KEYS = ["SiteID", "VariableCode", "MethodID", "SourceID", "QualityControlLevelID"]

def _py_ts(expr: str) -> str:
    """Render a timestamp the way Python's ``str(datetime)`` does (the XML
    sink stringifies with str()): 6-digit microseconds, but the fractional
    part omitted entirely when it is zero — DuckDB's VARCHAR cast instead
    TRIMS trailing zeros, so a plain CAST drifts on e.g. '.738090'."""
    return (
        f"CASE WHEN microsecond({expr}) % 1000000 = 0 "
        f"THEN strftime({expr}, '%Y-%m-%d %H:%M:%S') "
        f"ELSE strftime({expr}, '%Y-%m-%d %H:%M:%S.%f') END"
    )


XML_ROUNDTRIP_ORACLE = (
    DV_CTE
    + f"""
SELECT CAST(SiteID AS VARCHAR) AS SiteID,
       CAST(VariableCode AS VARCHAR) AS VariableCode,
       CAST(MethodID AS VARCHAR) AS MethodID,
       CAST(SourceID AS VARCHAR) AS SourceID,
       CAST(QualityControlLevelID AS VARCHAR) AS QualityControlLevelID,
       {_py_ts('min(LocalDateTime)')} AS BeginDateTime,
       {_py_ts('max(LocalDateTime)')} AS EndDateTime,
       CAST(count(*) AS VARCHAR) AS ValueCount,
       {_py_ts('min(DateTimeUTC)')} AS BeginDateTimeUTC,
       {_py_ts('max(DateTimeUTC)')} AS EndDateTimeUTC
FROM dv
GROUP BY 1, 2, 3, 4, 5
"""
)


@query(
    "xml_metadata_roundtrip",
    oracle=XML_ROUNDTRIP_ORACLE,
    description="S8: series-catalog XML metadata export re-parsed off disk, element naming/order/stringification on the hash",
)
def q_xml_metadata_roundtrip(spark, sf_dir):
    """Derive the series catalog, export it through the S8 XML metadata
    sink, re-parse the XML OFF DISK, and return one row per <Series>
    element with every child element as a string column — element order,
    tag naming, and value stringification all ride the driver hash (the
    oracle re-states the catalog with VARCHAR casts).
    """
    import xml.etree.ElementTree as ET

    from pyspark.sql import types as T

    cat = derive_catalog(_dv(spark, sf_dir), keys=_CATALOG_KEYS)
    path = scratch_dir("h2ou_xmlrt_") + "/meta.xml"
    export_series_metadata(cat, path)

    cols = cat.columns
    root = ET.parse(path).getroot()
    rows = [tuple((el.findtext(c)) for c in cols) for el in root.iter("Series")]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    return spark.createDataFrame(rows, schema)


# -- S7: flag-gated distributed row export round trip -------------------------

EXPORT_ROWS_ORACLE = (
    DV_CTE
    + """
SELECT LocalDateTime, DataValue, DateTimeUTC, SiteID, VariableCode,
       QualityControlLevelID
FROM dv
"""
)


@query(
    "export_rows_roundtrip",
    oracle=EXPORT_ROWS_ORACLE,
    description="S7: flag-gated distributed multi-part row export with lossless microsecond timestamps, read back whole",
)
def q_export_rows_roundtrip(spark, sf_dir):
    """S7 row-wise export with flags utc/site/var/qcl through the
    DISTRIBUTED csv writer (one part file per partition — the bulk-export
    path, not the single-file chunk sink), then read every part back with
    an explicit schema. The flag→column-set contract, the multi-part
    write, and timestamp/double CSV round-trip fidelity are all on the
    hash."""
    from pyspark.sql import types as T

    dv = _dv(spark, sf_dir)
    out = scratch_dir("h2ou_rowsrt_") + "/rows"
    export_series_rows(dv, out, utc=True, site=True, var=True, qcl=True)
    schema = T.StructType(
        [
            T.StructField("LocalDateTime", T.TimestampType()),
            T.StructField("DataValue", T.DoubleType()),
            T.StructField("DateTimeUTC", T.TimestampType()),
            T.StructField("SiteID", T.LongType()),
            T.StructField("VariableCode", T.StringType()),
            T.StructField("QualityControlLevelID", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(out)


# -- nearest-direction as-of join ---------------------------------------------

ASOF_NEAREST_ORACLE = """
WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click')
SELECT l.user_id, l.event_id, l.ts,
       m.ts AS asof_ts, m.dir AS asof_direction,
       m.click_value
FROM l LEFT JOIN LATERAL (
  SELECT r.ts,
         CASE WHEN r.ts <= l.ts THEN 'backward' ELSE 'forward' END AS dir,
         floor(r.value * 100.0 + 0.5) / 100.0 AS click_value
  FROM r
  WHERE r.user_id = l.user_id
    AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= CAST(7200 AS BIGINT) * 1000000
  ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)),
           CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END,
           r.event_id DESC
  LIMIT 1
) m ON TRUE
"""


@query(
    "asof_join_nearest",
    oracle=ASOF_NEAREST_ORACLE,
    description="nearest-direction as-of join (min |dt| either way, backward tie-break, tolerance + tiebreak), one shuffle",
    bench=True,  # round 10: joined the headline set + both scaling blocks
)
def q_asof_join_nearest(spark, sf_dir):
    """Nearest click around each purchase (±2 h): the NEW
    ``asof_join_nearest`` operator — closest right row in EITHER
    direction, equidistant ties resolved backward, duplicate-timestamp
    right rows resolved by largest event_id. The oracle is a per-row
    LATERAL nearest lookup with the identical ordering contract. One
    shuffle on user_id (both directional carries ride the same exchange).
    """
    ev = _t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", fround(F.col("value"), 2).alias("click_value"), "event_id"
    )
    return asof.asof_join_nearest(
        purch,
        clicks,
        ["user_id"],
        payload_cols=["click_value"],
        tolerance_seconds=7200,
        tiebreak="event_id",
    )


# -- exact grouped percentiles -------------------------------------------------

GROUPED_PERCENTILES_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       floor((quantile_cont(value, 0.25)) * 10000.0 + 0.5) / 10000.0 AS p25,
       floor((quantile_cont(value, 0.50)) * 10000.0 + 0.5) / 10000.0 AS p50,
       floor((quantile_cont(value, 0.90)) * 10000.0 + 0.5) / 10000.0 AS p90
FROM events
GROUP BY event_type
"""


@query(
    "grouped_percentiles",
    oracle=GROUPED_PERCENTILES_ORACLE,
    description="exact per-group linear-interpolation percentiles (Spark percentile = DuckDB quantile_cont)",
)
def q_grouped_percentiles(spark, sf_dir):
    """Exact per-group percentiles by linear interpolation (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``: both index p·(n−1) into the
    sorted values). Exact percentile is a sort-based aggregate — fine at
    per-group scale; at 100 TB the streaming-sketch twin is
    ``approx_percentile`` (accuracy-tested in pytest, not hashable
    cross-engine because sketch merge order is partition-dependent)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
        fround(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        fround(F.expr("percentile(value, 0.90)"), 4).alias("p90"),
    )


# -- S12: REST ingest round trip ----------------------------------------------

REST_INGEST_ORACLE = (
    DV_CTE
    + """
SELECT ValueID AS value_id,
       strftime(LocalDateTime, '%Y-%m-%d %H:%M:%S.%f') AS local_dt,
       floor(DataValue * 100.0 + 0.5) / 100.0 AS data_value
FROM dv WHERE SiteID <= 1
"""
)


@query(
    "rest_ingest_roundtrip",
    oracle=REST_INGEST_ORACLE,
    description="S12: distributed foreachPartition JSON posting to a local HTTP server; returns exactly what the server received",
)
def q_rest_ingest_roundtrip(spark, sf_dir):
    """S12 on a driver hash: POST a DataValues selection to a local HTTP
    endpoint through the DISTRIBUTED sink (``post_json_partitions`` —
    executor-side ``foreachPartition``, 4 partitions, bounded JSON
    batches), then return exactly what the server RECEIVED. A dropped
    batch, a double-post, or a JSON type mangling flips the hash. The
    in-process ThreadingHTTPServer mirrors tests/test_rest_sink.py; on a
    real cluster the same sink code points at a service URL (reference
    analog: ``HydroShareUtility.py`` upload loop).

    The received rows are rebuilt driver-side — bounded by construction
    (the posted selection is a per-chunk slice, same contract as the
    single-file CSV sinks)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from h2outility_spark.sinks.rest_sink import post_json_partitions

    received: list[dict] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n) if n else b""
            with lock:
                received.extend(json.loads(body))
            out = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        sel = (
            _dv(spark, sf_dir)
            .filter(F.col("SiteID") <= 1)
            .select(
                F.col("ValueID").alias("value_id"),
                F.date_format("LocalDateTime", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("local_dt"),
                fround(F.col("DataValue"), 2).alias("data_value"),
            )
            .repartition(4)
        )
        post_json_partitions(
            sel, f"http://127.0.0.1:{server.server_port}/ingest", batch_size=50
        )
    finally:
        server.shutdown()
        server.server_close()
    rows = [(int(r["value_id"]), str(r["local_dt"]), float(r["data_value"])) for r in received]
    return spark.createDataFrame(rows, "value_id bigint, local_dt string, data_value double")


# -- rolling correlation (W-family depth) --------------------------------------

ROLLING_CORR_ORACLE = """
SELECT user_id, event_id,
       floor((corr(value, epoch_us(ts) / 1000000.0)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING))
             * 10000.0 + 0.5) / 10000.0 AS trend_corr
FROM events
"""


@query(
    "rolling_corr",
    oracle=ROLLING_CORR_ORACLE,
    description="rolling value-vs-time Pearson correlation per series (+-5-row frame), NaN->NULL folded for parity",
)
def q_rolling_corr(spark, sf_dir):
    """Rolling value-vs-time Pearson correlation per series (±5-row frame):
    the local-trend detector (corr ~ +1 = steady rise, ~ −1 = steady fall).
    Degenerate frames (zero variance) are normalized to NULL — Spark's
    corr yields NaN where DuckDB yields NULL, so the NaN is folded before
    rounding. One shuffle on the series key, same as every QC window."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-5, 5)
    c = F.corr(F.col("value"), F.unix_micros("ts") / F.lit(1_000_000.0)).over(w)
    c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
    return ev.select("user_id", "event_id", fround(c, 4).alias("trend_corr"))


# -- sliding-window chunking ----------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48

CHUNK_SLIDING_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')), ' ') AS toks,
         CASE WHEN length(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')), ' ')) END AS n
  FROM documents
),
s AS (
  SELECT doc_id, toks, n, u.s AS start_tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY u.s) - 1 AS chunk_idx
  FROM t, unnest(generate_series(0, n - 1, {_CHUNK_STRIDE})) u(s)
  WHERE n > 0 AND (u.s = 0 OR u.s - {_CHUNK_STRIDE} + {_CHUNK_SIZE} < n)
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_SIZE}, n - start_tok) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, start_tok + 1, start_tok + {_CHUNK_SIZE}), ' ') AS chunk_text
FROM s
"""


@query(
    "chunk_sliding",
    oracle=CHUNK_SLIDING_ORACLE,
    description="sliding-window RAG chunking (64-token windows every 48), pure built-ins, zero shuffles",
    bench=True,
)
def q_chunk_sliding(spark, sf_dir):
    """Sliding-window chunking of the document corpus (64-token windows
    every 48 tokens → 16-token overlap): boundary text is visible to both
    neighboring chunks, the shape RAG retrieval and context-window packing
    want. Chunk indices, offsets, exact chunk text and the
    minimal-trailing-window rule all ride the hash. Zero shuffles."""
    from h2outility_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    return T.chunk_sliding(docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# -- S5 fan-out: one annotated CSV per site chunk, written executor-side ---------

from h2outility_spark.operators.reshape import pivot_column_names as _pcn  # noqa: E402
from h2outility_spark.workload import PIVOT_PAIRS as _PAIRS, _wide_export_oracle  # noqa: E402

_FANOUT_NAMES = _pcn(_PAIRS)

#: identical content contract to the certified wide_export matrix — the
#: fan-out must reproduce it file-by-file.
ANNOTATED_FANOUT_ORACLE = _wide_export_oracle()


@query(
    "annotated_export_fanout",
    oracle=ANNOTATED_FANOUT_ORACLE,
    description="S5 at the 100 TB shape: every per-site annotated CSV chunk written executor-side (applyInPandas), read back whole",
)
def q_annotated_export_fanout(spark, sf_dir):
    """The reference's whole batch behavior in one query, at the 100 TB
    shape: the full wide matrix is split into per-site chunks and EVERY
    chunk is serialized to its own annotated CSV EXECUTOR-SIDE
    (``write_annotated_chunks_distributed`` — applyInPandas over
    groupBy(SiteID), all chunks in parallel, no driver loop), then every
    file is read back through the comment-skipping CSV scan and the union
    returned. The oracle is the certified wide_export matrix: a chunk
    whose file is missing, double-written, mis-filled, or column-shuffled
    flips the hash. 150 files at sf0.01; same plan at 100k chunks."""
    from pyspark.sql import types as T

    from h2outility_spark.operators.reshape import fill_no_data, pivot_wide
    from h2outility_spark.sinks.csv_sink import write_annotated_chunks_distributed
    from h2outility_spark.workload import PIVOT_PAIRS

    dv = _dv(spark, sf_dir).withColumn("obs_date", F.to_date("LocalDateTime"))
    names = _FANOUT_NAMES
    wide = pivot_wide(dv, ["SiteID", "obs_date"], PIVOT_PAIRS, agg="avg")
    value_cols = [names[p] for p in PIVOT_PAIRS]
    rounded = wide.select(
        "SiteID", "obs_date", *[fround(F.col(f"`{c}`"), 2).alias(c) for c in value_cols]
    )
    filled = fill_no_data(rounded, {c: -9999.0 for c in value_cols})

    out_dir = scratch_dir("h2ou_fanout_")
    summary = write_annotated_chunks_distributed(
        filled, out_dir, chunk_col="SiteID", order_by=["SiteID", "obs_date"]
    )
    n_files = summary.count()  # acts the write job; 1-row-per-chunk frame
    assert n_files > 0

    schema = T.StructType(
        [T.StructField("SiteID", T.LongType()), T.StructField("obs_date", T.DateType())]
        + [T.StructField(c, T.DoubleType()) for c in value_cols]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("comment", "#")
        .csv(os.path.join(out_dir, "*.csv"))
    )


# -- incremental view maintenance off the TxTable CDF -----------------------------

TXTABLE_IVM_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey % 50 AS cust_bucket,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 10 < 8
),
upd AS (
  SELECT o_orderkey, o_custkey % 50 AS cust_bucket,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) + 500 AS cents
  FROM orders WHERE o_orderkey % 4 = 0
),
final AS (
  SELECT * FROM upd
  UNION ALL
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
)
SELECT cust_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM final GROUP BY cust_bucket
"""


@query(
    "txtable_incremental_agg",
    oracle=TXTABLE_IVM_ORACLE,
    description="incremental view maintenance: (count,sum) aggregate advanced from the CDF only, O(changed rows)",
)
def q_txtable_incremental_agg(spark, sf_dir):
    """Incremental view maintenance, hash-proven equivalent to a
    recompute: materialize a per-bucket (count, sum) aggregate at v1,
    run a mixed upsert (updates to existing keys + brand-new keys)
    through merge_upsert, then advance the view using ONLY the v1→v2
    change feed (``ivm.maintain_grouped_agg`` — O(changed rows), never
    O(table)) and return the maintained view. The oracle recomputes the
    aggregate from the final state algebraically — any drift between
    maintain-from-CDF and recompute flips the hash. Measures are integer
    cents, so maintained ≡ recomputed exactly (integer addition is
    associative; no float accumulation-order escape hatch)."""
    from h2outility_spark.operators import ivm
    from h2outility_spark.storage_tx import TxTable

    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 50).alias("cust_bucket"),
        cents.alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") % 10 < 8)
    upd = orders.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "cents", F.col("cents") + F.lit(500)
    )

    t = TxTable(spark, scratch_dir("h2ou_ivm_") + "/t", key_cols=["o_orderkey"])
    v1 = t.append(base)
    old_view = ivm.aggregate_state(
        t.snapshot(v1), ["cust_bucket"], "cents", "n_orders", "total_cents"
    )
    v2 = t.merge_upsert(upd)
    return ivm.maintain_grouped_agg(
        old_view,
        t.changes(v1, v2),
        ["cust_bucket"],
        "cents",
        "n_orders",
        "total_cents",
    )


# -- per-group winsorization -------------------------------------------------------

WINSORIZE_ORACLE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       floor((CASE WHEN e.value < b.lo THEN b.lo
                   WHEN e.value > b.hi THEN b.hi
                   ELSE e.value END) * 10000.0 + 0.5) / 10000.0 AS winsorized,
       CAST(e.value < b.lo OR e.value > b.hi AS BOOLEAN) AS clipped
FROM events e JOIN b USING (event_type)
"""


@query(
    "winsorize_values",
    oracle=WINSORIZE_ORACLE,
    description="per-group [p05,p95] winsorization, bounds broadcast onto the fact stream (fact table never shuffles)",
)
def q_winsorize_values(spark, sf_dir):
    """Per-group winsorization: clip every value into its group's
    [p05, p95] band — the robust-stats pre-step QC pipelines run before
    fitting anything. Shape: one exact-percentile aggregate over the
    (tiny) group set, BROADCAST back onto the fact stream, clip in a
    narrow map — the fact table never shuffles, which is the only
    acceptable plan at 100 TB (the percentile agg shuffles the values
    once; swap in approx_percentile to make that map-side too)."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        fround(clipped, 4).alias("winsorized"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias("clipped"),
    )


# -- hourly OHLC rollup ----------------------------------------------------------

SERIES_OHLC_ORACLE = """
SELECT user_id, event_type, date_trunc('hour', ts) AS hour_start,
       floor((first(value ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0 AS open,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS high,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS low,
       floor((last(value ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0 AS close,
       CAST(count(*) AS BIGINT) AS n_obs
FROM events
GROUP BY 1, 2, 3
"""


@query(
    "series_ohlc",
    oracle=SERIES_OHLC_ORACLE,
    description="hourly OHLC per series via min_by/max_by ordered aggregates, one map-side-partial hash aggregate",
    bench=True,
)
def q_series_ohlc(spark, sf_dir):
    """Hourly OHLC per series (open = first value in the hour, close =
    last, ties on timestamp broken by event_id): the canonical downsample
    for sensor/market series. Spark's min_by/max_by over a (ts, event_id)
    struct ≡ DuckDB's ordered first/last aggregates. ONE hash aggregate
    with map-side partials — no window, no sort of the full stream; at
    100 TB this is the cheapest possible shape for a per-hour summary."""
    ev = _t(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        fround(F.min_by(F.col("value"), order_key), 2).alias("open"),
        fround(F.max("value"), 2).alias("high"),
        fround(F.min("value"), 2).alias("low"),
        fround(F.max_by(F.col("value"), order_key), 2).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


#: name -> (fn, oracle) for the round-9 promotion pass and the parity test.
STAGED4 = {
    "jdbc_roundtrip": (q_jdbc_roundtrip, JDBC_ROUNDTRIP_ORACLE),
    "xml_metadata_roundtrip": (q_xml_metadata_roundtrip, XML_ROUNDTRIP_ORACLE),
    "export_rows_roundtrip": (q_export_rows_roundtrip, EXPORT_ROWS_ORACLE),
    "asof_join_nearest": (q_asof_join_nearest, ASOF_NEAREST_ORACLE),
    "grouped_percentiles": (q_grouped_percentiles, GROUPED_PERCENTILES_ORACLE),
    "rest_ingest_roundtrip": (q_rest_ingest_roundtrip, REST_INGEST_ORACLE),
    "rolling_corr": (q_rolling_corr, ROLLING_CORR_ORACLE),
    "chunk_sliding": (q_chunk_sliding, CHUNK_SLIDING_ORACLE),
    "series_ohlc": (q_series_ohlc, SERIES_OHLC_ORACLE),
    "annotated_export_fanout": (q_annotated_export_fanout, ANNOTATED_FANOUT_ORACLE),
    "txtable_incremental_agg": (q_txtable_incremental_agg, TXTABLE_IVM_ORACLE),
    "winsorize_values": (q_winsorize_values, WINSORIZE_ORACLE),
}
