"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata (extension surface; the reference is
numeric-timeseries only).

Design:
  * A multimodal asset is ``struct<data: binary, mime: string, meta:
    map<string,string>>`` — or a flat (data, mime) pair of columns. Bytes
    stay opaque to the engine; Catalyst never interprets them.
  * Decode / feature-extract / resize / frame-sample run as Arrow-batched
    ``mapInPandas`` operators: one Python worker per partition, whole
    column batches across the Arrow boundary, never row-at-a-time.
  * Codecs are INJECTABLE; the defaults are real pure-Python decoders for
    the formats stdlib can handle (uncompressed 24-bit BMP, non-interlaced
    8-bit PNG, GIF first frame, baseline JPEG, 16-bit PCM WAV —
    ``h2outility_spark.codecs``, sniffed by magic bytes). Formats that
    need ffmpeg-class libraries (WebP/MP4/MP3), absent in this container,
    raise NotImplementedError at the decode site with the magic bytes
    named; swap in a real decoder on a cluster with the libs installed.
    ``deterministic_fake_decoder`` remains as a reproducible stand-in for
    plumbing tests.

Scale notes: binary payloads dominate partition size — size partitions by
bytes (``spark.sql.files.maxPartitionBytes``), never by row count; keep
payloads out of shuffles (extract features first, shuffle the small
feature vectors, join back by id if needed).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha1", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def deterministic_fake_decoder(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode: derives (width, height,
    mean_luma) from the payload's sha1 so tests are reproducible. NOT a real
    decoder — replace with PIL/turbojpeg on a real cluster."""
    h = hashlib.sha1(data or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, float]] | None = None,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_fn=None`` sniffs the format and uses the built-in pure-Python
    codecs (uncompressed 24-bit BMP; non-interlaced 8-bit PNG via stdlib
    zlib; GIF; baseline JPEG — codecs.sniff_image_decoder); payloads in
    formats that need an external codec library raise NotImplementedError
    at the decode site.
    """
    if decode_fn is None:
        from h2outility_spark.codecs import sniff_image_decoder

        def decode_fn(b: bytes) -> tuple[int, int, float]:  # noqa: ANN001
            try:
                return sniff_image_decoder(b)
            except ValueError as e:
                if "unsupported image format" in str(e):
                    raise NotImplementedError(
                        f"no built-in decoder for payload starting {b[:4]!r}: BMP, "
                        "8-bit PNG, GIF and baseline JPEG decode stdlib-only; WebP/"
                        "video need ffmpeg-class libs (absent here) — inject decode_fn"
                    ) from e
                raise

    fn = decode_fn

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            data = pdf[data_col]
            # NULL/empty payload -> null features (schema is nullable for
            # exactly this); a missing asset must not abort the job. An
            # UNDECODABLE payload still raises: silently nulling real bytes
            # would hide corruption.
            decoded = [(None, None, None) if not b else fn(b) for b in data]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "n_bytes": [len(b) if b is not None else 0 for b in data],
                    "sha1": [hashlib.sha1(b or b"").hexdigest() for b in data],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return assets.select(F.col(id_col), F.col(data_col)).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 30, id_col: str = "asset_id") -> DataFrame:
    """Video frame-sampling *plan*: emits (asset_id, frame_index) rows for a
    downstream decoder, derived from declared frame counts in metadata.
    Pure Catalyst (sequence + explode) — the expensive decode happens later,
    against only the sampled indices."""
    n_frames = F.coalesce(F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0))
    return assets.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias("frame_index"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def deterministic_fake_resizer(data: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Deterministic resize stand-in: derives source dims like the fake
    decoder, scales them to fit ``max_side``, and emits a payload digest as
    the 'resized bytes'. Replace with PIL ``Image.thumbnail`` on a real
    cluster."""
    w, h, _ = deterministic_fake_decoder(data)
    scale = min(1.0, max_side / max(w, h))
    out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
    payload = hashlib.sha1((data or b"") + f"{out_w}x{out_h}".encode()).digest()
    return payload, out_w, out_h


def resize_images(
    assets: DataFrame,
    max_side: int = 256,
    resize_fn: Callable[[bytes, int], tuple[bytes, int, int]] | None = None,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Arrow-batched image resize (bounding-box to ``max_side``): the
    standard normalization pass before vision-model training.

    Same codec contract as ``extract_image_features``: ``resize_fn=None``
    sniffs BMP/PNG and resizes with the matching built-in (staying in the
    input format); other formats raise at the codec site. The output keeps
    payloads in the SELECT path only — downstream writers partition by
    bytes; nothing here shuffles the binary column.
    """
    if resize_fn is None:
        from h2outility_spark.codecs import sniff_image_resizer

        def resize_fn(b: bytes, side_: int) -> tuple[bytes, int, int]:  # noqa: ANN001
            try:
                return sniff_image_resizer(b, side_)
            except ValueError as e:
                if "unsupported image format" in str(e):
                    raise NotImplementedError(
                        f"no built-in resizer for payload starting {b[:4]!r}: BMP, "
                        "8-bit PNG, GIF and baseline JPEG resize stdlib-only; inject "
                        "resize_fn for other formats"
                    ) from e
                raise

    fn, side = resize_fn, max_side

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL/empty payload passes through as null output row parts
            resized = [
                (None, None, None) if not b else fn(b, side) for b in pdf[data_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [r[0] for r in resized],
                    "width": [r[1] for r in resized],
                    "height": [r[2] for r in resized],
                }
            )

    return assets.select(F.col(id_col), F.col(data_col)).mapInPandas(batches, RESIZED_SCHEMA)


def audio_chunk_plan(
    assets: DataFrame, chunk_ms: int = 10_000, id_col: str = "asset_id"
) -> DataFrame:
    """Audio chunking *plan*: (asset_id, chunk_start_ms) rows covering the
    declared ``duration_ms`` metadata in ``chunk_ms`` strides — like
    ``frame_sample_plan``, pure Catalyst (sequence + explode); the decoder
    later touches only the planned chunks."""
    dur = F.coalesce(F.element_at(F.col("meta"), "duration_ms").cast("long"), F.lit(0))
    return assets.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(chunk_ms))
        ).alias("chunk_start_ms"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_abs_amplitude", T.DoubleType(), True),
    ]
)


def extract_audio_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int, float]] | None = None,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Arrow-batched audio feature extraction: (sample_rate, n_channels,
    duration_ms, mean_abs_amplitude) per asset. Default codec is the
    stdlib 16-bit PCM WAV parser (codecs.wav_audio_decoder); other
    containers (mp3/ogg) need an injected decoder."""
    if decode_fn is None:
        from h2outility_spark.codecs import wav_audio_decoder

        def decode_fn(b: bytes) -> tuple[int, int, int, float]:  # noqa: ANN001
            if b[:4] == b"RIFF":
                return wav_audio_decoder(b)
            raise NotImplementedError(
                f"no built-in decoder for payload starting {b[:4]!r}: only PCM WAV "
                "decodes stdlib-only; inject decode_fn for compressed audio"
            )

    fn = decode_fn

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            data = pdf[data_col]
            # NULL/empty payload -> null features (see extract_image_features)
            decoded = [(None, None, None, None) if not b else fn(b) for b in data]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "n_bytes": [len(b) if b is not None else 0 for b in data],
                    "sample_rate": [d[0] for d in decoded],
                    "n_channels": [d[1] for d in decoded],
                    "duration_ms": [d[2] for d in decoded],
                    "mean_abs_amplitude": [d[3] for d in decoded],
                }
            )

    return assets.select(F.col(id_col), F.col(data_col)).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), True),
        T.StructField("start_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
    ]
)


def extract_audio_frames(
    assets: DataFrame,
    window_ms: int = 100,
    frames_fn: Callable[[bytes, int], list] | None = None,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Windowed audio features — one output row per (asset, window) with
    RMS level and zero-crossing rate: the front-end for VAD, silence
    trimming, and speech-quality gating in audio-corpus pipelines.
    Default codec is the stdlib 16-bit PCM WAV path
    (codecs.wav_window_features); NULL/empty payloads produce no windows
    rather than aborting the batch. The explode happens inside
    ``mapInPandas``, so the binary column never enters a shuffle — output
    is already the narrow numeric frame."""
    if frames_fn is None:
        from h2outility_spark.codecs import wav_window_features

        def frames_fn(b: bytes, ms: int) -> list:  # noqa: ANN001
            if b[:4] == b"RIFF":
                return wav_window_features(b, ms)
            raise NotImplementedError(
                f"no built-in decoder for payload starting {b[:4]!r}: only PCM WAV "
                "decodes stdlib-only; inject frames_fn for compressed audio"
            )

    fn, ms = frames_fn, window_ms

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, widx, starts, rms, zcr = [], [], [], [], []
            for aid, b in zip(pdf[id_col], pdf[data_col]):
                if not b:
                    continue
                for w, s, r, z in fn(b, ms):
                    ids.append(aid)
                    widx.append(w)
                    starts.append(s)
                    rms.append(r)
                    zcr.append(z)
            yield pd.DataFrame(
                {"asset_id": ids, "window_idx": widx, "start_ms": starts, "rms": rms, "zcr": zcr}
            )

    return assets.select(F.col(id_col), F.col(data_col)).mapInPandas(batches, AUDIO_FRAMES_SCHEMA)


def audio_activity_segments(
    assets: DataFrame,
    rms_threshold: float = 0.05,
    window_ms: int = 100,
    frames_fn: Callable[[bytes, int], list] | None = None,
) -> DataFrame:
    """Energy-based voice-activity segmentation: windows above
    ``rms_threshold`` are merged into maximal runs (gaps-and-islands on
    ``window_idx`` — the same gap grouping as the QC islands operator,
    W3) and emitted as (asset_id, segment, start_ms, end_ms, n_windows,
    mean_rms). The speech/silence splitter an audio-corpus pipeline runs
    before transcription or chunking.

    All segmentation happens JVM-side on the narrow frame
    ``extract_audio_frames`` produced — one window shuffle keyed by
    asset, no Python past the codec."""
    from pyspark.sql import Window as W

    frames = extract_audio_frames(assets, window_ms=window_ms, frames_fn=frames_fn)
    active = frames.filter(F.col("rms") >= rms_threshold)
    w = W.partitionBy("asset_id").orderBy("window_idx")
    runs = active.withColumn(
        "segment", F.col("window_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy("asset_id", "segment")
        .agg(
            F.min("start_ms").alias("start_ms"),
            (F.max("start_ms") + F.lit(window_ms)).alias("end_ms"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
            F.round(F.avg("rms"), 6).alias("mean_rms"),
        )
        .drop("segment")
    )


def binarize_text_fixture(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal asset fixture from the documents table (UTF-8
    payload bytes + mime + meta) — this container has no image test data, so
    tests exercise the binary plumbing with text payloads."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.lit("text/plain").alias("mime"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )


def image_dhash(
    assets: DataFrame,
    hash_fn: Callable[[bytes], int] | None = None,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Perceptual fingerprint per image: (asset_id, dhash) with the 64-bit
    difference hash (codecs.dhash64; BMP/PNG/GIF/JPEG built-in). NULL payloads
    yield NULL hashes. The binary column stays inside mapInPandas; only
    the 8-byte hash continues into the pipeline. The id column keeps its
    INPUT type (string asset keys are as common as numeric ones — think
    URL or content-hash ids), only ``dhash`` is pinned to long."""
    if hash_fn is None:
        from h2outility_spark.codecs import dhash64

        hash_fn = dhash64
    fn = hash_fn
    id_ddl = assets.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # signed-64 view keeps the LongType column exact
                    "dhash": [
                        None if not b else (fn(b) ^ 0x8000000000000000) - 0x8000000000000000
                        for b in pdf[data_col]
                    ],
                }
            )

    return assets.select(F.col(id_col), F.col(data_col)).mapInPandas(
        batches, f"`{id_col}` {id_ddl}, dhash long"
    )


def image_neardup_pairs(
    assets: DataFrame,
    max_hamming: int = 6,
    hash_fn: Callable[[bytes], int] | None = None,
    id_col: str = "asset_id",
) -> DataFrame:
    """Near-duplicate image pairs by perceptual hash: band each 64-bit
    dHash into four 16-bit keys. Pigeonhole guarantee: at Hamming
    distance <= 3 the differing bits occupy at most 3 bands, so at least
    one band matches exactly and the pair is ALWAYS a candidate; at
    distances 4..``max_hamming`` a shared band is likely but not
    guaranteed (the standard pHash-banding recall trade — add bands to
    tighten it). Candidates come from a band-key self-join, never all
    pairs; the exact Hamming distance is then verified JVM-side with
    ``bit_count(xor)``."""
    hashes = image_dhash(assets, hash_fn=hash_fn, id_col=id_col).filter(
        F.col("dhash").isNotNull()
    )
    banded = hashes.select(
        id_col,
        "dhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("dhash"), s).bitwiseAND(F.lit(0xFFFF))
                    for s in (0, 16, 32, 48)
                ]
            )
        ).alias("band", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def canonical_images(
    assets: DataFrame,
    max_hamming: int = 6,
    hash_fn: Callable[[bytes], int] | None = None,
    id_col: str = "asset_id",
) -> DataFrame:
    """Image-dedup canonicalization: perceptual near-dup pairs →
    connected components (the same log-rounds pointer jumping the text
    dedup uses) → keep the min-id member of every duplicate cluster plus
    all unclustered assets. The image twin of the text pipeline's
    exact+near dedup stage."""
    from h2outility_spark.operators.dedup import connected_components

    pairs = image_neardup_pairs(assets, max_hamming=max_hamming, hash_fn=hash_fn, id_col=id_col)
    clusters = connected_components(pairs.select("id_a", "id_b"))
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return assets.join(losers, id_col, "left_anti")
