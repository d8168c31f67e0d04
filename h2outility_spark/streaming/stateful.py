"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the extension point for QC logic that genuinely needs cross-batch state
(running statistics per series), which neither plain watermarked windows
nor the batch QC operators express.

Operator: per-series running EMA + threshold-crossing detector. For every
micro-batch it updates an exponential moving average per key held in
GroupState and emits rows whose value deviates from the running EMA by
more than ``threshold`` — the streaming analog of W2's value-change
detection, but with memory across batches.

Scale notes: state is one (ema, count) pair per series key — bounded by
|series|, not by throughput. Eviction of abandoned series belongs in
clock-triggered deployments via ProcessingTimeTimeout; with the
one-shot AvailableNow trigger used here, a timeout conf makes Spark spin
empty timeout micro-batches forever after the data drains, so the
operator runs with NoTimeout (verified empirically on Spark 4.1).

Spark 4's successor API (``transformWithStateInPandas`` — typed value/
list/map state, timers, TTL) is the intended upgrade path but is
container-blocked here: its driver-side runner needs the Python
``protobuf`` package, which this environment lacks (verified: the stream
fails with ImportError google.protobuf.descriptor before the first
batch). The operator surface below is API-compatible with that migration
— state is already an explicit schema tuple and output an iterator of
pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

OUTPUT_SCHEMA = (
    "user_id long, event_type string, ts timestamp, value double, "
    "ema double, deviation double"
)
STATE_SCHEMA = "ema double, n long"


def make_ema_detector(alpha: float = 0.3, threshold: float = 100.0):
    """Build the per-group update function (closure over parameters)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        ema, n = state.get if state.exists else (None, 0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                v = float(row.value)
                if ema is None:
                    ema = v
                else:
                    ema = alpha * v + (1 - alpha) * ema
                n += 1
                dev = abs(v - ema)
                if dev >= threshold:
                    out_rows.append(
                        (key[0], key[1], row.ts, v, round(ema, 6), round(dev, 6))
                    )
        state.update((float(ema) if ema is not None else 0.0, int(n)))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "event_type", "ts", "value", "ema", "deviation"]
            )

    return update


def streaming_ema_alerts(
    events: DataFrame, alpha: float = 0.3, threshold: float = 100.0
) -> DataFrame:
    """Wire the detector into a streaming (or batch-test) grouped frame."""
    return (
        events.groupBy("user_id", "event_type")
        .applyInPandasWithState(
            make_ema_detector(alpha, threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Per-source corpus quality drift monitor
# ---------------------------------------------------------------------------

DRIFT_OUTPUT_SCHEMA = (
    "source string, doc_id long, score double, running_mean double, zscore double"
)
DRIFT_STATE_SCHEMA = "n long, mean double, m2 double"


def make_quality_drift_detector(z_threshold: float = 3.0, min_n: int = 20):
    """Per-source Welford running mean/variance over document quality
    scores; emits an alert row for every doc whose score is more than
    ``z_threshold`` standard deviations from the source's running mean
    (once ``min_n`` docs have been seen). The streaming guard a corpus
    ingest runs next to the batch quality gate: a crawler regression or a
    source gone spammy shows up as a z-score burst long before the nightly
    batch calibration re-runs.

    State per source is three numbers — bounded by |sources|, independent
    of throughput. Docs inside a batch are processed in doc_id order so
    replays are deterministic."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for row in pdf.itertuples(index=False):
                s = float(row.score)
                if n >= min_n:
                    var = m2 / (n - 1) if n > 1 else 0.0
                    std = math.sqrt(var)
                    if std > 0.0:
                        z = (s - mean) / std
                        if abs(z) >= z_threshold:
                            out_rows.append(
                                (key[0], row.doc_id, s, round(mean, 6), round(z, 4))
                            )
                    elif s != mean:
                        # zero-variance history: any deviation is infinite-z;
                        # emit with NULL zscore rather than dividing by zero
                        out_rows.append((key[0], row.doc_id, s, round(mean, 6), None))
                # Welford update AFTER the test: the doc is judged against
                # history, then becomes history
                n += 1
                delta = s - mean
                mean += delta / n
                m2 += delta * (s - mean)
        state.update((int(n), float(mean), float(m2)))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["source", "doc_id", "score", "running_mean", "zscore"]
            )

    return update


def streaming_quality_drift(
    scored_docs: DataFrame, z_threshold: float = 3.0, min_n: int = 20
) -> DataFrame:
    """Wire the drift detector over a (source, doc_id, score) frame —
    score the stream JVM-side first (``text.calibration_score_col()``)
    so only three narrow columns cross into Python."""
    return scored_docs.groupBy("source").applyInPandasWithState(
        make_quality_drift_detector(z_threshold, min_n),
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
