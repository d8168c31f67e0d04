"""Custom PySpark DataSource (Spark 4 Python DataSource API): stream a
``storage_tx.TxTable``'s append tail as a Structured Streaming source.

Offsets are TABLE VERSIONS — the manifest log IS the write-ahead log, so
the source needs no extra bookkeeping: each micro-batch emits the rows of
the data files ADDED by versions ``(last_seen, latest]``. Replays are
exact (the same immutable files are re-read for the same offset range),
giving end-to-end exactly-once into any checkpointed sink.

Contract: APPEND-ONLY tables. ``append`` versions emit their added files'
rows; ``compact`` versions emit nothing (pure rewrites of already-emitted
rows — the file diff is ignored by op, which is why compaction stays safe
to run under a live tail reader); any other op (merge/overwrite/restore)
raises, because rewritten files would re-emit old rows. This matches the
Kafka-ish ingest shape the table plays in pipelines; the batch
``TxTable.changes()`` feed covers the general case.

Execution shape: a partition-planning ``DataSourceStreamReader`` — the
driver only diffs manifests (metadata) and plans ONE PARTITION PER ADDED
FILE; executors read the parquet with pyarrow in parallel. Per-batch cost
on the driver is O(changed manifest entries), the data plane scales with
the cluster.

Usage::

    spark.dataSource.register(TxTableStreamDataSource)
    stream = spark.readStream.format("txtable_stream").option("path", dir).load()
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from h2outility_spark.storage_tx import TxTable, _MANIFEST_DIR


def _versions(table_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table_dir, _MANIFEST_DIR, "v*.json"))
    )


def _latest_version(table_dir: str) -> int | None:
    vs = _versions(table_dir)
    return vs[-1] if vs else None


def _manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(table_dir, _MANIFEST_DIR, f"v{version:08d}.json")) as f:
        return TxTable._normalize_manifest(json.load(f))


def _segment_entries(table_dir: str, name: str) -> list[dict]:
    with open(os.path.join(table_dir, _MANIFEST_DIR, name)) as f:
        return json.load(f)["entries"]


def _file_paths(table_dir: str, m: dict) -> set[str]:
    out = {e["path"] for e in m["_inline_files"]}
    for d in m["segments"]:
        out.update(e["path"] for e in _segment_entries(table_dir, d["name"]))
    return out


def _added_files(table_dir: str, v: int, allow_bootstrap: bool = False) -> list[str]:
    """Relative paths of the data files version ``v`` ADDED, enforcing the
    append-only contract (compact → none; other non-append ops → error).

    Cost is O(changed segments), not O(table): unchanged segments carry
    over BY NAME between manifests, so the diff reads only segments
    present in exactly one of the two manifests (new segments hold the
    candidates; vanished ones — small segments repacked by the manifest
    compactor — hold the carried files to subtract).

    If version ``v``'s PARENT manifest was vacuumed away, behavior depends
    on ``allow_bootstrap``: a FRESH reader (offset minted by
    ``initialOffset`` this run, which sets the bootstrap flag) emits
    ``v``'s FULL file set as the snapshot bootstrap — it has emitted
    nothing yet, so the snapshot is exactly its backlog. A CHECKPOINTED
    reader resuming mid-stream must NOT take that branch: it already
    emitted every row up to its offset, and the full snapshot would
    re-emit the whole table as duplicates into an exactly-once sink — it
    gets the fresh-checkpoint ValueError instead.
    """
    try:
        m = _manifest(table_dir, v)
    except FileNotFoundError:
        raise ValueError(
            f"txtable_stream offset points at version {v}, which vacuum has "
            f"removed (oldest retained: {min(_versions(table_dir), default='none')}); "
            "restart the stream from a fresh checkpoint"
        ) from None
    try:
        prev_m = _manifest(table_dir, v - 1) if v > 0 else None
    except FileNotFoundError:
        if allow_bootstrap:
            # v is the oldest retained version and the reader is fresh:
            # bootstrap with its snapshot
            return sorted(_file_paths(table_dir, m))
        raise ValueError(
            f"version {v}'s parent manifest was vacuumed away beneath a "
            "checkpointed reader; emitting the snapshot here would re-send "
            "already-delivered rows as duplicates — restart the stream from "
            "a fresh checkpoint"
        ) from None
    if m["op"] == "compact":
        return []
    if m["op"] != "append":
        raise ValueError(
            f"txtable_stream is an append-only tail (version {v} is "
            f"op={m['op']!r}); use TxTable.changes() for the general feed"
        )
    if prev_m is None:
        return sorted(_file_paths(table_dir, m))
    prev_segs = {d["name"] for d in prev_m["segments"]}
    cur_segs = {d["name"] for d in m["segments"]}
    candidates: set[str] = {e["path"] for e in m["_inline_files"]}
    for name in cur_segs - prev_segs:
        candidates.update(e["path"] for e in _segment_entries(table_dir, name))
    carried: set[str] = {e["path"] for e in prev_m["_inline_files"]}
    for name in prev_segs - cur_segs:
        carried.update(e["path"] for e in _segment_entries(table_dir, name))
    return sorted(candidates - carried)


class _TxFilePartition(InputPartition):
    def __init__(self, abs_path: str):
        self.abs_path = abs_path


class _TxAppendTailReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, field_names: list[str]):
        self.table_dir = table_dir
        self.field_names = field_names

    def initialOffset(self) -> dict:
        # Start just below the OLDEST RETAINED version, not -1: on a table
        # whose early manifests were vacuumed, the first batch then
        # bootstraps from the earliest reconstructable snapshot instead of
        # chasing deleted manifests. The bootstrap flag rides in the offset
        # so ONLY a reader starting from this freshly-minted offset may take
        # the full-snapshot branch; a checkpointed offset (minted by
        # latestOffset, no flag) never bootstraps — see _added_files.
        vs = _versions(self.table_dir)
        return {"version": (vs[0] - 1) if vs else -1, "bootstrap": True}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.table_dir)
        return {"version": -1 if latest is None else latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            # Only the FIRST version past a fresh initialOffset may
            # snapshot-bootstrap; later versions in the range provably have
            # a retained parent (v-1 was just resolved).
            fresh = bool(start.get("bootstrap")) and v == start["version"] + 1
            parts.extend(
                _TxFilePartition(os.path.join(self.table_dir, rel))
                for rel in _added_files(self.table_dir, v, allow_bootstrap=fresh)
            )
        return parts

    def read(self, partition: _TxFilePartition) -> Iterator[tuple]:
        # Runs on EXECUTORS: one immutable parquet file per task.
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.abs_path, columns=self.field_names)
        cols = [tbl.column(n).to_pylist() for n in self.field_names]
        return iter(zip(*cols))

    def commit(self, end: dict) -> None:
        # Nothing to clean up: offsets are durable table versions and the
        # files they name are immutable (vacuum retention is the guard).
        pass


class TxTableStreamDataSource(DataSource):
    """``format("txtable_stream")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "txtable_stream"

    def schema(self) -> str:
        table_dir = self.options["path"]
        latest = _latest_version(table_dir)
        if latest is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
        return _manifest(table_dir, latest)["schema"]

    def streamReader(self, schema) -> _TxAppendTailReader:
        return _TxAppendTailReader(self.options["path"], [f.name for f in schema.fields])
