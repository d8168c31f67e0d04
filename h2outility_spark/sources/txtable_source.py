"""Custom PySpark DataSource (Spark 4 Python DataSource API): stream a
``storage_tx.TxTable``'s append tail as a Structured Streaming source.

Offsets are TABLE VERSIONS — the manifest log IS the write-ahead log, so
the source needs no extra bookkeeping: each micro-batch emits the rows of
the data files ADDED by versions ``(last_seen, latest]``. Replays are
exact (``readBetweenOffsets`` re-reads the same immutable files), giving
end-to-end exactly-once into any checkpointed sink.

Contract: APPEND-ONLY tables. ``append`` versions emit their added files'
rows; ``compact`` versions emit nothing (pure rewrites of already-emitted
rows — the file diff is ignored by op, which is why compaction stays safe
to run under a live tail reader); any other op (merge/overwrite/restore)
raises, because rewritten files would re-emit old rows. This matches the
Kafka-ish ingest shape the table plays in pipelines; the batch
``TxTable.changes()`` feed covers the general case.

Driver-side reader (``SimpleDataSourceStreamReader``): rows are read with
pyarrow on the driver, the documented trade of the simple API for modest
per-batch volumes; at high throughput the same offset scheme moves into a
partition-planning ``DataSourceStreamReader`` (one partition per added
file).

Usage::

    spark.dataSource.register(TxTableStreamDataSource)
    stream = spark.readStream.format("txtable_stream").option("path", dir).load()
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from h2outility_spark.storage_tx import TxTable, _MANIFEST_DIR


def _latest_version(table_dir: str) -> int | None:
    versions = [
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table_dir, _MANIFEST_DIR, "v*.json"))
    ]
    return max(versions) if versions else None


def _manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(table_dir, _MANIFEST_DIR, f"v{version:08d}.json")) as f:
        return TxTable._normalize_manifest(json.load(f))


def _file_paths(table_dir: str, m: dict) -> set[str]:
    out = {e["path"] for e in m["_inline_files"]}
    for d in m["segments"]:
        with open(os.path.join(table_dir, _MANIFEST_DIR, d["name"])) as f:
            out.update(e["path"] for e in json.load(f)["entries"])
    return out


class _TxAppendTailReader(SimpleDataSourceStreamReader):
    def __init__(self, table_dir: str, field_names: list[str]):
        self.table_dir = table_dir
        self.field_names = field_names

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _rows_of_version(self, v: int) -> list[tuple]:
        import pyarrow.parquet as pq

        m = _manifest(self.table_dir, v)
        if m["op"] == "compact":
            return []
        if m["op"] != "append":
            raise ValueError(
                f"txtable_stream is an append-only tail (version {v} is "
                f"op={m['op']!r}); use TxTable.changes() for the general feed"
            )
        prev = _file_paths(self.table_dir, _manifest(self.table_dir, v - 1)) if v > 0 else set()
        added = sorted(_file_paths(self.table_dir, m) - prev)
        rows: list[tuple] = []
        for rel in added:
            tbl = pq.read_table(os.path.join(self.table_dir, rel), columns=self.field_names)
            cols = [tbl.column(n).to_pylist() for n in self.field_names]
            rows.extend(zip(*cols))
        return rows

    def _rows_between(self, after: int, upto: int) -> list[tuple]:
        rows: list[tuple] = []
        for v in range(after + 1, upto + 1):
            rows.extend(self._rows_of_version(v))
        return rows

    def read(self, start: dict):
        latest = _latest_version(self.table_dir)
        if latest is None or latest <= start["version"]:
            return iter([]), start
        return iter(self._rows_between(start["version"], latest)), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows_between(start["version"], end["version"]))


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

    def simpleStreamReader(self, schema) -> _TxAppendTailReader:
        return _TxAppendTailReader(self.options["path"], [f.name for f in schema.fields])
