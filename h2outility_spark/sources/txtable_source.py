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
Kafka-ish ingest shape the table plays in pipelines; the general case —
merge/delete versions emitting row-level changes — is the CDC source
(``TxTableCdcDataSource`` below, the streaming form of the batch
``TxTable.changes()`` feed).

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
    The diff/vacuum/bootstrap mechanics are shared with the CDC source
    (:func:`_changed_files`); this wrapper only adds the op guard and
    keeps the +1 side (an append never removes files, so the symmetric
    diff IS the added set).

    Bootstrap FIRST, then guard: a fresh tail reader whose start version
    was vacuumed reads the oldest retained version as a full SNAPSHOT, and
    a snapshot is op-agnostic — the merges/overwrites that produced it are
    history the tail never replays, so the append-only guard applies only
    to versions read as incremental diffs."""
    if allow_bootstrap and v > 0:
        try:
            _manifest(table_dir, v - 1)
        except FileNotFoundError:
            # Parent vacuumed + fresh reader: the snapshot-bootstrap branch
            # of _changed_files (all +1); v's own op is irrelevant here.
            return [p for p, sign in _changed_files(table_dir, v, True) if sign == 1]
    try:
        op = _manifest(table_dir, v)["op"]
    except FileNotFoundError:
        op = None  # let _changed_files raise the canonical vacuum error
    if op not in (None, "append", "compact"):
        raise ValueError(
            f"txtable_stream is an append-only tail (version {v} is "
            f"op={op!r}); use TxTable.changes() / the txtable_cdc source "
            "for the general feed"
        )
    return [p for p, sign in _changed_files(table_dir, v, allow_bootstrap) if sign == 1]


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


# ---------------------------------------------------------------------------
# CDC form: signed change rows for EVERY op (merge/delete/restore included)
# ---------------------------------------------------------------------------
#
# The append tail above deliberately raises on non-append versions; this
# source is the general change feed — the streaming form of the batch
# ``TxTable.changes()`` (reference I2 watermark-append upgraded to
# lakehouse CDC). Per version it emits the rows of files ADDED with
# ``_sign`` +1 and files REMOVED with ``_sign`` −1 (files shared by both
# manifests are immutable, hence changeless, and are never read). Rows
# merely REWRITTEN into new files (compaction survivors, copy-on-write
# carriage) appear once with each sign and cancel in the downstream
# multiset sum — ``net_changes`` turns the signed rows into the Delta-CDF
# '_change_type' shape with ONE combiner-friendly groupBy over just the
# changed rows, the same cancellation ``changes()`` runs as exceptAll.
# Keeping the cancellation OUT of the source keeps the source
# embarrassingly parallel (one immutable parquet file per task, no
# executor-side state) and lets Catalyst plan the shuffle; 'compact'
# versions are skipped entirely by op (zero read, zero shuffle).
#
# Offsets, vacuum discipline and snapshot bootstrap are identical to the
# tail reader: versions are the WAL, a fresh reader whose start version
# was vacuumed bootstraps from the oldest retained snapshot (all +1 — a
# replica built from the feed alone starts with the full state), a
# checkpointed reader refuses the same branch to protect exactly-once
# sinks.


def _changed_files(
    table_dir: str, v: int, allow_bootstrap: bool = False
) -> list[tuple[str, int]]:
    """(relative path, sign) for version ``v``: +1 = added, −1 = removed.
    THE shared diff core for both stream sources (the tail keeps the +1
    side behind an op guard): O(changed segments) — unchanged segments
    carry over BY NAME and are never opened — with one vacuum/bootstrap
    contract for both.

    If version ``v``'s PARENT manifest was vacuumed away, behavior
    depends on ``allow_bootstrap``: a FRESH reader (offset minted by
    ``initialOffset`` this run, which sets the bootstrap flag) emits
    ``v``'s FULL file set as the snapshot bootstrap — it has emitted
    nothing yet, so the snapshot is exactly its backlog. A CHECKPOINTED
    reader resuming mid-stream must NOT take that branch: it already
    emitted every row up to its offset, and the full snapshot would
    re-emit the whole table as duplicates into an exactly-once sink —
    it gets the fresh-checkpoint ValueError instead."""
    try:
        m = _manifest(table_dir, v)
    except FileNotFoundError:
        raise ValueError(
            f"stream offset points at version {v}, which vacuum has "
            f"removed (oldest retained: {min(_versions(table_dir), default='none')}); "
            "restart the stream from a fresh checkpoint"
        ) from None
    try:
        prev_m = _manifest(table_dir, v - 1) if v > 0 else None
    except FileNotFoundError:
        if allow_bootstrap:
            return [(p, 1) for p in sorted(_file_paths(table_dir, m))]
        raise ValueError(
            f"version {v}'s parent manifest was vacuumed away beneath a "
            "checkpointed reader; emitting the snapshot here would re-send "
            "already-delivered rows as duplicates — restart the stream "
            "from a fresh checkpoint"
        ) from None
    if m["op"] == "compact":
        return []  # pure rewrite: provably no net change, skip by op
    if prev_m is None:
        return [(p, 1) for p in sorted(_file_paths(table_dir, m))]
    prev_segs = {d["name"] for d in prev_m["segments"]}
    cur_segs = {d["name"] for d in m["segments"]}
    cur_cand: set[str] = {e["path"] for e in m["_inline_files"]}
    for name in cur_segs - prev_segs:
        cur_cand.update(e["path"] for e in _segment_entries(table_dir, name))
    prev_cand: set[str] = {e["path"] for e in prev_m["_inline_files"]}
    for name in prev_segs - cur_segs:
        prev_cand.update(e["path"] for e in _segment_entries(table_dir, name))
    return [(p, 1) for p in sorted(cur_cand - prev_cand)] + [
        (p, -1) for p in sorted(prev_cand - cur_cand)
    ]


def _ddl_column_names(ddl: str) -> set[str]:
    """Top-level column names of a DDL string ("`a` int, `b` array<int>")
    without a SparkSession: split on depth-0 commas (angle brackets track
    nested generics), take each entry's first token, strip backticks."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return {p.strip().split()[0].strip("`") for p in parts if p.strip()}


class _TxSignedFilePartition(InputPartition):
    def __init__(self, abs_path: str, version: int, sign: int):
        self.abs_path = abs_path
        self.version = version
        self.sign = sign


class _TxCdcReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, data_field_names: list[str]):
        self.table_dir = table_dir
        self.data_field_names = data_field_names

    def initialOffset(self) -> dict:
        vs = _versions(self.table_dir)
        return {"version": (vs[0] - 1) if vs else -1, "bootstrap": True}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.table_dir)
        return {"version": -1 if latest is None else latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            fresh = bool(start.get("bootstrap")) and v == start["version"] + 1
            parts.extend(
                _TxSignedFilePartition(os.path.join(self.table_dir, rel), v, sign)
                for rel, sign in _changed_files(self.table_dir, v, allow_bootstrap=fresh)
            )
        return parts

    def read(self, partition: _TxSignedFilePartition) -> Iterator[tuple]:
        # Runs on EXECUTORS: one immutable parquet file per task. Columns a
        # file predates (add-column schema evolution) surface as nulls,
        # matching snapshot()/changes() semantics for old files.
        import pyarrow.parquet as pq

        present = set(pq.read_schema(partition.abs_path).names)
        want = [c for c in self.data_field_names if c in present]
        tbl = pq.read_table(partition.abs_path, columns=want)
        n = tbl.num_rows
        by_name = {c: tbl.column(c).to_pylist() for c in want}
        cols = [by_name.get(c, [None] * n) for c in self.data_field_names]
        meta = ([partition.version] * n, [partition.sign] * n)
        return iter(zip(*cols, *meta))

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; files are immutable


class TxTableCdcDataSource(DataSource):
    """``format("txtable_cdc")`` — signed change-row stream; see the CDC
    section comment above. Schema = destination table schema plus
    ``_commit_version bigint`` (the version that produced the row) and
    ``_sign int`` (+1 added / −1 removed)."""

    @classmethod
    def name(cls) -> str:
        return "txtable_cdc"

    def schema(self) -> str:
        table_dir = self.options["path"]
        latest = _latest_version(table_dir)
        if latest is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
        data_schema = _manifest(table_dir, latest)["schema"]
        # The metadata columns are reserved: a table that already owns one
        # would silently have it shadowed by the per-partition metadata in
        # read() AND excluded from net_changes' groupBy — corrupt feed, so
        # refuse loudly at stream start instead. Column names are parsed
        # from the DDL by hand: schema() runs in the data-source helper
        # process where no SparkSession exists for StructType.fromDDL.
        clash = _ddl_column_names(data_schema) & {"_commit_version", "_sign"}
        if clash:
            raise ValueError(
                f"txtable_cdc reserves column names {sorted(clash)}; rename "
                "the table column(s) before streaming the change feed"
            )
        return data_schema + ", _commit_version bigint, _sign int"

    def streamReader(self, schema) -> _TxCdcReader:
        data = [f.name for f in schema.fields if f.name not in ("_commit_version", "_sign")]
        return _TxCdcReader(self.options["path"], data)


def net_changes(signed):
    """Collapse signed change rows into the Delta-CDF shape: data columns
    + ``_change_type`` ('insert' | 'delete'), with exact multiset
    multiplicities. The multiset sum TELESCOPES across versions — net over
    rows spanning (v_a, v_b] equals ``TxTable.changes(v_a, v_b)`` — so a
    micro-batch covering several commits collapses to the end-to-end
    delta before any downstream work (an upsert immediately overwritten
    within the batch costs nothing). One hash aggregate over only the
    changed rows (map-side combine does the cancellation early); rewritten
    rows cancel to net 0 and vanish."""
    from pyspark.sql import functions as F

    data_cols = [c for c in signed.columns if c not in ("_commit_version", "_sign")]
    counts = (
        signed.groupBy(*data_cols)
        .agg(F.sum("_sign").alias("_net"))
        .filter(F.col("_net") != 0)
    )
    # |net| copies per row keeps exact multiset semantics (duplicates in
    # the table stay duplicates in the feed); |net| is almost always 1.
    rep = counts.withColumn("_i", F.explode(F.sequence(F.lit(1), F.abs(F.col("_net")))))
    return rep.select(
        *data_cols,
        F.when(F.col("_net") > 0, F.lit("insert")).otherwise(F.lit("delete")).alias(
            "_change_type"
        ),
    )
