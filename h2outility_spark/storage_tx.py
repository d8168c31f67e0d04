"""Snapshot-isolated transactional tables on plain parquet — manifest
commits, copy-on-write MERGE, time travel, rollback.

Reference analog: the RDBMS commit/rollback the reference leans on for its
edit sessions (``odmservices/edit_service.py:371-373`` in /root/reference —
``self._session.commit()`` / ``rollback()``) and the exists-check save
(M1/M2, W8/W9 in SURVEY.md §2). This container has no Delta/Iceberg jars,
so this module implements the same guarantees with the primitives those
formats are built from:

  * **Immutable data files.** Writers only ever ADD parquet files under
    ``data/``; nothing is modified in place. A data file is invisible until
    a manifest references it, so readers never observe partial writes.
  * **Manifest = snapshot.** ``_manifests/v{N}.json`` names the exact data
    files (with row counts and per-file key min/max) that make up version
    N. Reading a table = reading one manifest, then only its files.
  * **Segmented file lists (Iceberg's manifest-list trick).** The file
    list itself lives in content-addressed SEGMENT files
    (``_manifests/seg-{sha}.json``, up to ``SEGMENT_TARGET`` entries
    each); the top-level manifest holds only segment descriptors
    (name + n_files + per-key min/max). A commit writes the segments it
    CHANGED plus one small manifest — unchanged segments carry over by
    name. At 100 TB / ~1M files a one-file append serializes one tiny
    segment and a descriptor list, not a 100 MB file inventory, and
    ``history()`` never touches segments at all. Segment-level min/max
    lets merge_upsert skip reading descriptors' segments entirely when
    their key range can't overlap the updates.
  * **Atomic commit = one file creation.** A writer stages its manifest to
    a temp name and publishes with ``os.link(tmp, vN.json)`` — on POSIX a
    hard link to an existing name fails with EEXIST, so exactly ONE of two
    racing writers wins version N; the loser re-reads the new snapshot and
    retries (optimistic concurrency). On an object store the same step is
    a conditional PUT (S3 ``If-None-Match``) or a commit service; the
    protocol is unchanged.
  * **MERGE is copy-on-write with file pruning.** Only parent files whose
    [min, max] range of the merge key overlaps the updates are rewritten;
    the rest carry over by reference. At 100 TB with range-clustered files
    (storage.write_sized) an upsert touching one day rewrites one day's
    files, not the table.
  * **Time travel / rollback.** Every version stays readable;
    ``restore(v)`` commits a NEW version whose file list equals v's — an
    audit-preserving rollback (the reference's W9 discard-working-copy,
    but with history).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

#: Max file entries per segment file. At ~300 bytes/entry a full segment is
#: ~300 KB — large enough that a 1M-file table is ~1000 segments (a ~150 KB
#: descriptor list in the manifest), small enough that rewriting one is cheap.
SEGMENT_TARGET = 1000
#: A segment with fewer entries than this counts as "small" for compaction.
_COMPACT_SMALL = SEGMENT_TARGET // 4
#: Repack small segments once this many accumulate (amortizes many tiny
#: appends into O(changed)-per-commit writes overall).
_COMPACT_TRIGGER = 16


def _norm_stat(v):
    """JSON-serializable, ORDER-PRESERVING form of a min/max statistic.
    Datetimes/dates become ISO strings (space separator, zero-padded), whose
    lexicographic order equals chronological order, so range-pruning
    comparisons stay correct across the JSON round-trip."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer was about to."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:08d}.json")


def _file_stats(path: str, key_cols: list[str]) -> dict:
    """Row count + per-key min/max from the parquet footer (metadata-only
    read — no data IO). min/max power file pruning in merge_upsert."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    stats: dict = {"rows": md.num_rows, "bytes": os.path.getsize(path), "min": {}, "max": {}}
    name_to_idx = {md.schema.column(i).name: i for i in range(len(md.schema))}
    for key in key_cols:
        idx = name_to_idx.get(key)
        if idx is None:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            stats["min"][key] = _norm_stat(min(mins))
            stats["max"][key] = _norm_stat(max(maxs))
    return stats


class TxTable:
    """A transactional parquet table rooted at ``table_dir``.

    ``key_cols`` are the logical-row-identity columns (the merge keys);
    their per-file min/max is recorded at write time for pruning.
    """

    def __init__(self, spark: SparkSession, table_dir: str, key_cols: list[str]):
        self.spark = spark
        self.table_dir = table_dir
        self.key_cols = list(key_cols)
        os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(table_dir, _DATA_DIR), exist_ok=True)

    # -- snapshot state ----------------------------------------------------

    def latest_version(self) -> int | None:
        versions = [
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self.table_dir, _MANIFEST_DIR, "v*.json"))
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> dict | None:
        v = self.latest_version() if version is None else version
        if v is None:
            return None
        with open(_manifest_path(self.table_dir, v)) as f:
            return self._normalize_manifest(json.load(f))

    @staticmethod
    def _normalize_manifest(m: dict) -> dict:
        """Read-compatibility for pre-segmentation manifests that carried
        the full entry list inline under ``files``: surface them through
        the segment interface (``_inline_files``) so snapshot/files/
        restore/vacuum work unchanged on an existing table. New commits
        always write the segmented format."""
        if "segments" not in m:
            if "files" not in m:
                raise ValueError(
                    f"unsupported manifest format (neither 'segments' nor 'files'): keys={sorted(m)}"
                )
            m = dict(m)
            m["_inline_files"] = m.pop("files")
            m["segments"] = []
            m.setdefault("n_files", len(m["_inline_files"]))
        else:
            m.setdefault("_inline_files", [])
            m.setdefault("n_files", sum(d.get("n_files", 0) for d in m["segments"]))
        return m

    def files(self, version: int | None = None) -> list[dict]:
        """The materialized file-entry list of ``version`` (default:
        latest) — reads the manifest's segments."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        return self._files_of(m)

    def _files_of(self, m: dict) -> list[dict]:
        out: list[dict] = list(m.get("_inline_files", []))
        for d in m["segments"]:
            out.extend(self._read_segment(d["name"]))
        return out

    def _segments_of(self, m: dict) -> list[dict]:
        """Parent segments for a new commit. An old-format parent's inline
        entries are materialized into real segment files here (idempotent:
        content-addressed), so the upgrade happens on the first write and
        every later commit carries them by name."""
        segs = list(m["segments"])
        if m.get("_inline_files"):
            segs += self._write_segments(m["_inline_files"])
        return segs

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest). Empty manifests
        (or a table with no commits) read as an empty frame if a schema was
        ever recorded; otherwise raise."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        paths = [os.path.join(self.table_dir, f["path"]) for f in self._files_of(m)]
        if not paths:
            return self.spark.createDataFrame([], m["schema"])
        return self.spark.read.schema(m["schema"]).parquet(*paths)

    def scan(
        self, key: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Manifest-pruned range scan: read ONLY the data files whose
        recorded [min, max] for ``key`` overlaps [lo, hi], then apply the
        residual filter. Spark's own planner prunes row groups from
        footers, but it must still LIST and OPEN every file to get there —
        at ~1M files the listing alone dominates. Here the manifest
        answers the file-level question without touching storage: whole
        segments are skipped by their aggregated stats, then files by
        theirs (the same two-level prune merge_upsert uses). Files without
        recorded stats for ``key`` are read (cannot prove them skippable).
        Bounds are inclusive; either may be None for half-open ranges."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        nlo, nhi = _norm_stat(lo), _norm_stat(hi)

        def _misses(smin, smax) -> bool:
            if smin is None:
                return False
            return (nhi is not None and smin > nhi) or (nlo is not None and smax < nlo)

        paths: list[str] = []
        for entry in m["_inline_files"]:
            if not _misses(entry["min"].get(key), entry["max"].get(key)):
                paths.append(entry["path"])
        for d in m["segments"]:
            if _misses(d["min"].get(key), d["max"].get(key)):
                continue  # whole segment skipped — never read
            for entry in self._read_segment(d["name"]):
                if not _misses(entry["min"].get(key), entry["max"].get(key)):
                    paths.append(entry["path"])
        if not paths:
            df = self.spark.createDataFrame([], m["schema"])
        else:
            df = self.spark.read.schema(m["schema"]).parquet(
                *[os.path.join(self.table_dir, p) for p in paths]
            )
        from pyspark.sql import functions as F

        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(key) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(key) <= F.lit(hi))
        return df.filter(cond)

    def history(self) -> list[dict]:
        """Commit log. Reads only top-level manifests — O(versions), never
        touches segment files (the at-scale requirement)."""
        out = []
        for p in sorted(glob.glob(os.path.join(self.table_dir, _MANIFEST_DIR, "v*.json"))):
            with open(p) as f:
                m = self._normalize_manifest(json.load(f))
            out.append(
                {k: m[k] for k in ("version", "op", "parent")}
                | {"n_files": m["n_files"], "committed_at": m.get("committed_at")}
            )
        return out

    def describe(self, version: int | None = None) -> dict:
        """Table health snapshot for ops dashboards / compaction policy:
        rows, files, bytes, small-file count and fraction, bytes/row
        density, version count and latest op — all from manifests and
        segment metadata, zero data IO. ``small`` uses the median file's
        rows/4 as the cutoff, mirroring compact_files' default shape."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        entries = self._files_of(m)
        rows = sum(e["rows"] for e in entries)
        nbytes = sum(e.get("bytes", 0) for e in entries)
        sizes = sorted(e["rows"] for e in entries)
        median_rows = sizes[len(sizes) // 2] if sizes else 0
        small = sum(1 for e in entries if e["rows"] < max(1, median_rows // 4))
        return {
            "version": m["version"],
            "op": m["op"],
            "n_versions": len(self.history()),
            "n_files": len(entries),
            "n_segments": len(m["segments"]),
            "rows": rows,
            "bytes": nbytes,
            "bytes_per_row": round(nbytes / rows, 2) if rows and nbytes else None,
            "n_small_files": small,
            "small_file_fraction": round(small / len(entries), 4) if entries else 0.0,
        }

    def version_as_of(self, ts: float) -> int:
        """The latest version committed at or before unix-seconds ``ts``
        (timestamp time travel). Pre-timestamp manifests (no
        ``committed_at``) count as arbitrarily old. Raises if the table's
        first commit is younger than ``ts``."""
        best = None
        for h in self.history():
            at = h["committed_at"] or 0.0
            if at <= ts:
                best = h["version"]
        if best is None:
            raise FileNotFoundError(f"no version committed at or before {ts}")
        return best

    def snapshot_as_of(self, ts: float) -> DataFrame:
        """The table as it was at unix-seconds ``ts`` — reproducing the
        exact training-data snapshot a past job read is a one-liner."""
        return self.snapshot(version=self.version_as_of(ts))

    # -- segment layer -----------------------------------------------------

    def _segment_path(self, name: str) -> str:
        return os.path.join(self.table_dir, _MANIFEST_DIR, name)

    def _read_segment(self, name: str) -> list[dict]:
        with open(self._segment_path(name)) as f:
            return json.load(f)["entries"]

    def _write_segments(self, entries: list[dict]) -> list[dict]:
        """Pack file entries into content-addressed segment files
        (``seg-{sha}.json``); return their descriptors. Content addressing
        makes the write idempotent — two writers packing identical entries
        produce one file — and means a carried-over segment is never
        rewritten, only referenced by name."""
        descs = []
        for i in range(0, len(entries), SEGMENT_TARGET):
            chunk = entries[i : i + SEGMENT_TARGET]
            payload = json.dumps({"entries": chunk}, sort_keys=True)
            name = f"seg-{hashlib.sha256(payload.encode()).hexdigest()[:24]}.json"
            path = self._segment_path(name)
            if not os.path.exists(path):
                tmp = f"{path}.tmp-{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    f.write(payload)
                os.replace(tmp, path)
            else:
                # Reusing an orphaned segment (lost race / vacuumed
                # version): refresh mtime so vacuum's retention window
                # re-protects it until this writer's commit publishes a
                # manifest that references it — otherwise a concurrent
                # vacuum could reclaim it between here and _commit and
                # the commit would publish a corrupt snapshot.
                os.utime(path, None)
            descs.append(self._describe(name, chunk))
        return descs

    def _describe(self, name: str, chunk: list[dict]) -> dict:
        """Segment descriptor: name + n_files + per-key min/max aggregated
        over the chunk's file stats. A key appears only when EVERY file in
        the chunk has stats for it, so absence means 'cannot prune'."""
        d: dict = {"name": name, "n_files": len(chunk), "min": {}, "max": {}}
        for k in self.key_cols:
            mins = [e["min"][k] for e in chunk if k in e.get("min", {})]
            maxs = [e["max"][k] for e in chunk if k in e.get("max", {})]
            if mins and len(mins) == len(chunk):
                d["min"][k] = min(mins)
                d["max"][k] = max(maxs)
        return d

    def _compact(self, segments: list[dict]) -> list[dict]:
        """Bound manifest growth under many tiny commits: once
        ``_COMPACT_TRIGGER`` small segments accumulate, load and repack
        just those into full segments. Amortized cost per commit stays
        O(changed files); big segments are never touched."""
        small = [d for d in segments if d["n_files"] < _COMPACT_SMALL]
        if len(small) < _COMPACT_TRIGGER:
            return segments
        keep = [d for d in segments if d["n_files"] >= _COMPACT_SMALL]
        entries: list[dict] = []
        for d in small:
            entries.extend(self._read_segment(d["name"]))
        return keep + self._write_segments(entries)

    # -- write path --------------------------------------------------------

    def _stage_files(self, df: DataFrame) -> list[dict]:
        """Write ``df`` as immutable data files; return manifest entries.

        Spark writes to a scratch dir; each part file is MOVED (same-fs
        rename) into ``data/`` under a fresh uuid name. Files in data/ are
        unreferenced until a manifest commit publishes them, so a crash
        mid-stage leaves garbage (reclaimed by vacuum), never corruption.
        """
        scratch = tempfile.mkdtemp(prefix="txstage-", dir=self.table_dir)
        # INT96 timestamps carry no column statistics; micros do. The
        # manifest's min/max pruning depends on them. The conf is restored
        # after the staged write so a session that deliberately set a
        # different value keeps it for unrelated writes.
        conf_key = "spark.sql.parquet.outputTimestampType"
        prev = self.spark.conf.get(conf_key, None)
        try:
            self.spark.conf.set(conf_key, "TIMESTAMP_MICROS")
            df.write.mode("overwrite").parquet(os.path.join(scratch, "out"))
            entries = []
            for part in sorted(glob.glob(os.path.join(scratch, "out", "*.parquet"))):
                name = f"{uuid.uuid4().hex}.parquet"
                dest = os.path.join(self.table_dir, _DATA_DIR, name)
                os.rename(part, dest)
                st = _file_stats(dest, self.key_cols)
                if st["rows"] == 0:
                    os.remove(dest)
                    continue
                entries.append({"path": f"{_DATA_DIR}/{name}", **st})
            return entries
        finally:
            if prev is None:
                self.spark.conf.unset(conf_key)
            else:
                self.spark.conf.set(conf_key, prev)
            shutil.rmtree(scratch, ignore_errors=True)

    def _commit(self, segments: list[dict], schema: str, op: str, parent: int | None) -> int:
        """Publish a new manifest atomically as ``parent + 1``; raises
        CommitConflict if that version already exists. ``parent`` must be
        the version the WRITER BASED ITS CHANGE ON (not re-resolved here):
        if a concurrent writer committed after this writer read its
        snapshot, the version slot is taken and the conflict surfaces —
        re-resolving the parent at commit time would silently drop the
        concurrent commit's files from the new version (lost update). The
        manifest holds only segment DESCRIPTORS — its size is O(segments),
        and a commit's total write payload is the changed segments plus
        this file, never the whole file inventory."""
        import time as _time

        version = 0 if parent is None else parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "schema": schema,
            "committed_at": _time.time(),
            "n_files": sum(d["n_files"] for d in segments),
            "segments": segments,
        }
        tmp = os.path.join(self.table_dir, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, _manifest_path(self.table_dir, version))  # atomic check-and-put
        except FileExistsError as e:
            raise CommitConflict(f"version {version} was committed concurrently") from e
        finally:
            os.remove(tmp)
        return version

    @staticmethod
    def _ddl(df: DataFrame) -> str:
        return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)

    def append(self, df: DataFrame, _retries: int = 3) -> int:
        new = self._write_segments(self._stage_files(df))
        for _ in range(_retries):
            m = self.manifest()
            base = self._segments_of(m) if m else []
            try:
                return self._commit(
                    self._compact(base + new), self._ddl(df), "append",
                    m["version"] if m else None,
                )
            except CommitConflict:
                continue  # new snapshot appeared; re-read parent segments and retry
        raise CommitConflict(f"append lost the commit race {_retries} times")

    def overwrite(self, df: DataFrame) -> int:
        new = self._write_segments(self._stage_files(df))
        while True:
            try:
                return self._commit(new, self._ddl(df), "overwrite", self.latest_version())
            except CommitConflict:
                continue  # overwrite replaces whatever won; just take the next version

    def _prune_split(self, m: dict, bounds: dict) -> tuple[list, list, list]:
        """Split the parent's file inventory by per-key [min, max] bounds:
        (untouched segments carried by NAME — never read, carried file
        entries, overlapping file entries that must be read and rewritten).
        A file/segment is prunable when ANY key axis is provably disjoint
        from the bounds; an all-null bound set prunes everything (null
        keys never match any recorded range)."""
        all_null = all(lo is None for lo, _ in bounds.values())

        def _misses(stat_min: dict, stat_max: dict) -> bool:
            if all_null:
                return True
            for k, (lo, hi) in bounds.items():
                if lo is None:
                    continue  # all-null keys on this axis: can't prune by it
                smin, smax = stat_min.get(k), stat_max.get(k)
                if smin is not None and (smax < lo or smin > hi):
                    return True
            return False

        untouched_segs, carried_entries, overlapping = [], [], []
        for entry in m["_inline_files"]:  # old-format parent: per-entry prune
            if _misses(entry["min"], entry["max"]):
                carried_entries.append(entry)
            else:
                overlapping.append(entry)
        for d in m["segments"]:
            if _misses(d["min"], d["max"]):
                untouched_segs.append(d)  # carried by name — segment never read
                continue
            for entry in self._read_segment(d["name"]):
                if _misses(entry["min"], entry["max"]):
                    carried_entries.append(entry)
                else:
                    overlapping.append(entry)
        return untouched_segs, carried_entries, overlapping

    def merge_upsert(self, updates: DataFrame, _retries: int = 3, evolve_schema: bool = False) -> int:
        """MERGE (upsert on ``key_cols``): rows matching an update's key are
        replaced; others are kept; unmatched updates are inserted.

        Copy-on-write with TWO pruning levels: whole segments whose key
        range misses the updates carry over by NAME (their entry lists are
        never even read); inside overlapping segments, files are split by
        their recorded key range into untouched (repacked by reference —
        zero data IO) and overlapping (read, matching keys anti-joined
        out, survivors rewritten together with the updates). Pruning is
        MULTI-AXIS: a file/segment is skipped when ANY merge key's
        recorded [min, max] is disjoint from the updates' bounds — with
        range-clustered files only the first key bites, but after
        ``compact_files(zorder=True)`` every axis is tight and the rewrite
        set shrinks to the intersection box.

        ``evolve_schema=True`` enables ADD-COLUMN evolution (Delta's
        mergeSchema): update columns unknown to the table are appended to
        the table schema, and columns the updates lack are null-filled.
        Carried-over files are never rewritten — parquet reads with the
        evolved schema surface the new columns as null for old files, so
        evolution is a metadata change plus the normal copy-on-write.
        Default (False) keeps the strict contract: unknown update columns
        are dropped by the conform-select and missing ones raise.
        """
        m = self.manifest()
        if m is None:
            new = self._write_segments(self._stage_files(updates))
            return self._commit(new, self._ddl(updates), "merge", None)

        # Conform updates to the TABLE schema (column order + types): the
        # committed manifest keeps the table's schema, and carried-over
        # files were written with it — an int-literal update against a
        # bigint column must cast, not fork the schema.
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        target = StructType.fromDDL(m["schema"])
        if evolve_schema:
            known = {f.name for f in target.fields}
            target = StructType(
                list(target.fields)
                + [f for f in updates.schema.fields if f.name not in known]
            )
            updates = updates.select(
                [
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in updates.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in target.fields
                ]
            )
        else:
            updates = updates.select([F.col(f.name).cast(f.dataType) for f in target.fields])
        schema_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in target.fields)

        # Per-key update bounds: a file/segment is prunable if ANY key axis
        # is provably disjoint. With range-clustered files only the first
        # key prunes (the others span everything), but after
        # compact_files(zorder=True) every axis is tight, so multi-axis
        # checks turn an O(axis-slab) rewrite into O(intersection-box).
        row = updates.select(
            F.count(F.lit(1)).alias("n_updates"),
            *[F.min(k).alias(f"lo_{k}") for k in self.key_cols],
            *[F.max(k).alias(f"hi_{k}") for k in self.key_cols],
        ).collect()[0]
        if row["n_updates"] == 0:
            if schema_ddl != m["schema"]:
                # Zero rows but a REAL schema change (evolve_schema added
                # columns): commit the evolution as a metadata-only version
                # carrying the parent's segments — the standard way to
                # evolve a table with an empty mergeSchema batch. Conflicts
                # surface to the caller like any other merge conflict.
                return self._commit(self._segments_of(m), schema_ddl, "merge", m["version"])
            # No-op merge: publishing a version that changes nothing would
            # churn history on every empty streaming micro-batch (and make
            # vacuum/time-travel bookkeeping noisier). The current version
            # already IS the post-merge state.
            return m["version"]
        bounds = {
            k: (_norm_stat(row[f"lo_{k}"]), _norm_stat(row[f"hi_{k}"])) for k in self.key_cols
        }
        untouched_segs, carried_entries, overlapping = self._prune_split(m, bounds)

        if overlapping:
            paths = [os.path.join(self.table_dir, e["path"]) for e in overlapping]
            # Read with the (possibly evolved) schema: parquet fills columns
            # absent from a file with nulls, so old files conform for free.
            current = self.spark.read.schema(schema_ddl).parquet(*paths)
            survivors = current.join(
                updates.select(*self.key_cols).distinct(), self.key_cols, "left_anti"
            )
            merged = survivors.unionByName(updates)
        else:
            merged = updates
        new = self._write_segments(carried_entries + self._stage_files(merged))

        for _ in range(_retries):
            try:
                return self._commit(untouched_segs + new, schema_ddl, "merge", m["version"])
            except CommitConflict:
                # A real lakehouse revalidates that the concurrent commit
                # didn't touch the overlapping files before retrying; here
                # we surface the conflict to the caller instead of silently
                # re-merging against a moved snapshot.
                raise
        raise AssertionError("unreachable")

    def delete_keys(self, keys: DataFrame) -> int:
        """DELETE by key (copy-on-write): rows whose ``key_cols`` match any
        row of ``keys`` are removed; everything else is kept. The missing
        third verb next to append and merge_upsert — retention erasure,
        right-to-be-forgotten, and the tombstone half of a branch merge
        all need it.

        Same TWO-level pruning as merge_upsert: whole segments whose key
        range misses the delete keys carry over by NAME; inside
        overlapping segments, files are split by recorded key range into
        carried-by-reference and overlapping (read, matching keys
        anti-joined out, survivors rewritten). A file fully emptied by the
        delete is simply dropped (zero-row staged files are never
        published). Deleted rows surface as 'delete' rows in ``changes()``
        — the CDF feed ``merge_from_branch(propagate_deletes=True)`` and
        downstream replicas consume."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        # Conform key types to the TABLE schema (an int-literal key frame
        # against a bigint key column must cast, not miss every row).
        target = {f.name: f.dataType for f in StructType.fromDDL(m["schema"]).fields}
        keys = keys.select(
            [F.col(k).cast(target[k]).alias(k) for k in self.key_cols]
        ).distinct()
        row = keys.select(
            F.count(F.lit(1)).alias("n_keys"),
            *[F.min(k).alias(f"lo_{k}") for k in self.key_cols],
            *[F.max(k).alias(f"hi_{k}") for k in self.key_cols],
        ).collect()[0]
        if row["n_keys"] == 0:
            return m["version"]  # no-op: don't churn history
        bounds = {
            k: (_norm_stat(row[f"lo_{k}"]), _norm_stat(row[f"hi_{k}"])) for k in self.key_cols
        }
        untouched_segs, carried_entries, overlapping = self._prune_split(m, bounds)
        if not overlapping:
            # Every file's key range provably misses the delete keys: the
            # delete cannot remove a row, so committing would publish a
            # byte-identical version — the same history churn the empty-
            # keys early return avoids.
            return m["version"]
        paths = [os.path.join(self.table_dir, e["path"]) for e in overlapping]
        current = self.spark.read.schema(m["schema"]).parquet(*paths)
        survivors = current.join(keys, self.key_cols, "left_anti")
        new = self._write_segments(carried_entries + self._stage_files(survivors))
        return self._commit(untouched_segs + new, m["schema"], "delete", m["version"])

    def restore(self, version: int) -> int:
        """Roll back BY MOVING FORWARD: commit a new version with the file
        list of ``version``. History stays intact and auditable. Segments
        carry over by name, so a restore writes one small manifest no
        matter how large the table is."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"version {version} does not exist")
        while True:
            try:
                return self._commit(
                    self._segments_of(m), m["schema"], "restore", self.latest_version()
                )
            except CommitConflict:
                continue

    def changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Row-level change feed between two versions (Delta CDF shape):
        the result carries the destination schema plus ``_change_type``
        ('insert' | 'delete'); an update appears as its delete + insert
        pair. Feed incremental consumers without re-reading the table.

        At-scale shape: the diff starts from the MANIFESTS — only files
        present in exactly one version are read (immutable files shared by
        both versions cannot contain changes), so cost is O(changed files)
        + an exceptAll shuffle over just those rows. Rows merely rewritten
        into different files (compaction, survivors of a copy-on-write
        merge) appear on both sides and cancel in the exceptAll. Both
        sides read with the DESTINATION schema, so an add-column evolution
        surfaces old rows' new columns as null exactly like the snapshots
        do."""
        m_from = self.manifest(v_from)
        m_to = self.manifest(self.latest_version() if v_to is None else v_to)
        if m_from is None or m_to is None:
            raise FileNotFoundError("both versions must exist")
        from_paths = {e["path"] for e in self._files_of(m_from)}
        to_paths = {e["path"] for e in self._files_of(m_to)}
        schema = m_to["schema"]

        from pyspark.sql import functions as F

        def _read(paths: set[str]) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.table_dir, p) for p in sorted(paths)]
            )

        only_from = _read(from_paths - to_paths)
        only_to = _read(to_paths - from_paths)
        inserted = only_to.exceptAll(only_from).withColumn("_change_type", F.lit("insert"))
        deleted = only_from.exceptAll(only_to).withColumn("_change_type", F.lit("delete"))
        return inserted.unionByName(deleted)

    def clone(self, dest_dir: str, version: int | None = None) -> "TxTable":
        """Cheap independent copy of ``version`` (default latest) at
        ``dest_dir`` — the experiment-branch primitive: fork the corpus,
        mutate the fork, leave the source untouched.

        Data files are HARD-LINKED (same filesystem; falls back to a real
        copy across devices), so the clone is O(files) metadata work, not
        O(bytes). Unlike a Delta shallow clone, the link means the clone
        stays readable even after the source vacuums the shared file: the
        inode lives until both sides drop it. Histories are independent —
        the clone starts at version 0 with op 'clone'."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed version in {self.table_dir}")
        dest = TxTable(self.spark, dest_dir, key_cols=self.key_cols)
        if dest.latest_version() is not None:
            # Fail BEFORE linking: a late commit failure would leave the
            # existing table polluted with orphaned (retention-guarded)
            # data files, and the copy fallback could overwrite its files.
            raise FileExistsError(f"{dest_dir} already holds a committed table")
        entries = self._files_of(m)
        for e in entries:
            src = os.path.join(self.table_dir, e["path"])
            dst = os.path.join(dest_dir, e["path"])
            try:
                os.link(src, dst)
            except OSError:  # cross-device or fs without hard links
                shutil.copy2(src, dst)
        segs = dest._write_segments(entries)
        dest._commit(segs, m["schema"], "clone", None)
        return dest

    # -- named branches ------------------------------------------------------
    #
    # Sugar over clone(): a branch is a clone living in the table's own
    # _branches/<name> namespace, so it is discoverable (branches()) and
    # mergeable back (merge_from_branch) — the Delta/Iceberg named-branch
    # workflow (branch, experiment, merge or discard) on the same
    # hard-link clone primitive. Branch data files are hard links, so the
    # source's vacuum/compaction cannot invalidate a branch (the inode
    # survives until both sides drop it); vacuum only scans the table's
    # own _DATA_DIR, never _branches/.

    _BRANCH_DIR = "_branches"

    @staticmethod
    def _check_branch_name(name: str) -> None:
        import re

        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name):
            raise ValueError(f"invalid branch name {name!r}")

    def branch(self, name: str, version: int | None = None) -> "TxTable":
        """Create named branch ``name`` from ``version`` (default latest).
        The branch starts at its own version 0 (op 'clone'); its post-fork
        edits are exactly ``branch_table(name).changes(0)``."""
        self._check_branch_name(name)
        return self.clone(os.path.join(self.table_dir, self._BRANCH_DIR, name), version)

    def branches(self) -> list[str]:
        d = os.path.join(self.table_dir, self._BRANCH_DIR)
        if not os.path.isdir(d):
            return []
        # A branch exists only once its clone COMMITTED a manifest: an
        # interrupted branch() leaves the bare directory skeleton
        # (TxTable.__init__ creates it before any file links), and listing
        # that phantom would hand callers a table that raises on first
        # read.
        return sorted(
            n
            for n in os.listdir(d)
            if glob.glob(os.path.join(d, n, _MANIFEST_DIR, "v*.json"))
        )

    def branch_table(self, name: str) -> "TxTable":
        self._check_branch_name(name)
        d = os.path.join(self.table_dir, self._BRANCH_DIR, name)
        if not glob.glob(os.path.join(d, _MANIFEST_DIR, "v*.json")):
            raise FileNotFoundError(f"no branch {name!r} in {self.table_dir}")
        return TxTable(self.spark, d, key_cols=self.key_cols)

    def merge_from_branch(
        self, other: "TxTable", since_version: int = 0, propagate_deletes: bool = False
    ) -> int:
        """Merge a branch's post-fork work back into this table: the
        branch's CDF since ``since_version`` (its fork point — version 0
        for a fresh branch) is reduced to its net inserted rows (an
        update's delete+insert pair nets to the insert, which carries the
        key's final value) and merge_upserted here in one commit.

        Deletes performed on the branch net to bare delete rows. By
        default they are ignored (merging an experiment must not silently
        destroy main's rows); ``propagate_deletes=True`` opts into the
        tombstone policy: keys the branch deleted WITHOUT re-inserting
        (the delete rows anti-joined against the insert keys — an updated
        key is never a tombstone) are ``delete_keys``'d here first, then
        the inserts merge. The tombstone path is TWO commits (delete,
        then merge) — each individually atomic; readers between them see
        the post-delete pre-merge state, never a torn file set."""
        from pyspark.sql import functions as F

        # The CDF plan holds two exceptAll shuffles over the changed files;
        # downstream it is consumed up to four times (the bounds collects
        # and the staged writes of delete_keys + merge_upsert). Persist it
        # so the expensive diff runs once, keeping the advertised
        # O(changes)-per-merge cost.
        net = other.changes(since_version).persist()
        try:
            inserts = net.filter(F.col("_change_type") == "insert").drop("_change_type")
            if propagate_deletes:
                tombstones = (
                    net.filter(F.col("_change_type") == "delete")
                    .select(*self.key_cols)
                    .join(
                        inserts.select(*self.key_cols).distinct(),
                        self.key_cols,
                        "left_anti",
                    )
                    .distinct()
                )
                self.delete_keys(tombstones)
            return self.merge_upsert(inserts)
        finally:
            net.unpersist()

    def resolve_from_branch(
        self,
        other: "TxTable",
        since_self: int,
        since_other: int = 0,
        prefer: str = "branch",
        propagate_deletes: bool = False,
    ) -> int:
        """THREE-WAY merge with a conflict policy — the step after
        ``branch_conflicts`` reports divergence: both this table (since
        ``since_self``, its version at fork time) and the branch (since
        ``since_other``, 0 for a fresh branch) have advanced, and their
        changed key sets may overlap.

        * ``prefer='branch'`` ("theirs"): every branch change lands,
          conflicted keys taking the branch's final state — upsert
          semantics already mean the last writer wins, so this delegates
          to :meth:`merge_from_branch` unchanged.
        * ``prefer='main'`` ("ours"): conflicted keys KEEP this table's
          current state; only the branch's NON-conflicting net changes
          apply (inserts merge_upserted, deleted-not-reinserted keys
          tombstoned when ``propagate_deletes``). The conflict set is
          computed as in :meth:`branch_conflicts` and anti-joined out of
          both legs — one CDF diff per side, one join, then the same
          two-commit-max apply path as merge_from_branch.

        ``propagate_deletes`` defaults False, the SAME default as
        :meth:`merge_from_branch` (a resolution must not silently destroy
        rows either); pass True to let branch-side deletes tombstone.

        Returns the version committed by the final apply. Cost stays
        O(changes on either side), never O(table)."""
        if prefer not in ("branch", "main"):
            raise ValueError(f"prefer must be 'branch' or 'main', got {prefer!r}")
        if prefer == "branch":
            return self.merge_from_branch(
                other, since_version=since_other, propagate_deletes=propagate_deletes
            )
        from pyspark.sql import functions as F

        # ONE CDF diff per side: the branch leg of the conflict set is
        # derived from the SAME persisted net the apply path consumes
        # (calling branch_conflicts here would re-run other.changes()),
        # and conflicts itself is persisted because delete_keys +
        # merge_upsert each consume their inputs several times (bounds
        # collects + staged writes) — without it the exceptAll shuffles
        # behind self.changes() would re-run per consumption.
        net = other.changes(since_other).persist()
        conflicts = (
            self.changes(since_self)
            .select(*self.key_cols)
            .distinct()
            .join(net.select(*self.key_cols).distinct(), self.key_cols, "semi")
            .persist()
        )
        # The DERIVED frames are also persisted: delete_keys and
        # merge_upsert each consume their input several times (conform
        # select + bounds collect + anti-join + staged write), and without
        # a persist every consumption re-runs the anti-joins over the
        # cached net/conflicts (profiled: the delete_keys call here cost
        # 26 jobs / 4.0 s vs 6 jobs / 0.5 s standalone; persisting the
        # derived key frames measured −13% min / −10% median on
        # txtable_resolve_ours, ABBA, results identical). The frames are
        # tiny (key columns of changed rows only), so the materialization
        # is bounded; both verbs complete synchronously before the
        # finally releases them. merge_from_branch deliberately does NOT
        # get the same treatment: its derived tombstones are one anti-join
        # off the already-persisted net, and the A/B there was a tie
        # (scripts/ab_branch_persist.py).
        derived: list[DataFrame] = []
        try:
            all_inserts = net.filter(F.col("_change_type") == "insert").drop(
                "_change_type"
            )
            inserts = all_inserts.join(conflicts, self.key_cols, "left_anti").persist()
            derived.append(inserts)
            if propagate_deletes:
                tombstones = (
                    net.filter(F.col("_change_type") == "delete")
                    .select(*self.key_cols)
                    .join(
                        all_inserts.select(*self.key_cols).distinct(),
                        self.key_cols,
                        "left_anti",
                    )
                    .join(conflicts, self.key_cols, "left_anti")
                    .distinct()
                    .persist()
                )
                derived.append(tombstones)
                self.delete_keys(tombstones)
            return self.merge_upsert(inserts)
        finally:
            net.unpersist()
            conflicts.unpersist()
            for f in derived:
                f.unpersist()

    def branch_conflicts(
        self, a: "TxTable", b: "TxTable", since_a: int = 0, since_b: int = 0
    ) -> DataFrame:
        """Keys TOUCHED (net-inserted or net-deleted) on BOTH branches
        since their fork points — the divergence report a three-way merge
        needs before choosing a resolution policy. One row per conflicted
        key. Cost: each branch's CDF is O(its changed files); the
        intersection is one join of two key sets."""
        from pyspark.sql import functions as F

        def _touched(t: "TxTable", since: int) -> DataFrame:
            return t.changes(since).select(*self.key_cols).distinct()

        return _touched(a, since_a).join(_touched(b, since_b), self.key_cols, "semi")

    # -- maintenance -------------------------------------------------------

    def compact_files(
        self,
        target_rows: int = 1_000_000,
        small_rows: int | None = None,
        zorder: bool = False,
        target_bytes: int | None = None,
    ) -> int | None:
        """OPTIMIZE: rewrite many small DATA files into few range-clustered
        large ones (Delta OPTIMIZE / Iceberg rewrite_data_files). Streaming
        upserts leave one file per micro-batch; at 100 TB that is millions
        of tiny files whose per-file overhead (open cost, footer reads,
        scheduler tasks) dominates scans. Compaction is a metadata-plus-IO
        maintenance commit:

          * files with ``rows < small_rows`` (default ``target_rows // 4``)
            are read, re-sorted by the first merge key via
            ``repartitionByRange`` — keeping per-file key ranges tight and
            disjoint so merge_upsert's min/max pruning stays sharp — and
            rewritten into files of ~``target_rows``;
          * big files and whole segments without small files carry over by
            reference (zero data IO for the already-healthy part);
          * the result is published as one atomic ``compact`` commit; the
            pre-compaction version stays fully time-travelable until
            ``vacuum`` ages it out.

        Data-identical by construction (pure rewrite, no filter). Returns
        the new version, or None when fewer than two small files exist
        (no-op — no empty commits). On a concurrent-writer conflict the
        CommitConflict surfaces to the caller: the compaction inputs are
        stale (the winner may have rewritten a compacted file), so the
        whole operation must re-run against the new snapshot — never
        blind-retried.
        """
        import math

        m = self.manifest()
        if m is None:
            return None
        if target_bytes is not None:
            # Files are sized in BYTES on real storage (the 128 MB-ish
            # object-store sweet spot); translate through the table's own
            # observed bytes/row so target_rows tracks the actual schema
            # width instead of a guess. Entries written before byte stats
            # existed contribute rows only.
            sized = [e for e in self._files_of(m) if e.get("bytes")]
            if sized:
                bpr = sum(e["bytes"] for e in sized) / max(1, sum(e["rows"] for e in sized))
                target_rows = max(1, int(target_bytes / bpr))
        cutoff = target_rows // 4 if small_rows is None else small_rows

        carried_segs, carried_entries, small_entries = [], [], []
        for e in m["_inline_files"]:
            (small_entries if e["rows"] < cutoff else carried_entries).append(e)
        for d in m["segments"]:
            entries = self._read_segment(d["name"])
            if all(e["rows"] >= cutoff for e in entries):
                carried_segs.append(d)  # healthy segment: carried by name
                continue
            for e in entries:
                (small_entries if e["rows"] < cutoff else carried_entries).append(e)
        if len(small_entries) < 2:
            return None

        paths = [os.path.join(self.table_dir, e["path"]) for e in small_entries]
        df = self.spark.read.schema(m["schema"]).parquet(*paths)
        total = sum(e["rows"] for e in small_entries)
        n_out = max(1, math.ceil(total / target_rows))
        k0 = self.key_cols[0]
        cluster_cols = [k for k in self.key_cols if k in df.columns]
        if zorder:
            # Morton normalization casts each key to DOUBLE; a string key
            # would die at runtime under ANSI mode — fail fast with the
            # actual constraint instead.
            from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

            bad = [
                f.name
                for f in df.schema.fields
                if f.name in cluster_cols
                and not isinstance(f.dataType, (NumericType, TimestampType, TimestampNTZType))
            ]
            if bad:
                raise ValueError(
                    f"zorder=True needs numeric/timestamp merge keys; "
                    f"non-numeric: {bad}"
                )
        if zorder and len(cluster_cols) >= 2:
            # Multi-axis maintenance: rewrite on the Morton code over ALL
            # merge keys, so footer min/max stats prune selective filters
            # (and merge overlap checks) on any key axis, not just the
            # first — Delta's OPTIMIZE ZORDER BY.
            from h2outility_spark.storage import zordered_frame

            packed = zordered_frame(df, cluster_cols, num_partitions=n_out)
        elif k0 in df.columns:
            from pyspark.sql import functions as F

            packed = df.repartitionByRange(n_out, F.col(k0))
        else:
            packed = df.coalesce(n_out)
        new = self._write_segments(carried_entries + self._stage_files(packed))
        return self._commit(carried_segs + new, m["schema"], "compact", m["version"])

    def vacuum(self, keep_versions: int = 10, retention_seconds: float = 3600.0) -> list[str]:
        """Delete data files referenced by NO retained manifest (older
        manifests beyond ``keep_versions`` are dropped first). Returns the
        deleted file names. Readers of retained versions are unaffected —
        a live reader of a dropped version is the same hazard Delta/Iceberg
        document for their vacuum.

        ``retention_seconds`` guards in-flight WRITERS (same rule as
        Delta's ``deletedFileRetentionDuration`` / Iceberg's
        ``min-snapshots-to-keep`` window): a file a concurrent writer has
        staged but not yet committed is unreferenced by any manifest, so an
        unguarded vacuum would delete it and the writer's later commit
        would publish a manifest pointing at missing files — a permanently
        corrupt snapshot. Files whose mtime is younger than the window are
        therefore kept. Pass ``retention_seconds=0`` only when the caller
        holds exclusive access (no in-flight writers) — tests do this."""
        import time as _time

        latest = self.latest_version()
        if latest is None:
            return []
        cutoff = latest - keep_versions + 1
        for p in glob.glob(os.path.join(self.table_dir, _MANIFEST_DIR, "v*.json")):
            if int(os.path.basename(p)[1:-5]) < cutoff:
                os.remove(p)
        ref_segments: set[str] = set()
        referenced: set[str] = set()
        for p in glob.glob(os.path.join(self.table_dir, _MANIFEST_DIR, "v*.json")):
            with open(p) as f:
                m = self._normalize_manifest(json.load(f))
            referenced.update(e["path"] for e in m["_inline_files"])
            for d in m["segments"]:
                ref_segments.add(d["name"])
                referenced.update(e["path"] for e in self._read_segment(d["name"]))
        now = _time.time()
        deleted = []
        for p in glob.glob(os.path.join(self.table_dir, _DATA_DIR, "*.parquet")):
            rel = f"{_DATA_DIR}/{os.path.basename(p)}"
            if rel in referenced:
                continue
            try:
                if now - os.path.getmtime(p) < retention_seconds:
                    continue  # possibly staged by an in-flight writer
                os.remove(p)
            except FileNotFoundError:
                continue  # another vacuum raced us; file is already gone
            deleted.append(rel)
        # segment files referenced by no retained manifest (same age guard:
        # a racing writer may have packed segments it hasn't committed yet)
        for p in glob.glob(os.path.join(self.table_dir, _MANIFEST_DIR, "seg-*.json")):
            if os.path.basename(p) in ref_segments:
                continue
            try:
                if now - os.path.getmtime(p) < retention_seconds:
                    continue
                os.remove(p)
            except FileNotFoundError:
                continue
        return sorted(deleted)
