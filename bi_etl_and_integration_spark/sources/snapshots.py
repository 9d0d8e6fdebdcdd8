"""Snapshot table: a minimal transactional table format on plain
parquet — the lakehouse-lite replacement for the temp-dir-swap publish
protocol (``pipeline.checkpointed_write``), built because no
Delta/Iceberg package exists in this environment (ROADMAP round-2
re-check) and the pattern itself is public (Delta's _delta_log /
Iceberg's metadata tree reduced to essentials).

Layout::

    table/
      data/<commit-uuid>/part-*.parquet    immutable, write-once
      _manifests/v0000000001.json          the commit log

A *manifest* lists the exact data files of one table version plus the
schema DDL.  The COMMIT is the atomic exclusive creation of the next
``v{N}.json`` (``O_CREAT|O_EXCL``): exactly one writer can create a
given version, so concurrent writers serialize by retrying against the
new latest — optimistic concurrency, no lock server.  Readers list the
manifest dir, pick the highest version, and read exactly the files it
names — they never see a half-written commit because data files are
written BEFORE the manifest that references them and are never
modified after.

Guarantees and their boundaries (stated, not implied):
  - Atomic visibility + snapshot isolation: yes, on any filesystem
    with atomic exclusive create (POSIX local, NFSv4, HDFS).  S3 has
    no atomic create-if-absent — same boundary Delta has without a
    coordinating LogStore; front it with one writer or a lock there.
  - Appends from concurrent writers: both survive (retry re-reads the
    latest parent).  Concurrent overwrite+append: last committed wins
    deterministically by version order — the append retries onto the
    overwrite's files.
  - Time travel: any retained version is readable; ``rollback`` is a
    NEW commit pointing at the old file list (history is never
    rewritten).  ``vacuum`` deletes data unreferenced by the retained
    tail, after which older versions are gone.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MANIFEST_DIR = "_manifests"
_PAD = 10


class CommitConflict(RuntimeError):
    """Another writer committed the version we raced for (surfaced only
    after ``max_retries`` exhausted)."""


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR,
                        f"v{version:0{_PAD}d}.json")


def _list_versions(table: str) -> list[int]:
    d = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as fh:
        return json.load(fh)


def _entry_path(entry) -> str:
    """Manifest file entry -> relative path (v1 manifests stored bare
    strings; v2 stores {path, rows, stats})."""
    return entry if isinstance(entry, str) else entry["path"]


def _stat_value(v):
    """Normalize a parquet footer min/max to a JSON-stable, ordered
    value.  Dates/timestamps become ISO strings — lexicographic order
    == chronological order for ISO-8601, so pruning stays correct."""
    import datetime
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _file_stats(full_path: str) -> tuple[int, dict]:
    """(row_count, {col: [min, max]}) from the parquet footer — only
    top-level columns whose every row group carries min/max stats.
    Cost: one footer read per NEW file of this commit (bounded by one
    write's output, never the whole table)."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(full_path).metadata
    mins: dict = {}
    maxs: dict = {}
    dead: set = set()
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            col = rgm.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                continue
            lo, hi = _stat_value(st.min), _stat_value(st.max)
            if lo is None or hi is None:
                dead.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    stats = {c: [mins[c], maxs[c]] for c in mins if c not in dead}
    return md.num_rows, stats


_PRUNE_OPS = ("=", "<", "<=", ">", ">=")


def _may_match(entry, predicates) -> bool:
    """False only when the file's stats PROVE no row satisfies every
    predicate — missing stats always read (pruning is an optimization,
    never a correctness gate)."""
    if not predicates or isinstance(entry, str):
        return True
    stats = entry.get("stats") or {}
    for col, op, val in predicates:
        if col not in stats:
            continue
        lo, hi = stats[col]
        # only same-kind comparisons are meaningful; mixed types read
        num = isinstance(val, (int, float)) and not isinstance(val, bool)
        if num != isinstance(lo, (int, float)):
            continue
        if op == "=" and not (lo <= val <= hi):
            return False
        if op == ">" and not hi > val:
            return False
        if op == ">=" and not hi >= val:
            return False
        if op == "<" and not lo < val:
            return False
        if op == "<=" and not lo <= val:
            return False
    return True


def _evolve_ddl(table_ddl: str, df_schema: T.StructType) -> str:
    """Union-extend a manifest schema with an appended frame's schema:
    table column order is preserved, brand-new columns append at the
    end; a same-name column with a different type raises."""
    table = T.StructType.fromDDL(table_ddl)
    existing = {f.name: f.dataType.simpleString() for f in table.fields}
    out = [f"{f.name} {existing[f.name]}" for f in table.fields]
    for f in df_schema.fields:
        new_t = f.dataType.simpleString()
        if f.name in existing:
            if existing[f.name] != new_t:
                raise ValueError(
                    f"evolve_schema: column {f.name!r} is "
                    f"{existing[f.name]} in the table but {new_t} in "
                    "the append — explicit cast or overwrite required")
        else:
            out.append(f"{f.name} {new_t}")
    return ",".join(out)


class SnapshotTable:
    """Handle on one snapshot table directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------ read

    def versions(self) -> list[int]:
        return _list_versions(self.path)

    def latest_version(self) -> int | None:
        v = _list_versions(self.path)
        return v[-1] if v else None

    def history(self) -> list[dict]:
        """Commit log, oldest first: version/operation/ts/n_files."""
        out = []
        for v in _list_versions(self.path):
            m = _read_manifest(self.path, v)
            out.append({"version": v, "operation": m["operation"],
                        "ts": m["ts"], "n_files": len(m["files"])})
        return out

    def read(self, version: int | None = None, *,
             prune: list[tuple] | None = None) -> DataFrame:
        """Snapshot read.  ``version=None`` → latest.  The file list is
        pinned at manifest-read time: a commit that lands after this
        call does not change what this DataFrame scans (snapshot
        isolation) — except that ``vacuum`` may delete files of
        versions older than its retention tail.

        ``prune``: manifest-level data skipping — ``[(col, op, value)]``
        with op ∈ =,<,<=,>,>= drops every file whose footer min/max
        PROVES no row matches, before Spark lists a single file.  This
        is an optimization contract, not a filter: the caller still
        applies the real ``where()`` (files lacking stats are always
        read).  At 100 TB this removes the per-file footer round trip
        row-group pruning would otherwise pay."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(
                    f"{self.path} has no committed version")
        if prune:
            for col, op, _ in prune:
                if op not in _PRUNE_OPS:
                    raise ValueError(f"prune op {op!r} not in "
                                     f"{_PRUNE_OPS}")
        m = _read_manifest(self.path, version)
        schema = T.StructType.fromDDL(m["schema"])
        files = [os.path.join(self.path, _entry_path(e))
                 for e in m["files"] if _may_match(e, prune)]
        if not files:
            return self.spark.createDataFrame([], schema)
        # explicit schema: the manifest is the source of truth, not
        # whichever file's footer gets sampled first
        return self.spark.read.schema(schema).parquet(*files)

    def row_count(self, version: int | None = None) -> int | None:
        """Exact row count from manifest metadata — no scan.  None if
        any entry predates stats capture (v1 manifests)."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(
                    f"{self.path} has no committed version")
        total = 0
        for e in _read_manifest(self.path, version)["files"]:
            if isinstance(e, str) or "rows" not in e:
                return None
            total += e["rows"]
        return total

    # ----------------------------------------------------------- write

    def write(self, df: DataFrame, mode: str = "overwrite", *,
              evolve_schema: bool = False,
              max_retries: int = 20) -> int:
        """Commit ``df`` as the next version.  ``mode``: ``overwrite``
        replaces the file list, ``append`` extends the parent's.
        Returns the committed version number.

        ``evolve_schema`` (append only): columns new to the table are
        ADDED to the manifest schema (at the end, Delta
        mergeSchema-style) instead of erroring; columns the append
        lacks stay, NULL-filled for the new rows.  No data file is
        rewritten — parquet column resolution is by NAME, so old files
        simply lack the new column and read as NULL under the
        manifest's (authoritative) union schema.  A column present on
        both sides with a DIFFERENT type still errors: silent type
        widening is how tables rot.

        Data files land under an unborn commit-uuid dir first; the
        manifest create is the only visibility switch, so a crash
        before it leaves invisible garbage (reclaimed by ``vacuum``),
        never a torn table."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite/append, got {mode!r}")
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.path, "data", commit_id)
        df.write.mode("errorifexists").parquet(data_dir)
        new_files = []
        for f in sorted(os.listdir(data_dir)):
            if not f.endswith(".parquet"):
                continue
            rel = os.path.join("data", commit_id, f)
            rows, stats = _file_stats(os.path.join(data_dir, f))
            new_files.append({"path": rel, "rows": rows, "stats": stats})
        ddl = ",".join(f.name + " " + f.dataType.simpleString()
                       for f in df.schema.fields)
        os.makedirs(os.path.join(self.path, _MANIFEST_DIR), exist_ok=True)

        for _ in range(max_retries):
            parent = self.latest_version()
            files = list(new_files)
            if mode == "append" and parent is not None:
                pm = _read_manifest(self.path, parent)
                if pm["schema"] != ddl:
                    if not evolve_schema:
                        raise ValueError(
                            "append schema mismatch: table has "
                            f"[{pm['schema']}], appending [{ddl}] — "
                            "overwrite to change schema, or pass "
                            "evolve_schema=True to union-extend it")
                    ddl = _evolve_ddl(pm["schema"], df.schema)
                files = pm["files"] + files
            version = (parent or 0) + 1
            manifest = {"version": version, "parent": parent,
                        "operation": mode, "files": files,
                        "schema": ddl, "ts": time.time(),
                        "commit_id": commit_id}
            target = _manifest_path(self.path, version)
            try:
                # O_EXCL create IS the commit: exactly one writer wins v
                fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue                     # lost the race: re-parent
            with os.fdopen(fd, "w") as fh:
                json.dump(manifest, fh)
            return version
        raise CommitConflict(
            f"{self.path}: lost the commit race {max_retries} times")

    def rollback(self, to_version: int) -> int:
        """Restore an old version's file list as a NEW commit (history
        stays append-only, like Delta RESTORE)."""
        m = _read_manifest(self.path, to_version)
        latest = self.latest_version()
        version = (latest or 0) + 1
        manifest = {"version": version, "parent": latest,
                    "operation": f"rollback({to_version})",
                    "files": m["files"], "schema": m["schema"],
                    "ts": time.time(), "commit_id": m.get("commit_id")}
        target = _manifest_path(self.path, version)
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        return version

    def compact(self, *, target_files: int = 1) -> int:
        """OPTIMIZE: rewrite the current version's data as
        ``target_files`` files and commit the result — small-file
        compaction after many streaming/CDC appends (each append is
        ≥1 file; a thousand micro-batches = a thousand tiny scans).
        Old versions still read the old files until ``vacuum``."""
        df = self.read().coalesce(max(1, target_files))
        return self._commit_like(df, "compact")

    def _commit_like(self, df: DataFrame, operation: str) -> int:
        v = self.write(df, "overwrite")
        # annotate the operation (write() stamps "overwrite"); the
        # manifest is ours until someone reads it — rewrite in place is
        # safe because the version number is already claimed
        p = _manifest_path(self.path, v)
        with open(p) as fh:
            m = json.load(fh)
        m["operation"] = operation
        with open(p, "w") as fh:
            json.dump(m, fh)
        return v

    # --------------------------------------------------------- vacuum

    def vacuum(self, *, keep_last: int = 2) -> list[str]:
        """Delete data files referenced ONLY by versions older than the
        ``keep_last`` newest (plus orphans from crashed writes).
        Returns deleted paths.  After vacuum, ``read(version=old)``
        fails for pruned versions — retention is the time-travel
        horizon, exactly the Delta VACUUM contract."""
        versions = _list_versions(self.path)
        if not versions:
            return []
        keep = set()
        for v in versions[-keep_last:]:
            keep.update(_entry_path(e) for e in
                        _read_manifest(self.path, v)["files"])
        keep_dirs = {p.split(os.sep)[1] for p in keep}
        data_root = os.path.join(self.path, "data")
        deleted = []
        import shutil
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                if d not in keep_dirs:
                    full = os.path.join(data_root, d)
                    shutil.rmtree(full, ignore_errors=True)
                    deleted.append(full)
        for v in versions[:-keep_last] if keep_last else versions:
            m = _read_manifest(self.path, v)
            if any(_entry_path(e).split(os.sep)[1] not in keep_dirs
                   for e in m["files"]):
                os.remove(_manifest_path(self.path, v))
        return deleted


def snapshot_write(spark: SparkSession, df: DataFrame, path: str, *,
                   mode: str = "overwrite") -> int:
    """One-shot convenience over :class:`SnapshotTable`."""
    return SnapshotTable(spark, path).write(df, mode)


def snapshot_read(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame:
    return SnapshotTable(spark, path).read(version)
