"""Snapshot table layer (R12) — Iceberg-semantics emulation on parquet.

The north rule requires all pipeline state in tables with atomic
snapshot commits, per-partition lineage + counter metrics, and
resume-from-last-committed-snapshot (reference analogue: the ES index
refresh/visibility barrier, ``RosetteTextAnalysisPluginIT.java:219``).
The sandbox ships no Iceberg runtime jar, so this module provides the
same observable semantics over plain parquet + JSON manifests, behind a
seam small enough to swap for ``writeTo(...).append()`` on a real
cluster:

  <root>/
    snapshots/snap-00001.json     ← manifest, committed atomically
    snapshots/snap-00002.json       (write-tmp + rename)
    data/snap-00001/…parquet      ← immutable data files

A manifest records: snapshot id, parent id, stage label, the file-level
lineage (path, rows, bytes per parquet part = per output partition),
and caller-supplied counter metrics.  A crash between data write and
manifest rename leaves an orphan data dir that is never read — commits
are all-or-nothing, exactly Iceberg's visibility rule.

Snapshots form a linear history; ``read`` returns the latest snapshot's
data (overwrite semantics per stage — each pipeline stage owns one
table), and ``history()`` exposes the chain for audit/resume.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    stage: str
    files: list[dict]  # [{path, rows, bytes}] — per-partition lineage
    metrics: dict[str, float] = field(default_factory=dict)
    schema_json: str | None = None  # lets a zero-file snapshot read back

    @property
    def row_count(self) -> int:
        return sum(f["rows"] for f in self.files)


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same snapshot id first (the CAS at
    the manifest link failed) — re-read history and retry."""


class SnapshotTable:
    """One logical table with linear snapshot history."""

    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "snapshots")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        # committed manifests are immutable once linked, so parsed
        # snapshots are cached — without this, every last_snapshot_for/
        # current_snapshot re-parses ALL manifests and an append-per-
        # micro-batch stream degrades O(n²) over its lifetime
        self._cache: dict[str, Snapshot] = {}

    # -- manifest plumbing ---------------------------------------------------
    def _manifest_paths(self) -> list[str]:
        # numeric sort on the parsed id: lexicographic filename order
        # breaks at the padding rollover (snap-100000 < snap-99999)
        def sid(p: str) -> int:
            base = os.path.basename(p)
            return int(base[len("snap-"):-len(".json")])

        return sorted(
            (
                os.path.join(self.snap_dir, f)
                for f in os.listdir(self.snap_dir)
                if f.startswith("snap-") and f.endswith(".json")
            ),
            key=sid,
        )

    def history(self) -> list[Snapshot]:
        out = []
        for p in self._manifest_paths():
            snap = self._cache.get(p)
            if snap is None:
                with open(p) as fh:
                    d = json.load(fh)
                snap = Snapshot(
                    snapshot_id=d["snapshot_id"],
                    parent_id=d.get("parent_id"),
                    stage=d["stage"],
                    files=d["files"],
                    metrics=d.get("metrics", {}),
                    schema_json=d.get("schema"),
                )
                self._cache[p] = snap
            out.append(snap)
        return out

    def current_snapshot(self) -> Snapshot | None:
        hist = self.history()
        return hist[-1] if hist else None

    def last_snapshot_for(self, stage: str) -> Snapshot | None:
        for snap in reversed(self.history()):
            if snap.stage == stage:
                return snap
        return None

    # -- commit / read -------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        stage: str,
        metrics: dict[str, float] | None = None,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        buckets: tuple[str, int] | None = None,
    ) -> Snapshot:
        """Write df as a new snapshot; visible only once the manifest
        rename lands (atomic on POSIX).

        ``mode="overwrite"``: the new snapshot's view is just these
        files (stage tables — each pipeline stage owns the table).
        ``mode="append"``: Iceberg-style — the snapshot's view is the
        parent's files plus the new ones (ingest/stream tables).
        ``partition_by``: hive-style directory partitioning.
        ``buckets=(col, n)``: the north star's bucket-by-block layout —
        rows are hash-bucketed on ``col`` into ``n`` stable buckets
        (``__bucket`` partition dirs), so a downstream self-join on the
        block key reads co-located buckets (Iceberg ``bucket(n, col)``
        transform emulation).
        """
        from pyspark.sql import functions as F

        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        parent = self.current_snapshot()
        sid = (parent.snapshot_id + 1) if parent else 1
        # data dir is writer-unique: two racing writers computing the
        # same sid must not clobber each other's parquet mid-write; the
        # loser's orphan dir is never referenced by any manifest
        out_dir = tempfile.mkdtemp(prefix=f"snap-{sid:05d}-", dir=self.data_dir)
        parts = list(partition_by or [])
        if buckets is not None:
            col, n = buckets
            df = df.withColumn("__bucket", F.pmod(F.hash(F.col(col)), F.lit(n)))
            df = df.repartition(n, "__bucket")
            parts.append("__bucket")
        writer = df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(out_dir)

        files = list(parent.files) if (mode == "append" and parent) else []
        for root_, _dirs, names in os.walk(out_dir):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                path = os.path.join(root_, name)
                files.append(
                    {
                        "path": path,
                        "rows": _parquet_rows(path),
                        "bytes": os.path.getsize(path),
                        "partition": os.path.relpath(root_, out_dir),
                    }
                )
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent.snapshot_id if parent else None,
            "stage": stage,
            "files": files,
            "metrics": dict(metrics or {}),
            "schema": df.schema.json(),
        }
        final = os.path.join(self.snap_dir, f"snap-{sid:05d}.json")
        fd, tmp = tempfile.mkstemp(dir=self.snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())  # durable before visible (no torn manifest)
        try:
            # the commit point is a compare-and-swap: link fails if a
            # concurrent writer already committed this snapshot id,
            # instead of rename silently overwriting their manifest
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise ConcurrentCommitError(
                f"snapshot {sid} already committed in {self.root}; "
                f"re-read history and retry"
            ) from None
        os.unlink(tmp)
        dfd = os.open(self.snap_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)  # persist the directory entry itself
        finally:
            os.close(dfd)
        snap = Snapshot(
            sid, manifest["parent_id"], stage, files, manifest["metrics"],
            manifest["schema"],
        )
        self._cache[final] = snap
        return snap

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read a snapshot (default: current). Reads only files listed in
        the manifest — orphan dirs from failed commits are invisible."""
        if snapshot_id is None:
            snap = self.current_snapshot()
            if snap is None:
                raise FileNotFoundError(f"no committed snapshot in {self.root}")
        else:
            snap = next(
                (s for s in self.history() if s.snapshot_id == snapshot_id), None
            )
            if snap is None:
                raise FileNotFoundError(f"snapshot {snapshot_id} not in {self.root}")
        if not snap.files:
            # a committed-but-empty snapshot (e.g. a filter removed all
            # rows of a partitioned write) still reads as an empty
            # DataFrame with the committed schema
            from pyspark.sql import types as T

            if snap.schema_json is None:
                raise ValueError(
                    f"snapshot {snap.snapshot_id} in {self.root} has no "
                    f"data files and no recorded schema"
                )
            return spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(snap.schema_json))
            )
        # group files by their owning snap-dir so hive partition columns
        # (partition_by / bucket layout) are recovered via basePath
        groups: dict[str, list[str]] = {}
        for f in snap.files:
            rel = os.path.relpath(f["path"], self.data_dir)
            groups.setdefault(rel.split(os.sep)[0], []).append(f["path"])
        dfs = [
            spark.read.option("basePath", os.path.join(self.data_dir, top)).parquet(
                *paths
            )
            for top, paths in sorted(groups.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
