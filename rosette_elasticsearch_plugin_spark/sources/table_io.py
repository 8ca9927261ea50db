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

    @property
    def row_count(self) -> int:
        return sum(f["rows"] for f in self.files)


class SnapshotTable:
    """One logical table with linear snapshot history."""

    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "snapshots")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------
    def _manifest_paths(self) -> list[str]:
        return sorted(
            os.path.join(self.snap_dir, f)
            for f in os.listdir(self.snap_dir)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def history(self) -> list[Snapshot]:
        out = []
        for p in self._manifest_paths():
            with open(p) as fh:
                d = json.load(fh)
            out.append(
                Snapshot(
                    snapshot_id=d["snapshot_id"],
                    parent_id=d.get("parent_id"),
                    stage=d["stage"],
                    files=d["files"],
                    metrics=d.get("metrics", {}),
                )
            )
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
        out_dir = os.path.join(self.data_dir, f"snap-{sid:05d}")
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
        }
        final = os.path.join(self.snap_dir, f"snap-{sid:05d}.json")
        fd, tmp = tempfile.mkstemp(dir=self.snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.rename(tmp, final)  # the commit point
        return Snapshot(sid, manifest["parent_id"], stage, files, manifest["metrics"])

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
