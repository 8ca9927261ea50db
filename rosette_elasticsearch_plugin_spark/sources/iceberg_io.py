"""Real-Iceberg implementation of the SnapshotTable surface.

The exact swap documented in README "Iceberg seam", as code: the five
calls ``plans/state.ResumableERPipeline`` and ``streaming/ingest``
consume (`commit` append/overwrite, `read` with optional snapshot id,
`history`, `last_snapshot_for`) over a real Iceberg catalog table via
``df.writeTo(...)`` and the ``<table>.snapshots`` metadata table.

The sandbox ships no Iceberg runtime jar, so this module is exercised
only by ``tests/test_iceberg_seam.py``, which SKIPS cleanly unless
``org.apache.iceberg.spark.SparkCatalog`` is on the session classpath
(e.g. ``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``).  Import is
cheap and jar-free; failures surface only at call time.

Differences from the emulation, by design:

* snapshot ids are Iceberg's random longs, not a linear counter —
  ordering comes from the snapshot log, parentage from ``parent_id``;
* per-snapshot lineage comes from the ``<table>.files`` metadata table
  instead of a JSON manifest;
* stage labels and caller metrics ride in snapshot SUMMARY properties
  (write option ``snapshot-property.<key>``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .table_io import Snapshot


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on this session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def ensure_local_catalog(
    spark: SparkSession, name: str, warehouse: str
) -> None:
    """Register a Hadoop-backed Iceberg catalog at runtime (catalog
    resolution is lazy, so ``spark.conf.set`` suffices — no session
    restart needed)."""
    spark.conf.set(
        f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)


class IcebergSnapshotTable:
    """One Iceberg table exposing the SnapshotTable surface.

    ``table``: fully qualified name, e.g. ``local.db.mentions``.
    """

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def _exists(self) -> bool:
        # only a missing-table analysis error means "absent" — a
        # transient read failure must NOT be swallowed (commit() would
        # then report a successful write as table-creation, or
        # history() would silently return [] and mask real snapshots)
        from pyspark.errors import AnalysisException

        try:
            self.spark.read.table(self.table)
            return True
        except AnalysisException:
            return False

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
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        # caller metrics ride under an "m." prefix so read-back can
        # separate them from Iceberg/Spark-stamped summary entries
        # (app-id, engine-name, operation, total-records, ...).  Values
        # are JSON-encoded so the read-back preserves the caller's type
        # exactly — ResumableERPipeline compares its resume fingerprint
        # (a hex STRING) by equality, and a float-coercing round-trip
        # would silently defeat that check for all-digit fingerprints.
        writer = df.writeTo(self.table).option(
            "snapshot-property.stage", stage
        )
        for k, v in (metrics or {}).items():
            writer = writer.option(f"snapshot-property.m.{k}", json.dumps(v))
        if buckets is not None or partition_by:
            from pyspark.sql import functions as F

            parts = [F.col(c) for c in (partition_by or [])]
            if buckets is not None:
                col, n = buckets
                parts.append(F.bucket(n, col))
            writer = writer.partitionedBy(*parts)
        exists = self._exists()
        if mode == "append":
            if exists:
                writer.append()
            else:
                writer.create()
        else:
            # stage tables are whole-table overwrites (each pipeline
            # stage owns its table), so replace content atomically
            writer.createOrReplace()
        snap = self.current_snapshot()
        if snap is None:
            # the write succeeded but no snapshot is visible — surface
            # it rather than returning None against the -> Snapshot
            # contract (state.py dereferences snap.snapshot_id)
            raise RuntimeError(
                f"commit to {self.table} succeeded but no snapshot is "
                f"visible in {self.table}.snapshots"
            )
        return snap

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(self.table)

    # -- history -------------------------------------------------------------
    def history(self) -> list[Snapshot]:
        if not self._exists():
            return []
        rows = self.spark.sql(
            f"select snapshot_id, parent_id, summary from "
            f"{self.table}.snapshots order by committed_at"
        ).collect()
        # deterministic order: walk the parent chain (committed_at has
        # millisecond resolution — two tiny commits can tie, and the
        # SQL order between ties is arbitrary).  Snapshot history is
        # linear here (single writer per table); fall back to the
        # committed_at order if the chain is broken (e.g. expired
        # snapshots).
        by_parent = {r["parent_id"]: r for r in rows}
        ordered, seen, cur = [], set(), None
        while cur in by_parent and by_parent[cur]["snapshot_id"] not in seen:
            r = by_parent[cur]
            ordered.append(r)
            seen.add(r["snapshot_id"])
            cur = r["snapshot_id"]
        if len(ordered) != len(rows):
            ordered = rows
        out = []
        for r in ordered:
            summary = dict(r["summary"] or {})
            stage = summary.pop("stage", "")
            # caller metrics are the "m."-prefixed entries we wrote in
            # commit(); everything else is engine metadata
            metrics = {
                k[2:]: _metric(v)
                for k, v in summary.items()
                if k.startswith("m.")
            }
            out.append(
                Snapshot(
                    snapshot_id=r["snapshot_id"],
                    parent_id=r["parent_id"],
                    stage=stage,
                    # per-COMMIT lineage, matching the emulation's
                    # per-snapshot semantics (the cumulative table
                    # totals live in 'total-*')
                    files=[
                        {"path": "", "rows": int(summary.get("added-records", 0)),
                         "bytes": int(summary.get("added-files-size", 0))}
                    ],
                    metrics=metrics,
                    schema_json=json.dumps({}),
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


def _metric(v: str):
    """Invert commit()'s json.dumps — type-exact round-trip.  The plain
    fallback keeps snapshots written by older builds (bare str(v))
    readable."""
    try:
        return json.loads(v)
    except (TypeError, ValueError):
        return v
