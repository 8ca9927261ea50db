"""Structured-Streaming ingest-time enrichment (SURVEY.md §1.3: the
reference enriches at ES index time — a per-document micro-batch; the
Spark-native equivalent is ``readStream → stages → foreachBatch``).

The reference itself has no streaming operators (SURVEY.md §2.5), so
this module is the forward-looking ingest path the north star implies:
documents land in a directory (or any streaming source), each
micro-batch runs the SAME batch enrichment stages (plans/pipeline.py —
one code path for batch and streaming), failed rows are split to a
quarantine table (``on_failure`` routing, docs/...Doc-Enrichment.md:276-304),
and every micro-batch commits atomically to a snapshot table
(sources/table_io.py) — giving exactly-once visibility per batch plus
resume via the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.base import split_quarantine
from ..sources.table_io import SnapshotTable


def flat_docs_schema() -> T.StructType:
    """Schema of the driver's flat documents table (streaming file
    sources require an explicit schema — no inference mid-stream)."""
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )


def checkpoint_run_id(checkpoint_dir: str, cache: list[str]) -> str:
    """The stream's query id, read from the checkpoint metadata Spark
    writes at start.  Stable across restarts of the SAME checkpoint (so
    a replayed batch_id is recognized), fresh when the checkpoint is
    wiped or relocated (so a new run whose batch ids restart at 0 is
    NOT mistaken for an already-committed batch — without this,
    recovery-by-deleting-the-checkpoint silently skipped every new
    batch as a 'replay')."""
    if not cache:
        import json
        import os

        try:
            with open(os.path.join(checkpoint_dir, "metadata")) as fh:
                cache.append(json.load(fh)["id"])
        except (OSError, KeyError, ValueError):
            # unreadable checkpoint metadata (remote fs, transient
            # error): fall back to a per-stream unique id.  That
            # degrades replay-idempotence to at-least-once for THIS
            # stream, but a shared constant here would collide labels
            # ACROSS runs and silently drop new batches as "replays" —
            # duplicates beat data loss.
            import uuid

            cache.append(f"u{uuid.uuid4().hex[:12]}")
    return cache[0]


def stage_batch_files(batches, in_dir: str) -> None:
    """Write each DataFrame as ONE flat parquet file
    ``batch-<i>.parquet`` with strictly increasing mtimes, so a
    ``maxFilesPerTrigger=1`` file stream drains them as deterministic
    micro-batches in list order.  (The file source reads flat files,
    not the directory-per-write layout ``df.write.parquet`` produces —
    hence the single-part move.)"""
    import glob
    import os
    import shutil

    os.makedirs(in_dir, exist_ok=True)
    for i, batch in enumerate(batches):
        part_dir = os.path.join(in_dir, f"__stage{i}")
        batch.coalesce(1).write.parquet(part_dir)
        (src,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(in_dir, f"batch-{i}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))


def enrich_stream(
    spark: SparkSession,
    input_dir: str,
    stage,
    table_root: str,
    checkpoint_dir: str,
    quarantine_root: str | None = None,
    schema: T.StructType | None = None,
    available_now: bool = True,
):
    """Start an ingest-enrichment stream; returns the StreamingQuery.

    ``stage``: a batch DataFrame→DataFrame enrichment (from
    plans/pipeline.build_pipeline) — reused verbatim per micro-batch.
    ``available_now=True`` drains the current backlog then stops
    (test/batch-catchup mode); False runs continuously.
    """
    table = SnapshotTable(table_root)
    quarantine = SnapshotTable(quarantine_root) if quarantine_root else None

    stream = (
        spark.readStream.schema(schema or flat_docs_schema())
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    run_id_cache: list[str] = []

    def _run_id() -> str:
        return checkpoint_run_id(checkpoint_dir, run_id_cache)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash between table.commit()
        # and the streaming checkpoint commit replays this batch_id on
        # restart.  The (query id, batch id) stage label keys
        # idempotence — if a snapshot for this batch already landed, the
        # replay is a no-op, which is what makes the
        # exactly-once-visibility claim actually hold.
        stage_label = f"stream-{_run_id()}-batch-{batch_id}"
        main_done = table.last_snapshot_for(stage_label) is not None
        quar_done = (
            quarantine is None
            or quarantine.last_snapshot_for(stage_label) is not None
        )
        if main_done and quar_done:
            return
        # pin the enriched batch: ok-commit, bad.count() and the
        # quarantine commit otherwise each recompute the whole
        # enrichment (2-3× the Python/Arrow stage cost per batch)
        out = stage(batch_df).persist()
        try:
            ok, bad = split_quarantine(out)
            if not main_done:
                table.commit(ok, stage=stage_label, mode="append")
            if not quar_done:
                n_bad = bad.count()
                if n_bad:
                    quarantine.commit(
                        bad,
                        stage=stage_label,
                        metrics={"rows": n_bad},
                        mode="append",
                    )
        finally:
            out.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
