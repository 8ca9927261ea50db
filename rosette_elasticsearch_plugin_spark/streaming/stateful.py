"""Custom STATEFUL streaming operator: running per-name mention counts
via ``applyInPandasWithState`` — the Structured-Streaming primitive for
state the built-in windowed aggregations can't express (here: a
monotone per-key running total that must survive across micro-batches
and emit an update row per trigger).

The reference has no streaming (SURVEY.md §2.5); this is the
forward-looking counterpart of P6d (per-entity mention counts,
EntitiesProcessor.java:142) for a continuously-ingesting deployment:
each micro-batch folds its mention occurrences into the per-name state
store, and the emitted update log — committed idempotently per
(query id, batch id) like streaming/ingest.py — collapses to exactly
the batch ``groupBy(normalized).count()``, which is the operator's
exact oracle for ANY batch split.

Scale shape: tokens shuffle once on the state key (required by the
state store's partitioning), state is O(distinct names) not O(docs),
and the update log appends per trigger — the same
vocabulary-not-volume argument as the resolution layer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.table_io import SnapshotTable
from .ingest import checkpoint_run_id, flat_docs_schema

UPDATE_TYPE = T.StructType(
    [
        T.StructField("normalized", T.StringType()),
        T.StructField("running_count", T.LongType()),
    ]
)
STATE_TYPE = T.StructType([T.StructField("count", T.LongType())])


def _update_counts(key, pdfs, state: GroupState):
    """Fold this trigger's rows for one key into the running total and
    emit the new total (one update row per key per trigger).  The state
    store commits transactionally with the batch, so a foreachBatch
    replay recomputes from the PRE-batch state and re-emits identical
    rows — idempotence then comes from the sink's batch labels."""
    new = 0
    for pdf in pdfs:
        new += len(pdf)
    prev = state.get[0] if state.exists else 0
    total = prev + new
    state.update((total,))
    yield pd.DataFrame({"normalized": [key[0]], "running_count": [total]})


def mention_count_stream(
    spark: SparkSession,
    input_dir: str,
    updates_root: str,
    checkpoint_dir: str,
    pattern: str = r"[a-z]{2,}",
    schema: T.StructType | None = None,
    available_now: bool = True,
):
    """Start the stateful counting stream; returns the StreamingQuery.

    readStream → explode normalized tokens → groupBy(normalized).
    applyInPandasWithState (running totals live in the state store) →
    foreachBatch append of the update rows to a snapshot table with
    replay-idempotent (query id, batch id) stage labels.
    """
    table = SnapshotTable(updates_root)
    stream = (
        spark.readStream.schema(schema or flat_docs_schema())
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    mentions = stream.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(pattern), F.lit(0)
            )
        ).alias("normalized")
    )
    updates = mentions.groupBy("normalized").applyInPandasWithState(
        _update_counts,
        UPDATE_TYPE,
        STATE_TYPE,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    run_id_cache: list[str] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        label = (
            f"state-{checkpoint_run_id(checkpoint_dir, run_id_cache)}"
            f"-batch-{batch_id}"
        )
        if table.last_snapshot_for(label) is not None:
            return  # replayed batch already committed
        table.commit(
            batch_df.withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ),
            stage=label,
            mode="append",
        )

    writer = (
        updates.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def final_counts(spark: SparkSession, updates_root: str) -> DataFrame:
    """Collapse the update log to the final total per name.  Totals are
    monotone, so max(running_count) is the last update — and equals the
    batch recompute ``groupBy(normalized).count()`` exactly."""
    log = SnapshotTable(updates_root).read(spark)
    return log.groupBy("normalized").agg(
        F.max("running_count").alias("n_mentions")
    )
