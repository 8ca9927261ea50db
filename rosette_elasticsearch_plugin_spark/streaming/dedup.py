"""Structured-Streaming exact deduplication — cross-batch keep-first.

The streaming face of ``operators/dedup.exact_dedup``: each micro-batch
of documents is hashed (md5 of text), reduced within the batch, and
MERGED into the committed keeper state

    (text_md5, n_docs, keeper_doc_id)

with ``n_docs`` summed and ``keeper_doc_id`` min-merged.  Both merge
operators are associative and commutative, so the final state equals
the batch ``exact_dedup`` over the full corpus for ANY micro-batch
split — which makes the whole stream DuckDB-oracle-checkable with the
batch query's SQL (``stream_exact_dedup`` vs ``dedup_exact``), with no
ordering assumption at all.

Commit discipline is the shared SnapshotTable pattern
(streaming/resolve.py): full-state overwrite per batch keyed by
(run id, batch id), so readers always see one atomic complete keeper
table and a replayed batch is a no-op.  At the 10^12-doc design point
the per-batch work is one map-side-combinable aggregate over the delta
plus a hash-keyed merge join against vocabulary-scale state — the
"have I seen this content before" gate every training-data ingest
runs in front of the expensive enrichment stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..sources.table_io import SnapshotTable
from .ingest import checkpoint_run_id

KEEPERS_SCHEMA = T.StructType(
    [
        T.StructField("text_md5", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("keeper_doc_id", T.LongType()),
    ]
)


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    keepers_root: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    text_col: str = "text",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Start the streaming exact-dedup query; returns the StreamingQuery.

    keepers_root: SnapshotTable holding the complete keeper state;
    every micro-batch commits the next full state snapshot.
    """
    from .ingest import flat_docs_schema

    table = SnapshotTable(keepers_root)
    run_id_cache: list[str] = []

    stream = (
        spark.readStream.schema(schema or flat_docs_schema())
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        run_id = checkpoint_run_id(checkpoint_dir, run_id_cache)
        stage_label = f"dedup-{run_id}-batch-{batch_id}"
        if table.last_snapshot_for(stage_label) is not None:
            return  # replayed batch — state already committed
        delta = batch_df.groupBy(
            F.md5(F.col(text_col)).alias("text_md5")
        ).agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        snap = table.current_snapshot()
        if snap is not None:
            prior = table.read(spark, snap.snapshot_id)
            merged = (
                prior.unionByName(delta)
                .groupBy("text_md5")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.min("keeper_doc_id").alias("keeper_doc_id"),
                )
            )
        else:
            merged = delta
        table.commit(
            merged.select("text_md5", "n_docs", "keeper_doc_id"),
            stage=stage_label,
            metrics={"batch_id": float(batch_id)},
            mode="overwrite",
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- streaming NEAR-dup: the banded index maintained continuously -------------
# The streaming face of operators/dedup.incremental_near_dup_pairs:
# each micro-batch extends the committed band index with its own
# kernels (old docs never re-signed), generates candidates from the
# delta keys against the full index, verifies with candidate-restricted
# shingling, and commits prior ∪ new verified pairs.  Because the
# incremental pair set is exactly the full recompute's pairs touching
# the delta (monotone ingest ids — the file stream's arrival order),
# the final pairs state hash-equals the batch near_dup_pairs over the
# whole corpus.
#
# State: three SnapshotTables — the corpus text (in production this is
# the warehouse documents table itself, read by id at verification
# time; carried here so the stream is self-contained), the band index,
# and the verified pairs (committed LAST: its stage label is the
# batch's completion marker).

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id_a", T.LongType()),
        T.StructField("doc_id_b", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_key", T.StringType()),
    ]
)


def near_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Start the streaming near-dup query; returns the StreamingQuery.

    state_root/pairs is the deliverable: the complete verified near-dup
    pair table after each batch.
    """
    import os

    from ..operators.dedup import (
        extend_band_index,
        incremental_near_dup_pairs,
    )
    from .ingest import flat_docs_schema

    docs_table = SnapshotTable(os.path.join(state_root, "docs"))
    index_table = SnapshotTable(os.path.join(state_root, "index"))
    pairs_table = SnapshotTable(os.path.join(state_root, "pairs"))
    run_id_cache: list[str] = []

    stream = (
        spark.readStream.schema(schema or flat_docs_schema())
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        run_id = checkpoint_run_id(checkpoint_dir, run_id_cache)
        stage_label = f"neardup-{run_id}-batch-{batch_id}"
        if pairs_table.last_snapshot_for(stage_label) is not None:
            return  # replayed batch
        batch_docs = batch_df.select("doc_id", text_col)
        dsnap = docs_table.current_snapshot()
        prior_docs = (
            docs_table.read(spark, dsnap.snapshot_id)
            if dsnap is not None
            else None
        )
        all_docs = (
            batch_docs
            if prior_docs is None
            else prior_docs.unionByName(batch_docs)
        )
        isnap = index_table.current_snapshot()
        prior_index = (
            index_table.read(spark, isnap.snapshot_id)
            if isnap is not None
            else spark.createDataFrame([], INDEX_SCHEMA)
        )
        psnap = pairs_table.current_snapshot()
        prior_pairs = (
            pairs_table.read(spark, psnap.snapshot_id)
            if psnap is not None
            else spark.createDataFrame([], PAIRS_SCHEMA)
        )
        inc = incremental_near_dup_pairs(
            all_docs,
            prior_index,
            batch_docs,
            text_col=text_col,
            bands=bands,
            rows=rows,
            threshold=threshold,
        )
        pairs = prior_pairs.unionByName(
            inc.select("doc_id_a", "doc_id_b", "jaccard")
        )
        index = extend_band_index(
            prior_index, batch_docs, text_col, bands, rows
        )
        docs_table.commit(
            all_docs, stage=stage_label,
            metrics={"batch_id": float(batch_id)}, mode="overwrite",
        )
        index_table.commit(
            index.select("doc_id", "band_key"), stage=stage_label,
            metrics={"batch_id": float(batch_id)}, mode="overwrite",
        )
        pairs_table.commit(
            pairs.select("doc_id_a", "doc_id_b", "jaccard"),
            stage=stage_label,
            metrics={"batch_id": float(batch_id)},
            mode="overwrite",
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
