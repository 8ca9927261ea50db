"""Adapter: flat driver documents → interleaved-span documents.

The engine's native input is the ``input_hint`` shape
(doc_id string, spans array<struct<kind,text,media_ref,offset>>); the
driver's ``documents.parquet`` is flat (doc_id int64, text, lang,
source, n_chars) — FIXTURES.md §8 prescribes a small adapter view that
maps each flat row to a one-text-span document.  For multimodal-path
exercises we also interleave a deterministic synthetic media span on
every third document (doc_id % 3 == 0) — deterministic, so tests and
oracles can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flat_to_spans(flat: DataFrame, with_media: bool = True) -> DataFrame:
    """(doc_id int64, text, ...) → (doc_id string, spans array<struct>).

    Text span at offset 0; optional media span at offset = n_chars."""
    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("image").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("img://doc/"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.length("text").alias("offset"),
    )
    if with_media:
        spans = F.when(
            F.col("doc_id") % 3 == 0, F.array(text_span, media_span)
        ).otherwise(F.array(text_span))
    else:
        spans = F.array(text_span)
    return flat.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )


def parallelize_scan(df: DataFrame) -> DataFrame:
    """Physical-only: stop a small-file scan from serializing heavy
    per-row kernels downstream.

    A single small parquet file arrives as ONE input split (row-group
    granularity + ``spark.sql.files.openCostInBytes``), so every
    downstream signature/extraction kernel would run on one core no
    matter the cluster size.  When the scan has fewer partitions than
    the session's defaultParallelism, round-robin repartition up to it
    (the explicit partition count keeps AQE from coalescing the tiny
    table straight back to one partition).  At warehouse scale the
    input has far more splits than cores and this is a no-op — no
    shuffle is ever added to a properly-sized scan.  Output rows are
    identical either way; only their placement changes, and nothing in
    the engine derives values from partition layout (mention ids,
    sampling and LSH keys are all row-content hashes).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_documents(spark, sf_dir: str, with_media: bool = True) -> DataFrame:
    flat = parallelize_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return flat_to_spans(flat, with_media)


def read_flat_documents(
    spark, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Read a flat documents table from parquet, JSON-lines, or CSV —
    always with an EXPLICIT schema, never inference (inference is a
    second full scan at warehouse scale and types dirty data
    non-deterministically).  JSON-lines is the reference's native
    ingest shape — one ``_source`` document per index request
    (RosetteTextAnalysisPluginIT.java indexes JSON bodies); CSV covers
    export/interchange dumps.  Reading through the same schema means
    every downstream operator is format-agnostic."""
    from ..streaming.ingest import flat_docs_schema

    reader = spark.read.schema(schema or flat_docs_schema())
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        # multiLine + RFC-style quote escaping so documents containing
        # newlines / quotes round-trip byte-identically
        return reader.options(
            header=True, multiLine=True, quote='"', escape='"'
        ).csv(path)
    raise ValueError(f"unsupported documents format: {fmt!r}")
