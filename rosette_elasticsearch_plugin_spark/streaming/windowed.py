"""Watermarked event-time windowed aggregation — the BUILT-IN
Structured Streaming aggregation surface (``withWatermark`` +
``window()``), complementing the custom stateful operator in
``stateful.py``: readStream → watermark → tumbling-window groupBy →
count → sink.

Two output modes, two verification styles:

* ``complete`` (the driver-contract query): the final in-memory table
  is the aggregation over every event ever seen, so it equals the
  plain batch window-group-count EXACTLY — that batch SQL is the
  oracle.  The watermark is declared (and its state machinery runs)
  but cannot drop rows in complete mode.
* ``append`` (pytest): real late-data semantics — rows older than the
  watermark are DROPPED, and a window's single result row is emitted
  only once the watermark passes its end.  Deterministic under
  ``maxFilesPerTrigger=1`` file ordering, which is how the test pins
  drop + emission behavior.

Scale shape: the window aggregate shuffles once on (window, key) with
map-side partial aggregation; state is O(open windows × keys), bounded
BECAUSE of the watermark (without it, append-mode state grows forever
— the reason the watermark is non-optional in this module's API).

Window starts are reported as epoch SECONDS (bigint): Spark renders
timestamps in the session zone while DuckDB's are zone-naive, so an
epoch integer is the only representation that hash-compares
identically across both engines regardless of host timezone.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def events_schema() -> T.StructType:
    """Schema of the driver's events table (TESTDATA.md)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    schema: T.StructType | None = None,
    output_mode: str = "complete",
    available_now: bool = True,
):
    """Start the windowed count stream; returns (query, table_name).

    The result lands in an in-memory sink table ``table_name`` with
    columns (window_start: bigint epoch seconds, event_type: string,
    n_events: bigint).  Memory-sink capacity is not a concern at any
    corpus scale: the table holds one row per (window, type), not per
    event — a production deployment swaps in the foreachBatch snapshot
    sink from ``ingest.py`` unchanged."""
    stream = (
        spark.readStream.schema(schema or events_schema())
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), window).alias("win"),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    name = f"windowed_counts_{uuid.uuid4().hex[:12]}"
    writer = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), name


def final_windowed_counts(spark: SparkSession, table_name: str) -> DataFrame:
    """Read the sink table (complete mode: the exact batch-equivalent
    aggregation; append mode: the watermark-closed windows)."""
    return spark.table(table_name)
