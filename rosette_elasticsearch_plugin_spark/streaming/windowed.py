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


def session_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    key: str = "event_type",
    schema: T.StructType | None = None,
    output_mode: str = "complete",
    available_now: bool = True,
):
    """Sessionization — the SESSION-window flavor of the built-in
    streaming aggregation surface (``F.session_window``): a session is
    a maximal run of events per ``key`` where consecutive gaps stay
    under ``gap``; the window is ``[first event, last event + gap)``.

    Unlike tumbling windows, session windows MERGE across micro-batches:
    an event in batch N can extend (or bridge two of) the sessions built
    in batches 1..N-1, so the state store does genuine window-merge work
    — this is the operator that exercises it.  Complete-mode final table
    ≡ the batch ``session_window`` aggregation ≡ a gaps-and-islands SQL
    (new session when ``ts - lag(ts) >= gap``), which is the exact
    oracle; append mode additionally withholds sessions the watermark
    has not yet closed (pinned in tests).

    Scale shape: one shuffle on the session key with in-state window
    merging; state is O(open sessions × keys) and bounded by the
    watermark.  Returns (query, table_name); the sink table has one row
    per closed session — (session_start, session_end: bigint epoch
    seconds, ``key``, n_events) — never one per event.

    Late-data caveat (measured, differs from tumbling windows): the
    session operator filters events older than the watermark in EVERY
    output mode — complete mode does NOT exempt them the way the
    tumbling-window aggregation above does.  Feed batches in
    (approximate) event-time order, or size the watermark to the real
    disorder bound; replaying a history as interleaved micro-batches
    under a small watermark silently drops most of it (pinned in
    tests/test_streaming.py)."""
    stream = (
        spark.readStream.schema(schema or events_schema())
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("win"),
            key,
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("session_start"),
            F.unix_timestamp(F.col("win.end")).alias("session_end"),
            key,
            "n_events",
        )
    )
    name = f"session_counts_{uuid.uuid4().hex[:12]}"
    writer = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), name


def session_counts_sql(
    gap_interval: str = "30 minutes",
    key: str = "event_type",
    events_from: str = "events",
) -> str:
    """Gaps-and-islands mirror of :func:`session_event_counts`'s
    complete-mode final table: new session when the gap to the previous
    event (per key) is >= the session gap — sessions are ``[start,
    last + gap)`` half-open, so an event landing exactly on a session's
    end starts a NEW session (verified value-identical to Spark's
    ``session_window`` on the driver corpus)."""
    return f"""
with m as (select {key}, ts,
        case when lag(ts) over (partition by {key} order by ts) is null
               or ts - lag(ts) over (partition by {key} order by ts)
                  >= interval '{gap_interval}'
             then 1 else 0 end as new_sess
      from {events_from}),
s as (select {key}, ts,
        sum(new_sess) over (partition by {key} order by ts
                            rows unbounded preceding) as sid
      from m)
select cast(floor(epoch(min(ts))) as bigint) as session_start,
       cast(floor(epoch(max(ts) + interval '{gap_interval}')) as bigint)
         as session_end,
       {key}, cast(count(*) as bigint) as n_events
from s group by {key}, sid"""
