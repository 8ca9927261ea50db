"""As-of join: each left row picks the latest right row at or before
its timestamp, per key — the temporal-enrichment operator Spark's
built-in join types lack (every event joined to the newest prior
reference state: a price tick, a cluster snapshot, a session start).

Implementation is the scale-correct union + ordered-window plan, not a
per-key merge UDF: tag both sides, sort each key's rows by (ts, side,
tie), and carry the right side's payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding running
frame.  ONE shuffle on the key (the window's partitionBy), no
per-row Python, no pair blow-up — at 10^12 rows this is a single
repartition + linear scan per key, and AQE handles hot keys the same
way it does any skewed window.

Tie discipline (what makes the result exactly mirrorable): right rows
sort BEFORE left rows at equal ts (an equal-timestamp reference
counts as "prior", DuckDB-ASOF's >= convention), and among right rows
with identical ts the largest tie-break id wins.  The DuckDB oracle
deliberately uses a structurally different plan (left join +
row_number qualify) so the hash match cross-checks the window logic
rather than re-running it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    tie_col: str = "event_id",
    payload_cols: tuple[str, ...] = (),
    prefix: str = "ref_",
) -> DataFrame:
    """For every left row: the latest right row with the same ``on``
    key and ``right.ts <= left.ts`` (ties per the module discipline).
    Output = all left columns + ``prefix``-renamed right ts/tie/payload
    columns (NULL when no prior right row exists)."""
    rcols = [ts_col, tie_col, *payload_cols]
    r = right.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.col(tie_col).alias("__tie"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
    )
    lft = left.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.col(tie_col).alias("__tie"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in rcols],
        *[F.col(c) for c in left.columns if c != on],
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lft.unionByName(r).select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True)
            .over(w)
            .alias(f"__carry_{c}")
            for c in rcols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        on,
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(f"__carry_{c}").alias(f"{prefix}{c}") for c in rcols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int = 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Point-in-interval (range) join without the per-key cross
    product a theta join plans to: each interval is replicated to the
    fixed-width time buckets it spans (ceil(duration/width)+1 bounded
    rows), each point carries its single bucket, and the range
    predicate becomes an equi-join on (key, bucket) plus a containment
    filter.  A point matches an interval through exactly one bucket —
    its own — so the rewrite needs no dedup stage and is logically
    identical to ``points ⋈ start <= ts <= end`` (proven against the
    quadratic plan by the driver oracle and pytest brute force).

    Inputs carry integer timestamp columns (epoch micros); output =
    all point columns + all interval columns (minus the key, carried
    once).  At 10^12 rows choose ``bucket_width`` near the typical
    interval length: wider wastes filter work, narrower multiplies
    interval replicas."""
    ivals = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"{end_col} div {bucket_width}"),
            )
        ).alias("__bkt"),
    )
    pts = points.select(
        "*", F.expr(f"{ts_col} div {bucket_width}").alias("__bkt")
    )
    return (
        pts.join(ivals, [on, "__bkt"])
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bkt")
    )


FUNNEL_WINDOW_US = 86_400_000_000  # 24 h


def funnel_stages(
    events: DataFrame,
    seq: tuple[str, str, str] = ("view", "click", "purchase"),
    window_us: int = FUNNEL_WINDOW_US,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    event_id_col: str = "event_id",
) -> DataFrame:
    """(user_id, funnel_stage): the deepest prefix of ``seq`` each user
    completes as an ordered event chain e1 < e2 < e3 with the LAST
    step within ``window_us`` of the first (the windowFunnel
    semantics, stated as an exists-chain).

    One shuffle (partition by user), then pure running-max windows over
    the (ts, event_id)-ordered stream — never a per-user self-join:

    * at each step-2 event, the latest step-1 time strictly before it
      (the latest anchor is the within-window witness iff any is);
    * at each step-3 event, the running max over prior step-2 events
      of THEIR latest-prior-step-1 time — the best chain anchor; the
      chain exists iff it is ≥ ts − window.

    Scale shape: per-user state is O(1) window aggregates over one
    sort — at 10^12 events this is the one-pass sessionization plan,
    with AQE handling user skew."""
    from pyspark.sql import Window

    s1, s2, s3 = seq
    order = Window.partitionBy(user_col).orderBy(ts_col, event_id_col)
    prior = order.rowsBetween(Window.unboundedPreceding, -1)
    ts = F.col(ts_col)
    e = events.select(
        user_col, event_id_col, ts_col, F.col(type_col).alias("et")
    )
    e = e.withColumn(
        "lv", F.max(F.when(F.col("et") == s1, ts)).over(prior)
    )
    e = e.withColumn(
        "anchor2",
        F.max(
            F.when(F.col("et") == s2, F.col("lv"))
        ).over(prior),
    )
    flags = e.select(
        user_col,
        F.when(F.col("et") == s1, 1).otherwise(0).alias("f1"),
        F.when(
            (F.col("et") == s2)
            & F.col("lv").isNotNull()
            & (ts - F.col("lv") <= window_us),
            1,
        ).otherwise(0).alias("f2"),
        F.when(
            (F.col("et") == s3)
            & F.col("anchor2").isNotNull()
            & (ts - F.col("anchor2") <= window_us),
            1,
        ).otherwise(0).alias("f3"),
    )
    agg = flags.groupBy(user_col).agg(
        F.max("f1").alias("r1"), F.max("f2").alias("r2"),
        F.max("f3").alias("r3"),
    )
    return agg.select(
        user_col,
        F.when(F.col("r3") == 1, 3)
        .when(F.col("r2") == 1, 2)
        .when(F.col("r1") == 1, 1)
        .otherwise(0)
        .cast("long")
        .alias("funnel_stage"),
    )
