"""As-of join (operators/asof.asof_join): hand-built cases pinning the
tie discipline — latest prior wins, equal timestamp counts as prior,
equal-ts right rows break to the largest tie id, missing prior yields
NULLs — plus a randomized equivalence check against a python brute
force."""

import datetime as dt
import random

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators.asof import asof_join

_T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return _T0 + dt.timedelta(seconds=sec)


def _frames(spark, left_rows, right_rows):
    schema = "user_id long, event_id long, ts timestamp, value double"
    return (
        spark.createDataFrame(left_rows, schema),
        spark.createDataFrame(right_rows, schema),
    )


def _run(spark, left_rows, right_rows):
    l, r = _frames(spark, left_rows, right_rows)
    out = asof_join(l, r, on="user_id", payload_cols=("value",))
    return {
        row["event_id"]: (row["ref_event_id"], row["ref_value"])
        for row in out.collect()
    }


def test_latest_prior_wins(spark):
    got = _run(
        spark,
        [(1, 100, _ts(10), 0.0)],
        [(1, 1, _ts(1), 1.0), (1, 2, _ts(5), 2.0), (1, 3, _ts(11), 3.0)],
    )
    assert got == {100: (2, 2.0)}


def test_equal_ts_counts_as_prior(spark):
    got = _run(
        spark,
        [(1, 100, _ts(5), 0.0)],
        [(1, 1, _ts(5), 1.0)],
    )
    assert got == {100: (1, 1.0)}


def test_equal_ts_right_ties_break_to_largest_id(spark):
    got = _run(
        spark,
        [(1, 100, _ts(5), 0.0)],
        [(1, 1, _ts(3), 1.0), (1, 7, _ts(3), 7.0), (1, 4, _ts(3), 4.0)],
    )
    assert got == {100: (7, 7.0)}


def test_no_prior_yields_nulls_and_keys_partition(spark):
    got = _run(
        spark,
        [(1, 100, _ts(1), 0.0), (2, 200, _ts(9), 0.0)],
        [(1, 1, _ts(5), 1.0), (2, 2, _ts(4), 2.0)],
    )
    # user 1's only right row is later -> NULL ref; user 2 never sees
    # user 1's rows
    assert got == {100: (None, None), 200: (2, 2.0)}


def test_matches_bruteforce_on_random_streams(spark):
    rng = random.Random(7)
    left_rows, right_rows = [], []
    eid = 0
    for u in range(5):
        for _ in range(rng.randint(3, 8)):
            eid += 1
            left_rows.append((u, eid, _ts(rng.randint(0, 50)), float(eid)))
        for _ in range(rng.randint(3, 8)):
            eid += 1
            right_rows.append((u, eid, _ts(rng.randint(0, 50)), float(eid)))
    got = _run(spark, left_rows, right_rows)

    def brute(u, ts):
        cands = [(r[2], r[1], r[3]) for r in right_rows
                 if r[0] == u and r[2] <= ts]
        if not cands:
            return (None, None)
        best = max(cands)  # (ts, event_id) lexicographic = tie discipline
        return (best[1], best[2])

    for (u, e, ts, _v) in left_rows:
        assert got[e] == brute(u, ts), (u, e, ts)


# --- bucketed range join ----------------------------------------------------------


def test_range_join_matches_bruteforce(spark, tmp_path):
    """Dense synthetic stream: the bucketed interval join must equal
    the quadratic point-in-interval definition, including sessions
    spanning multiple buckets and purchases outside any session."""
    import datetime as dt

    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        _SESSION_GAP_US,
        q_events_range_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    GAP = _SESSION_GAP_US // 1_000_000  # seconds
    rows, eid = [], 0

    def add(u, sec, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=sec), u, typ, 1.0, "{}"))

    for u in range(3):
        # session A: three clicks spanning 2.5 gap-widths (multi-bucket)
        for s in (0, GAP - 10, int(GAP * 2.5) - 30):
            add(u, s, "click")
        # purchase inside session A, one outside any session, one at
        # the exact session edge (ts == end -> contained)
        add(u, GAP // 2, "purchase")
        add(u, GAP * 10, "purchase")
        add(u, int(GAP * 2.5) - 30, "purchase")
        # session B much later
        add(u, GAP * 20, "view")
        add(u, GAP * 20 + 5, "purchase")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        (r["event_id"], r["session_seq"]): (r["start_us"], r["end_us"])
        for r in q_events_range_join(spark, str(tmp_path)).collect()
    }

    # brute force in python
    base = sorted(
        [(r[2], int(r[1].timestamp() * 1e6), r[0]) for r in rows
         if r[3] != "purchase"]
    )
    sessions = {}
    for u in {b[0] for b in base}:
        evs = [(ts, e) for (uu, ts, e) in base if uu == u]
        seq, prev = 0, None
        for ts, e in evs:
            if prev is None or ts - prev > _SESSION_GAP_US:
                seq += 1
                sessions[(u, seq)] = [ts, ts]
            else:
                sessions[(u, seq)][1] = ts
            prev = ts
    want = {}
    for r in rows:
        if r[3] != "purchase":
            continue
        ts = int(r[1].timestamp() * 1e6)
        for (u, seq), (a, b) in sessions.items():
            if u == r[2] and a <= ts <= b:
                want[(r[0], seq)] = (a, b)
    assert got == want
    # per user exactly 2 matches: inside-A and edge-of-A; the GAP*10
    # probe is outside any session, and session B is the single 'view'
    # point-interval so the +5 s purchase falls outside it
    assert len(got) == 6


# --- physical-plan shape pins ------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_join_plans_no_nested_loop(spark):
    """The bucketed rewrite must plan as an equi-join: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere — that is the
    entire point of the bucket trick at 10^12 rows."""
    from rosette_elasticsearch_plugin_spark.operators.asof import (
        interval_join,
    )

    pts = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").alias("pid"),
        (F.col("id") * 1000).alias("ts_us"),
    )
    ivs = spark.range(20).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").alias("iid"),
        (F.col("id") * 5000).alias("start_us"),
        (F.col("id") * 5000 + 3000).alias("end_us"),
    )
    plan = _plan(interval_join(pts, ivs, on="k"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_exchange(spark):
    """The union + ordered-window as-of plan shuffles exactly once (the
    key repartition for the window); a second data Exchange would mean
    the union or the carry re-partitioned — the failure mode the
    operator exists to avoid."""
    import datetime as dt

    l, r = (
        spark.createDataFrame(
            [(1, i, dt.datetime(2024, 1, 1, 0, 0, i), 1.0) for i in range(3)],
            "user_id long, event_id long, ts timestamp, value double",
        )
        for _ in range(2)
    )
    from rosette_elasticsearch_plugin_spark.operators.asof import asof_join

    plan = _plan(asof_join(l, r, on="user_id", payload_cols=("value",)))
    n_exchange = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchange <= 1, plan


def test_funnel_stages_semantics(spark):
    """Crafted chains: full in-window chain → 3; purchase outside the
    24 h window of the view → 2; purchase BEFORE the click → 2; click
    with no prior view → 1 only if a view exists; no step-1 → 0."""
    from rosette_elasticsearch_plugin_spark.operators.asof import (
        FUNNEL_WINDOW_US,
        funnel_stages,
    )

    H = 3_600_000_000  # one hour in µs
    rows = [
        # u1: view(0) click(1h) purchase(2h) — full chain
        (1, 1, "view", 0), (2, 1, "click", H), (3, 1, "purchase", 2 * H),
        # u2: purchase lands past the window of the only view
        (4, 2, "view", 0), (5, 2, "click", H),
        (6, 2, "purchase", FUNNEL_WINDOW_US + 2 * H),
        # u3: purchase precedes the click — order broken, stage 2
        (7, 3, "view", 0), (8, 3, "purchase", H), (9, 3, "click", 2 * H),
        # u4: click before any view — stage 1 (a later view exists)
        (10, 4, "click", 0), (11, 4, "view", H),
        # u5: no view at all
        (12, 5, "click", 0), (13, 5, "purchase", H),
        # u6: late view re-anchors the window: old view far back, new
        # view + click + purchase tight — stage 3 through the new chain
        (14, 6, "view", 0), (15, 6, "click", H),
        (16, 6, "view", 10 * H), (17, 6, "click", 11 * H),
        (18, 6, "purchase", 12 * H),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    )
    got = {
        r["user_id"]: r["funnel_stage"]
        for r in funnel_stages(df).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2, 4: 1, 5: 0, 6: 3}
