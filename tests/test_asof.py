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
