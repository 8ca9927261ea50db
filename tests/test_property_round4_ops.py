"""Property-based checks for the round-4 final-wave operators:
alias canonicalization (three-way engine parity), best-match edge
restriction (vs a brute-force Python reference), and duplicated-span
detection (vs a brute-force positional-gram reference)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.functions.aliases import (
    NICKNAMES,
    alias_canonical_col,
    alias_canonical_py,
    alias_canonical_sql,
)

SET = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# token soup mixing nicknames, formal names, and junk — multi-space
# runs included on purpose (split/list semantics must agree)
_TOKENS = list(NICKNAMES)[:12] + ["karim", "svensson", "x", ""]
name_strings = st.lists(
    st.sampled_from(_TOKENS), min_size=0, max_size=5
).map(" ".join)


@SET
@given(s=name_strings)
def test_alias_canonical_three_way(spark, s):
    got_py = alias_canonical_py(s)
    got_spark = spark.createDataFrame([(s,)], "v string").select(
        alias_canonical_col(F.col("v")).alias("o")
    ).collect()[0]["o"]
    con = duckdb.connect()
    con.execute("create temp table t(v varchar)")
    con.execute("insert into t values (?)", [s])
    got_duck = con.execute(
        f"select {alias_canonical_sql('v')} from t"
    ).fetchone()[0]
    assert got_spark == got_duck == got_py


def _best_match_ref(pairs, tau, mutual):
    """Pure-Python reference for best_match_edges."""
    best = {}
    for a, b, s in pairs:
        if s < tau:
            continue
        for u, v in ((a, b), (b, a)):
            cur = best.get(u)
            # max score, ties by smallest neighbor id
            if cur is None or (-s, v) < cur[0]:
                best[u] = ((-s, v), v)
    edges = set()
    for u, (_k, v) in best.items():
        if mutual:
            if best.get(v, (None, None))[1] == u and u < v:
                edges.add((u, v))
        else:
            edges.add((min(u, v), max(u, v)))
    return edges


pair_graphs = st.lists(
    st.tuples(
        st.integers(0, 7),
        st.integers(0, 7),
        st.sampled_from([0.3, 0.5, 0.6, 0.7, 0.8, 0.9]),
    ),
    min_size=0,
    max_size=12,
)


@SET
@given(raw=pair_graphs, mutual=st.booleans())
def test_best_match_edges_matches_bruteforce(spark, raw, mutual):
    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        best_match_edges,
    )

    # normalize to unique a<b pairs with one score each (the operator's
    # documented input contract, produced upstream by score_pairs)
    seen = {}
    for a, b, s in raw:
        if a == b:
            continue
        key = (f"n{min(a, b)}", f"n{max(a, b)}")
        seen.setdefault(key, s)
    pairs = [(a, b, s) for (a, b), s in seen.items()]
    want = _best_match_ref(pairs, 0.5, mutual)
    if not pairs:
        return
    df = spark.createDataFrame(
        pairs, "node_a string, node_b string, score double"
    )
    got = {
        (r["node_a"], r["node_b"])
        for r in best_match_edges(df, 0.5, mutual=mutual).collect()
    }
    assert got == want


def _spans_ref(rows, n=3, min_df=2):
    """Brute-force positional-gram reference for duplicated_spans."""
    import re

    toks = {d: re.findall("[a-z]+", t.lower()) for d, t in rows}
    grams = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[i:i + n]), set()).add(d)
    flagged = {
        d: sorted(
            i + 1
            for i in range(len(ts) - n + 1)
            if len(grams[" ".join(ts[i:i + n])]) >= min_df
        )
        for d, ts in toks.items()
    }
    out = set()
    for d, ps in flagged.items():
        run = []
        for p in ps:
            if run and p - run[-1] <= n:
                run.append(p)
            else:
                if run:
                    out.add((d, run[0], run[-1] + n - 1, len(run)))
                run = [p]
        if run:
            out.add((d, run[0], run[-1] + n - 1, len(run)))
    return out


doc_texts = st.lists(
    st.sampled_from(["aa bb cc", "aa bb cc dd", "dd ee", "zz", ""]),
    min_size=1,
    max_size=4,
)


@SET
@given(texts=doc_texts)
def test_duplicated_spans_matches_bruteforce(spark, texts):
    from rosette_elasticsearch_plugin_spark.operators.dedup import (
        duplicated_spans,
    )

    rows = [(i, " ".join([t, "u%d" % i, t]) if t else t)
            for i, t in enumerate(texts)]
    want = _spans_ref(rows)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicated_spans(df).collect()
    }
    assert got == want


# ---- incrementality invariants under random corpora --------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
small_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6).map(" ".join),
    min_size=2,
    max_size=5,
)

INC_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@INC_SET
@given(texts=small_docs, data=st.data())
def test_retract_near_dup_random_equals_recompute(spark, texts, data):
    """retract_near_dup_pairs == full recompute over survivors for
    random tiny corpora, random delete sets, and a cap small enough
    that hot buckets / rep churn occur."""
    from rosette_elasticsearch_plugin_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    removed_ids = data.draw(
        st.sets(st.sampled_from([r[0] for r in rows]), max_size=len(rows))
    )
    d = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
    cap = data.draw(st.sampled_from([1, 2]))
    prior = dedup.near_dup_pairs(d, threshold=0.3, max_bucket=cap)
    idx = dedup.extend_band_index(None, d)
    removed = spark.createDataFrame(
        [(i,) for i in removed_ids] or [(-1,)], ["doc_id"]
    )
    got = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 6))
        for r in dedup.retract_near_dup_pairs(
            d, idx, prior, removed, threshold=0.3, max_bucket=cap
        ).collect()
    }
    surv = d.join(removed, "doc_id", "left_anti")
    want = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 6))
        for r in dedup.near_dup_pairs(
            surv, threshold=0.3, max_bucket=cap
        ).collect()
    }
    assert got == want


@INC_SET
@given(texts=small_docs, split=st.integers(1, 4))
def test_incremental_spans_random_equals_recompute(spark, texts, split):
    """incremental_duplicated_spans == full recompute for random tiny
    corpora and arbitrary batch splits."""
    from rosette_elasticsearch_plugin_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    cut = min(split, len(rows) - 1)
    b1 = spark.createDataFrame(rows[:cut], ["doc_id", "text"])
    b2 = spark.createDataFrame(rows[cut:], ["doc_id", "text"])
    full = spark.createDataFrame(rows, ["doc_id", "text"])
    _idx, spans = dedup.incremental_duplicated_spans(
        dedup.gram_index(b1), dedup.duplicated_spans(b1), b2
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in spans.collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicated_spans(full).collect()
    }
    assert got == want
