"""One-to-one assignment, Bloom PPRL encodings, and adjusted Rand.

Each operator is checked for its algebraic invariants plus an exact
cross-engine mirror where one exists (bloom positions, dice).
"""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- one-to-one
def test_one_to_one_is_mutual_best(spark):
    from rosette_elasticsearch_plugin_spark.resolution.assignment import (
        one_to_one_links,
    )

    rows = [
        # a1's best is b1 and vice versa -> kept
        ("a1", "b1", 0.9),
        ("a1", "b2", 0.8),
        ("a2", "b1", 0.7),
        # a2's best is b2, but b2's global best is a1 -> NOT mutual
        # (single-round semantics: no iterative re-matching of losers)
        ("a2", "b2", 0.75),
        # a3's best b3, but b3 prefers a4 -> a3 unmatched, (a4,b3) kept
        ("a3", "b3", 0.72),
        ("a4", "b3", 0.95),
    ]
    df = spark.createDataFrame(rows, ["a_node", "b_node", "score"])
    got = {
        (r.a_node, r.b_node) for r in one_to_one_links(df).collect()
    }
    assert got == {("a1", "b1"), ("a4", "b3")}


def test_one_to_one_tie_breaks_lexicographically(spark):
    from rosette_elasticsearch_plugin_spark.resolution.assignment import (
        one_to_one_links,
    )

    rows = [("a1", "b2", 0.9), ("a1", "b1", 0.9), ("a2", "b2", 0.9)]
    df = spark.createDataFrame(rows, ["a_node", "b_node", "score"])
    got = {(r.a_node, r.b_node) for r in one_to_one_links(df).collect()}
    # a1 ties b1/b2 -> picks b1 (lexicographic); b2's best-by-tie is a1,
    # but a1 chose b1, so (a2,b2) fails mutuality only if b2 ranks a1
    # first — it does (a1 < a2), so b2 stays unmatched.
    assert got == {("a1", "b1")}


def test_one_to_one_sql_mirror(spark, duck):
    from rosette_elasticsearch_plugin_spark.resolution.assignment import (
        one_to_one_links,
        one_to_one_sql,
    )

    rows = [
        ("a%d" % i, "b%d" % j, round(((i * 7 + j * 13) % 10) / 10.0, 6))
        for i in range(6)
        for j in range(6)
    ]
    df = spark.createDataFrame(rows, ["a_node", "b_node", "score"])
    got = {
        (r.a_node, r.b_node, r.score)
        for r in one_to_one_links(df).collect()
    }
    vals = ", ".join(
        "('%s','%s',cast(%s as double))" % r for r in rows
    )
    sql = (
        "with pairs(a_node, b_node, score) as (values " + vals + ") "
        + one_to_one_sql("pairs")
    )
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------- bloom PPRL
def test_bloom_positions_match_python_model(spark):
    """Spark encoding == reference python recomputation (h56 of salted
    bigrams mod m), including the len<2 whole-string fallback."""
    import hashlib

    from rosette_elasticsearch_plugin_spark.functions.bloom import (
        BLOOM_K,
        BLOOM_M,
        bloom_positions_col,
    )

    def py_bloom(s):
        grams = (
            [s]
            if len(s) < 2
            else [s[i : i + 2] for i in range(len(s) - 1)]
        )
        pos = {
            int(hashlib.md5(f"{i}:{g}".encode()).hexdigest()[:14], 16)
            % BLOOM_M
            for i in range(BLOOM_K)
            for g in grams
        }
        return sorted(pos)

    names = ["bruno herrera", "b herrera", "dan aykroyd", "x", "ab"]
    df = spark.createDataFrame([(n,) for n in names], ["key"])
    got = {
        r.key: list(r.p)
        for r in df.select(
            "key", bloom_positions_col(F.col("key")).alias("p")
        ).collect()
    }
    for n in names:
        assert got[n] == py_bloom(n), n


def test_bloom_sql_mirror_and_dice(spark, duck):
    from rosette_elasticsearch_plugin_spark.functions.bloom import (
        bloom_positions_col,
        bloom_positions_sql,
        dice_col,
        dice_sql,
    )

    names = ["bruno herrera", "bruno herrrera", "matt damon", "ab"]
    df = spark.createDataFrame([(n,) for n in names], ["key"])
    enc = df.select("key", bloom_positions_col(F.col("key")).alias("p"))
    pairs = (
        enc.alias("x")
        .crossJoin(enc.alias("y"))
        .where(F.col("x.key") < F.col("y.key"))
        .select(
            F.col("x.key").alias("ka"),
            F.col("y.key").alias("kb"),
            dice_col(F.col("x.p"), F.col("y.p")).alias("dice"),
        )
    )
    got = {(r.ka, r.kb): r.dice for r in pairs.collect()}
    for (ka, kb), d in got.items():
        pa = bloom_positions_sql("'%s'" % ka)
        pb = bloom_positions_sql("'%s'" % kb)
        want = duck.execute(
            "select " + dice_sql(pa, pb)
        ).fetchone()[0]
        assert d == pytest.approx(want, abs=1e-9), (ka, kb)
    # near-duplicate names score far above unrelated ones
    assert got[("bruno herrera", "bruno herrrera")] > 0.85
    assert got[("bruno herrera", "matt damon")] < 0.5


def test_bloom_null_propagates(spark):
    from rosette_elasticsearch_plugin_spark.functions.bloom import (
        bloom_positions_col,
    )

    df = spark.createDataFrame([(None,), ("ok",)], "key string")
    rows = {
        r.key: r.p
        for r in df.select(
            "key", bloom_positions_col(F.col("key")).alias("p")
        ).collect()
    }
    assert rows[None] is None and rows["ok"] is not None


# ------------------------------------------------------------- adjusted rand
def _ari_df(spark, assign):
    return spark.createDataFrame(assign, ["entity_label", "cluster"])


def test_adjusted_rand_perfect_and_chance(spark):
    from rosette_elasticsearch_plugin_spark.resolution.evaluate import (
        adjusted_rand,
    )

    perfect = [("e1", "c1")] * 3 + [("e2", "c2")] * 4
    row = adjusted_rand(_ari_df(spark, perfect)).collect()[0]
    assert row.ari == 1.0
    # single cluster over two labels: max == exp -> defined as 1.0 only
    # when identical; here idx < exp so ari < 1
    merged = [("e1", "c1")] * 3 + [("e2", "c1")] * 3
    row2 = adjusted_rand(_ari_df(spark, merged)).collect()[0]
    assert row2.ari < 1.0


def test_adjusted_rand_matches_sklearn_formula(spark):
    from rosette_elasticsearch_plugin_spark.resolution.evaluate import (
        adjusted_rand,
    )

    # hand-computed: labels [1,1,2,2,2], clusters [a,a,a,b,b]
    assign = [
        ("e1", "a"),
        ("e1", "a"),
        ("e2", "a"),
        ("e2", "b"),
        ("e2", "b"),
    ]
    row = adjusted_rand(_ari_df(spark, assign)).collect()[0]
    # contingency: n(a,e1)=2 n(a,e2)=1 n(b,e2)=2 -> idx=1+0+1=2
    # a: C(3,2)+C(2,2)=4 ; b: C(2,2)+C(3,2)=4 ; n2=C(5,2)=10
    # exp=1.6, max=4 -> ari=(2-1.6)/(4-1.6)=1/6
    assert row.n_pairs == 10
    assert row.ari == pytest.approx(1 / 6, abs=1e-6)


# ------------------------------------------------------------ cluster repair
def test_cluster_repair_splits_weak_bridge(spark):
    """A chain a-b-c where b attaches weakly: repair splits b out and
    a/c separate (the bridge was b), while a strong pair stays merged."""
    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        cluster_repair,
    )

    names = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",)], ["node"]
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 0.72),  # weak: b's best is 0.72 < 0.8
            ("b", "c", 0.71),
            ("x", "y", 0.95),  # strong pair survives
        ],
        ["node_a", "node_b", "score"],
    )
    got = {
        r.node: r for r in cluster_repair(names, edges, 0.8).collect()
    }
    # before: {a,b,c} one cluster, {x,y} one cluster
    assert got["a"].cluster_before == got["c"].cluster_before == "a"
    # after: a and c both had ONLY weak edges -> all three singletons
    assert got["a"].cluster_after == "a"
    assert got["b"].cluster_after == "b"
    assert got["c"].cluster_after == "c"
    assert got["b"].moved and got["c"].moved
    assert got["x"].cluster_after == got["y"].cluster_after == "x"
    assert not got["x"].moved


def test_cluster_repair_keeps_strong_core(spark):
    """Removing a weak satellite must not split the strong core."""
    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        cluster_repair,
    )

    names = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("w",)], ["node"]
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.85),
            ("c", "w", 0.71),  # w weakly attached to the strong core
        ],
        ["node_a", "node_b", "score"],
    )
    got = {
        r.node: r for r in cluster_repair(names, edges, 0.8).collect()
    }
    assert got["a"].cluster_after == got["b"].cluster_after == "a"
    assert got["c"].cluster_after == "a"
    assert got["w"].cluster_after == "w" and got["w"].moved
