"""Semantics pins for the round-4 wave-3 operators: rarest-token
(canopy-surrogate) blocking, soft-TF-IDF cosine scoring, and the
cross-document boilerplate n-gram profile."""

import pytest
from pyspark.sql import functions as F


def _names(spark, rows):
    return spark.createDataFrame(rows, "node string, key string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "node_a string, node_b string")


# --- rarest-token blocking -------------------------------------------------------


def test_rare_token_one_key_per_node(spark):
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        rare_token_blocks,
    )

    names = _names(
        spark,
        [
            ("john smith", "john smith"),
            ("john aardvark", "john aardvark"),
            ("mary smith", "mary smith"),
        ],
    )
    out = {r["node"]: r["block_key"] for r in rare_token_blocks(names).collect()}
    # exactly one key per node
    assert len(out) == 3
    # 'john' and 'smith' each appear twice; 'aardvark' and 'mary' once —
    # each node keys on its globally rarest token
    assert out["john aardvark"] == "r:aardvark"
    assert out["mary smith"] == "r:mary"
    # all of john smith's tokens have df=2 → lexicographic tie-break
    assert out["john smith"] == "r:john"


def test_rare_token_min_len_and_blocks_collide(spark):
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        rare_token_blocks,
    )

    # single-letter initials are dropped ('j' never becomes a key), and
    # the two variants sharing the rare surname land in the same block
    # (the canopy the family exists to create) while the common given
    # name does not drag every 'john' together
    names = _names(
        spark,
        [
            ("j aardvark", "j aardvark"),
            ("john aardvark", "john aardvark"),
            ("john zebra", "john zebra"),
            ("john quokka", "john quokka"),
        ],
    )
    out = {r["node"]: r["block_key"] for r in rare_token_blocks(names).collect()}
    # df: john=3, aardvark=2, zebra=1, quokka=1
    assert out["j aardvark"] == "r:aardvark"
    assert out["john aardvark"] == "r:aardvark"
    assert out["john zebra"] == "r:zebra"
    assert out["john quokka"] == "r:quokka"


# --- soft TF-IDF cosine ----------------------------------------------------------


def test_tfidf_cosine_identity_and_disjoint(spark):
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        tfidf_cosine_scores,
    )

    names = _names(
        spark,
        [
            ("a", "john smith"),
            ("b", "john smith"),
            ("c", "liu wei"),
        ],
    )
    pairs = _pairs(spark, [("a", "b"), ("a", "c")])
    out = {
        (r["node_a"], r["node_b"]): (r["n_shared"], r["cos"])
        for r in tfidf_cosine_scores(pairs, names).collect()
    }
    assert out[("a", "b")] == (2, 1.0)  # identical token sets
    assert out[("a", "c")] == (0, 0.0)  # disjoint → explicit zero row


def test_tfidf_cosine_rare_token_outweighs_common(spark):
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        tfidf_cosine_scores,
    )

    # 'john' is common (df=4), surnames are rare (df=1): sharing the
    # rare surname must score higher than sharing the common given name
    names = _names(
        spark,
        [
            ("a", "john aardvark"),
            ("b", "mary aardvark"),
            ("c", "john zebra"),
            ("d", "john quokka"),
            ("e", "john okapi"),
        ],
    )
    pairs = _pairs(spark, [("a", "b"), ("a", "c")])
    out = {
        (r["node_a"], r["node_b"]): r["cos"]
        for r in tfidf_cosine_scores(pairs, names).collect()
    }
    assert out[("a", "b")] > out[("a", "c")]
    assert 0.0 < out[("a", "c")] < out[("a", "b")] < 1.0


# --- cross-document boilerplate n-grams ------------------------------------------


@pytest.fixture(scope="module")
def boiler_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boiler"))
    tmpl = "all rights reserved worldwide"
    rows = [
        # three docs sharing the 4-token template → its 3-grams reach
        # BOILER_K=3; each doc also has unique content grams
        (0, f"{tmpl} alpha beta gamma delta"),
        (1, f"{tmpl} epsilon zeta eta theta"),
        (2, f"{tmpl} iota kappa lam mu"),
        # a pure-content doc: zero boilerplate
        (3, "nu xi omicron pi rho sigma"),
        # too short for a 3-gram: must not appear at all
        (4, "tau upsilon"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "srcT", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_common_ngrams_flags_template_docs(spark, boiler_dir):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_dedup_common_ngrams,
    )

    out = {
        r["doc_id"]: r for r in q_dedup_common_ngrams(spark, boiler_dir).collect()
    }
    # doc 4 has <3 tokens → no grams → absent
    assert set(out) == {0, 1, 2, 3}
    # the shared template contributes exactly its two 3-grams per doc
    for d in (0, 1, 2):
        assert out[d]["n_boiler"] == 2
        assert 0.0 < out[d]["boiler_frac"] < 1.0
    assert out[3]["n_boiler"] == 0
    assert out[3]["boiler_frac"] == 0.0


def test_ngram_topk_deterministic_ties(spark, boiler_dir):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_corpus_ngram_topk,
    )

    rows = q_corpus_ngram_topk(spark, boiler_dir).collect()
    assert rows, "top-k must be non-empty"
    # the two template 3-grams lead with df=3, lexicographic order
    assert [(r["gram"], r["df"]) for r in rows[:2]] == [
        ("all rights reserved", 3),
        ("rights reserved worldwide", 3),
    ]
    # ranking is (df desc, gram asc) throughout
    ks = [(-r["df"], r["gram"]) for r in rows]
    assert ks == sorted(ks)


# --- TF-IDF-edge resolution + per-family budget -----------------------------------


def test_tfidf_resolve_links_token_permutations_only(spark):
    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        connected_components,
    )
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        tfidf_cosine_scores,
    )

    # same token set (reordered) → cos 1.0 → linked; a typo'd variant
    # shares only the common token → below tau → NOT linked (the
    # structural recall ceiling documented at TFIDF_TAU)
    names = _names(
        spark,
        [
            ("dan aykroyd", "dan aykroyd"),
            ("aykroyd dan", "aykroyd dan"),
            ("dan aykroid", "dan aykroid"),
        ],
    )
    pairs = _pairs(
        spark,
        [("aykroyd dan", "dan aykroyd"), ("dan aykroid", "dan aykroyd")],
    )
    edges = (
        tfidf_cosine_scores(pairs, names)
        .where(F.col("cos") >= 0.7)
        .select("node_a", "node_b")
    )
    cl = {
        r["node"]: r["cluster"]
        for r in connected_components(
            edges, nodes=names.select("node")
        ).collect()
    }
    assert cl["dan aykroyd"] == cl["aykroyd dan"]
    assert cl["dan aykroid"] != cl["dan aykroyd"]


def test_block_budget_rare_family_is_linear(spark):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_er_block_budget,
    )

    out = {
        r["family"]: r
        for r in q_er_block_budget(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(out) == {"x", "m", "h", "t", "r"}
    # rarest-token emits exactly one key per name …
    assert out["r"]["n_keys"] == out["x"]["n_keys"]  # x: is also 1/name
    # … so its pair budget is a strict subset of raw token blocking's
    assert out["r"]["n_pairs"] < out["t"]["n_pairs"]
