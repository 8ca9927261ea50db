"""Token blocking + meta-blocking (resolution/metablocking.py) and
benchmark decontamination (plans/driver_queries.q_corpus_decontaminate).

Hand-built block tables pin the CBS/JS arithmetic exactly; the fixture
vocabulary run pins the end-to-end recall property (every true
name-variant pair the scorer would accept survives the pruning)."""

import pytest
from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.resolution.blocking import token_blocks
from rosette_elasticsearch_plugin_spark.resolution.metablocking import (
    meta_block_weights,
    purge_blocks,
    weighted_edge_pruning,
)


def test_token_blocks_per_token_keys(spark):
    names = spark.createDataFrame(
        [("Dan Aykroyd", "dan aykroyd"), ("Aykroyd Dan", "aykroyd dan")],
        "node string, key string",
    )
    got = {
        (r["node"], r["block_key"]) for r in token_blocks(names).collect()
    }
    assert got == {
        ("Dan Aykroyd", "t:dan"),
        ("Dan Aykroyd", "t:aykroyd"),
        ("Aykroyd Dan", "t:dan"),
        ("Aykroyd Dan", "t:aykroyd"),
    }


def test_token_blocks_drops_short_tokens(spark):
    names = spark.createDataFrame(
        [("J R Ewing", "j r ewing")], "node string, key string"
    )
    got = {r["block_key"] for r in token_blocks(names).collect()}
    assert got == {"t:ewing"}  # single-letter initials never block


def _blocks(spark, rows):
    return spark.createDataFrame(rows, "node string, block_key string")


def test_purge_drops_oversized_blocks(spark):
    rows = [(f"n{i}", "t:stopword") for i in range(5)] + [
        ("n0", "t:rare"),
        ("n1", "t:rare"),
    ]
    purged = purge_blocks(_blocks(spark, rows), max_block_size=4)
    assert {r["block_key"] for r in purged.collect()} == {"t:rare"}


def test_meta_block_weights_exact_js(spark):
    # a: {k1,k2,k3}; b: {k1,k2}; c: {k3}
    rows = [
        ("a", "k1"), ("a", "k2"), ("a", "k3"),
        ("b", "k1"), ("b", "k2"),
        ("c", "k3"),
    ]
    w = {
        (r["node_a"], r["node_b"]): (r["cbs"], r["js"])
        for r in meta_block_weights(
            _blocks(spark, rows), max_block_size=10
        ).collect()
    }
    assert w[("a", "b")] == (2, 2 / 3)   # |∩|=2, |∪|=3
    assert w[("a", "c")] == (1, 1 / 3)
    assert ("b", "c") not in w           # no shared block → no edge


def test_wep_prunes_below_tau(spark):
    rows = [
        ("a", "k1"), ("a", "k2"), ("a", "k3"),
        ("b", "k1"), ("b", "k2"),
        ("c", "k3"),
    ]
    kept = {
        (r["node_a"], r["node_b"])
        for r in weighted_edge_pruning(
            _blocks(spark, rows), tau=0.5, max_block_size=10
        ).collect()
    }
    assert kept == {("a", "b")}


def test_meta_blocking_completeness_vs_pruning(spark):
    """The meta-blocking tradeoff, pinned on the fixture vocabulary:
    at the default tau the pruned candidate graph keeps ≥95% of the
    pairs the scorer accepts as true matches (pair-completeness, the
    metric the technique is evaluated on) while removing ≥20% of the
    co-occurring candidate edges.  An absolute no-loss property would
    be wrong by construction — WEP exists to trade tail recall
    (initialism+typo combos sharing one key) for a linear budget."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        META_MAX_BLOCK,
        META_TAU,
        _fixture_keyed,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import (
        ERConfig,
        resolve_names,
    )
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        all_blocks,
    )

    keyed = _fixture_keyed(spark)
    blocks = all_blocks(keyed, ERConfig().blocking).unionByName(
        token_blocks(keyed)
    )
    weights = {
        (r["node_a"], r["node_b"]): r["js"]
        for r in meta_block_weights(blocks, META_MAX_BLOCK).collect()
    }
    kept = {p for p, js in weights.items() if js >= META_TAU}
    clusters = resolve_names(keyed.select("node"))
    by_cluster: dict[str, list[str]] = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster"], []).append(r["node"])
    true_pairs = {
        (min(a, b), max(a, b))
        for mem in by_cluster.values()
        for a in mem
        for b in mem
        if a < b
    }
    pc = len(true_pairs & kept) / len(true_pairs)
    pruned = 1 - len(kept) / len(weights)
    assert pc >= 0.95, f"pair-completeness {pc:.3f} below bound"
    assert pruned >= 0.20, f"pruning ratio {pruned:.2%} below bound"


def test_meta_pairs_subset_of_default_universe(spark):
    """The integrated meta path (ERConfig.meta_tau) only FILTERS the
    default capped-blocks pair universe — it never invents a pair the
    default generator wouldn't have produced from the same blocks."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        META_MAX_BLOCK,
        META_TAU,
        _fixture_keyed,
    )
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        BlockingConfig,
        all_blocks,
    )
    from rosette_elasticsearch_plugin_spark.resolution.pairs import (
        candidate_pairs,
    )

    keyed = _fixture_keyed(spark)
    blocks = all_blocks(
        keyed, BlockingConfig(use_tokens=True)
    ).localCheckpoint(eager=False)
    meta = {
        (r["node_a"], r["node_b"])
        for r in weighted_edge_pruning(
            blocks, META_TAU, META_MAX_BLOCK
        ).collect()
    }
    default = {
        (r["node_a"], r["node_b"])
        for r in candidate_pairs(blocks, META_MAX_BLOCK).collect()
    }
    assert meta <= default
    assert len(meta) < len(default)  # tau actually prunes something


def test_meta_resolution_f1_above_bar(spark):
    """End-to-end quality under the integrated meta-blocking config:
    pairwise F1 on the fixture's planted truth stays ≥ 0.99 (the north
    rule's bar) — the pairs tau prunes are redundant or rare enough
    that transitivity absorbs almost all of them (measured 0.997 vs
    1.000 for the default path)."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        META_TAU,
        _fixture_keyed,
        _name_f1_fixture,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import (
        ERConfig,
        resolve_names,
    )
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        BlockingConfig,
    )

    _names, truth = _name_f1_fixture()
    cfg = ERConfig(
        blocking=BlockingConfig(use_tokens=True), meta_tau=META_TAU
    )
    keyed = _fixture_keyed(spark)
    cl = {
        r["node"]: r["cluster"]
        for r in resolve_names(keyed.select("node"), cfg).collect()
    }
    ms = [(e, cl.get(n, n)) for _m, e, n in truth]
    tp = fp = fn = 0
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            same_truth = ms[i][0] == ms[j][0]
            same_pred = ms[i][1] == ms[j][1]
            tp += same_truth and same_pred
            fp += (not same_truth) and same_pred
            fn += same_truth and (not same_pred)
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    f1 = 2 * p * r / (p + r)
    assert f1 >= 0.99, f"meta-blocked F1 {f1:.4f} below the 0.99 bar"


def test_dedup_meta_pairs_band_semantics(spark):
    """Band-collision weights over the document LSH table: common-band
    counts are bounded by the band count, planted duplicate pairs sit
    at the maximum weight (identical text → identical signature → all
    bands collide → js = 1.0), and every reported pair is an LSH
    candidate."""
    import rosette_elasticsearch_plugin_spark.plans.driver_queries as DQ
    from rosette_elasticsearch_plugin_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark shuffle planning"),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(d, "documents.parquet")
        )
        docs = DQ._docs_with_dups(spark, d)
        got = {
            (r["doc_id_a"], r["doc_id_b"]): (
                r["n_common_bands"],
                r["band_js"],
            )
            for r in DQ.q_dedup_meta_pairs(spark, d).collect()
        }
        cand = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in dedup.lsh_candidate_pairs(
                docs, bands=DQ.DEDUP_BANDS, rows=DQ.DEDUP_ROWS
            ).collect()
        }
    assert all(1 <= c <= DQ.DEDUP_BANDS for c, _ in got.values())
    assert got[(1, 2)] == (DQ.DEDUP_BANDS, 1.0)
    assert set(got) <= cand


def test_decontaminate_short_docs_and_eval_exclusion(spark):
    """Docs shorter than the n-gram window yield no grams (the sequence
    guard — without it Spark's descending sequence(1, 0) would fabricate
    windows), and eval-set docs (doc_id % 97 == 0) are never reported."""
    import rosette_elasticsearch_plugin_spark.plans.driver_queries as DQ

    rows = [
        (0, "alpha beta gamma delta"),      # eval doc (0 % 97 == 0)
        (1, "alpha beta gamma epsilon"),    # shares 'alpha beta gamma'
        (2, "zz"),                          # shorter than the window
        (3, "nothing shared here at all"),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            r["doc_id"]: r["n_eval_grams"]
            for r in DQ.q_corpus_decontaminate(spark, d).collect()
        }
    assert out == {1: 1}
