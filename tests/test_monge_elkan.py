"""Semantics pins for Monge-Elkan hybrid similarity
(resolution/scoring.monge_elkan_scores): token-reorder invariance,
per-token typo tolerance, directional asymmetry of the two means, and
scalar agreement with a brute-force python reference."""

import pytest
from pyspark.sql import functions as F


def _names(spark, rows):
    return spark.createDataFrame(rows, "node string, key string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "node_a string, node_b string")


def _me(spark, ka, kb):
    names = _names(spark, [("a", ka), ("b", kb)])
    pairs = _pairs(spark, [("a", "b")])
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        monge_elkan_scores,
    )

    r = monge_elkan_scores(pairs, names).collect()[0]
    return r["me_ab"], r["me_ba"], r["me"]


def _me_ref(ka, kb):
    """Brute-force scalar reference: mean of best JW per token, both
    directions, micro-quantized like the kernel."""
    from rosette_elasticsearch_plugin_spark.functions.similarity import (
        jaro_winkler_py,
    )
    from rosette_elasticsearch_plugin_spark.resolution.scoring import ME_MICRO

    import math

    ta, tb = ka.split(" "), kb.split(" ")

    def micro(x):
        return math.floor(x * ME_MICRO + 0.5)

    sa = sum(max(micro(jaro_winkler_py(t, u)) for u in tb) for t in ta)
    sb = sum(max(micro(jaro_winkler_py(t, u)) for t in ta) for u in tb)

    def round6(x):
        # both engines round HALF_UP on the shortest double repr
        # (Spark BigDecimal.valueOf, DuckDB round) — python's round()
        # is banker's and disagrees on ties like 0.8955555
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    return round6(sa / (len(ta) * ME_MICRO)), round6(sb / (len(tb) * ME_MICRO))


def test_identity_and_reorder_score_one(spark):
    assert _me(spark, "john smith", "john smith") == (1.0, 1.0, 1.0)
    # token reordering is free for ME (whole-string JW punishes it)
    assert _me(spark, "smith john", "john smith") == (1.0, 1.0, 1.0)


def test_per_token_typo_tolerated(spark):
    # one-character typo in one token: ME stays near 1 because only
    # that token's best-match dips
    _ab, _ba, me = _me(spark, "jon smith", "john smith")
    assert me > 0.95


def test_directional_asymmetry_subset_tokens(spark):
    # A's only token matches perfectly inside B, so ME(A→B) = 1.0;
    # B's extra token has no good match in A, so ME(B→A) < 1
    ab, ba, me = _me(spark, "smith", "john smith")
    assert ab == 1.0
    assert ba < 1.0
    assert abs(me - round((ab + ba) / 2, 6)) < 1e-9


def test_matches_scalar_reference(spark):
    cases = [
        ("bill w smith", "william smith"),
        ("garcia marquez g", "gabriel garcia marquez"),
        ("jon smythe", "john smith"),
        ("ann lee", "ann lee"),
    ]
    names = _names(
        spark,
        [(f"a{i}", a) for i, (a, _b) in enumerate(cases)]
        + [(f"b{i}", b) for i, (_a, b) in enumerate(cases)],
    )
    pairs = _pairs(spark, [(f"a{i}", f"b{i}") for i in range(len(cases))])
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        monge_elkan_scores,
    )

    got = {
        r["node_a"]: (r["me_ab"], r["me_ba"])
        for r in monge_elkan_scores(pairs, names).collect()
    }
    for i, (a, b) in enumerate(cases):
        ab, ba = _me_ref(a, b)
        assert got[f"a{i}"] == (ab, ba), (a, b)


def test_beats_token_cosine_on_typos_beats_jw_on_reorder(spark):
    # the documented niche: typo'd token (cosine scores 0.5-ish on
    # token identity) AND reordered tokens (whole-string JW drops)
    _ab, _ba, me = _me(spark, "smith jon", "john smith")
    assert me > 0.9
    from rosette_elasticsearch_plugin_spark.functions.similarity import (
        jaro_winkler_py,
    )

    assert jaro_winkler_py("smith jon", "john smith") < me
