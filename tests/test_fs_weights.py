"""Fellegi-Sunter weight estimation (resolution/fs.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fs_parts(spark):
    from rosette_elasticsearch_plugin_spark.resolution.fs import (
        fs_features,
        fs_params,
        fs_weight,
    )

    keyed = spark.createDataFrame(
        [
            ("anna berg", "anna berg"),
            ("ana berg", "ana berg"),
            ("anna berg ", "anna berg"),  # same key, different node
            ("karl voss", "karl voss"),
            ("karla voz", "karla voz"),
        ],
        ["node", "key"],
    )
    blocks = spark.createDataFrame(
        [
            ("anna berg", "m:ANBR"),
            ("ana berg", "m:ANBR"),
            ("anna berg ", "m:ANBR"),
            ("karl voss", "m:KRLF"),
            ("karla voz", "m:KRLF"),
        ],
        ["node", "block_key"],
    )
    pairs = spark.createDataFrame(
        [
            ("ana berg", "anna berg"),
            ("anna berg", "anna berg "),
            ("karl voss", "karla voz"),
            ("anna berg", "karl voss"),
        ],
        ["node_a", "node_b"],
    )
    labeled = spark.createDataFrame(
        [
            ("ana berg", "anna berg", True),
            ("anna berg", "anna berg ", True),
            ("karl voss", "karla voz", False),
            ("anna berg", "karl voss", False),
        ],
        ["node_a", "node_b", "is_match"],
    )
    feats = fs_features(pairs, keyed, blocks)
    params = fs_params(feats, labeled)
    return feats, params, fs_weight(feats, params)


def test_fs_features_flags(fs_parts):
    feats, _, _ = fs_parts
    rows = {(r.node_a, r.node_b): r for r in feats.collect()}
    exact = rows[("anna berg", "anna berg ")]
    assert exact.f_exact and exact.f_phon and exact.f_jac and exact.f_lev
    typo = rows[("ana berg", "anna berg")]
    # jaccard: {ana,berg} vs {anna,berg} -> 1/3 < 0.5, so f_jac is off
    assert not typo.f_exact and typo.f_phon and typo.f_lev
    assert not typo.f_jac
    cross = rows[("anna berg", "karl voss")]
    assert not cross.f_exact and not cross.f_jac


def test_fs_params_laplace_bounds(fs_parts):
    from rosette_elasticsearch_plugin_spark.resolution.fs import FS_FEATURES

    _, params, _ = fs_parts
    row = params.collect()[0]
    assert row.n_match == 2 and row.n_non == 2
    for f in FS_FEATURES:
        for p in (row["m_" + f], row["u_" + f]):
            assert 0.0 < p < 1.0


def test_fs_weight_orders_matches_above_nonmatches(fs_parts):
    _, _, weighted = fs_parts
    w = {(r.node_a, r.node_b): r.fs_weight for r in weighted.collect()}
    assert w[("anna berg", "anna berg ")] > w[("anna berg", "karl voss")]
    assert w[("ana berg", "anna berg")] > w[("anna berg", "karl voss")]


def test_fs_weight_agreement_monotone(spark):
    """Flipping any single feature from disagree to agree raises the
    weight whenever m > u for that feature (true on the fixture)."""
    from rosette_elasticsearch_plugin_spark.resolution.fs import (
        FS_FEATURES,
        fs_weight,
    )

    base = {f: False for f in FS_FEATURES}
    rows = [("x", "y%d" % i, *[(j <= i) for j in range(4)]) for i in range(5)]
    feats = spark.createDataFrame(
        rows, ["node_a", "node_b", *FS_FEATURES]
    )
    params = spark.createDataFrame(
        [(10, 100, 0.9, 0.1, 0.8, 0.2, 0.7, 0.1, 0.6, 0.05)],
        [
            "n_match",
            "n_non",
            "m_f_exact",
            "u_f_exact",
            "m_f_phon",
            "u_f_phon",
            "m_f_jac",
            "u_f_jac",
            "m_f_lev",
            "u_f_lev",
        ],
    )
    got = {
        r.node_b: r.fs_weight for r in fs_weight(feats, params).collect()
    }
    ordered = [got["y%d" % i] for i in range(5)]
    assert ordered == sorted(ordered)
    assert ordered[0] < 0 < ordered[-1]


def test_fs_em_separates_discriminative_features(spark):
    """Unsupervised EM on a mixture of clear matches and clear
    non-matches recovers m >> u for the informative features and a
    plausible prevalence, with no labels anywhere."""
    from rosette_elasticsearch_plugin_spark.resolution.fs import (
        FS_FEATURES,
        fs_em_params,
    )

    rows = []
    # 20 "match-like" patterns (all features agree)
    for i in range(20):
        rows.append(("m%d" % i, "x%d" % i, True, True, True, True))
    # 180 "non-match" patterns (only phon agrees — the blocking artifact)
    for i in range(180):
        rows.append(("n%d" % i, "y%d" % i, False, True, False, False))
    feats = spark.createDataFrame(
        rows, ["node_a", "node_b", *FS_FEATURES]
    )
    row = fs_em_params(feats, rounds=2).collect()[0]
    assert row.n_pairs == 200
    assert 0.0 < row.lam < 1.0
    for f in ("f_exact", "f_jac", "f_lev"):
        assert row["m_" + f] > row["u_" + f], f
    # the match class EM found should be ~10% of pairs
    assert 0.02 < row.lam < 0.4


def test_fs_weight_tf_rare_beats_common(spark):
    """Splink-style TF adjustment: two pairs with IDENTICAL agreement
    vectors get the same base weight, but the one agreeing on a rare
    key outscores the one agreeing on a vocabulary-hot key; non-exact
    pairs are untouched (tf_weight == fs_weight)."""
    from rosette_elasticsearch_plugin_spark.resolution.fs import (
        fs_features,
        fs_params,
        fs_weight_tf,
    )

    # 4 nodes share the hot key, 2 the rare key, 2 disagree entirely
    keyed = spark.createDataFrame(
        [
            ("john smith", "john smith"),
            ("john  smith", "john smith"),
            ("jon smith sr", "john smith"),
            ("mr john smith", "john smith"),
            ("xerxes q", "xerxes q"),
            ("xerxes q.", "xerxes q"),
            ("ada byron", "ada byron"),
            ("alan turing", "alan turing"),
        ],
        ["node", "key"],
    )
    blocks = keyed.select("node", F.lit("m:X").alias("block_key"))
    pairs = spark.createDataFrame(
        [
            ("john smith", "john  smith"),  # exact on hot key
            ("xerxes q", "xerxes q."),      # exact on rare key
            ("ada byron", "alan turing"),   # no agreement
        ],
        ["node_a", "node_b"],
    )
    labeled = spark.createDataFrame(
        [
            ("john smith", "john  smith", True),
            ("xerxes q", "xerxes q.", True),
            ("ada byron", "alan turing", False),
        ],
        ["node_a", "node_b", "is_match"],
    )
    feats = fs_features(pairs, keyed, blocks)
    params = fs_params(feats, labeled)
    out = {
        (r.node_a, r.node_b): r
        for r in fs_weight_tf(feats, params, keyed).collect()
    }
    hot = out[("john smith", "john  smith")]
    rare = out[("xerxes q", "xerxes q.")]
    non = out[("ada byron", "alan turing")]
    assert hot.f_exact and rare.f_exact and not non.f_exact
    # identical agreement vector -> identical base weight
    assert hot.fs_weight == rare.fs_weight
    # rare key boosted above common key: log2(u/(2/8)) > log2(u/(4/8))
    assert rare.tf_weight > hot.tf_weight
    # exact adjustment delta is log2(tf_hot / tf_rare) = log2(2) = 1 bit
    assert abs((rare.tf_weight - hot.tf_weight) - 1.0) < 1e-5
    # non-agreeing pair untouched
    assert non.tf_weight == non.fs_weight


def test_multifield_link_weights_and_decisions(spark):
    """Multi-field FS over the clean/dirty two-source fixture: each
    field's agreement earns a positive log-likelihood contribution
    (m > u for every field), full-agreement pairs dominate, and
    decisions take only the three standard values."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_er_multifield_link,
    )

    rows = q_er_multifield_link(spark, None).collect()
    assert rows, "no candidate pairs"
    decisions = {r["decision"] for r in rows}
    assert decisions <= {"link", "non_link", "review"}
    by_feats = {}
    for r in rows:
        by_feats.setdefault(
            (r["f_name"], r["f_city"], r["f_yob"]), []
        ).append(r["fs_weight"])
    # every feature's agreement must increase the weight, all else equal
    for i in range(3):
        for key, ws in by_feats.items():
            if key[i]:
                flipped = key[:i] + (False,) + key[i + 1:]
                if flipped in by_feats:
                    assert min(ws) > max(by_feats[flipped])
    # a full-agreement pair (clean city+yob survives for most families)
    # must be an unambiguous link
    assert (True, True, True) in by_feats
    assert all(w > 4.0 for w in by_feats[(True, True, True)])


def test_multifield_u_sample_tracks_full_space(spark):
    """The seeded-hash u-estimation sample (the scale path for the
    m/u pair space) must agree with the complete cross-source space:
    pct=100 IS the full space bit-for-bit, and a 60% per-side sample
    (~36% of pairs) estimates every m/u within a tight absolute band —
    the sample is of the pair SPACE, so the rare-agreement u rates are
    the quantities under test."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        _MF_FEATURES,
        mf_u_params,
    )

    full = mf_u_params(spark, pct=100).collect()[0].asDict()
    sampled = mf_u_params(spark, pct=60).collect()[0].asDict()
    assert sampled["n_match"] < full["n_match"]
    assert sampled["n_non"] < full["n_non"]
    for f in _MF_FEATURES:
        for p in ("m_", "u_"):
            got, want = sampled[p + f], full[p + f]
            assert abs(got - want) < 0.12, (
                f"{p}{f}: sampled {got:.4f} vs full {want:.4f}"
            )
