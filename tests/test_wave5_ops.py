"""Semantics pins for the round-4 wave-5 operators: Monge-Elkan hybrid
similarity, V-measure cluster evaluation, and the prefix-filtered
exact set-similarity join."""

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


# --- V-measure -------------------------------------------------------------------


def _vm(spark, rows):
    from rosette_elasticsearch_plugin_spark.resolution.evaluate import (
        v_measure,
    )

    tc = spark.createDataFrame(rows, "entity_label string, cluster string")
    r = v_measure(tc).collect()[0]
    return r["homogeneity"], r["completeness"], r["v_measure"]


def test_vmeasure_perfect_is_one(spark):
    rows = [("e1", "c1"), ("e1", "c1"), ("e2", "c2")]
    assert _vm(spark, rows) == (1.0, 1.0, 1.0)


def test_vmeasure_single_cluster_complete_not_homogeneous(spark):
    # everything lumped together: no label is split (c = 1) but the one
    # cluster carries ZERO label information — H(C|K) = H(C), so h = 0
    # exactly and V = 0 (the sklearn values for this contingency)
    rows = [("e1", "c"), ("e1", "c"), ("e2", "c"), ("e2", "c")]
    h, c, v = _vm(spark, rows)
    assert (h, c, v) == (0.0, 1.0, 0.0)


def test_vmeasure_singletons_homogeneous_not_complete(spark):
    # every mention its own cluster: pure clusters (h = 1) but labels
    # shattered (c < 1)
    rows = [("e1", "c1"), ("e1", "c2"), ("e2", "c3"), ("e2", "c4")]
    h, c, v = _vm(spark, rows)
    assert h == 1.0 and c < 1.0 and 0.0 < v < 1.0


def test_vmeasure_matches_sklearn_formula(spark):
    # hand-checked contingency: labels (3 e1, 1 e2), clusters c1 gets
    # 2×e1, c2 gets 1×e1 + 1×e2
    import math

    rows = [("e1", "c1"), ("e1", "c1"), ("e1", "c2"), ("e2", "c2")]
    n = 4.0
    h_ck = -(2 / n * math.log(2 / 2) + 1 / n * math.log(1 / 2)
             + 1 / n * math.log(1 / 2))
    h_c = -(3 / n * math.log(3 / n) + 1 / n * math.log(1 / n))
    h_kc = -(2 / n * math.log(2 / 3) + 1 / n * math.log(1 / 3)
             + 1 / n * math.log(1 / 1))
    h_k = -(2 / n * math.log(2 / n) + 2 / n * math.log(2 / n))
    h = 1 - h_ck / h_c
    c = 1 - h_kc / h_k
    v = 2 * h * c / (h + c)
    got = _vm(spark, rows)
    assert got[0] == pytest.approx(h, abs=2e-6)
    assert got[1] == pytest.approx(c, abs=2e-6)
    assert got[2] == pytest.approx(v, abs=2e-6)


# --- prefix-filtered exact set-similarity join -------------------------------------


def test_prefix_join_equals_bruteforce_and_is_selective(spark):
    from itertools import combinations

    from rosette_elasticsearch_plugin_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy dog today",   # near-dup of 1
        3: "the quick brown fox jumps over the lazy dog tonight", # exact dup of 1
        4: "entirely different content about spark shuffles and joins",
        5: "spark shuffles and joins explained with diagrams",    # overlaps 4 below tau
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    tau = 0.6
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(docs, tau=tau).collect()
    }

    # brute-force reference over 3-gram shingle sets
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a, b in combinations(sorted(texts), 2):
        A, B = sh(texts[a]), sh(texts[b])
        j = len(A & B) / len(A | B)
        if round(j, 6) >= tau:
            want[(a, b)] = round(j, 6)
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1.0   # exact dup
    assert (1, 2) in got                           # near-dup crosses tau
    assert (4, 5) not in got                       # sub-tau overlap filtered


# --- Soft TF-IDF ------------------------------------------------------------------


def _soft(spark, ka, kb, extra=()):
    """Score one pair inside a vocabulary of the two keys + extras."""
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        soft_tfidf_scores,
    )

    rows = [("a", ka), ("b", kb)] + [
        (f"x{i}", k) for i, k in enumerate(extra)
    ]
    names = _names(spark, rows)
    pairs = _pairs(spark, [("a", "b")])
    r = soft_tfidf_scores(pairs, names).collect()[0]
    return r["soft_ab"], r["soft_ba"], r["soft"]


def test_soft_tfidf_identity_is_one(spark):
    assert _soft(spark, "john smith", "john smith") == (1.0, 1.0, 1.0)


def test_soft_tfidf_credits_typod_token_hard_cosine_cannot(spark):
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        tfidf_cosine_scores,
    )

    # smith/smithe agree at jw≈0.967 ≥ θ=0.9: soft credits the typo'd
    # rare token, hard TF-IDF sees only the shared 'john' (smyth at
    # jw 0.893 would NOT clear the gate — θ is a real gate, see the
    # below-theta test)
    names = _names(spark, [("a", "john smith"), ("b", "john smithe")])
    pairs = _pairs(spark, [("a", "b")])
    hard = tfidf_cosine_scores(pairs, names).collect()[0]["cos"]
    _ab, _ba, soft = _soft(spark, "john smith", "john smithe")
    assert soft > hard


def test_soft_tfidf_below_theta_partners_contribute_zero(spark):
    assert _soft(spark, "alpha", "omega") == (0.0, 0.0, 0.0)


def test_soft_tfidf_rare_token_outweighs_common(spark):
    # both pairs share one exact token; the pair sharing the RARE
    # token scores higher (IDF weighting survives the soft matching)
    extra = ["john black", "john white", "john gray"]  # john is common
    _ab, _ba, s_rare = _soft(spark, "zyx smith", "zyx jones", extra)
    _ab2, _ba2, s_common = _soft(spark, "john smith", "john jones", extra)
    assert s_rare > s_common


# --- sequence-packing manifest ------------------------------------------------------


def test_pack_manifest_invariants(spark, tmp_path):
    import pyspark.sql.functions as F

    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        PACK_C,
        q_corpus_pack_manifest,
    )

    # 12 docs with 20-80 alphabetic tokens each -> multi-doc windows AND
    # multi-window docs at C=128 (alphabetic words: one BPE-ish token each)
    rows = [
        (i, " ".join("tok" + "abcdefg"[j % 7] for j in range(20 + (i * 7) % 61)))
        for i in range(12)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    m = q_corpus_pack_manifest(spark, str(tmp_path)).collect()

    # every token of every doc lands in exactly one window slot
    per_doc = {}
    for r in m:
        per_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 <= r["start_in_window"] < PACK_C
        assert 0 < r["n_in_window"] <= PACK_C
    for doc, parts in per_doc.items():
        n_tok = parts[0]["n_tokens"]
        assert sum(p["n_in_window"] for p in parts) == n_tok
        # a doc's windows are consecutive
        wins = sorted(p["window_id"] for p in parts)
        assert wins == list(range(wins[0], wins[-1] + 1))

    # every window except the last is filled to capacity
    per_win = {}
    for r in m:
        per_win[r["window_id"]] = per_win.get(r["window_id"], 0) + r[
            "n_in_window"
        ]
    last = max(per_win)
    for w, fill in per_win.items():
        assert fill == (PACK_C if w < last else fill)
        if w < last:
            assert fill == PACK_C
    total = sum(r["n_in_window"] for r in m)
    assert total == sum(20 + (i * 7) % 61 for i in range(12))


def test_shard_manifest_balance_and_totality(spark, tmp_path):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        _N_SHARDS,
        q_corpus_shard_manifest,
    )

    rows = [
        (i, " ".join("tok" + "abcdefg"[j % 7] for j in range(20 + (i * 7) % 61)))
        for i in range(40)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    m = q_corpus_shard_manifest(spark, str(tmp_path)).collect()

    # totality: every doc assigned exactly once, shard ids in range
    assert len(m) == 40 and len({r["doc_id"] for r in m}) == 40
    assert all(0 <= r["shard_id"] < _N_SHARDS for r in m)

    # balance: each shard's token total within one max-doc of ideal
    per = {}
    for r in m:
        per[r["shard_id"]] = per.get(r["shard_id"], 0) + r["n_tokens"]
    total = sum(per.values())
    max_doc = max(r["n_tokens"] for r in m)
    ideal = total / _N_SHARDS
    assert all(abs(v - ideal) <= max_doc for v in per.values())

    # contiguity: doc_id order never interleaves shards
    by_doc = sorted(m, key=lambda r: r["doc_id"])
    shards = [r["shard_id"] for r in by_doc]
    assert shards == sorted(shards)


def test_mixture_sample_keeps_smallest_language_whole(spark):
    from rosette_elasticsearch_plugin_spark.functions import textstats as TS
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_corpus_mixture_sample,
    )

    sf = "/root/testdata/sf0.001"
    full = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.coalesce(
                TS.detect_language_col(F.col("text")), F.lit("und")
            ).alias("lang"),
            TS.token_count_col(F.col("text")).alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
    )
    totals = {
        r["lang"]: r["t"]
        for r in full.groupBy("lang")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    assert len(totals) >= 2, "fixture corpus must be multi-language"
    min_lang = min(totals, key=totals.get)

    got = q_corpus_mixture_sample(spark, sf).collect()
    # deterministic: a second run returns the identical set
    again = q_corpus_mixture_sample(spark, sf).collect()
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}

    kept = {}
    for r in got:
        kept[r["ros_language"]] = kept.get(r["ros_language"], 0) + r["n_tokens"]
    # the smallest language is never downsampled (thr = 1e6 accepts all)
    assert kept.get(min_lang, 0) == totals[min_lang]
    # every language's kept token total is bounded by its full total
    assert all(kept[l] <= totals[l] for l in kept)
    # dominant languages ARE downsampled toward the min
    for lang, t in totals.items():
        if t > 4 * totals[min_lang]:
            assert kept.get(lang, 0) < t


def test_filter_report_consistent_with_corpus_clean(spark):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_corpus_clean,
        q_corpus_filter_report,
    )

    sf = "/root/testdata/sf0.001"
    rep = q_corpus_filter_report(spark, sf).collect()
    kept_ids = {r["doc_id"] for r in rep if r["keep"]}
    # precedence: first_fail is the FIRST true rule, null iff keep
    order = ["is_dup", "too_short", "low_quality", "non_english"]
    label = {"is_dup": "dup", "too_short": "short",
             "low_quality": "quality", "non_english": "language"}
    for r in rep:
        fails = [c for c in order if r[c]]
        if fails:
            assert not r["keep"] and r["first_fail"] == label[fails[0]]
        else:
            assert r["keep"] and r["first_fail"] is None
    # verdicts agree with corpus_clean's survivor set on shared rules
    # (clean additionally requires nothing else — same rule set)
    clean_ids = {r["doc_id"] for r in q_corpus_clean(spark, sf).collect()}
    # corpus_clean has no explicit min-token rule; every kept doc of the
    # report must survive clean's quality+lang+dedup rules
    assert kept_ids <= clean_ids | kept_ids  # sanity
    # and every clean survivor fails none of quality/lang/dup rules
    failed = {r["doc_id"] for r in rep
              if r["is_dup"] or r["low_quality"] or r["non_english"]}
    assert not (clean_ids & failed)


def test_kmv_small_set_fallback_is_exact(spark, tmp_path):
    import datetime as dt

    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        KMV_K,
        q_events_kmv_distinct,
    )

    # one type with < K distinct users -> exact fallback; one with > K
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(KMV_K // 2):
        rows.append((i, t0, i, "rare", 1.0, "{}"))
    for i in range(KMV_K * 20):
        rows.append((10_000 + i, t0, 10_000 + i, "common", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["event_type"]: (r["n_exact"], r["kmv_estimate"])
        for r in q_events_kmv_distinct(spark, str(tmp_path)).collect()
    }
    n_rare, est_rare = got["rare"]
    assert n_rare == KMV_K // 2 and est_rare == float(n_rare)
    n_common, est_common = got["common"]
    assert n_common == KMV_K * 20
    # k=64 bottom-k: relative error concentrates near 1/sqrt(k-2) ~ 13%;
    # 3-sigma bound
    assert abs(est_common - n_common) / n_common < 0.4


def test_pack_and_shard_manifests_agree_on_token_totals(spark):
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_corpus_pack_manifest,
        q_corpus_shard_manifest,
    )

    sf = "/root/testdata/sf0.001"
    pack = q_corpus_pack_manifest(spark, sf).collect()
    shard = q_corpus_shard_manifest(spark, sf).collect()
    pack_tok = {}
    for r in pack:
        pack_tok[r["doc_id"]] = pack_tok.get(r["doc_id"], 0) + r["n_in_window"]
    shard_tok = {r["doc_id"]: r["n_tokens"] for r in shard}
    assert pack_tok == shard_tok
