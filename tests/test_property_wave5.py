"""Property-based checks for the wave-5 operators: the Monge-Elkan
batch kernel vs a scalar per-pair reference (pure python — no engine
in the loop), the prefix-filtered similarity join vs a brute-force
set reference (one Spark job per example), and V-measure vs the
unquantized entropy formulas on random contingency tables."""

import math
import random
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
SPARK_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TOKENS = ["john", "jon", "smith", "smythe", "w", "william", "bill", ""]
key_strings = st.lists(
    st.sampled_from(_TOKENS), min_size=1, max_size=4
).map(" ".join)


@SET
@given(ka=key_strings, kb=key_strings)
def test_me_batch_kernel_matches_scalar_reference(ka, kb):
    from rosette_elasticsearch_plugin_spark.functions.similarity import (
        jaro_winkler_py,
    )
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        ME_MICRO,
        _me_sums_batch,
    )

    sa, na, sb, nb = _me_sums_batch([ka], [kb])
    ta, tb = ka.split(" "), kb.split(" ")

    def micro(x):
        return math.floor(x * ME_MICRO + 0.5)

    ref_sa = sum(max(micro(jaro_winkler_py(t, u)) for u in tb) for t in ta)
    ref_sb = sum(max(micro(jaro_winkler_py(t, u)) for t in ta) for u in tb)
    assert (sa[0], na[0], sb[0], nb[0]) == (
        ref_sa, len(ta), ref_sb, len(tb),
    )
    # symmetry under operand swap
    sa2, na2, sb2, nb2 = _me_sums_batch([kb], [ka])
    assert (sa2[0], na2[0]) == (sb[0], nb[0])
    assert (sb2[0], nb2[0]) == (sa[0], na[0])


_WORDS = ["a", "b", "c", "d", "e", "f"]
doc_lists = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=6,
)


@SPARK_SET
@given(texts=doc_lists, tau=st.sampled_from([0.4, 0.6, 0.8]))
def test_prefix_join_equals_bruteforce_random(spark, texts, tau):
    from rosette_elasticsearch_plugin_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(docs, tau=tau).collect()
    }

    def sh(t):
        toks = t.split()
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(n)} - {""}

    want = {}
    for a, b in combinations(range(len(texts)), 2):
        A, B = sh(texts[a]), sh(texts[b])
        if not A or not B:
            continue
        j = round(len(A & B) / len(A | B), 6)
        if j >= tau:
            want[(a, b)] = j
    assert got == want


def test_vmeasure_matches_formula_on_random_tables(spark):
    from rosette_elasticsearch_plugin_spark.resolution.evaluate import (
        v_measure,
    )

    rng = random.Random(7)
    for _trial in range(6):
        n_labels = rng.randint(1, 4)
        n_clusters = rng.randint(1, 4)
        rows = [
            (f"e{rng.randrange(n_labels)}", f"c{rng.randrange(n_clusters)}")
            for _ in range(rng.randint(4, 30))
        ]
        got = v_measure(
            spark.createDataFrame(rows, "entity_label string, cluster string")
        ).collect()[0]

        n = len(rows)
        from collections import Counter

        cells = Counter(rows)
        ksz = Counter(c for _e, c in rows)
        csz = Counter(e for e, _c in rows)
        h_ck = -sum(
            m / n * math.log(m / ksz[c]) for (_e, c), m in cells.items()
        )
        h_kc = -sum(
            m / n * math.log(m / csz[e]) for (e, _c), m in cells.items()
        )
        h_c = -sum(m / n * math.log(m / n) for m in csz.values())
        h_k = -sum(m / n * math.log(m / n) for m in ksz.values())
        h = 1.0 if h_c == 0 else 1 - h_ck / h_c
        c = 1.0 if h_k == 0 else 1 - h_kc / h_k
        v = 0.0 if h + c == 0 else 2 * h * c / (h + c)
        assert abs(got["homogeneity"] - h) < 2e-5
        assert abs(got["completeness"] - c) < 2e-5
        assert abs(got["v_measure"] - v) < 2e-5
        assert 0.0 <= got["v_measure"] <= 1.0
