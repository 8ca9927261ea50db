"""Fuzzy name search over the blocking index (plans/search.py)."""

from rosette_elasticsearch_plugin_spark.plans.search import search_names


def _run(spark, queries, names, **kw):
    q = spark.createDataFrame([(s,) for s in queries], "query string")
    n = spark.createDataFrame([(s,) for s in names], "name string")
    rows = search_names(q, n, **kw).collect()
    out: dict[str, list[tuple[str, float]]] = {}
    for r in sorted(rows, key=lambda r: (r["query"], r["rank"])):
        out.setdefault(r["query"], []).append((r["name"], r["score"]))
    return out

CORPUS = [
    "dan aykroyd", "daniel aykroyd", "ghostbusters", "ghost busters",
    "the hollywood reporter", "vladimir putin", "владимир путин",
    "matt damon", "sofia moreau",
]


def test_search_finds_typo_and_cross_script(spark):
    got = _run(spark, ["dan akroid", "vladimir putin", "zzyzx qqqfle"], CORPUS)
    assert got["dan akroid"][0][0] == "dan aykroyd"
    # cross-script: the Cyrillic corpus name shares the transliterated
    # key, so it matches the Latin query at score 1.0 like the Latin one
    top = {n for n, s in got["vladimir putin"] if s == 1.0}
    assert top == {"vladimir putin", "владимир путин"}
    assert "zzyzx qqqfle" not in got


def test_search_respects_threshold_and_k(spark):
    got = _run(spark, ["ghost busters"], CORPUS, k=1)
    assert len(got["ghost busters"]) == 1
    assert got["ghost busters"][0][0] in ("ghost busters", "ghostbusters")
    strict = _run(spark, ["dan akroid"], CORPUS, threshold=0.99)
    assert "dan akroid" not in strict  # typo score < 0.99
