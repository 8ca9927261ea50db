"""Fuzzy name search over the blocking index (plans/search.py)."""

from rosette_elasticsearch_plugin_spark.plans.search import (
    build_block_index,
    search_names,
)


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


def test_search_from_committed_block_index(spark, tmp_path):
    """The scale path: build the block index ONCE, commit it to a
    SnapshotTable bucketed by block_key, then serve queries from the
    committed snapshot — no corpus names/text touched at query time,
    and results identical to the recompute path."""
    from rosette_elasticsearch_plugin_spark.sources.table_io import (
        SnapshotTable,
    )

    names = spark.createDataFrame([(s,) for s in CORPUS], "name string")
    table = SnapshotTable(str(tmp_path / "block_index"))
    table.commit(
        build_block_index(names), "block_index", buckets=("block_key", 4)
    )

    served = table.read(spark).drop("__bucket")
    q = spark.createDataFrame(
        [("dan akroid",), ("vladimir putin",)], "query string"
    )
    got = {
        (r["query"], r["rank"]): (r["name"], r["score"])
        for r in search_names(q, name_index=served).collect()
    }
    want = {
        (r["query"], r["rank"]): (r["name"], r["score"])
        for r in search_names(q, names).collect()
    }
    assert got == want
    assert got[("dan akroid", 1)][0] == "dan aykroyd"
