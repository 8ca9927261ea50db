"""Suffix-array blocking (resolution/blocking.suffix_blocks): exact
key enumeration, the df purge, the short-name whole-key fallback, and
the leading-character-variant recall property that motivates the
family (Aizawa & Oyama 2005)."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.resolution.blocking import (
    BlockingConfig,
    all_blocks,
    suffix_blocks,
)


def _keys(spark, rows, **kw):
    names = spark.createDataFrame(rows, "node string, key string")
    return {
        (r["node"], r["block_key"])
        for r in suffix_blocks(names, **kw).collect()
    }


def test_suffix_enumeration_space_stripped(spark):
    # "jon smith" -> compact "jonsmith" (8 chars), min_len 5 ->
    # suffixes at positions 1..4
    got = _keys(spark, [("Jon Smith", "jon smith")], min_len=5)
    assert got == {
        ("Jon Smith", "s:jonsmith"),
        ("Jon Smith", "s:onsmith"),
        ("Jon Smith", "s:nsmith"),
        ("Jon Smith", "s:smith"),
    }


def test_short_name_keys_on_whole_compact_key(spark):
    got = _keys(spark, [("Bo Li", "bo li")], min_len=5)
    assert got == {("Bo Li", "s:boli")}


def test_df_purge_drops_common_suffixes(spark):
    # "nsson" and shorter tails are shared by all three; with
    # max_block=2 every shared suffix is purged, the distinct heads
    # survive
    rows = [
        ("Jonsson", "jonsson"),
        ("Monsson", "monsson"),
        ("Ronsson", "ronsson"),
    ]
    got = _keys(spark, rows, min_len=5, max_block=2)
    sufs = {k for _, k in got}
    assert "s:onsson" not in sufs and "s:nsson" not in sufs
    assert {("Jonsson", "s:jonsson"), ("Monsson", "s:monsson")} <= got


def test_leading_typo_shares_suffix_blocks(spark):
    # the motivating case: a FIRST-character typo breaks the exact key
    # and the metaphone head anchor, but every suffix past position 1
    # is shared
    rows = [("Katarina Berg", "katarina berg"), ("Xatarina Berg", "xatarina berg")]
    got = _keys(spark, rows, min_len=5)
    shared = {
        k for n, k in got if n == "Katarina Berg"
    } & {k for n, k in got if n == "Xatarina Berg"}
    assert "s:atarinaberg" in shared and len(shared) >= 5


def test_all_blocks_suffix_optin(spark):
    names = spark.createDataFrame(
        [("Jon Smith", "jon smith")], "node string, key string"
    )
    off = {
        r["block_key"]
        for r in all_blocks(names, BlockingConfig()).collect()
    }
    on = {
        r["block_key"]
        for r in all_blocks(
            names, BlockingConfig(use_suffix=True)
        ).collect()
    }
    assert not {k for k in off if k.startswith("s:")}
    assert {k for k in on if k.startswith("s:")} == {
        "s:jonsmith", "s:onsmith", "s:nsmith", "s:smith"
    }
    assert off <= on


# --- property: Spark suffix_blocks ≡ python brute force -----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SPARK_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_name_keys = st.lists(
    st.lists(
        st.sampled_from(
            ["anders", "andersson", "bo", "li", "jonsson", "monsson", "x"]
        ),
        min_size=1,
        max_size=3,
    ).map(" ".join),
    min_size=1,
    max_size=10,
    unique=True,
)


def _brute(keys, min_len, max_block):
    per = {}
    for k in keys:
        ck = k.replace(" ", "")
        n = max(len(ck) - min_len + 1, 1)
        per[k] = {ck[i:] for i in range(n) if ck[i:]}
    df = {}
    for sufs in per.values():
        for s in sufs:
            df[s] = df.get(s, 0) + 1
    return {
        (k, "s:" + s)
        for k, sufs in per.items()
        for s in sufs
        if df[s] <= max_block
    }


@_SPARK_SET
@given(keys=_name_keys, min_len=st.integers(2, 7), max_block=st.integers(1, 5))
def test_suffix_blocks_matches_brute_force(spark, keys, min_len, max_block):
    names = spark.createDataFrame(
        [(k, k) for k in keys], "node string, key string"
    )
    got = {
        (r["node"], r["block_key"])
        for r in suffix_blocks(names, min_len, max_block).collect()
    }
    assert got == _brute(keys, min_len, max_block)
