"""Cross-engine hash parity: h56 / shingles / MinHash / SimHash."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.functions import hashing as H
from rosette_elasticsearch_plugin_spark.functions import normalize as N

NAMES = ["dan aykroyd", "ghostbusters", "владимир путин", "a", "", "smith"]


def test_h56_parity(spark, duck):
    df = spark.createDataFrame([(n,) for n in NAMES], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", H.h56_col(F.col("s")).alias("h")).collect()}
    for n in NAMES:
        want = duck.execute(f"select {H.h56_sql('$s')}", {"s": n}).fetchone()[0]
        assert got[n] == want, n


def test_minhash_parity(spark, duck):
    params = H.minhash_params(6)
    df = spark.createDataFrame([(n,) for n in NAMES], "s string")
    sig = H.minhash_sig_col(H.shingles_col(F.col("s")), params)
    got = {r["s"]: list(r["sig"]) if r["sig"] else None
           for r in df.select("s", sig.alias("sig")).collect()}
    for n in NAMES:
        want = duck.execute(
            f"select {H.minhash_sig_sql(H.shingles_sql('$s'), params)}", {"s": n}
        ).fetchone()[0]
        assert got[n] == list(want), n


def test_two_step_minhash_equals_one_step(spark):
    """hashed-shingles factored plan must produce identical signatures."""
    params = H.minhash_params(6)
    df = spark.createDataFrame([(n,) for n in NAMES if n], "s string")
    one = df.select("s", H.minhash_sig_col(H.shingles_col(F.col("s")), params).alias("sig"))
    hashed = df.select("s", H.hashed_shingles_col(H.shingles_col(F.col("s"))).alias("h"))
    two = hashed.select("s", H.minhash_sig_from_hashes_col(F.col("h"), params).alias("sig"))
    assert {tuple(r["sig"]) for r in one.collect()} == {tuple(r["sig"]) for r in two.collect()}


def test_shingles_short_string(spark):
    df = spark.createDataFrame([("ab",), ("abc",), ("abcd",)], "s string")
    got = {r["s"]: r["g"] for r in df.select("s", H.shingles_col(F.col("s")).alias("g")).collect()}
    assert got["ab"] == ["ab"]
    assert got["abc"] == ["abc"]
    assert got["abcd"] == ["abc", "bcd"]


def test_simhash_parity(spark, duck):
    df = spark.createDataFrame([(n,) for n in NAMES if n], "s string")
    toks = F.split(F.col("s"), " ")
    got = {r["s"]: r["sh"] for r in df.select("s", H.simhash_col(toks).alias("sh")).collect()}
    for n in [x for x in NAMES if x]:
        want = duck.execute(
            f"select {H.simhash_sql(chr(34) + 'toks' + chr(34))} from (select string_split($s, ' ') as toks)",
            {"s": n},
        ).fetchone()[0]
        assert got[n] == want, n


def test_lsh_band_keys(spark):
    params = H.minhash_params(6)
    df = spark.createDataFrame([("dan aykroyd",)], "s string")
    sig = H.minhash_sig_col(H.shingles_col(F.col("s")), params)
    keys = df.select(H.lsh_band_keys_col(sig, 3, 2).alias("k")).collect()[0]["k"]
    assert len(keys) == 3
    assert all(k.startswith("b") for k in keys)
