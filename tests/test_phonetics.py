"""R4 Double Metaphone: golden codes + UDF/pure-function agreement."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.functions.phonetics import (
    double_metaphone,
    double_metaphone_udf,
)

GOLDEN = {
    "Smith": ("SM0", "XMT"),
    "Schmidt": ("XMT", "SMT"),
    "Putin": ("PTN", "PTN"),
    "": ("", ""),
    "Владимир": ("", ""),  # non-Latin → empty code by design
}


def test_golden_codes():
    for name, want in GOLDEN.items():
        assert double_metaphone(name) == want, name


def test_variants_collide():
    """Blocking property: common name variants share a code."""
    for a, b in [
        ("Aykroyd", "Akroyd"),
        ("Svensson", "Svenson"),
        ("Nabokov", "Nabokow"),
        ("Philip", "Filip"),
    ]:
        pa, sa = double_metaphone(a)
        pb, sb = double_metaphone(b)
        assert {pa, sa} & {pb, sb}, (a, b, (pa, sa), (pb, sb))


def test_udf_matches_pure(spark):
    names = list(GOLDEN) + ["Aykroyd", "Ghostbusters", "Jose", "Wagner"]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = {
        r["s"]: (r["dm"]["primary"], r["dm"]["secondary"])
        for r in df.select("s", double_metaphone_udf(F.col("s")).alias("dm")).collect()
    }
    for n in names:
        assert got[n] == double_metaphone(n), n
