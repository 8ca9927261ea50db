"""R2 normalization: golden values + three-way parity
(Spark column / DuckDB mirror / Python mirror)."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.functions import normalize as N

CASES = [
    ("Dan Aykroyd", "dan aykroyd"),
    ("The  Hollywood-Reporter!", "the hollywood reporter"),
    ("Vladimír Pútin", "vladimir putin"),
    ("Владимир Путин", "владимир путин"),
    ("  a  b  ", "a b"),
    ("", ""),
]


def test_normalize_py_golden():
    for raw, want in CASES:
        assert N.normalize_py(raw) == want, raw


def test_normalize_spark_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "s string")
    got = {
        r["s"]: r["n"]
        for r in df.select("s", N.normalize_col(F.col("s")).alias("n")).collect()
    }
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_normalize_duckdb_mirror(duck):
    for raw, want in CASES:
        got = duck.execute(
            f"select {N.normalize_sql('$s')}", {"s": raw}
        ).fetchone()[0]
        assert got == want, raw


def test_normalize_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "s string")
    assert df.select(N.normalize_col(F.col("s"))).collect()[0][0] is None
