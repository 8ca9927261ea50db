"""PII redaction golden outputs + cross-engine parity."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.functions.redact import (
    pii_count_col,
    pii_count_sql,
    redact_col,
    redact_sql,
)

CASES = [
    ("mail me at a.b-c+x@test.org today", "mail me at <EMAIL> today", 1),
    ("see https://ex.com/p?q=1#f and http://a.io", "see <URL> and <URL>", 2),
    ("call +1 (415) 555-0199 maybe", "call <PHONE> maybe", 1),
    ("order 123456789 shipped", "order <IDNUM> shipped", 1),
    # URL wins over its embedded email/digits; token not re-matched
    ("go to https://u:p@host.com/9999999 now", "go to <URL> now", 1),
    ("clean text stays clean", "clean text stays clean", 0),
]


def test_redact_golden(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "i long, text string"
    )
    got = {
        r["i"]: (r["red"], r["n"])
        for r in df.select(
            "i",
            redact_col(F.col("text")).alias("red"),
            pii_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    for i, (_, want_red, want_n) in enumerate(CASES):
        assert got[i] == (want_red, want_n), (i, got[i])


def test_redact_duckdb_mirror(duck):
    for text, want_red, want_n in CASES:
        esc = text.replace("'", "''")
        red, n = duck.execute(
            f"select {redact_sql('t')}, {pii_count_sql('t')} "
            f"from (select '{esc}' as t)"
        ).fetchone()
        assert (red, n) == (want_red, want_n), text
