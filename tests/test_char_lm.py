"""Character-bigram LM quality score (functions/textstats.py)."""

from pyspark.sql import functions as F


def _score(spark, rows):
    from rosette_elasticsearch_plugin_spark.functions.textstats import (
        char_lm_model,
        char_lm_score,
    )

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    model = char_lm_model(docs)
    return {
        r.doc_id: r
        for r in char_lm_score(docs, model).collect()
    }, model


def test_char_lm_ranks_fluent_above_gibberish(spark):
    fluent = "the quick brown fox jumps over the lazy dog and then "
    rows = [
        ("fluent", fluent * 4),
        ("fluent2", "the lazy dog jumps over the quick brown fox again "),
        ("gibberish", "zq xv jq qz vx zzqp wvxk qqj zxv kqw jzx vqk " * 3),
    ]
    got, _ = _score(spark, rows)
    assert got["fluent"].avg_logp2 > got["gibberish"].avg_logp2
    assert got["fluent2"].avg_logp2 > got["gibberish"].avg_logp2
    assert got["gibberish"].ppl > got["fluent"].ppl


def test_char_lm_oov_fallback(spark):
    """Scoring a doc whose grams the model never saw uses the OOV
    log-prob, which is strictly below every trained gram's."""
    from rosette_elasticsearch_plugin_spark.functions.textstats import (
        char_lm_model,
        char_lm_score,
    )

    train = spark.createDataFrame(
        [("a", "aaaa bbbb aaaa")], ["doc_id", "text"]
    )
    model = char_lm_model(train)
    test = spark.createDataFrame(
        [("seen", "aaaa"), ("unseen", "zzzz")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in char_lm_score(test, model).collect()}
    assert got["unseen"].avg_logp2 < got["seen"].avg_logp2
    min_logp = model.agg(F.min("logp")).collect()[0][0]
    oov = model.agg(F.max("logp_oov")).collect()[0][0]
    assert oov < min_logp


def test_char_lm_null_text_excluded(spark):
    rows = [("a", "hello world"), ("b", None)]
    got, _ = _score(spark, rows)
    assert "b" not in got and "a" in got


def test_char_entropy_bounds(spark):
    from rosette_elasticsearch_plugin_spark.functions.textstats import (
        char_entropy,
    )

    rows = [
        ("uniform", "abcdefgh"),       # 8 distinct chars -> exactly 3 bits
        ("degenerate", "aaaaaaaa"),    # one char -> 0 bits
        ("fluent", "the quick brown fox jumps over the lazy dog"),
        ("empty", ""),                 # excluded
        ("null", None),                # excluded
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert got["uniform"].entropy_bits == 3.0
    assert got["degenerate"].entropy_bits == 0.0
    assert 3.0 < got["fluent"].entropy_bits < 5.0
    assert "empty" not in got and "null" not in got


def test_char_entropy_sql_mirror(spark, duck):
    from rosette_elasticsearch_plugin_spark.functions.textstats import (
        char_entropy,
        char_entropy_sql,
    )

    rows = [(1, "hello world"), (2, "aAbB xyz !!"), (3, "mississippi")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_chars, r.entropy_bits)
        for r in char_entropy(docs).collect()
    }
    vals = ", ".join("(%d, '%s')" % r for r in rows)
    want = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            char_entropy_sql(f"(values {vals}) d(doc_id, text)")
        ).fetchall()
    }
    assert got == want
