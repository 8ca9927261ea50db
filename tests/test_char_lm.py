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
