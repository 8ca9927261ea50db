"""P1 guard contract (RosetteAbstractProcessorTest.java:42-70):
empty input → passthrough; occupied target → error; empty compute
result on non-empty input → error column; quarantine routing."""

import pytest
from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators.base import (
    TargetOccupiedError,
    apply_guarded,
    split_quarantine,
)
from rosette_elasticsearch_plugin_spark.operators.language import language_stage


def test_empty_input_passthrough(spark):
    df = spark.createDataFrame(
        [("d1", ""), ("d2", None), ("d3", "this is the very english text")],
        "doc_id string, text string",
    )
    out = language_stage()(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["ros_language"] is None
    assert by_id["d1"]["ros_language__error"] is None
    assert by_id["d2"]["ros_language"] is None
    assert by_id["d2"]["ros_language__error"] is None
    assert by_id["d3"]["ros_language"] == "eng"


def test_occupied_target_raises(spark):
    df = spark.createDataFrame(
        [("d1", "text", "already")], "doc_id string, text string, ros_language string"
    )
    with pytest.raises(TargetOccupiedError):
        language_stage()(df)


def test_empty_result_flagged(spark):
    # '12345' has no language markers → detector null → error column set
    df = spark.createDataFrame(
        [("d1", "12345 67890")], "doc_id string, text string"
    )
    r = language_stage()(df).collect()[0]
    assert r["ros_language"] is None
    assert r["ros_language__error"] is not None


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [("d1", "the english text"), ("d2", "12345")],
        "doc_id string, text string",
    )
    out = language_stage()(df)
    good, bad = split_quarantine(out)
    assert [r["doc_id"] for r in good.collect()] == ["d1"]
    assert [r["doc_id"] for r in bad.collect()] == ["d2"]


def test_guard_value_only_for_nonempty(spark):
    df = spark.createDataFrame([("d1", "x")], "doc_id string, text string")
    out = apply_guarded(df, "text", "t", F.upper(F.col("text")))
    assert out.collect()[0]["t"] == "X"
