"""Structured-Streaming ingest enrichment: micro-batch = the reference's
per-document index-time enrichment; snapshot commit per batch; resume
via the streaming checkpoint (no reprocessing of seen files)."""

import pytest
from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.plans.pipeline import build_pipeline
from rosette_elasticsearch_plugin_spark.sources.table_io import SnapshotTable
from rosette_elasticsearch_plugin_spark.streaming.ingest import (
    enrich_stream,
    flat_docs_schema,
)

PROCESSORS = [
    {"ros_language": {"field": "text", "target_field": "ros_language"}},
    {"ros_sentiment": {"field": "text", "target_field": "ros_sentiment"}},
]


def _write_docs(spark, path, ids, text="the quick brown fox and the lazy dog"):
    rows = [(i, text, "en", "t", len(text)) for i in ids]
    (
        spark.createDataFrame(rows, flat_docs_schema())
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "in"),
        "table": str(tmp_path / "table"),
        "ckpt": str(tmp_path / "ckpt"),
        "quar": str(tmp_path / "quar"),
    }


def _drain(spark, dirs):
    stage = build_pipeline(spark, PROCESSORS)
    q = enrich_stream(
        spark, dirs["in"], stage, dirs["table"], dirs["ckpt"],
        quarantine_root=dirs["quar"],
    )
    q.awaitTermination(120)
    return SnapshotTable(dirs["table"])


def test_stream_enriches_and_commits(spark, dirs):
    _write_docs(spark, dirs["in"], range(10))
    table = _drain(spark, dirs)
    out = table.read(spark)
    assert out.count() == 10
    assert {"ros_language", "ros_sentiment"} <= set(out.columns)
    assert out.where(F.col("ros_language").isNull()).count() == 0
    assert table.current_snapshot().stage.startswith("stream-")
    assert "-batch-" in table.current_snapshot().stage


def test_stream_resumes_from_checkpoint(spark, dirs):
    _write_docs(spark, dirs["in"], range(10))
    _drain(spark, dirs)

    # new files arrive; a restarted stream processes ONLY them
    _write_docs(spark, dirs["in"], range(100, 105))
    table = _drain(spark, dirs)
    hist = table.history()
    # append semantics: first snapshot = 10 rows, latest view = all 15
    assert hist[0].row_count == 10
    assert hist[-1].row_count == 15
    out = table.read(spark)
    assert out.count() == 15
    # and the 5 new docs were processed exactly once
    assert out.where(F.col("doc_id") >= 100).count() == 5
