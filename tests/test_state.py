"""R12 — snapshot tables + resumable pipeline (north rule: resume from
last committed snapshot, per-partition lineage + metrics)."""

import os

import pytest
from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.plans.er_pipeline import (
    resolve_documents,
)
from rosette_elasticsearch_plugin_spark.plans.state import ResumableERPipeline
from rosette_elasticsearch_plugin_spark.sources.adapter import load_documents
from rosette_elasticsearch_plugin_spark.sources.table_io import SnapshotTable

SF = "/root/testdata/sf0.001"
PATTERN = r"[a-z]{2,}"


def test_snapshot_commit_read_history_lineage(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    s1 = t.commit(df1, "stage_a", {"rows_in": 100})
    assert s1.snapshot_id == 1 and s1.parent_id is None
    assert s1.row_count == 100
    # per-partition lineage present with plausible sizes
    assert all(f["rows"] >= 0 and f["bytes"] > 0 for f in s1.files)

    s2 = t.commit(df1.where("id < 10"), "stage_a")
    assert s2.snapshot_id == 2 and s2.parent_id == 1
    hist = t.history()
    assert [s.snapshot_id for s in hist] == [1, 2]
    # current read = latest snapshot only (overwrite semantics)
    assert t.read(spark).count() == 10
    # time travel to snapshot 1
    assert t.read(spark, 1).count() == 100


def test_uncommitted_data_invisible(spark, tmp_path):
    """Crash between data write and manifest rename → orphan dir that no
    read ever sees (the Iceberg visibility rule)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(5), "s")
    # simulate a failed commit: data lands, manifest never renamed
    orphan = os.path.join(t.data_dir, "snap-00099")
    spark.range(1000).write.parquet(orphan)
    assert t.read(spark).count() == 5
    assert t.current_snapshot().snapshot_id == 1


def test_resume_after_injected_failure(spark, tmp_path):
    docs = load_documents(spark, SF)
    root = str(tmp_path / "state")

    p1 = ResumableERPipeline(root)
    with pytest.raises(RuntimeError, match="injected failure"):
        p1.run(spark, docs, pattern=PATTERN, fail_after="name_clusters")
    done = {r.stage: r for r in p1.results}
    assert not done["mentions"].resumed and not done["name_clusters"].resumed
    assert "assigned" not in done

    # fresh pipeline object = restarted driver; completed stages resume
    p2 = ResumableERPipeline(root)
    assigned = p2.run(spark, docs, pattern=PATTERN)
    report = {m["stage"]: m for m in p2.metrics()}
    assert report["mentions"]["resumed"] is True
    assert report["name_clusters"]["resumed"] is True
    assert report["assigned"]["resumed"] is False
    # snapshot ids stable across the resume (nothing recomputed/rewritten)
    assert report["mentions"]["snapshot_id"] == done["mentions"].snapshot_id
    # per-partition lineage present in the metrics report
    assert all(len(m["partitions"]) >= 1 for m in report.values())

    # resumed result == single-shot result, value for value
    expected, _ = resolve_documents(docs, pattern=PATTERN)
    cols = ["doc_id", "mention_id", "normalized", "cluster"]
    got = sorted(map(tuple, assigned.select(*cols).collect()))
    want = sorted(map(tuple, expected.select(*cols).collect()))
    assert got == want


def test_rerun_after_success_is_fully_resumed(spark, tmp_path):
    docs = load_documents(spark, SF)
    root = str(tmp_path / "state")
    p1 = ResumableERPipeline(root)
    p1.run(spark, docs, pattern=PATTERN)
    p2 = ResumableERPipeline(root)
    out = p2.run(spark, docs, pattern=PATTERN)
    assert all(m["resumed"] for m in p2.metrics())
    assert out.count() == self_count(p1)


def self_count(p: ResumableERPipeline) -> int:
    return [r for r in p.results if r.stage == "assigned"][0].rows


def test_bucketed_commit_layout_and_readback(spark, tmp_path):
    """North-star bucket-by-block layout: rows hash-bucketed on the key
    into stable __bucket partition dirs; read-back recovers everything."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(f"name{i}", i) for i in range(200)], "node string, v long"
    )
    snap = t.commit(df, "blocks", buckets=("node", 8))
    # lineage records the bucket dir per file
    parts = {f["partition"].split("=")[0] for f in snap.files}
    assert parts == {"__bucket"}
    back = t.read(spark)
    assert back.count() == 200
    assert "__bucket" in back.columns
    # bucket assignment is the deterministic pmod(hash(node), 8)
    from pyspark.sql import functions as F

    bad = back.where(
        F.col("__bucket") != F.pmod(F.hash("node"), F.lit(8))
    ).count()
    assert bad == 0


def test_partitioned_commit_readback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)], "id long, kind string"
    )
    t.commit(df, "s", partition_by=["kind"])
    back = t.read(spark)
    assert back.count() == 30
    assert set(back.select("kind").distinct().toPandas()["kind"]) == {"a", "b", "c"}
