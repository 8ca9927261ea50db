"""Iceberg-seam contract test for the snapshot table layer.

``sources/table_io.SnapshotTable`` emulates Iceberg snapshot semantics
over parquet + JSON manifests because the sandbox ships no Iceberg
runtime jar.  This test pins down exactly the OBSERVABLE contract a
real Iceberg-backed implementation must satisfy, driven through a thin
adapter so the swap is mechanical:

  swap points (see README "Iceberg seam"):
    commit(df, stage, mode="append")     → df.writeTo(t).append()
                                           + snapshot summary props
    commit(df, stage, mode="overwrite")  → df.writeTo(t).overwritePartitions()
    commit(..., buckets=(col, n))        → ALTER TABLE ... ADD PARTITION
                                           FIELD bucket(n, col) (once)
    read(spark[, snapshot_id])           → spark.read.option(
                                           "snapshot-id", id).table(t)
    history()/last_snapshot_for(stage)   → t.snapshots metadata table,
                                           filtered on summary["stage"]

Every assertion below holds verbatim for Iceberg tables; nothing in
this test touches manifests, file paths, or any other emulation
internals.
"""

import pytest

from rosette_elasticsearch_plugin_spark.sources.table_io import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_read_before_any_commit_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        table.read(spark)


def test_append_accumulates_and_overwrite_replaces(spark, table):
    table.commit(_df(spark, [(1, "a")]), "ingest", mode="append")
    table.commit(_df(spark, [(2, "b")]), "ingest", mode="append")
    assert sorted(r["k"] for r in table.read(spark).collect()) == [1, 2]
    table.commit(_df(spark, [(9, "z")]), "compact", mode="overwrite")
    assert [r["k"] for r in table.read(spark).collect()] == [9]


def test_snapshot_ids_are_linear_and_time_travel_works(spark, table):
    s1 = table.commit(_df(spark, [(1, "a")]), "stage1")
    s2 = table.commit(_df(spark, [(2, "b")]), "stage2")
    assert s2.parent_id == s1.snapshot_id
    # time travel: reading snapshot 1 ignores snapshot 2's data
    assert [r["k"] for r in table.read(spark, s1.snapshot_id).collect()] == [1]
    assert [r["k"] for r in table.read(spark, s2.snapshot_id).collect()] == [2]


def test_last_snapshot_for_stage_and_metrics(spark, table):
    table.commit(_df(spark, [(1, "a")]), "mentions", metrics={"rows": 1})
    table.commit(_df(spark, [(2, "b")]), "clusters", metrics={"rows": 1})
    snap = table.last_snapshot_for("mentions")
    assert snap is not None and snap.stage == "mentions"
    assert snap.metrics["rows"] == 1
    assert table.last_snapshot_for("nope") is None
    # per-partition lineage: every snapshot reports file-level rows
    assert snap.row_count == 1
    assert all("rows" in f and "bytes" in f for f in snap.files)


def test_bucket_layout_is_stable_for_colocated_joins(spark, table):
    """bucket-by-block partitioning (Iceberg bucket(n, col) transform):
    the same key lands in the same bucket on every commit, so two
    bucketed tables co-locate their join keys."""
    rows = [(i, f"v{i}") for i in range(40)]
    s = table.commit(_df(spark, rows), "blocks", buckets=("k", 4))
    parts = {f["partition"].split("=")[-1] for f in s.files}
    assert len(parts) == 4
    df = table.read(spark)
    # the bucket column is part of the physical layout and readable
    got = {(r["k"], r["__bucket"]) for r in df.collect()}
    s2 = table.commit(_df(spark, rows), "blocks", buckets=("k", 4))
    df2 = table.read(spark, s2.snapshot_id)
    assert {(r["k"], r["__bucket"]) for r in df2.collect()} == got


def test_failed_commit_is_invisible(spark, table):
    """All-or-nothing visibility: work that never reached the commit
    point must not be readable — exactly Iceberg's rule that a snapshot
    exists only once its metadata pointer is swapped."""
    table.commit(_df(spark, [(1, "a")]), "stage1")
    before = table.current_snapshot().snapshot_id
    # simulate a crash mid-commit: data written, commit never finalized
    # (emulation: data dir without manifest; Iceberg: data files without
    # a metadata swap).  We model it by just... not committing.
    doomed = _df(spark, [(666, "x")])
    doomed.write.mode("overwrite").parquet(str(table.data_dir) + "/snap-99999")
    assert table.current_snapshot().snapshot_id == before
    assert [r["k"] for r in table.read(spark).collect()] == [1]


def test_empty_snapshot_reads_back_with_schema(spark, table):
    """A committed snapshot whose write produced zero data files (all
    rows filtered) must read back as an empty DataFrame with the
    committed schema, not crash."""
    df = _df(spark, [(1, "a")]).where("k > 99")
    table.commit(df, "s", partition_by=["v"])
    out = table.read(spark)
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}


def test_concurrent_commit_raises_instead_of_overwriting(spark, table):
    """The commit point is a CAS: if another writer already committed
    this snapshot id, the commit fails loudly rather than silently
    replacing their manifest."""
    import os

    import pytest as _pytest

    from rosette_elasticsearch_plugin_spark.sources.table_io import (
        ConcurrentCommitError,
    )

    from unittest import mock

    s1 = table.commit(_df(spark, [(1, "a")]), "s1")
    # a rival writer lands snapshot 2 in the window between OUR parent
    # read and our manifest link: pin our view of the parent at s1,
    # then let the rival commit for real
    rival = os.path.join(table.snap_dir, "snap-00002.json")
    with open(rival, "w") as fh:
        fh.write('{"snapshot_id": 2, "stage": "rival", "files": []}')
    with mock.patch.object(type(table), "current_snapshot", return_value=s1):
        with _pytest.raises(ConcurrentCommitError):
            table.commit(_df(spark, [(2, "b")]), "s2")
    # the rival's manifest is intact
    assert table.last_snapshot_for("rival") is not None


def test_cc_nonconvergence_raises(spark):
    """A component whose diameter exceeds the iteration budget must
    fail loudly, never return silently split clusters."""
    import pytest as _pytest

    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        connected_components,
    )

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(10)]
    edges = spark.createDataFrame(chain, "node_a string, node_b string")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    ok = connected_components(edges, max_iter=15)
    assert {r["cluster"] for r in ok.collect()} == {"n00"}


def test_resume_pipeline_reuses_only_matching_fingerprint(spark, tmp_path):
    """The staged ER pipeline resumes from a committed snapshot ONLY
    when the run fingerprint (inputs + config) matches; a changed
    pattern recomputes instead of silently reading stale state."""
    from rosette_elasticsearch_plugin_spark.plans.state import (
        ResumableERPipeline,
    )
    from rosette_elasticsearch_plugin_spark.schema import DOCUMENTS

    docs = spark.createDataFrame(
        [("d1", [("text", "alice and bob met carol", None, 0)])], DOCUMENTS
    )
    root = str(tmp_path / "state")
    ResumableERPipeline(root).run(spark, docs, pattern=r"[a-z]{3,}")
    again = ResumableERPipeline(root)
    again.run(spark, docs, pattern=r"[a-z]{3,}")
    assert all(m["resumed"] for m in again.metrics())
    changed = ResumableERPipeline(root)
    changed.run(spark, docs, pattern=r"[a-z]{4,}")
    assert not any(m["resumed"] for m in changed.metrics())


def test_flat_documents_format_agnostic(spark, tmp_path):
    """parquet / JSON-lines / CSV readers produce the identical flat
    documents frame through the explicit-schema seam — including text
    containing quotes, commas, and embedded newlines (the CSV
    multiLine + escape options exist for exactly those)."""
    from rosette_elasticsearch_plugin_spark.sources.adapter import (
        read_flat_documents,
    )
    from rosette_elasticsearch_plugin_spark.streaming.ingest import (
        flat_docs_schema,
    )

    rows = [
        (1, 'plain text', "en", "t", 10),
        (2, 'with "quotes", commas', "en", "t", 21),
        (3, "multi\nline\ntext", "de", "u", 15),
        (4, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, flat_docs_schema()).coalesce(1)
    paths = {
        "parquet": str(tmp_path / "p"),
        "json": str(tmp_path / "j"),
        "csv": str(tmp_path / "c"),
    }
    df.write.parquet(paths["parquet"])
    df.write.json(paths["json"])
    df.write.options(header=True, quote='"', escape='"').csv(paths["csv"])
    want = {tuple(r) for r in rows}
    for fmt, path in paths.items():
        got = {
            tuple(r)
            for r in read_flat_documents(spark, path, fmt=fmt).collect()
        }
        assert got == want, fmt
