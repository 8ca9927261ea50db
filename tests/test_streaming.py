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


# --- continuous resolution: incremental_resolve per micro-batch ------------


def _write_corpus_batches(spark, in_dir, ranges, n_docs=60, seed=7):
    import glob
    import os
    import shutil

    from rosette_elasticsearch_plugin_spark import corpus as corpus_mod

    c = corpus_mod.generate(n_docs=n_docs, seed=seed)
    docs_df, _ = corpus_mod.to_spark(spark, c)
    os.makedirs(in_dir, exist_ok=True)
    for i, (lo, hi) in enumerate(ranges):
        batch = docs_df.where(
            (F.col("doc_id") >= f"doc{lo:05d}") & (F.col("doc_id") < f"doc{hi:05d}")
        )
        part_dir = os.path.join(os.path.dirname(in_dir), f"__part{i}")
        batch.coalesce(1).write.parquet(part_dir)
        (src,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(in_dir, f"batch-{i}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(part_dir)
    return docs_df


def _run_resolve_stream(spark, dirs, **kw):
    from rosette_elasticsearch_plugin_spark.streaming.resolve import resolve_stream

    q = resolve_stream(
        spark, dirs["in"], clusters_root=dirs["table"],
        checkpoint_dir=dirs["ckpt"], **kw,
    )
    q.awaitTermination(300)
    return SnapshotTable(dirs["table"])


def _partition(rows):
    """cluster label → frozenset of members, label-independent."""
    by = {}
    for r in rows:
        by.setdefault(r["cluster"], set()).add(r["node"])
    return {frozenset(v) for v in by.values()}


def test_resolve_stream_matches_batch(spark, dirs):
    """Final streamed state (min-node labels) == full-corpus batch
    resolution, for a 3-way split the batch path never saw."""
    from rosette_elasticsearch_plugin_spark.operators.entities import (
        distinct_mention_names,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import resolve_names

    docs_df = _write_corpus_batches(
        spark, dirs["in"], [(0, 20), (20, 40), (40, 60)]
    )
    table = _run_resolve_stream(spark, dirs, stable_ids=False)
    # one state snapshot per micro-batch, each a complete table
    assert len(table.history()) == 3
    got = sorted(
        (r["node"], r["cluster"]) for r in table.read(spark).collect()
    )
    want = sorted(
        (r["node"], r["cluster"])
        for r in resolve_names(distinct_mention_names(docs_df)).collect()
    )
    assert got == want


def test_resolve_stream_stable_ids(spark, dirs):
    """Production id rule over the stream: membership equals the batch
    partition, and every final cluster containing a batch-0-era node
    keeps a batch-0-era id (references never dangle)."""
    from rosette_elasticsearch_plugin_spark.operators.entities import (
        distinct_mention_names,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import resolve_names

    docs_df = _write_corpus_batches(spark, dirs["in"], [(0, 30), (30, 60)])
    table = _run_resolve_stream(spark, dirs, stable_ids=True)
    hist = table.history()
    assert len(hist) == 2
    first = table.read(spark, hist[0].snapshot_id).collect()
    final = table.read(spark, hist[-1].snapshot_id).collect()
    # membership is label-independent → must equal the batch partition
    want = _partition(resolve_names(distinct_mention_names(docs_df)).collect())
    assert _partition(final) == want
    # id stability: any final cluster with a batch-0 member is labeled
    # by a batch-0 cluster id (merges collapse to an older id, never a
    # fresh one)
    first_ids = {r["cluster"] for r in first}
    first_nodes = {r["node"] for r in first}
    for label, members in (
        (r["cluster"], None) for r in final if r["node"] in first_nodes
    ):
        assert label in first_ids


def test_resolve_stream_replay_is_noop(spark, dirs):
    """Restarting the drained stream on the same checkpoint commits
    nothing new (idempotent replay → exactly-once state visibility)."""
    _write_corpus_batches(spark, dirs["in"], [(0, 30), (30, 60)])
    table = _run_resolve_stream(spark, dirs)
    n = len(table.history())
    table2 = _run_resolve_stream(spark, dirs)
    assert len(table2.history()) == n


def test_stateful_counts_accumulate_across_batches(spark, dirs):
    """applyInPandasWithState: the per-name running total must SURVIVE
    across micro-batches (strictly increasing update rows for a name
    seen in every batch) and the final state must equal the batch
    groupBy count for any split."""
    import os

    from rosette_elasticsearch_plugin_spark.streaming.stateful import (
        final_counts,
        mention_count_stream,
    )

    os.makedirs(dirs["in"], exist_ok=True)
    texts = [
        "alpha beta alpha",          # batch 0: alpha=2, beta=1
        "alpha gamma",               # batch 1: alpha=3 cumulative
        "beta beta alpha delta",     # batch 2: alpha=4, beta=3
    ]
    from rosette_elasticsearch_plugin_spark.streaming.ingest import (
        stage_batch_files,
    )

    stage_batch_files(
        [
            spark.createDataFrame(
                [(i, text, "en", "t", len(text))], flat_docs_schema()
            )
            for i, text in enumerate(texts)
        ],
        dirs["in"],
    )
    q = mention_count_stream(
        spark, dirs["in"], updates_root=dirs["table"], checkpoint_dir=dirs["ckpt"]
    )
    q.awaitTermination()

    log = SnapshotTable(dirs["table"]).read(spark)
    alpha = [
        r["running_count"]
        for r in log.where(F.col("normalized") == "alpha")
        .orderBy("batch_id")
        .collect()
    ]
    assert alpha == [2, 3, 4]  # state carried batch to batch
    got = {
        r["normalized"]: r["n_mentions"]
        for r in final_counts(spark, dirs["table"]).collect()
    }
    assert got == {"alpha": 4, "beta": 3, "gamma": 1, "delta": 1}


def test_resolve_stream_maintains_name_index(spark, dirs):
    """The streaming resolver commits a (node, key, block_key) index
    beside the clusters state, extending it per batch — its final
    content must equal a from-scratch index over the full vocabulary,
    and it must cover exactly the resolved node set."""
    from rosette_elasticsearch_plugin_spark.operators.entities import (
        distinct_mention_names,
    )
    from rosette_elasticsearch_plugin_spark.plans.incremental import (
        extend_name_index,
    )

    docs_df = _write_corpus_batches(spark, dirs["in"], [(0, 30), (30, 60)])
    table = _run_resolve_stream(spark, dirs, stable_ids=False)
    idx_table = SnapshotTable(dirs["table"].rstrip("/") + "_index")
    assert len(idx_table.history()) == 2  # one index snapshot per batch
    got = {
        (r["node"], r["key"], r["block_key"])
        for r in idx_table.read(spark).collect()
    }
    want = {
        (r["node"], r["key"], r["block_key"])
        for r in extend_name_index(
            None, distinct_mention_names(docs_df)
        ).collect()
    }
    assert got == want
    nodes = {r["node"] for r in table.read(spark).collect()}
    assert {n for n, _, _ in got} == nodes


def _write_event_batch(spark, in_dir, rows):
    """One micro-batch file of (event_id, ts, event_type) rows."""
    from rosette_elasticsearch_plugin_spark.streaming.windowed import (
        events_schema,
    )

    full = [(i, ts, 0, et, 0.0, "{}") for i, ts, et in rows]
    (
        spark.createDataFrame(full, events_schema())
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )


def test_windowed_append_drops_late_rows(spark, dirs):
    """Append-mode watermark semantics: a row older than the watermark
    is dropped, and only watermark-closed windows are emitted.

    Batch 1: two 'a' events in hour-0       → watermark 00:20−30m
    Batch 2: one 'b' event at 02:00         → watermark 01:30, hour-0
             window (end 01:00) closes with count 2
    Batch 3: LATE 'a' at 00:10 (< 01:30 → DROPPED) + one 'c' at 04:00
             → watermark 03:30, hour-2 window closes with count 1;
             hour-4 stays open and is never emitted."""
    from datetime import datetime as DT

    from rosette_elasticsearch_plugin_spark.streaming.windowed import (
        final_windowed_counts,
        windowed_event_counts,
    )

    d = lambda h, m: DT(2024, 1, 1, h, m)  # noqa: E731
    batches = [
        [(0, d(0, 5), "a"), (1, d(0, 20), "a")],
        [(2, d(2, 0), "b")],
        [(3, d(0, 10), "a"), (4, d(4, 0), "c")],
    ]
    # write each file only after the stream drained the previous one —
    # the batch ORDER is the point of this test (the watermark is
    # computed from batches 1-2 and must drop batch 3's late row)
    _write_event_batch(spark, dirs["in"], batches[0])
    q, name = windowed_event_counts(
        spark,
        dirs["in"],
        checkpoint_dir=dirs["ckpt"],
        window="1 hour",
        watermark="30 minutes",
        output_mode="append",
        available_now=False,
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            _write_event_batch(spark, dirs["in"], b)
            q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    rows = final_windowed_counts(spark, name).collect()
    got = {r["event_type"]: (r["window_start"], r["n_events"]) for r in rows}
    # the late row was dropped: hour-0 'a' window emitted with 2, not 3
    assert got["a"][1] == 2
    # hour-2 'b' window closed by the final watermark
    assert got["b"][1] == 1
    # the open hour-4 'c' window was never emitted
    assert "c" not in got
    assert len(rows) == 2
    # tumbling alignment: epoch-hour-aligned starts exactly 2h apart
    assert got["a"][0] % 3600 == 0
    assert got["b"][0] - got["a"][0] == 7200


def test_cdc_stream_adds_deletes_refcounts(spark, tmp_path):
    """CDC continuous resolution: the final streamed state equals the
    batch resolve over exactly the names with positive final refcount
    — re-adds after retraction and a survive-one-delete refcount both
    exercised on a tiny deterministic event log."""
    import os

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import (
        resolve_names,
    )
    from rosette_elasticsearch_plugin_spark.streaming.ingest import (
        stage_batch_files,
    )
    from rosette_elasticsearch_plugin_spark.streaming.resolve import (
        resolve_cdc_stream,
    )

    batches = [
        # b1: two aykroyd variants + putin
        [("add", "dan aykroyd"), ("add", "daniel aykroyd"),
         ("add", "vladimir putin")],
        # b2: second reference to putin; delete one aykroyd variant
        [("add", "vladimir putin"), ("delete", "daniel aykroyd")],
        # b3: putin survives one delete (refcount 2→1); the deleted
        # aykroyd variant is re-added; unknown delete is noise
        [("delete", "vladimir putin"), ("add", "daniel aykroyd"),
         ("delete", "zzyzx nobody")],
    ]
    live = ["dan aykroyd", "daniel aykroyd", "vladimir putin"]

    in_dir = os.path.join(str(tmp_path), "in")
    stage_batch_files(
        [spark.createDataFrame(b, "op string, node string") for b in batches],
        in_dir,
    )
    q = resolve_cdc_stream(
        spark,
        in_dir,
        clusters_root=os.path.join(str(tmp_path), "clusters"),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()

    got = {
        r["node"]: r["cluster"]
        for r in SnapshotTable(os.path.join(str(tmp_path), "clusters"))
        .read(spark)
        .collect()
    }
    want = {
        r["node"]: r["cluster"]
        for r in resolve_names(
            spark.createDataFrame([(n,) for n in live], "node string")
        ).collect()
    }
    assert got == want
    # the two aykroyd variants are one cluster; putin stayed live
    assert got["dan aykroyd"] == got["daniel aykroyd"]
    assert "vladimir putin" in got


def test_session_windows_merge_across_batches(spark, dirs):
    """The state-merge property that makes streaming sessionization
    non-trivial: a session whose events arrive in DIFFERENT micro-batches
    must still come out as ONE session row.

    Batch 1: 'a' at 00:00 and 00:10 (one open session)
    Batch 2: 'a' at 00:25 — 15 min after the last event, under the
             30-min gap → EXTENDS the batch-1 session; plus 'a' at
             03:00 — over the gap → its own session."""
    from datetime import datetime as DT

    from rosette_elasticsearch_plugin_spark.streaming.windowed import (
        final_windowed_counts,
        session_event_counts,
    )

    d = lambda h, m: DT(2024, 1, 1, h, m)  # noqa: E731
    _write_event_batch(spark, dirs["in"], [(0, d(0, 0), "a"), (1, d(0, 10), "a")])
    q, name = session_event_counts(
        spark,
        dirs["in"],
        checkpoint_dir=dirs["ckpt"],
        gap="30 minutes",
        watermark="30 minutes",
        output_mode="complete",
        available_now=False,
    )
    try:
        q.processAllAvailable()
        _write_event_batch(
            spark, dirs["in"], [(2, d(0, 25), "a"), (3, d(3, 0), "a")]
        )
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    rows = final_windowed_counts(spark, name).collect()
    got = {r["session_start"]: r for r in rows}
    base = int(DT(2024, 1, 1).timestamp())
    # ONE merged session 00:00-00:55 with all three events — not the
    # batch-1 session plus a separate batch-2 one
    assert len(rows) == 2
    assert got[base]["n_events"] == 3
    assert got[base]["session_end"] == base + 25 * 60 + 30 * 60
    assert got[base + 3 * 3600]["n_events"] == 1


def test_session_windows_drop_late_rows_even_in_complete_mode(spark, dirs):
    """Session windows apply the late-event filter in EVERY output mode
    (measured; tumbling complete mode keeps late rows — the module
    docstring documents the asymmetry).  An event older than the
    watermark vanishes from the complete-mode result too."""
    from datetime import datetime as DT

    from rosette_elasticsearch_plugin_spark.streaming.windowed import (
        final_windowed_counts,
        session_event_counts,
    )

    d = lambda h, m: DT(2024, 1, 1, h, m)  # noqa: E731
    _write_event_batch(spark, dirs["in"], [(0, d(5, 0), "a")])
    q, name = session_event_counts(
        spark,
        dirs["in"],
        checkpoint_dir=dirs["ckpt"],
        gap="30 minutes",
        watermark="30 minutes",
        output_mode="complete",
        available_now=False,
    )
    try:
        q.processAllAvailable()
        # batch 2 ('b' at 05:40) lets the 04:30 watermark from batch 1
        # take effect (watermark filters engage one batch after the
        # data that set them — same lag the tumbling append test rides)
        _write_event_batch(spark, dirs["in"], [(1, d(5, 40), "b")])
        q.processAllAvailable()
        # 01:00 is far older than the active watermark → dropped, even
        # though the sink is complete-mode
        _write_event_batch(spark, dirs["in"], [(2, d(1, 0), "a")])
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    rows = final_windowed_counts(spark, name).collect()
    base = int(DT(2024, 1, 1).timestamp())
    assert sum(r["n_events"] for r in rows) == 2
    assert len(rows) == 2
    assert base + 3600 not in {r["session_start"] for r in rows}


def test_dedup_stream_split_invariant_and_replay(spark, dirs):
    """Streaming exact dedup: the final keeper state equals the batch
    exact_dedup over the full input for an adversarial split (dup
    before its original, dups within one batch), and a restart on the
    drained checkpoint commits nothing new."""
    import os

    from rosette_elasticsearch_plugin_spark.operators.dedup import exact_dedup
    from rosette_elasticsearch_plugin_spark.sources.table_io import (
        SnapshotTable,
    )
    from rosette_elasticsearch_plugin_spark.streaming.dedup import dedup_stream
    from rosette_elasticsearch_plugin_spark.streaming.ingest import (
        flat_docs_schema,
        stage_batch_files,
    )

    rows = [
        # (doc_id, text): 10/2 duplicate 1, 11 duplicates 3; the copy
        # with the SMALLER id (2) arrives in a LATER batch than id 10 —
        # min-merge must still pick 1 as keeper of that group
        (10, "alpha beta gamma"),
        (3, "delta epsilon"),
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (11, "delta epsilon"),
        (5, "unique text"),
    ]

    def df(sl):
        return spark.createDataFrame(
            [(i, t, "en", "t", len(t)) for i, t in sl], flat_docs_schema()
        )

    os.makedirs(dirs["in"], exist_ok=True)
    stage_batch_files([df(rows[:2]), df(rows[2:4]), df(rows[4:])], dirs["in"])

    def run():
        q = dedup_stream(
            spark,
            dirs["in"],
            keepers_root=os.path.join(dirs["table"], "keepers"),
            checkpoint_dir=os.path.join(dirs["table"], "ckpt_dedup"),
        )
        q.awaitTermination()
        return SnapshotTable(os.path.join(dirs["table"], "keepers"))

    table = run()
    got = {
        r.text_md5: (r.n_docs, r.keeper_doc_id)
        for r in table.read(spark).collect()
    }
    want = {
        r.text_md5: (r.n_docs, r.keeper_doc_id)
        for r in exact_dedup(df(rows)).collect()
    }
    assert got == want
    assert 1 in {k for _n, k in got.values()}  # min id won the group
    n = len(table.history())
    table2 = run()
    assert len(table2.history()) == n
