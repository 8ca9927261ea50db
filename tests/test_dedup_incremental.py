"""Incremental near-dup detection over a persisted band index
(operators/dedup.extend_band_index / incremental_near_dup_pairs)."""

from pyspark.sql import functions as F


def _pairs(df):
    return {
        (r.doc_id_a, r.doc_id_b)
        for r in df.select("doc_id_a", "doc_id_b").collect()
    }


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river "
    rows = [
        (1, base * 3),
        (2, base * 3 + "and rests "),       # near-dup of 1
        (3, "completely different text about entity resolution engines "
            "and spark pipelines running at warehouse scale every day "),
        # batch 2 (monotone ids): a re-crawl of 1 and a brand-new pair
        (10, base * 3),                      # exact dup of 1 (old×new)
        (11, "zebra umbrella cascade fortune " * 6),
        (12, "zebra umbrella cascade fortune " * 6 + "extra tail "),
        # 11/12 near-dup (new×new)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_equals_full_recompute(spark):
    from rosette_elasticsearch_plugin_spark.operators import dedup

    d = _corpus(spark)
    b1 = d.where(F.col("doc_id") < 10)
    b2 = d.where(F.col("doc_id") >= 10)
    full = dedup.near_dup_pairs(d, threshold=0.5)
    prior = dedup.near_dup_pairs(b1, threshold=0.5)
    idx = dedup.extend_band_index(None, b1)
    inc = dedup.incremental_near_dup_pairs(d, idx, b2, threshold=0.5)
    assert _pairs(prior) | _pairs(inc) == _pairs(full)
    # the incremental half touches >= 1 new doc in every pair
    for a, b in _pairs(inc):
        assert a >= 10 or b >= 10
    # and it found both the old×new re-crawl and the new×new pair
    assert (1, 10) in _pairs(inc)
    assert (11, 12) in _pairs(inc)


def test_extend_band_index_unions_batches(spark):
    from rosette_elasticsearch_plugin_spark.operators import dedup

    d = _corpus(spark)
    b1 = d.where(F.col("doc_id") < 10)
    b2 = d.where(F.col("doc_id") >= 10)
    full_idx = dedup.band_key_table(d)
    inc_idx = dedup.extend_band_index(
        dedup.extend_band_index(None, b1), b2
    )
    got = {
        (r.doc_id, r.band_key) for r in inc_idx.collect()
    }
    want = {
        (r.doc_id, r.band_key) for r in full_idx.collect()
    }
    assert got == want


def test_retract_equals_full_recompute_on_survivors(spark):
    """Deleting docs maintains the verified pair set exactly: kept
    prior pairs ∪ re-verified dirty-bucket pairs == full recompute over
    survivors, with both dirty kinds exercised (a hot bucket crossing
    back under the cap, and a hot bucket losing its min-id rep)."""
    from rosette_elasticsearch_plugin_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river "
    alt = "zebra umbrella cascade fortune sunrise meadow " * 4
    rows = [
        (1, base * 3),
        (2, base * 3 + "and rests "),
        (3, base * 3 + "at noon "),
        (4, base * 3 + "by the bank "),
        (10, alt),
        (11, alt + "extra tail "),
        (12, alt + "another tail "),
        (20, "completely unrelated text about spark pipelines at scale "),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
    cap = 2  # 1-4 and 10-12 buckets are hot at this cap
    prior_pairs = dedup.near_dup_pairs(d, threshold=0.5, max_bucket=cap)
    idx = dedup.extend_band_index(None, d)
    # removing 1 deletes the min-id rep of the base family's buckets
    # (rep-lost path); removing 11,12 shrinks the alt family's buckets
    # from 3 to 1 member (cap-cross path, no surviving pairs)
    removed = spark.createDataFrame(
        [(1,), (11,), (12,)], ["doc_id"]
    )
    got = dedup.retract_near_dup_pairs(
        d, idx, prior_pairs, removed, threshold=0.5, max_bucket=cap
    )
    survivors = d.join(removed, "doc_id", "left_anti")
    want = dedup.near_dup_pairs(survivors, threshold=0.5, max_bucket=cap)
    assert _pairs(got) == _pairs(want)
    # jaccard values must match too, not just the pair keys
    gv = {(r.doc_id_a, r.doc_id_b): r.jaccard for r in got.collect()}
    wv = {(r.doc_id_a, r.doc_id_b): r.jaccard for r in want.collect()}
    assert gv == wv
    # the re-star path produced pairs absent from the kept prior set:
    # with rep 1 gone, 2 becomes the rep and (2,3)/(2,4) re-star fresh
    kept_only = {
        (a, b) for a, b in _pairs(prior_pairs) if a != 1 and b != 1
        and a not in (11, 12) and b not in (11, 12)
    }
    assert _pairs(got) - kept_only, "dirty-bucket regeneration never ran"


def test_retract_no_dirty_buckets_is_pure_filter(spark):
    """At the default cap nothing is hot, so retraction reduces to
    dropping pairs with a removed endpoint — and must still equal the
    full recompute."""
    from rosette_elasticsearch_plugin_spark.operators import dedup

    d = _corpus(spark).localCheckpoint()
    prior_pairs = dedup.near_dup_pairs(d, threshold=0.5)
    idx = dedup.extend_band_index(None, d)
    removed = spark.createDataFrame([(10,)], ["doc_id"])
    got = dedup.retract_near_dup_pairs(d, idx, prior_pairs, removed,
                                       threshold=0.5)
    want = dedup.near_dup_pairs(
        d.join(removed, "doc_id", "left_anti"), threshold=0.5
    )
    assert _pairs(got) == _pairs(want)


def test_duplicated_spans_maximal_islands(spark, duck):
    """Two docs share one 5-token run: the three overlapping flagged
    3-grams must merge into ONE maximal span with exact token offsets;
    unique text and within-single-doc repetition produce no rows."""
    from rosette_elasticsearch_plugin_spark.operators.dedup import (
        duplicated_spans,
        duplicated_spans_sql,
    )

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"intro words here {shared} unique tail one"),
        (2, f"{shared} completely different continuation two"),
        (3, "nothing in common with anything else at all"),
        # within-doc repetition only — df counts DISTINCT docs
        (4, "solo repeat solo repeat solo repeat"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicated_spans(d).collect()
    }
    # doc 1: shared run at token positions 4-8; doc 2: positions 1-5
    assert got == {(1, 4, 8, 3), (2, 1, 5, 3)}
    # mirror agrees value-for-value
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    sql = duplicated_spans_sql(f"(select * from (values {vals}) "
                               f"t(doc_id, text))")
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want


def test_duplicated_spans_gap_splits_islands(spark):
    """Two shared runs separated by a unique gap > n stay two spans."""
    from rosette_elasticsearch_plugin_spark.operators.dedup import (
        duplicated_spans,
    )

    a = "alpha beta gamma"
    b = "omega psi chi"
    d = spark.createDataFrame(
        [
            (1, f"{a} u1 u2 u3 u4 {b}"),
            (2, f"{a} v1 v2 v3 v4 {b}"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(d).collect()
    }
    assert got == {(1, 1, 3), (1, 8, 10), (2, 1, 3), (2, 8, 10)}


def test_incremental_spans_reflag_old_docs(spark):
    """A new doc flips a gram over the df threshold: the OLD doc
    containing it gains a span it did not have, untouched docs' prior
    spans pass through, and the result equals the full recompute."""
    from rosette_elasticsearch_plugin_spark.operators import dedup

    rows1 = [
        (1, "alpha beta gamma x y z"),          # gains a span in batch 2
        (2, "p q r s t"),                        # never duplicated
        (4, "omega psi chi one"),                # prior-span pair ...
        (5, "omega psi chi two"),                # ... within batch 1
    ]
    rows2 = [(3, "alpha beta gamma w v")]
    b1 = spark.createDataFrame(rows1, ["doc_id", "text"])
    b2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    full = spark.createDataFrame(rows1 + rows2, ["doc_id", "text"])

    prior_index = dedup.gram_index(b1)
    prior_spans = dedup.duplicated_spans(b1)
    assert {r.doc_id for r in prior_spans.collect()} == {4, 5}

    _idx, spans = dedup.incremental_duplicated_spans(
        prior_index, prior_spans, b2
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in spans.collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicated_spans(full).collect()
    }
    assert got == want
    assert (1, 1, 3, 1) in got      # the old doc's NEW span
    assert not any(d == 2 for d, *_ in got)
    # the returned index is the cumulative one
    assert _idx.count() == dedup.gram_index(full).count()


def test_incremental_spans_committed_df_path(spark):
    """The committed (gram, df) state path must produce exactly the
    recount path's output, including the old-doc re-span case, and
    extend_gram_df must equal a from-scratch aggregation."""
    from pyspark.sql import functions as F

    from rosette_elasticsearch_plugin_spark.operators import dedup

    rows1 = [
        (1, "alpha beta gamma x y z"),
        (2, "p q r s t"),
        (4, "omega psi chi one"),
        (5, "omega psi chi two"),
    ]
    rows2 = [(3, "alpha beta gamma w v")]
    b1 = spark.createDataFrame(rows1, ["doc_id", "text"])
    b2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    idx1 = dedup.gram_index(b1)
    sp1 = dedup.duplicated_spans(b1)
    df1 = dedup.extend_gram_df(None, idx1)

    _i_a, spans_a = dedup.incremental_duplicated_spans(idx1, sp1, b2)
    _i_b, spans_b = dedup.incremental_duplicated_spans(
        idx1, sp1, b2, prior_df=df1
    )
    key = lambda df: {  # noqa: E731
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in df.collect()
    }
    assert key(spans_a) == key(spans_b)
    # committed df state after the batch == from-scratch aggregation
    df2 = dedup.extend_gram_df(df1, dedup.gram_index(b2))
    full_df = dedup.extend_gram_df(
        None, dedup.gram_index(spark.createDataFrame(rows1 + rows2,
                                                     ["doc_id", "text"]))
    )
    assert {tuple(r) for r in df2.collect()} == {
        tuple(r) for r in full_df.collect()
    }


def test_corpus_cut_spans_rebuild_semantics(spark, duck):
    """The cut transform keeps exactly the tokens outside flagged
    spans, preserves order, and keeps fully-duplicated docs as empty
    rows; Spark and the DuckDB mirror agree value-for-value."""
    import rosette_elasticsearch_plugin_spark.plans.driver_queries as dq

    rows = [
        (1, "alpha beta gamma keep one two"),   # prefix duplicated
        (2, "alpha beta gamma other words here"),
        (3, "alpha beta gamma"),                # fully duplicated
        (4, "nothing shared at all here now"),  # untouched
    ]

    class _FakeDedup:
        pass

    d = spark.createDataFrame(rows, ["doc_id", "text"])
    # route the query helper at our fixture table instead of sf parquet
    orig = dq._docs
    dq._docs = lambda _s, _sf: d
    try:
        got = {
            (r.doc_id, r.cleaned_text, r.n_kept, r.n_tokens)
            for r in dq.q_corpus_cut_spans(spark, None).collect()
        }
    finally:
        dq._docs = orig
    assert got == {
        (1, "keep one two", 3, 6),
        (2, "other words here", 3, 6),
        (3, "", 0, 3),
        (4, "nothing shared at all here now", 6, 6),
    }
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    duck.execute(
        f"create or replace view documents as "
        f"select * from (values {vals}) t(doc_id, text)"
    )
    want = {tuple(r) for r in duck.execute(
        dq._sql_corpus_cut_spans()
    ).fetchall()}
    duck.execute("drop view documents")
    assert got == want
