"""Corpus generator sanity + the per-row span-sequence invariant
(BASELINE.json input_hint): enrichment must preserve (kind, text,
media_ref, order) of every span."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark import corpus
from rosette_elasticsearch_plugin_spark.operators.entities import (
    EntitiesConfig,
    entities_stage,
)


def test_generator_deterministic():
    a = corpus.generate(n_docs=30, seed=42)
    b = corpus.generate(n_docs=30, seed=42)
    assert a.docs == b.docs and a.mentions == b.mentions


def test_planted_offsets_are_correct():
    c = corpus.generate(n_docs=60, seed=42)
    texts = {}
    for doc_id, spans in c.docs:
        for kind, text, _, offset in spans:
            if kind == "text":
                texts[(doc_id, offset)] = text
    for doc_id, mid, start, end, surface, _, _, _, _ in c.mentions:
        matches = [
            t for (d, _), t in texts.items()
            if d == doc_id and t[start:end] == surface
        ]
        assert matches, (doc_id, surface)


def test_span_sequence_invariant_under_enrichment(spark):
    c = corpus.generate(n_docs=40, seed=7)
    docs, _ = corpus.to_spark(spark, c)
    enriched = entities_stage(docs, cfg=EntitiesConfig(include_offsets=True))
    before = {r["doc_id"]: r["j"] for r in
              docs.select("doc_id", F.to_json("spans").alias("j")).collect()}
    after = {r["doc_id"]: r["j"] for r in
             enriched.select("doc_id", F.to_json("spans").alias("j")).collect()}
    assert before == after
    # media spans specifically: kind/media_ref/offset all preserved in order
    media = {r["doc_id"]: r["m"] for r in docs.select(
        "doc_id",
        F.to_json(F.filter("spans", lambda s: s["kind"] != F.lit("text"))).alias("m"),
    ).collect()}
    media_after = {r["doc_id"]: r["m"] for r in enriched.select(
        "doc_id",
        F.to_json(F.filter("spans", lambda s: s["kind"] != F.lit("text"))).alias("m"),
    ).collect()}
    assert media == media_after


def test_parallelize_scan_spreads_small_file(spark):
    """A single small parquet file arrives as one input split; the
    helper must spread it to defaultParallelism without changing a
    single row.  On an already-parallel input it must be a no-op (no
    shuffle inserted into a properly-sized scan)."""
    import os
    import tempfile

    from rosette_elasticsearch_plugin_spark.sources.adapter import (
        parallelize_scan,
    )

    with tempfile.TemporaryDirectory(prefix="pscan_") as root:
        path = os.path.join(root, "docs")
        spark.range(0, 500).selectExpr(
            "cast(id as string) doc_id", "concat('text ', id) text"
        ).coalesce(1).write.parquet(path)
        scan = spark.read.parquet(path)
        assert scan.rdd.getNumPartitions() == 1
        par = parallelize_scan(scan)
        assert (
            par.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )
        assert sorted(r["doc_id"] for r in par.collect()) == sorted(
            r["doc_id"] for r in scan.collect()
        )
        # no-op on an input already at (or above) defaultParallelism:
        # the same plan object must come back — no Exchange added
        wide = scan.repartition(spark.sparkContext.defaultParallelism + 2)
        assert parallelize_scan(wide) is wide
