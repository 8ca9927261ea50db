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
