"""Physical-plan pins for the seventh-wave operators: the shuffle
guarantees the docstrings claim, checked against the executed plan the
way the enrich-stage pin does (test_pipeline_registry.py)."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators import ann, dedup
from rosette_elasticsearch_plugin_spark.operators.asof import funnel_stages
from rosette_elasticsearch_plugin_spark.resolution.blocking import embed_blocks


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cdc_chunks_is_shuffle_free(spark):
    """Chunking is one Arrow pass over the scan — no Exchange."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup.cdc_chunks(docs))
    assert "Exchange" not in plan, f"cdc_chunks must not shuffle:\n{plan}"


def test_pq_encode_is_shuffle_free(spark):
    """Corpus encoding (both the literal folds and the Arrow kernel)
    is scan-side — no Exchange below the codes projection."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = ann.pq_fit(e)
    for enc in (
        ann.pq_codes_col(F.col("embedding"), books),
        ann.pq_encode_udf(books)(F.col("embedding")),
    ):
        plan = _plan(e.select("vec_id", enc.alias("codes")))
        assert "Exchange" not in plan, f"encode must not shuffle:\n{plan}"


def test_embed_blocks_single_exchange(spark):
    """The embed family is one scan-side bucket expression + explode;
    the .distinct() is its only shuffle."""
    kdf = spark.createDataFrame(
        [(f"name{i} surname{i % 7}",) * 2 for i in range(50)],
        "node string, key string",
    )
    plan = _plan(embed_blocks(kdf))
    assert plan.count("Exchange") <= 2  # hash-agg pair for the distinct


def test_funnel_shuffles_only_on_user(spark):
    """funnel_stages: every Exchange in the plan hashes on user_id —
    the window sort's shuffle plus the final aggregate's (AQE's
    post-coalescing ENSURE_REQUIREMENTS re-adds the latter even though
    partitioning logically carries; its input is already partially
    aggregated to ≤ one row per user per partition, so it moves
    user-count rows, not events).  No other key ever shuffles."""
    import re

    ev = spark.createDataFrame(
        [(i, i % 7, "view" if i % 3 == 0 else "click", i * 1000)
         for i in range(100)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    out = funnel_stages(ev)
    out.collect()
    plan = _plan(out)
    exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan)
    assert exchanges and all(k == "user_id" for k in exchanges), plan
    assert len(exchanges) <= 2, plan
    assert "partial" in plan.lower()  # map-side combine before the agg
