"""Incremental resolution ≡ batch resolution (plans/incremental.py)."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark import corpus
from rosette_elasticsearch_plugin_spark.operators.entities import (
    distinct_mention_names,
)
from rosette_elasticsearch_plugin_spark.plans.er_pipeline import resolve_names
from rosette_elasticsearch_plugin_spark.plans.incremental import (
    incremental_resolve,
)


def _clusters_dict(df):
    return {r["node"]: r["cluster"] for r in df.collect()}


def test_incremental_equals_full_recompute(spark):
    c = corpus.generate(n_docs=160, seed=7)
    docs, _ = corpus.to_spark(spark, c)
    b1 = docs.where(F.col("doc_id") < "doc00080")
    b2 = docs.where(F.col("doc_id") >= "doc00080")

    full = _clusters_dict(resolve_names(distinct_mention_names(docs)))
    prior = resolve_names(distinct_mention_names(b1))
    inc = _clusters_dict(incremental_resolve(prior, distinct_mention_names(b2)))
    assert inc == full


def test_incremental_empty_delta_is_identity(spark):
    c = corpus.generate(n_docs=60, seed=11)
    docs, _ = corpus.to_spark(spark, c)
    names = distinct_mention_names(docs)
    prior = resolve_names(names)
    again = _clusters_dict(incremental_resolve(prior, names))
    assert again == _clusters_dict(prior)


def test_incremental_new_variant_joins_existing_cluster(spark):
    """A brand-new surface variant of an existing entity must land in
    the same component as that entity (min-node labels may rename the
    component — that IS the batch semantic; see stable_relabel for the
    id-stable view)."""
    prior_names = spark.createDataFrame(
        [("dan aykroyd",), ("daniel aykroyd",), ("matt damon",)], "node string"
    )
    prior = resolve_names(prior_names)
    before = _clusters_dict(prior)
    new = spark.createDataFrame([("aykroyd dan",), ("sofia moreau",)], "node string")
    after = _clusters_dict(incremental_resolve(prior, new))
    assert after["aykroyd dan"] == after["dan aykroyd"]  # same component
    assert after["matt damon"] == before["matt damon"]
    assert after["sofia moreau"] == "sofia moreau"  # new singleton


def test_stable_relabel_keeps_prior_ids(spark):
    """Production id stability: a component keeps its prior cluster id
    even when a lexicographically smaller member joins."""
    from rosette_elasticsearch_plugin_spark.plans.incremental import (
        stable_relabel,
    )

    prior_names = spark.createDataFrame(
        [("dan aykroyd",), ("daniel aykroyd",), ("matt damon",)], "node string"
    )
    prior = resolve_names(prior_names)
    before = _clusters_dict(prior)
    new = spark.createDataFrame([("aykroyd dan",), ("sofia moreau",)], "node string")
    raw = incremental_resolve(prior, new)
    stable = _clusters_dict(stable_relabel(raw, prior))
    assert stable["aykroyd dan"] == before["dan aykroyd"]  # id preserved
    assert stable["dan aykroyd"] == before["dan aykroyd"]
    assert stable["matt damon"] == before["matt damon"]
    assert stable["sofia moreau"] == "sofia moreau"
