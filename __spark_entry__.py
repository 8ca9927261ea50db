"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full entity-resolution
pipeline over the interleaved-span adapter view of sf0.001).
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracle mirrors (see
rosette_elasticsearch_plugin_spark/plans/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline (extraction → blocking → scoring →
    connected components) over interleaved documents built from
    /root/testdata/sf0.001; returns the mention table with cluster ids."""
    from pyspark.sql import functions as F

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import (
        resolve_documents,
    )
    from rosette_elasticsearch_plugin_spark.sources.adapter import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    # the flat driver corpus is lowercase word soup: mention = word token
    assigned, _ = resolve_documents(docs, pattern=r"[a-z]{2,}")
    return assigned.select(
        "doc_id", "mention_id", "surface", "normalized", "cluster"
    ).orderBy("doc_id", "mention_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
