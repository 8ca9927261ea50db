"""Fuzzy name search — the blocking stack as a query-time index.

The reference sits inside a SEARCH engine: users enrich at ingest and
then query the enriched fields (``docker/test.sh`` exercises exists /
constant_score over ``ros_language``; entity lookups hit the linked
entityIds).  The batch analogue of "find this possibly-misspelled name"
is a lookup that reuses the ER machinery verbatim:

  query names → blocking keys (exact + Double Metaphone + MinHash) →
  join against the corpus names' keys (the persisted block table of the
  resolution pipeline — at scale this is an index lookup, not a scan) →
  vectorized scoring → threshold → top-k per query.

Same keys, same scorer, same threshold semantics as resolution, so a
query matches exactly the names it would have clustered with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..resolution.blocking import all_blocks
from ..resolution.scoring import score_expr
from .er_pipeline import ERConfig, er_key_col


def search_names(
    queries: DataFrame,
    names: DataFrame,
    cfg: ERConfig = ERConfig(),
    k: int = 3,
    threshold: float | None = None,
) -> DataFrame:
    """(query, name, score, rank) — top-k corpus names per query name
    with score ≥ threshold (default: the resolution match threshold).

    queries: one string column of query surfaces (normalized or raw —
    they are keyed exactly like corpus names).
    names: one string column of corpus names (the resolution node set).
    Corpus-side hot blocks above cfg.max_block_size are dropped, same
    as resolution: an over-cap block key is too unselective to be a
    useful search posting list."""
    tau = cfg.scoring.threshold if threshold is None else threshold
    q = queries.select(F.col(queries.columns[0]).alias("node")).distinct()
    n = names.select(F.col(names.columns[0]).alias("node")).distinct()
    qb = all_blocks(
        q.select("node", er_key_col(F.col("node")).alias("key")), cfg.blocking
    ).withColumnRenamed("node", "query")
    nb = all_blocks(
        n.select("node", er_key_col(F.col("node")).alias("key")), cfg.blocking
    )
    sizes = nb.groupBy("block_key").agg(F.count("*").alias("__n"))
    nb = nb.join(
        sizes.where(F.col("__n") <= cfg.max_block_size), "block_key"
    ).drop("__n")
    cand = (
        qb.join(nb.withColumnRenamed("node", "name"), "block_key")
        .select("query", "name")
        .distinct()
    )
    # precomputed-key join-back, mirroring resolve_names: the translit
    # chain runs once per name/query, not per candidate pair
    qk = q.select(
        F.col("node").alias("query"), er_key_col(F.col("node")).alias("__qkey")
    )
    nk = n.select(
        F.col("node").alias("name"), er_key_col(F.col("node")).alias("__nkey")
    )
    scored = (
        cand.join(qk, "query")
        .join(nk, "name")
        .withColumn(
            "score", score_expr(F.col("__qkey"), F.col("__nkey"), cfg.scoring)
        )
        .where(F.col("score") >= tau)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("name"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query", "name", "score", F.col("rank").cast("long").alias("rank")
        )
    )
