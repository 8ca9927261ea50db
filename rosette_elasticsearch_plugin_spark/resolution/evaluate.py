"""R11 — pairwise F1 evaluation per blocking key.

Predicted same-cluster pairs vs labeled pairs (FIXTURES.md §4 shape:
mention_id_a, mention_id_b, block_key, is_match).  The north rule
requires F1 ≥ 0.99 *per blocking key*, so the aggregate is grouped.
Pure joins + conditional sums; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def predicted_pairs(assignments: DataFrame, id_col: str = "mention_id",
                    cluster_col: str = "cluster") -> DataFrame:
    """All same-cluster id pairs (a < b) from a (mention_id, cluster) table.

    Self-join on cluster — at scale this is quadratic per cluster, which
    is exactly what we want to observe in evaluation (oversized clusters
    are a quality failure, not a perf problem to hide)."""
    a = assignments.select(F.col(id_col).alias("mention_id_a"),
                           F.col(cluster_col).alias("cluster"))
    b = assignments.select(F.col(id_col).alias("mention_id_b"),
                           F.col(cluster_col).alias("cluster"))
    return (a.join(b, "cluster")
            .where(F.col("mention_id_a") < F.col("mention_id_b"))
            .select("mention_id_a", "mention_id_b"))


def pairwise_f1(labeled: DataFrame, predicted: DataFrame,
                by_block: bool = True) -> DataFrame:
    """Join labeled pairs with predictions; compute P/R/F1 (per block_key).

    labeled:   (mention_id_a, mention_id_b, block_key, is_match)
    predicted: (mention_id_a, mention_id_b)
    """
    pred = predicted.withColumn("pred", F.lit(True))
    j = labeled.join(pred, ["mention_id_a", "mention_id_b"], "left").select(
        "block_key",
        F.col("is_match"),
        F.coalesce("pred", F.lit(False)).alias("pred"),
    )
    keys = ["block_key"] if by_block else []
    agg = j.groupBy(*keys).agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(2 * prec * rec / (prec + rec))
    return agg.select(
        *keys, "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
