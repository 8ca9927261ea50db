"""Fellegi-Sunter probabilistic record linkage weights.

The classical decision-theoretic model (Fellegi & Sunter 1969, the
foundation of Splink/febrl-style linkers): each candidate pair is
compared on K binary agreement features; for feature k,
    m_k = P(agree_k | pair is a match)
    u_k = P(agree_k | pair is a non-match)
and the pair's log-likelihood-ratio weight is
    W = Σ_k  log2(m_k/u_k)            if agree_k
            log2((1-m_k)/(1-u_k))     otherwise.
Pairs with W above an upper threshold are links, below a lower
threshold non-links, between them clerical-review candidates — the
score that er_label_queue-style review queues rank by.

Here m/u are estimated from labeled candidate pairs (the fixture
corpus carries planted truth; in production the labels come from a
clerical sample or EM).  Estimation is ONE map-side-combinable
aggregate over the scored pairs (Laplace-smoothed so no probability is
ever 0 or 1); the parameter "table" is a single broadcast row, so
scoring adds no shuffle on top of the candidate-pair join.

Features are built strictly from primitives that already have exact
DuckDB mirrors (key equality, shared Double-Metaphone block key, token
Jaccard, Levenshtein similarity), and the per-pair weight sums
log-terms QUANTIZED to integer micro-units, so the whole operator is
hash-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.similarity import (
    levenshtein_sim_col,
    levenshtein_sim_sql,
    token_jaccard_col,
    token_jaccard_sql,
)

FS_JACCARD_TAU = 0.5
FS_LEV_TAU = 0.8
FS_FEATURES = ("f_exact", "f_phon", "f_jac", "f_lev")


def fs_features(
    pairs: DataFrame, keyed: DataFrame, blocks: DataFrame
) -> DataFrame:
    """Per-pair binary agreement vector.

    pairs:  (node_a, node_b) candidate pairs (node_a < node_b)
    keyed:  (node, key) canonical keys
    blocks: (node, block_key) the block index — the 'm:' family is
            reused as the phonetic-agreement feature, so no second
            metaphone pass runs.
    """
    ka = keyed.select(
        F.col("node").alias("node_a"), F.col("key").alias("key_a")
    )
    kb = keyed.select(
        F.col("node").alias("node_b"), F.col("key").alias("key_b")
    )
    mb = blocks.where(F.col("block_key").startswith("m:"))
    phon = (
        mb.select(F.col("node").alias("node_a"), "block_key")
        .join(
            mb.select(F.col("node").alias("node_b"), "block_key"),
            "block_key",
        )
        .select("node_a", "node_b")
        .distinct()
        .withColumn("f_phon", F.lit(True))
    )
    return (
        pairs.join(ka, "node_a")
        .join(kb, "node_b")
        .join(phon, ["node_a", "node_b"], "left")
        .select(
            "node_a",
            "node_b",
            (F.col("key_a") == F.col("key_b")).alias("f_exact"),
            F.coalesce("f_phon", F.lit(False)).alias("f_phon"),
            (
                token_jaccard_col(F.col("key_a"), F.col("key_b"))
                >= FS_JACCARD_TAU
            ).alias("f_jac"),
            (
                levenshtein_sim_col(F.col("key_a"), F.col("key_b"))
                >= FS_LEV_TAU
            ).alias("f_lev"),
        )
    )


def fs_params(features: DataFrame, labeled: DataFrame) -> DataFrame:
    """Single-row m/u estimates over labeled candidate pairs.

    labeled: (node_a, node_b, is_match).  Laplace smoothing (+0.5 / +1)
    keeps every probability strictly inside (0, 1).
    """
    j = features.join(labeled, ["node_a", "node_b"])
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("double")  # noqa: E731
    aggs = [
        F.sum(F.when(F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
        F.sum(F.when(~F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_non"),
    ]
    for f in FS_FEATURES:
        aggs.append(
            (
                (cnt(F.col("is_match") & F.col(f)) + 0.5)
                / (cnt(F.col("is_match")) + 1.0)
            ).alias("m_" + f)
        )
        aggs.append(
            (
                (cnt(~F.col("is_match") & F.col(f)) + 0.5)
                / (cnt(~F.col("is_match")) + 1.0)
            ).alias("u_" + f)
        )
    return j.agg(*aggs)


def _quant_log2(x: Column) -> Column:
    """log2 quantized to integer micro-units — summable exactly."""
    return F.round(F.log2(x) * 1e6).cast("long")


def fs_weight(features: DataFrame, params: DataFrame) -> DataFrame:
    """Per-pair Fellegi-Sunter weight from a broadcast parameter row."""
    out = features.crossJoin(F.broadcast(params))
    total = F.lit(0).cast("long")
    for f in FS_FEATURES:
        m, u = F.col("m_" + f), F.col("u_" + f)
        term = F.when(F.col(f), _quant_log2(m / u)).otherwise(
            _quant_log2((1 - m) / (1 - u))
        )
        total = total + term
    return out.select(
        "node_a",
        "node_b",
        *FS_FEATURES,
        F.round(total / 1e6, 6).alias("fs_weight"),
    )


# ---------------------------------------------------------------- SQL mirror
def fs_features_sql(
    pairs_from: str, names_from: str, blocks_from: str
) -> str:
    """CTE body mirroring fs_features: ``feats`` over cpairs/names/blocks."""
    jac = token_jaccard_sql("ka.key", "kb.key")
    lev = levenshtein_sim_sql("ka.key", "kb.key")
    return f"""
phon as (select distinct ba.node as node_a, bb.node as node_b
         from {blocks_from} ba join {blocks_from} bb using (block_key)
         where ba.block_key like 'm:%'),
feats as (
  select p.node_a, p.node_b,
         (ka.key = kb.key) as f_exact,
         exists (select 1 from phon
                 where phon.node_a = p.node_a
                   and phon.node_b = p.node_b) as f_phon,
         ({jac}) >= {FS_JACCARD_TAU} as f_jac,
         ({lev}) >= {FS_LEV_TAU} as f_lev
  from {pairs_from} p
       join {names_from} ka on ka.node = p.node_a
       join {names_from} kb on kb.node = p.node_b)
"""


def fs_params_sql(labeled_join: str) -> str:
    """CTE ``params`` over ``feats join <labels>`` (single row)."""
    cols = [
        "cast(sum(case when is_match then 1 else 0 end) as bigint)"
        " as n_match",
        "cast(sum(case when not is_match then 1 else 0 end) as bigint)"
        " as n_non",
    ]
    for f in FS_FEATURES:
        cols.append(
            f"(sum(case when is_match and {f} then 1.0 else 0.0 end) + 0.5)"
            f" / (sum(case when is_match then 1.0 else 0.0 end) + 1.0)"
            f" as m_{f}"
        )
        cols.append(
            f"(sum(case when not is_match and {f} then 1.0 else 0.0 end)"
            f" + 0.5)"
            f" / (sum(case when not is_match then 1.0 else 0.0 end) + 1.0)"
            f" as u_{f}"
        )
    return f"params as (select {', '.join(cols)} from {labeled_join})"


def fs_weight_sql() -> str:
    """SELECT body computing fs_weight from ``feats cross join params``."""
    terms = []
    for f in FS_FEATURES:
        terms.append(
            f"case when {f} then cast(round(log2(m_{f} / u_{f}) * 1e6)"
            f" as bigint)"
            f" else cast(round(log2((1 - m_{f}) / (1 - u_{f})) * 1e6)"
            f" as bigint) end"
        )
    total = " + ".join(terms)
    feats = ", ".join(FS_FEATURES)
    return (
        f"select node_a, node_b, {feats},"
        f" round(({total}) / 1e6, 6) as fs_weight"
        f" from feats cross join params"
    )
