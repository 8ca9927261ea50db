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


def adjusted_rand(tc: DataFrame) -> DataFrame:
    """Adjusted Rand Index between predicted clusters and truth labels.

    tc: one row per mention with (entity_label, cluster).  ARI
    chance-corrects pairwise agreement (Hubert & Arabie 1985):
        ARI = (idx - exp) / (max - exp)
    with idx = Σ_ij C(n_ij,2), a = Σ_i C(a_i,2), b = Σ_j C(b_j,2),
    exp = a·b / C(n,2), max = (a+b)/2.  Complements pairwise F1 (which
    ignores true negatives) and B³ (which is not chance-corrected).

    Everything up to the final division is an integer aggregate over
    three contingency groupBys (cells, cluster sizes, label sizes) —
    deterministic across engines, so the oracle hash-matches exactly.
    At scale these are three map-side-combinable aggregations over the
    mention table; no pair enumeration ever happens.
    """
    # n·(n−1)/2 in pure long arithmetic (shift, not float divide) so
    # counts beyond 2^26 can't lose exactness through a double
    comb2 = lambda c: F.shiftright(c.cast("long") * (c - 1), 1)  # noqa: E731
    cells = tc.groupBy("cluster", "entity_label").agg(
        F.count("*").alias("n_ij")
    )
    idx = cells.agg(F.sum(comb2(F.col("n_ij"))).alias("idx"))
    a = (
        tc.groupBy("cluster")
        .agg(F.count("*").alias("n_i"))
        .agg(F.sum(comb2(F.col("n_i"))).alias("a"))
    )
    b = (
        tc.groupBy("entity_label")
        .agg(F.count("*").alias("n_j"))
        .agg(F.sum(comb2(F.col("n_j"))).alias("b"))
    )
    n = tc.agg(comb2(F.count("*")).alias("n2"))
    j = idx.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b)).crossJoin(
        F.broadcast(n)
    )
    exp = F.col("a") * F.col("b") / F.col("n2")
    mx = (F.col("a") + F.col("b")) / F.lit(2.0)
    ari = F.when(
        F.abs(mx - exp) < F.lit(1e-12), F.lit(1.0)
    ).otherwise((F.col("idx") - exp) / (mx - exp))
    return j.select(
        F.col("n2").alias("n_pairs"),
        F.col("idx").alias("sum_comb_cells"),
        F.col("a").alias("sum_comb_pred"),
        F.col("b").alias("sum_comb_truth"),
        F.round(ari, 6).alias("ari"),
    )


def adjusted_rand_sql(tc_from: str) -> str:
    """DuckDB mirror of adjusted_rand over a (entity_label, cluster)
    relation/CTE named ``tc_from``."""
    return f"""
cells as (select cluster, entity_label, count(*) as n_ij
          from {tc_from} group by cluster, entity_label),
idx as (select cast(sum(n_ij * (n_ij - 1) // 2) as bigint) as idx from cells),
pa as (select cast(sum(n_i * (n_i - 1) // 2) as bigint) as a
       from (select count(*) as n_i from {tc_from} group by cluster)),
pb as (select cast(sum(n_j * (n_j - 1) // 2) as bigint) as b
       from (select count(*) as n_j from {tc_from} group by entity_label)),
nn as (select cast(count(*) * (count(*) - 1) // 2 as bigint) as n2
       from {tc_from}),
ari_agg as (
  select n2 as n_pairs, idx as sum_comb_cells, a as sum_comb_pred,
         b as sum_comb_truth,
         case when abs((a + b) / 2.0 - a * b / n2) < 1e-12 then 1.0
              else (idx - a * b / n2) / ((a + b) / 2.0 - a * b / n2)
         end as ari_raw
  from idx, pa, pb, nn)
"""


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


# --- V-measure (homogeneity / completeness) -------------------------------------
# Rosenberg & Hirschberg (EMNLP 2007): the entropy-based counterpart to
# ARI/B³ —
#   h = 1 − H(C|K)/H(C),  c = 1 − H(K|C)/H(K),  V = 2hc/(h+c)
# with C = truth labels, K = predicted clusters.  Unlike pairwise F1 it
# decomposes the error into "clusters mix labels" (h) vs "labels split
# across clusters" (c); unlike ARI it is not chance-corrected but is
# defined for every degenerate shape.
#
# Cross-engine determinism: each entropy TERM n·ln(n/d) is quantized to
# integer MICRO-UNITS right after the ln (the only libm call), so every
# Σ is an exact long in any aggregation order; the shared N·1e6 entropy
# denominators cancel inside h and c, leaving one double division per
# ratio and a final round-6.  ln itself is NOT correctly rounded, so a
# term within an ulp of a .5 micro-unit boundary can differ by ±1
# across libm builds — which is why only the post-division round-6
# ratios leave this function (a ±1 sum flip moves a ratio by ~1/q_hc
# micro-units, far below round-6 resolution), and why
# tests/test_quantizer_boundaries.py audits fixture boundary
# distances.  At scale: three map-side-combinable contingency
# aggregates over the mention table, no pair enumeration.
VM_MICRO = 1_000_000


def _vm_term(n: "Column", d: "Column") -> "Column":
    """round(n · ln(n/d) · 1e6) as long — one quantized entropy term."""
    return F.round(
        n.cast("double")
        * F.log(n.cast("double") / d.cast("double"))
        * F.lit(float(VM_MICRO))
    ).cast("long")


def v_measure(tc: DataFrame) -> DataFrame:
    """One row: exact entropy-term sums + homogeneity/completeness/V.

    tc: one row per mention with (entity_label, cluster)."""
    cells = tc.groupBy("cluster", "entity_label").agg(
        F.count("*").alias("n_ij")
    )
    ksz = tc.groupBy("cluster").agg(F.count("*").alias("n_k"))
    csz = tc.groupBy("entity_label").agg(F.count("*").alias("n_c"))
    n = tc.agg(F.count("*").alias("n"))

    q_hck = (
        cells.join(ksz, "cluster")
        .agg(F.sum(_vm_term(F.col("n_ij"), F.col("n_k"))).alias("q_hck"))
    )
    q_hkc = (
        cells.join(csz, "entity_label")
        .agg(F.sum(_vm_term(F.col("n_ij"), F.col("n_c"))).alias("q_hkc"))
    )
    q_hc = csz.crossJoin(F.broadcast(n)).agg(
        F.sum(_vm_term(F.col("n_c"), F.col("n"))).alias("q_hc")
    )
    q_hk = ksz.crossJoin(F.broadcast(n)).agg(
        F.sum(_vm_term(F.col("n_k"), F.col("n"))).alias("q_hk")
    )
    j = (
        q_hck.crossJoin(F.broadcast(q_hkc))
        .crossJoin(F.broadcast(q_hc))
        .crossJoin(F.broadcast(q_hk))
        .crossJoin(F.broadcast(n))
    )
    # H(C|K)/H(C) = Σq_hck / Σq_hc — the N·1e6 denominators cancel
    h = F.when(F.col("q_hc") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("q_hck").cast("double") / F.col("q_hc").cast("double")
    )
    c = F.when(F.col("q_hk") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("q_hkc").cast("double") / F.col("q_hk").cast("double")
    )
    hc, cc = F.round(h, 6), F.round(c, 6)
    v = F.when(hc + cc == 0.0, F.lit(0.0)).otherwise(
        F.round(F.lit(2.0) * hc * cc / (hc + cc), 6)
    )
    # Output carries only the round-6 ratios, never the raw micro-unit
    # long sums: libm ln is not correctly rounded, so a term landing
    # within an ulp of a .5 micro-unit boundary can flip a sum by ±1
    # between JVM and DuckDB builds.  Division + round-6 shrinks that
    # per-term flip surface to a per-ratio one (a ±1 flip in a ~1e6-unit
    # sum moves the ratio by ~1e-6/q_hc — below round-6 resolution on
    # any non-degenerate fixture; tests/test_quantizer_boundaries.py
    # audits the remaining boundary distances).
    return j.select(
        F.col("n").cast("long").alias("n_mentions"),
        hc.alias("homogeneity"),
        cc.alias("completeness"),
        v.alias("v_measure"),
    )


def v_measure_sql(tc_from: str, micro: int = VM_MICRO) -> str:
    """DuckDB mirror of v_measure over a (entity_label, cluster)
    relation/CTE named ``tc_from`` — ends in CTE ``vm``."""

    def term(n, d):
        return (
            f"cast(round(cast({n} as double) "
            f"* ln(cast({n} as double) / cast({d} as double)) "
            f"* {micro}.0) as bigint)"
        )

    return f"""
vm_cells as (select cluster, entity_label, count(*) as n_ij
             from {tc_from} group by cluster, entity_label),
vm_ksz as (select cluster, count(*) as n_k from {tc_from} group by cluster),
vm_csz as (select entity_label, count(*) as n_c
           from {tc_from} group by entity_label),
vm_n as (select count(*) as n from {tc_from}),
vm_q as (select
  (select sum({term('c.n_ij', 'k.n_k')})
   from vm_cells c join vm_ksz k using (cluster)) as q_hck,
  (select sum({term('c.n_ij', 'l.n_c')})
   from vm_cells c join vm_csz l using (entity_label)) as q_hkc,
  (select sum({term('n_c', 'n')}) from vm_csz, vm_n) as q_hc,
  (select sum({term('n_k', 'n')}) from vm_ksz, vm_n) as q_hk,
  (select n from vm_n) as n),
vm_hc as (select
  cast(n as bigint) as n_mentions, q_hck, q_hkc, q_hc, q_hk,
  round(case when q_hc = 0 then 1.0
        else 1.0 - cast(q_hck as double) / cast(q_hc as double) end, 6)
    as homogeneity,
  round(case when q_hk = 0 then 1.0
        else 1.0 - cast(q_hkc as double) / cast(q_hk as double) end, 6)
    as completeness
  from vm_q),
vm as (select n_mentions, homogeneity, completeness,
  case when homogeneity + completeness = 0.0 then 0.0
       else round(2.0 * homogeneity * completeness
                  / (homogeneity + completeness), 6)
  end as v_measure
from vm_hc)"""
