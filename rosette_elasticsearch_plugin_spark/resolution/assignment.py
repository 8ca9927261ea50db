"""Clean-clean one-to-one record linkage: mutual-best assignment.

When two deduplicated sources are linked (the classic Fellegi-Sunter
"file A × file B" setting — e.g. the reference plugin enriching two
indices whose documents describe the same real-world entities,
RosetteTextAnalysisPluginIT.java's two-index fixtures), each A-record
should link to AT MOST one B-record and vice versa.  Transitive
clustering (resolution/clustering.py) is wrong for that setting: one
noisy bridge pair merges two whole entities.  The standard scalable
answer is *symmetric best match*: keep a scored cross-source pair
(a, b) iff b is a's highest-scoring partner AND a is b's — a 1-1
matching that needs no iteration and no global solver.

Scale shape: two window functions over the scored candidate-pair
table, partitioned by each side's key — both are single shuffles on
keys the upstream pair join already produced, no self-join, no driver
state.  Greedy-by-weight global matching (Hungarian etc.) does not
distribute; mutual-best is the established large-scale surrogate
(used by Dedupe/Splink-style pipelines) and is exact whenever the
true match graph is 1-1 with margin > score noise.

Ties are broken lexicographically by partner id so the assignment is
deterministic and SQL-mirrorable (scores arrive pre-rounded to 6dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def one_to_one_links(
    scored: DataFrame,
    a_col: str = "a_node",
    b_col: str = "b_node",
    score_col: str = "score",
) -> DataFrame:
    """Mutual-best 1-1 assignment over scored cross-source pairs.

    scored: one row per candidate (A-record, B-record) pair with a
    deterministic (pre-rounded) score.  Returns the subset of rows
    where each side is the other's argmax, ties broken by partner id.
    """
    wa = Window.partitionBy(a_col).orderBy(
        F.desc(score_col), F.asc(b_col)
    )
    wb = Window.partitionBy(b_col).orderBy(
        F.desc(score_col), F.asc(a_col)
    )
    return (
        scored.withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rb", F.row_number().over(wb))
        .where((F.col("__ra") == 1) & (F.col("__rb") == 1))
        .drop("__ra", "__rb")
    )


def one_to_one_sql(
    pairs_from: str,
    a_col: str = "a_node",
    b_col: str = "b_node",
    score_col: str = "score",
) -> str:
    """DuckDB mirror of one_to_one_links over a named relation/CTE."""
    return f"""
select {a_col}, {b_col}, {score_col} from (
  select *,
         row_number() over (partition by {a_col}
                            order by {score_col} desc, {b_col}) as __ra,
         row_number() over (partition by {b_col}
                            order by {score_col} desc, {a_col}) as __rb
  from {pairs_from})
where __ra = 1 and __rb = 1
"""
