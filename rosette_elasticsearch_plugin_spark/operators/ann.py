"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated training-data ops):

* brute-force cosine top-k — the correctness baseline.  Cross join of a
  (small, broadcast) query set against the corpus; exact cosine via
  JVM-side ``zip_with``/``aggregate`` fold — deterministic left-to-right
  summation so the DuckDB oracle (same fold via list_reduce) matches
  bit-for-bit.
* random-hyperplane LSH — the scale path: K deterministic hyperplanes →
  sign-bit bucket key → candidates only within a bucket.  At 10^12 rows
  the bucket join is the only thing that shuffles, and bucket keys are
  computed scan-side (no UDF).

Planes are generated from a seeded RNG and inlined as literals on both
engines, so signatures agree exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def hyperplanes(dim: int = 64, k: int = 8, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(k)
    ]


def dot_col(vec: Column, weights: list[float]) -> Column:
    """Deterministic left-fold dot product of an array<float> column with
    a literal vector (double math, same order as the SQL mirror)."""
    lit = F.array(*[F.lit(float(w)) for w in weights])
    prods = F.zip_with(vec.cast("array<double>"), lit, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(expr: str, weights: list[float]) -> str:
    lit = "[" + ", ".join(f"cast({w} as double)" for w in weights) + "]"
    prods = f"list_transform(list_zip({expr}::double[], {lit}), p -> p[1] * p[2])"
    return f"list_reduce(list_prepend(cast(0.0 as double), {prods}), (acc, x) -> acc + x)"


def pair_dot_col(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def pair_dot_sql(a: str, b: str) -> str:
    prods = f"list_transform(list_zip({a}::double[], {b}::double[]), p -> p[1] * p[2])"
    return f"list_reduce(list_prepend(cast(0.0 as double), {prods}), (acc, x) -> acc + x)"


def cosine_col(a: Column, b: Column) -> Column:
    num = pair_dot_col(a, b)
    den = F.sqrt(pair_dot_col(a, a)) * F.sqrt(pair_dot_col(b, b))
    return F.round(F.when(den == 0, 0.0).otherwise(num / den), 6)


def cosine_sql(a: str, b: str) -> str:
    num = pair_dot_sql(a, b)
    den = f"(sqrt({pair_dot_sql(a, a)}) * sqrt({pair_dot_sql(b, b)}))"
    return f"round(case when {den} = 0 then 0.0 else {num} / {den} end, 6)"


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: sum of 2^i over planes with dot >= 0."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        out = out + F.when(dot_col(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def lsh_bucket_sql(expr: str, planes: list[list[float]]) -> str:
    terms = [
        f"(case when {dot_sql(expr, p)} >= 0 then cast({1 << i} as bigint) else 0 end)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def brute_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_queries: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k.  The query side is small → broadcast it; the
    corpus side streams (at 100 TB the corpus is the fact table, queries
    are the dim)."""
    queries = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if n_queries is not None:
        queries = queries.where(F.col("query_id") < n_queries)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = corpus.join(F.broadcast(queries)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = 3,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine only within hyperplane buckets."""
    planes = planes or hyperplanes()
    keyed = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(b, "bucket").where(F.col("a.vid") != F.col("b.vid"))
    scored = pairs.select(
        F.col("a.vid").alias("query_id"),
        F.col("b.vid").alias("neighbor_id"),
        cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
