"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated training-data ops):

* brute-force cosine top-k — the correctness baseline.  Cross join of a
  (small, broadcast) query set against the corpus; exact cosine via
  JVM-side ``zip_with``/``aggregate`` fold — deterministic left-to-right
  summation so the DuckDB oracle (same fold via list_reduce) matches
  bit-for-bit.
* multi-table banded random-hyperplane LSH — the scale path: L
  independent tables of b sign bits each; a pair is a candidate if it
  collides in ANY table, and buckets above a size cap are dropped
  (salted grid join below the cap — the same hot-block machinery as
  resolution/pairs.py).  Two scale properties a single fixed-width
  bucket key lacks:

  - recall is tunable via L without widening any one bucket key
    (P[candidate] = 1-(1-p^b)^L, p = 1-θ/π per plane);
  - the in-bucket self-join is bounded: 2^b buckets per table sized to
    the corpus (2^b ≳ n/1k) PLUS an explicit per-bucket cap, so no
    bucket ever goes quadratic at 10^12 rows — the fixed 8-plane key
    this replaces held 256 buckets total and each bucket grew O(n).

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


# defaults for the driver-scale corpora: 6 tables × 8 bits = 256 buckets
# per table; bits are the knob to keep 2^bits ≳ n/1k as n grows
ANN_TABLES, ANN_BITS = 6, 8
ANN_MAX_BUCKET, ANN_N_SALT, ANN_SALT_THRESHOLD = 500, 8, 64


def banded_hyperplanes(
    dim: int = 64,
    tables: int = ANN_TABLES,
    bits: int = ANN_BITS,
    seed: int = 42,
) -> list[list[list[float]]]:
    """L independent tables of b hyperplanes each (one seeded stream,
    chunked, so table t is stable as L grows)."""
    planes = hyperplanes(dim, tables * bits, seed)
    return [planes[t * bits:(t + 1) * bits] for t in range(tables)]


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


def norm_col(vec: Column) -> Column:
    """sqrt(v·v), same deterministic fold as ``pair_dot_col`` — meant to
    be computed ONCE per vector in a projection BELOW the pair join, so
    pair scoring runs one fold (the numerator) instead of three.  The
    product ``norm(a) * norm(b)`` is floating-point-identical to
    inlining both factors per pair, so oracles that compute the
    denominator per pair still match bit-for-bit."""
    return F.sqrt(pair_dot_col(vec, vec))


def cosine_from_norms_col(num: Column, na: Column, nb: Column) -> Column:
    den = na * nb
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


def band_keys_col(vec: Column, tables: list[list[list[float]]]) -> Column:
    """Array of per-table band keys 't<i>:<bucket>' — scan-side, no UDF."""
    keys = [
        F.concat(F.lit(f"t{i}:"), lsh_bucket_col(vec, tp).cast("string"))
        for i, tp in enumerate(tables)
    ]
    return F.array(*keys)


def band_keys_sql(expr: str, tables: list[list[list[float]]]) -> str:
    keys = [
        f"'t{i}:' || cast({lsh_bucket_sql(expr, tp)} as varchar)"
        for i, tp in enumerate(tables)
    ]
    return "[" + ", ".join(keys) + "]"


def banded_candidates(
    embeddings: DataFrame,
    tables: list[list[list[float]]] | None = None,
    max_bucket: int = ANN_MAX_BUCKET,
    n_salt: int = ANN_N_SALT,
    salt_threshold: int = ANN_SALT_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hot_block_mode: str = "drop",
) -> DataFrame:
    """(node_a, node_b) distinct candidate pairs colliding in ≥1 LSH
    table, via the capped+salted grid join (resolution/pairs.py).
    ``hot_block_mode``: "drop" for ANN search (an over-cap bucket is an
    uninformative region of the space), "star" for embedding DEDUP
    (an over-cap bucket of near-identical vectors is exactly the
    mega-duplicate group — every member pairs with the bucket's min-id
    representative, linear in bucket size).  The salt only bounds the
    physical join; the logical pair set is mirrored by the oracle."""
    from ..resolution.pairs import candidate_pairs

    tables = tables if tables is not None else banded_hyperplanes()
    keyed = embeddings.select(
        F.col(id_col).alias("node"),
        F.explode(band_keys_col(F.col(vec_col), tables)).alias("block_key"),
    )
    # materialize the band keys once: candidate_pairs consumes them from
    # the sizes aggregate, the sizes join, and both self-join sides, and
    # the L×b hyperplane dot folds are the dominant scan-side cost —
    # same reasoning as dedup.lsh_candidate_pairs' signature checkpoint
    keyed = keyed.localCheckpoint(eager=False)
    return candidate_pairs(
        keyed, max_bucket, n_salt, salt_threshold, hot_block_mode
    )


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
    # norms below the join: computed once per query (before broadcast)
    # and once per corpus row, not once per (query, corpus) pair — at
    # |Q| queries that removes 2|Q|/(2+|Q|+1) ≈ 2/3 of the fold work
    queries = queries.withColumn("qn", norm_col(F.col("qv")))
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_col(F.col(vec_col)).alias("cn"),
    )
    scored = corpus.join(F.broadcast(queries)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn(
        "cosine",
        cosine_from_norms_col(
            pair_dot_col(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
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


def lsh_topk(
    embeddings: DataFrame,
    k: int = 3,
    tables: list[list[list[float]]] | None = None,
    max_bucket: int = ANN_MAX_BUCKET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded-LSH ANN: exact cosine only for pairs colliding in ≥1 of
    the L hyperplane tables (bounded buckets; see module docstring)."""
    tables = tables if tables is not None else banded_hyperplanes()
    cands = banded_candidates(
        embeddings, tables, max_bucket, id_col=id_col, vec_col=vec_col
    )
    # materialized before the symmetrizing union: both branches
    # reference the candidate plan (capped+salted grid join), which
    # would otherwise be inlined and executed twice
    cands = cands.localCheckpoint(eager=False)
    # candidates are a<b once; rank needs both directions
    sym = cands.unionByName(
        cands.select(
            F.col("node_b").alias("node_a"), F.col("node_a").alias("node_b")
        )
    )
    # norm computed once per vector below the pair joins (see norm_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
    )
    scored = (
        sym.join(
            v.select(
                F.col("vid").alias("node_a"),
                F.col("v").alias("va"),
                F.col("n").alias("na"),
            ),
            "node_a",
        )
        .join(
            v.select(
                F.col("vid").alias("node_b"),
                F.col("v").alias("vb"),
                F.col("n").alias("nb"),
            ),
            "node_b",
        )
        .select(
            F.col("node_a").alias("query_id"),
            F.col("node_b").alias("neighbor_id"),
            cosine_from_norms_col(
                pair_dot_col(F.col("va"), F.col("vb")),
                F.col("na"),
                F.col("nb"),
            ).alias("cosine"),
        )
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
