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

import math
import random

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
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
    # NULL guard: DuckDB's fold over a NULL list yields 0 (→ 0.0 via
    # the zero-denominator branch) while Spark's aggregate yields NULL;
    # NULL vector in → NULL similarity out on both engines.  (NaN
    # components stay engine-native — Spark NaN, DuckDB NULL — which
    # the oracle canon already treats as equal.)
    return (
        f"round(case when {a} is null or {b} is null then null "
        f"when {den} = 0 then 0.0 else {num} / {den} end, 6)"
    )


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


def band_keys_udf(tables: list[list[list[float]]]):
    """Arrow matmul band keys — the production kernel for the same
    reason as ``ivf_cell_udf``: the literal path evaluates T·b
    per-element Catalyst lambda folds per vector (48 dot folds at the
    defaults), the kernel one numpy matmul per batch.  Sign agreement
    with the literal fold is exact for any dot product farther than
    float-summation noise (~1e-15 relative) from zero — pinned equal
    on both sf corpora by test; oracle queries keep the literal path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    bits = len(tables[0])
    if any(len(tp) != bits for tp in tables):
        # the flat reshape below assumes uniform tables; fail at build
        # time instead of a numpy ValueError at executor runtime
        raise ValueError(
            "band_keys_udf requires every table to have the same plane "
            "count; use band_keys_col for ragged tables"
        )
    planes = np.array(
        [p for tp in tables for p in tp], dtype=np.float64
    )  # (T·b) × dim
    n_tables = len(tables)
    weights = np.array([1 << i for i in range(bits)], dtype=np.int64)

    dim = planes.shape[1]

    @pandas_udf(ArrayType(StringType()))
    def keys(v: pd.Series) -> pd.Series:
        # null-propagate like the literal band_keys_col: NULL or
        # wrong-dimension vectors key to NULL instead of crashing the
        # batch; an empty Arrow batch returns empty
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = v.to_numpy()
        good = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = np.empty(len(vals), dtype=object)
        if good.any():
            mat = np.stack(vals[good]).astype(np.float64)
            signs = (mat @ planes.T) >= 0.0  # batch × (T·b)
            bucket = signs.reshape(len(mat), n_tables, bits) @ weights
            lists = np.empty(len(bucket), dtype=object)
            lists[:] = [
                [f"t{t}:{row[t]}" for t in range(n_tables)]
                for row in bucket
            ]
            out[good] = lists
        return pd.Series(out)

    # plan barrier, NOT actual nondeterminism (pure function of the
    # vector): without it Catalyst pushes the downstream join's
    # implicit isnotnull(key) filter through the projection and the
    # Arrow kernel evaluates TWICE per row (observed as two
    # ArrowEvalPython nodes in the physical plan)
    return keys.asNondeterministic()


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
    key_method: str = "literal",
) -> DataFrame:
    """(node_a, node_b) distinct candidate pairs colliding in ≥1 LSH
    table, via the capped+salted grid join (resolution/pairs.py).
    ``hot_block_mode``: "drop" for ANN search (an over-cap bucket is an
    uninformative region of the space), "star" for embedding DEDUP
    (an over-cap bucket of near-identical vectors is exactly the
    mega-duplicate group — every member pairs with the bucket's min-id
    representative, linear in bucket size).  The salt only bounds the
    physical join; the logical pair set is mirrored by the oracle.
    ``key_method``: "literal" (exact SQL mirror) or "udf" (the Arrow
    matmul kernel, see band_keys_udf — the production scan path)."""
    from ..resolution.pairs import candidate_pairs

    tables = tables if tables is not None else banded_hyperplanes()
    if key_method == "udf":
        keys = band_keys_udf(tables)(F.col(vec_col))
    else:
        keys = band_keys_col(F.col(vec_col), tables)
    keyed = embeddings.select(
        F.col(id_col).alias("node"),
        F.explode(keys).alias("block_key"),
    )
    # materialize the band keys once: candidate_pairs consumes them from
    # the sizes aggregate, the sizes join, and both self-join sides, and
    # the L×b hyperplane dot folds are the dominant scan-side cost —
    # same reasoning as dedup.lsh_candidate_pairs' signature checkpoint
    keyed = keyed.localCheckpoint(eager=False)
    return candidate_pairs(
        keyed, max_bucket, n_salt, salt_threshold, hot_block_mode
    )


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    """Shared output contract of every top-k path: rank per query by
    (cosine desc, neighbor_id asc), keep k, cast rank to long.  One
    place so brute/LSH/IVF and their oracles can never desynchronize."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
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
    return _topk_window(scored, k)


# --- IVF (inverted-file) ANN ---------------------------------------------------
# The second scale path beside banded LSH.  A coarse quantizer of nlist
# centroids partitions the corpus into cells (each vector belongs to its
# nearest centroid); a query probes only its nprobe nearest cells, so
# scored candidates shrink from n to ~n·nprobe/nlist.  Centroids come
# from a deterministic hash-ranked sample of the corpus itself (the
# standard sampling bootstrap for an IVF quantizer — k-means would
# refine them but adds nothing SQL-mirrorable), so the DuckDB oracle can
# re-derive the identical quantizer from the same table.
IVF_NLIST, IVF_NPROBE = 16, 4


def ivf_fit(
    embeddings: DataFrame,
    nlist: int = IVF_NLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float], float]]:
    """Fit the coarse quantizer: the nlist corpus vectors ranked first by
    h56(vec_id) (a seeded sample with full determinism; ties by id).

    This is the one driver action in the ANN family — bounded by nlist
    (it fits the MODEL, the same class as the convergence/partition-
    sizing aggregates; the sort is a distributed TakeOrdered, never a
    full collect).  Returns (cid, centroid, norm) with the norm computed
    by the same left fold as ``norm_col`` so inlined literals stay
    bit-identical to a SQL mirror that folds over the stored doubles.
    """
    from ..functions.hashing import h56_col

    rows = (
        embeddings.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
            h56_col(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(nlist)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_fit: empty embeddings table — no quantizer")
    model = []
    for r in rows:
        cv = [float(x) for x in r["cv"]]
        acc = 0.0
        for x in cv:  # same deterministic left fold as norm_col
            acc = acc + x * x
        model.append((int(r["cid"]), cv, math.sqrt(acc)))
    return model


def _ivf_centroid_cos(vec: Column, vnorm: Column, cv: list[float], cn: float) -> Column:
    """round-6 cosine(vec, literal centroid) — numerator fold per pair,
    norms as literals/hoisted column (bit-identical to the per-pair SQL
    formula: IEEE multiply is commutative, the folds share order)."""
    num = dot_col(vec, cv)
    den = F.lit(cn) * vnorm
    return F.round(F.when(den == 0, 0.0).otherwise(num / den), 6)


def ivf_cell_col(
    vec: Column, vnorm: Column, model: list[tuple[int, list[float], float]]
) -> Column:
    """Scan-side cell assignment: argmax cosine over the literal
    centroids (ties → smallest cid), zero shuffle — the IVF analogue of
    ``lsh_bucket_col``.  Constant-size expression tree via array_max
    over (cos, -cid) structs (the repo's 64KB-safe argmax shape)."""
    entries = [
        F.struct(
            _ivf_centroid_cos(vec, vnorm, cv, cn).alias("cos"),
            F.lit(-cid).cast("long").alias("negcid"),
        )
        for cid, cv, cn in model
    ]
    return (-F.array_max(F.array(*entries))["negcid"]).cast("long")


def ivf_probe_cells_col(
    vec: Column,
    vnorm: Column,
    model: list[tuple[int, list[float], float]],
    nprobe: int = IVF_NPROBE,
) -> Column:
    """The query's nprobe nearest cells: sort (−cos, cid) structs asc —
    identical ordering to the mirror's (cos desc, cid asc) window —
    and slice.  Includes the query's own cell (its nearest centroid
    ranks first), so planted near-duplicates are always reachable."""
    entries = [
        F.struct(
            (-_ivf_centroid_cos(vec, vnorm, cv, cn)).alias("negcos"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, cv, cn in model
    ]
    ordered = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["cid"])


def ivf_cell_udf(model: list[tuple[int, list[float], float]]):
    """Arrow-batched cell assignment for LARGE quantizers: one numpy
    matmul (batch×dim @ dim×nlist) per batch instead of nlist inlined
    literal fold expressions.

    The literal path (``ivf_cell_col``) is exactly SQL-mirrorable but
    its expression tree grows O(nlist·dim) — fine at nlist ≤ ~64,
    unusable at the nlist ≈ √n a 10^9-vector corpus needs (measured:
    at nlist=64 plan/codegen overhead already costs seconds per
    action).  This is the genuine can't-express-it-in-builtins case, so
    it is the one Pandas UDF in the ANN family.  Quantization matches
    the literal path's F.round semantics (HALF_UP at 6 decimals,
    emulated — np.round is half-to-even so a .5-boundary cosine would
    round the other way), and ties break to the smallest cid on both
    paths (centroid columns are pre-sorted by cid; np.argmax takes the
    first max).  Exact agreement is pinned by test on both sf corpora;
    a cosine within float-summation noise of a rounding boundary could
    still differ, which is exactly why ORACLE queries keep the literal
    path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    ordered = sorted(model, key=lambda m: m[0])
    C = np.array([cv for _, cv, _ in ordered], dtype=np.float64)
    cn = np.array([n for _, _, n in ordered], dtype=np.float64)
    cids = np.array([cid for cid, _, _ in ordered], dtype=np.int64)

    dim = C.shape[1] if len(C) else 0

    @pandas_udf(LongType())
    def cell(v: pd.Series) -> pd.Series:
        # null-propagate like the literal ivf_cell_col: NULL or
        # wrong-dimension vectors assign to NULL cell instead of
        # crashing the batch; an empty Arrow batch returns empty
        if len(v) == 0:
            return pd.Series([], dtype="Int64")
        vals = v.to_numpy()
        good = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = pd.array([None] * len(vals), dtype="Int64")
        if good.any():
            mat = np.stack(vals[good]).astype(np.float64)
            vn = np.sqrt((mat * mat).sum(axis=1))
            den = np.outer(vn, cn)
            num = mat @ C.T
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den == 0.0, 0.0, num / den)
            # HALF_UP at 6 decimals (away from zero), matching F.round
            quant = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos)
            best = np.argmax(quant, axis=1)
            out[good] = cids[best]
        return pd.Series(out, dtype="Int64")

    # plan barrier against double evaluation — see band_keys_udf
    return cell.asNondeterministic()


def ivf_probe_cells_udf(
    model: list[tuple[int, list[float], float]], nprobe: int = IVF_NPROBE
):
    """Arrow-batched top-nprobe cell probing — the query-side companion
    of ``ivf_cell_udf`` for LARGE quantizers, where the literal fold's
    O(nlist·dim) expression tree can't run.  Ordering matches
    ``ivf_probe_cells_col`` exactly: cosine quantized HALF_UP at 6
    decimals, descending, ties to the smallest cid (model pre-sorted by
    cid + stable argsort).  NULL / wrong-dimension vectors probe NULL."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    ordered = sorted(model, key=lambda m: m[0])
    C = np.array([cv for _, cv, _ in ordered], dtype=np.float64)
    cn = np.array([n for _, _, n in ordered], dtype=np.float64)
    cids = np.array([cid for cid, _, _ in ordered], dtype=np.int64)
    dim = C.shape[1] if len(C) else 0
    n_take = min(nprobe, len(ordered))

    @pandas_udf(ArrayType(LongType()))
    def probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = v.to_numpy()
        good = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = np.empty(len(vals), dtype=object)
        if good.any():
            mat = np.stack(vals[good]).astype(np.float64)
            vn = np.sqrt((mat * mat).sum(axis=1))
            den = np.outer(vn, cn)
            num = mat @ C.T
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den == 0.0, 0.0, num / den)
            # HALF_UP at 6 decimals (away from zero), matching F.round
            quant = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos)
            order = np.argsort(-quant, axis=1, kind="stable")[:, :n_take]
            picked = cids[order]
            lists = np.empty(len(picked), dtype=object)
            lists[:] = [[int(c) for c in row] for row in picked]
            out[good] = lists
        return pd.Series(out)

    # plan barrier against double evaluation — see band_keys_udf
    return probes.asNondeterministic()


def ivf_assign(
    embeddings: DataFrame,
    model: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "literal",
) -> DataFrame:
    """(vec_id, cell) — the inverted file.  Narrow scan-side map (no
    shuffle either way); at 100 TB this is the table you
    bucket-by(cell) and persist.  ``method``: "literal" inlines the
    centroids as fold expressions (exact SQL mirror, small nlist);
    "udf" runs the Arrow matmul kernel (large nlist — see
    ivf_cell_udf)."""
    v = F.col(vec_col)
    if method == "udf":
        cell = ivf_cell_udf(model)(v)
    else:
        cell = ivf_cell_col(v, norm_col(v), model)
    return embeddings.select(
        F.col(id_col).alias("vec_id"), cell.alias("cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 3,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    n_queries: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: list[tuple[int, list[float], float]] | None = None,
    method: str = "literal",
) -> DataFrame:
    """IVF ANN top-k: exact cosine only inside the query's nprobe
    probed cells.  Cells partition the corpus (each vector appears in
    exactly one), so no pair dedup is needed.  The probe side is tiny
    (n_queries × nprobe rows) → broadcast; the corpus streams, one
    shuffle on the cell key; cell skew is AQE's skew-join case.

    ``method``: "literal" inlines the centroids as fold expressions
    (exact SQL mirror — oracle queries use this); "udf" runs the Arrow
    matmul kernels for cell assignment AND probing — the only shape
    that runs at the nlist ≈ √n a large corpus needs (the literal
    expression tree grows O(nlist·dim))."""
    if model is None:
        model = ivf_fit(embeddings, nlist, id_col, vec_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
    )
    if method == "udf":
        cell_of = lambda vec, vn: ivf_cell_udf(model)(vec)  # noqa: E731
        probes_of = lambda vec, vn: ivf_probe_cells_udf(  # noqa: E731
            model, nprobe
        )(vec)
    else:
        cell_of = lambda vec, vn: ivf_cell_col(vec, vn, model)  # noqa: E731
        probes_of = lambda vec, vn: ivf_probe_cells_col(  # noqa: E731
            vec, vn, model, nprobe
        )
    corpus = v.select(
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("n").alias("cn"),
        cell_of(F.col("v"), F.col("n")).alias("cell"),
    )
    queries = v
    if n_queries is not None:
        queries = queries.where(F.col("vid") < n_queries)
    probes = queries.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
        F.explode(probes_of(F.col("v"), F.col("n"))).alias("cell"),
    )
    # the broadcast hint holds only when the query set is bounded; with
    # n_queries=None the probe side is the whole corpus × nprobe, so
    # leave the strategy to AQE (same rule as assign_cluster_ids)
    if n_queries is not None:
        probes = F.broadcast(probes)
    scored = corpus.join(probes, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn(
        "cosine",
        cosine_from_norms_col(
            pair_dot_col(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    return _topk_window(scored, k)


def lsh_topk(
    embeddings: DataFrame,
    k: int = 3,
    tables: list[list[list[float]]] | None = None,
    max_bucket: int = ANN_MAX_BUCKET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    key_method: str = "literal",
) -> DataFrame:
    """Banded-LSH ANN: exact cosine only for pairs colliding in ≥1 of
    the L hyperplane tables (bounded buckets; see module docstring)."""
    tables = tables if tables is not None else banded_hyperplanes()
    cands = banded_candidates(
        embeddings, tables, max_bucket, id_col=id_col, vec_col=vec_col,
        key_method=key_method,
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
    return _topk_window(scored, k)


# --- single-table multi-probe LSH -------------------------------------------
# Multi-probe LSH (Lv/Josephson/Wang/Charikar/Li, VLDB 2007): instead
# of L independent tables, ONE table of b sign bits is probed at the
# query's own bucket PLUS every radius-1 bucket (each single bit
# flipped) — the b+1 buckets a near-neighbor whose one marginal
# hyperplane dot sits near zero most likely landed in.  Recall
# comparable to several banded tables at 1/L the index size and ONE
# scan-side bucket expression per vector; the price is b+1 probe rows
# per query (explode, bounded) instead of L index entries per vector.
# A (query, neighbor) pair joins AT MOST ONCE — the neighbor has one
# bucket and the probe list's values are distinct — so no pair dedup
# is needed before scoring.
MP_BITS = 8


def multiprobe_topk(
    embeddings: DataFrame,
    k: int = 3,
    planes: list[list[float]] | None = None,
    max_bucket: int = ANN_MAX_BUCKET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: exact cosine only for (query, neighbor)
    pairs whose buckets differ in at most one of the b sign bits.
    Hot data buckets above ``max_bucket`` are dropped (same bound as
    the banded path, so no bucket goes quadratic at corpus scale)."""
    planes = planes if planes is not None else hyperplanes(64, MP_BITS)
    b = len(planes)
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    ).localCheckpoint(eager=False)
    keep = (
        v.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") <= max_bucket)
        .select("bucket")
    )
    data = v.join(keep, "bucket").select(
        F.col("bucket").alias("pbucket"),
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    probe_arr = F.array(
        F.col("bucket"),
        *[
            F.expr(f"bucket ^ {1 << i}").cast("long")
            for i in range(b)
        ],
    )
    probes = v.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
        F.explode(probe_arr).alias("pbucket"),
    )
    scored = (
        probes.join(data, "pbucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms_col(
                pair_dot_col(F.col("qv"), F.col("cv")),
                F.col("qn"),
                F.col("cn"),
            ).alias("cosine"),
        )
    )
    return _topk_window(scored, k)


# --- Lloyd k-means over the embeddings table ---------------------------------
# The clustering counterpart of the IVF quantizer: ivf_fit SAMPLES k
# corpus vectors as fixed cells; k-means ITERATES — argmax-cosine
# assignment, then element-wise mean centroid updates — which is the
# standard way both a better quantizer (k-means-IVF) and a topic/embed
# clustering are built.  Fully distributed: each iteration is one
# broadcast cross join (n×k cosine, k is small) plus one map-side-
# combinable groupBy(cid, dim) for the update; centroids live in a
# k-row DataFrame, never on the driver.
#
# Exact cross-engine mirror: assignment uses the shared round-6 cosine
# (ties -> smallest cid); centroid means are computed over embedding
# components QUANTIZED to integer micro-units (exact long sums in any
# aggregation order), then re-rounded to 6dp — so a 3-iteration run is
# value-identical between Spark and DuckDB and the whole iterative
# algorithm is hash-checkable (SQL mirror unrolls the iterations as
# CTE rounds).

KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_init(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cv) seed centroids: the k corpus vectors ranked first by
    h56(vec_id) — the same deterministic hash sample as ivf_fit, kept
    as a DataFrame (no driver action)."""
    from ..functions.hashing import h56_col

    return (
        embeddings.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
            h56_col(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h", "cid")
        .limit(k)
        .drop("__h")
    )


def _kmeans_assign_once(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, cid): round-6 cosine argmax, ties to the smallest cid."""
    from pyspark.sql import Window

    scored = v.crossJoin(F.broadcast(cent)).select(
        "vid", "cid", cosine_col(F.col("v"), F.col("cv")).alias("__cos")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("__cos"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("vid", "cid")
    )


def _kmeans_update(v: DataFrame, asg: DataFrame, cent: DataFrame) -> DataFrame:
    """Quantized element-wise mean per cell; empty cells keep their
    previous centroid (the standard Lloyd convention)."""
    dims = (
        asg.join(v, "vid")
        .select("cid", F.posexplode("v").alias("pos", "val"))
        .select(
            "cid",
            "pos",
            F.round(F.col("val") * 1e6).cast("long").alias("q"),
        )
    )
    sums = dims.groupBy("cid", "pos").agg(
        F.sum("q").alias("s"), F.count("*").alias("n")
    )
    new = sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", F.round(F.col("s") / F.col("n") / 1e6, 6).alias("val")))),
            lambda x: x["val"],
        ).alias("cv")
    )
    kept = cent.join(new.select("cid"), "cid", "left_anti")
    return new.unionByName(kept)


def kmeans_assignments(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) after ``iters`` Lloyd rounds."""
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    cent = kmeans_init(embeddings, k, id_col, vec_col)
    asg = None
    for _ in range(iters):
        # sever the growing loop lineage each round
        cent = cent.localCheckpoint(eager=True)
        asg = _kmeans_assign_once(v, cent)
        cent = _kmeans_update(v, asg, cent)
    return asg.select(
        F.col("vid").alias(id_col), F.col("cid").alias("cluster")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    tau: float = 0.34,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): k-means
    partitions the embedding space, then near-duplicate pairs are
    sought ONLY within each cell — the published recipe that turns
    embedding dedup from an O(n²) pair problem into k independent
    within-cell problems (cell size n/k stays constant when k grows
    with the corpus, so total pair work is linear).

    Returns one row per vector: (vec_id, cell, sem_rep, is_kept) —
    ``sem_rep`` = min vec_id of the vector's within-cell near-dup
    component (itself when it has no supra-τ neighbor in its cell),
    ``is_kept`` = this vector is the component representative.  A
    training pipeline keeps the ``is_kept`` rows.

    Exactness: cell assignment is the exactly-mirrored Lloyd loop
    (``kmeans_assignments``), the pair filter uses the shared round-6
    cosine, and the component labels come from ``connected_components``
    — so the whole chain hash-matches the unrolled-CTE DuckDB mirror
    (``semantic_dedup_sql``).

    Scale shape: one broadcast-kmeans pass, one self-join on the cell
    key (AQE-salted if a cell runs hot; cells are capped by
    construction when k ∝ n), CC over the sparse near-dup edges only.
    Recall vs corpus-wide pairing is the documented SemDeDup trade:
    cross-cell near-dups are missed by design — audit with
    ``ann_recall``-style comparisons before raising k.
    """
    from ..resolution.clustering import connected_components

    asg = kmeans_assignments(embeddings, k, iters, id_col, vec_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cells = (
        asg.select(
            F.col(id_col).alias("vid"), F.col("cluster").alias("cell")
        )
        .join(v, "vid")
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("vid").alias("vid_a"), "cell", F.col("v").alias("va")
    )
    b = cells.select(
        F.col("vid").alias("vid_b"), "cell", F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("vid_a") < F.col("vid_b"))
        .where(cosine_col(F.col("va"), F.col("vb")) >= F.lit(tau))
        .select("vid_a", "vid_b")
    )
    comps = connected_components(
        pairs, nodes=v.select("vid"), src="vid_a", dst="vid_b"
    )
    return (
        comps.select(
            F.col("node").alias("vid"), F.col("cluster").alias("sem_rep")
        )
        .join(cells.select("vid", "cell"), "vid")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            "sem_rep",
            (F.col("vid") == F.col("sem_rep")).alias("is_kept"),
        )
    )


def semantic_dedup_sql(
    table: str = "embeddings",
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    tau: float = 0.34,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of ``semantic_dedup``: the unrolled Lloyd CTEs,
    a within-cell pair filter on the shared round-6 cosine, and a
    recursive reach CTE for the component minimum."""
    cos = cosine_sql("va.v", "vb.v")
    return f"""
with recursive
{kmeans_ctes(table, k, iters, id_col, vec_col)},
cells as materialized (select vid, cid as cell from a{iters}),
cpairs as materialized (
  select ca.vid as vid_a, cb.vid as vid_b
  from cells ca join cells cb on ca.cell = cb.cell and ca.vid < cb.vid
  join v va on va.vid = ca.vid
  join v vb on vb.vid = cb.vid
  where {cos} >= {tau}),
sedges as materialized (
  select vid_a as u, vid_b as w from cpairs
  union all select vid_b as u, vid_a as w from cpairs),
sreach(u, w) as (select u, w from sedges
                 union
                 select r.u, e.w from sreach r join sedges e on r.w = e.u),
slabels as (
  select v.vid, least(v.vid, coalesce(min(r.w), v.vid)) as sem_rep
  from v left join sreach r on r.u = v.vid
  group by v.vid)
select l.vid as {id_col}, c.cell as cell, l.sem_rep as sem_rep,
       l.vid = l.sem_rep as is_kept
from slabels l join cells c on c.vid = l.vid
"""


def kmeans_ctes(
    table: str = "embeddings",
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The Lloyd-iteration CTE body (``v``, ``c0``, ``a1``…``a{iters}``)
    WITHOUT the leading ``with`` or a final select, so callers can
    compose further CTEs over the final assignment ``a{iters}`` and the
    vector table ``v`` — ``kmeans_sql`` and the SemDeDup mirror both
    build on it."""
    from ..functions.hashing import h56_sql

    h = h56_sql(f"cast({id_col} as varchar)")
    cos = cosine_sql("v.v", "c.cv")
    parts = [
        f"v as (select {id_col} as vid, {vec_col}::double[] as v"
        f" from {table})",
        f"c0 as (select {id_col} as cid, {vec_col}::double[] as cv"
        f" from {table} order by {h}, {id_col} limit {k})",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        parts.append(
            f"""a{t} as (select vid, cid from (
      select v.vid, c.cid,
             row_number() over (partition by v.vid
                  order by {cos} desc, c.cid) as rn
      from v cross join {prev} c) where rn = 1)"""
        )
        parts.append(
            # parallel unnest zips the value and position lists row-wise
            # (DuckDB's generate_series can't lateral-join on a column)
            f"""s{t} as (
      select cid, pos, sum(cast(round(val * 1e6) as bigint)) as s,
             count(*) as n
      from (select a.cid, unnest(v.v) as val,
                   unnest(range(1, len(v.v) + 1)) as pos
            from a{t} a join v on v.vid = a.vid)
      group by cid, pos)"""
        )
        parts.append(
            f"""c{t} as (select cid, list(round(s / n / 1e6, 6) order by pos) as cv
      from s{t} group by cid
      union all
      select cid, cv from {prev}
      where cid not in (select cid from s{t}))"""
        )
    return ",\n".join(parts)


def kmeans_sql(
    table: str = "embeddings",
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror: the Lloyd iterations unrolled as CTE rounds."""
    return (
        f"with {kmeans_ctes(table, k, iters, id_col, vec_col)}\n"
        f"select vid as {id_col}, cid as cluster from a{iters}"
    )


# --- product quantization (ADC shortlist + exact re-rank) ----------------------
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011): split each vector into PQ_M contiguous
# subvectors, quantize every subvector to one of PQ_KSUB codebook
# entries, and store only the m code bytes.  At 64-dim float32 the
# encoded corpus is 16 codes × 6 bits ≈ 12 bytes against 256 bytes of
# raw floats — a 21× compression that is what lets a 10^9-vector index
# live in cluster memory.  Queries stay EXACT on their own side
# (asymmetric distance computation): per query one m×ksub lookup table
# of subspace distances, each corpus vector scored by m table lookups
# + adds instead of a dim-wide float scan.  The ADC ranking is a
# SHORTLIST (quantization error makes its top-k lossy); the operator
# re-ranks the top PQ_SHORTLIST candidates with exact distances, the
# standard IndexPQ → refine topology.
#
# The codebook is the same deterministic sampled-model protocol as
# ivf_fit (h56-ranked corpus rows, NOT k-means — exactly
# SQL-re-derivable, so the DuckDB oracle can rebuild byte-identical
# codes from the table alone); measured on the sf0.01 corpus the
# sampled book at m=16/ksub=64 already reaches recall@3 ≈ 0.97 after
# the exact re-rank, and the planted-duplicate pins in
# tests/test_dedup_ann.py hold by construction (duplicates share all m
# codes, so ADC distance ≈ 0).

PQ_M, PQ_KSUB, PQ_SHORTLIST = 16, 64, 50


def pair_l2sq_col(a: Column, b: Column) -> Column:
    """Deterministic left-fold squared L2 distance between two array
    columns (double math, same order as ``pair_l2sq_sql``)."""
    diffs = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"),
        lambda x, y: (x - y) * (x - y),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2sq_col(vec: Column, weights: list[float]) -> Column:
    """Squared L2 against a literal vector — the codebook-entry case."""
    lit = F.array(*[F.lit(float(w)) for w in weights])
    return pair_l2sq_col(vec, lit)


def pair_l2sq_sql(a: str, b: str) -> str:
    diffs = (
        f"list_transform(list_zip({a}::double[], {b}::double[]), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2]))"
    )
    return (
        f"list_reduce(list_prepend(cast(0.0 as double), {diffs}), "
        f"(acc, x) -> acc + x)"
    )


def pq_fit(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Fit the PQ codebook: the ksub corpus vectors ranked first by
    h56(vec_id) (ties by id — the ivf_fit sampling protocol), each
    sliced into m contiguous subvectors; entry j of subspace s is
    sample j's subvector s.  One bounded driver action (ksub rows, the
    model-fit class); returns books[s] = [(j, centroid_subvector)]."""
    from ..functions.hashing import h56_col

    rows = (
        embeddings.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
            h56_col(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(ksub)
        .collect()
    )
    if not rows:
        raise ValueError("pq_fit: empty embeddings table — no codebook")
    dim = len(rows[0]["cv"])
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [
            (j, [float(x) for x in r["cv"][s * dsub:(s + 1) * dsub]])
            for j, r in enumerate(rows)
        ]
        for s in range(m)
    ]


def pq_code_col(
    vec: Column, s: int, dsub: int, book: list[tuple[int, list[float]]]
) -> Column:
    """Scan-side code for subspace s: argmin squared-L2 over the literal
    codebook entries (ties → smallest j), zero shuffle.  Constant-size
    expression tree via array_min over (d, j) structs (the repo's
    64KB-safe argmin shape); distances rounded to 6 decimals so the
    argmin is bit-stable against the SQL mirror's fold."""
    sub = F.slice(vec.cast("array<double>"), s * dsub + 1, dsub)
    entries = [
        F.struct(
            F.round(l2sq_col(sub, cv), 6).alias("d"),
            F.lit(j).cast("long").alias("j"),
        )
        for j, cv in book
    ]
    return F.array_min(F.array(*entries))["j"]


def pq_codes_col(
    vec: Column, books: list[list[tuple[int, list[float]]]]
) -> Column:
    """All m codes as one array<long>; NULL or wrong-dimension vectors
    null-propagate (the band_keys_udf robustness rule)."""
    m = len(books)
    dsub = len(books[0][0][1])
    dim = m * dsub
    arr = F.array(*[pq_code_col(vec, s, dsub, books[s]) for s in range(m)])
    return F.when(
        vec.isNull() | (F.size(vec) != F.lit(dim)),
        F.lit(None).cast("array<long>"),
    ).otherwise(arr)


def pq_encode_udf(books: list[list[tuple[int, list[float]]]]):
    """Arrow-batched encoder for LARGE codebooks: one numpy broadcast
    per batch instead of m·ksub inlined literal folds.  Same
    literal-vs-udf split as ivf_cell_udf: the literal path is exactly
    SQL-mirrorable but its tree grows O(m·ksub·dsub); this kernel is
    the shape a 10^9-vector encode runs.  Quantization matches the
    literal path's F.round semantics (HALF_UP at 6 decimals; distances
    are non-negative so floor(d·1e6 + 0.5)), ties break to the
    smallest j on both paths (np.argmin takes the first min); exact
    agreement is pinned by test on both sf corpora, and a distance
    within float-summation noise of a rounding boundary could still
    differ — which is why ORACLE queries keep the literal path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    m = len(books)
    dsub = len(books[0][0][1])
    dim = m * dsub
    C = np.array(
        [[cv for _, cv in book] for book in books], dtype=np.float64
    )  # m × ksub × dsub

    @pandas_udf(ArrayType(LongType()))
    def codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = v.to_numpy()
        good = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = np.empty(len(vals), dtype=object)
        out[:] = None
        if good.any():
            mat = np.stack(vals[good]).astype(np.float64)
            sub = mat.reshape(len(mat), m, dsub)
            d = ((sub[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
            quant = np.floor(d * 1e6 + 0.5)  # HALF_UP, d >= 0
            picked = quant.argmin(axis=2)  # batch × m, first-min ties
            lists = np.empty(len(picked), dtype=object)
            lists[:] = [row.tolist() for row in picked]
            out[good] = lists
        return pd.Series(out)

    # plan barrier against double evaluation — see band_keys_udf
    return codes.asNondeterministic()


def _pq_adc_col(
    qv: Column, codes: Column, books: list[list[tuple[int, list[float]]]]
) -> Column:
    """Asymmetric distance: sum over subspaces of squared-L2 between the
    query's exact subvector and the neighbor's decoded codebook entry.
    Each term rounded to 6 then summed left-to-right and re-rounded —
    the explicit (t0 + t1 + ...) chain matches the SQL mirror's literal
    addition order, so the shortlist cut is bit-stable."""
    m = len(books)
    dsub = len(books[0][0][1])
    total = None
    for s in range(m):
        lookup = F.array(
            *[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in books[s]]
        )
        sub_q = F.slice(qv.cast("array<double>"), s * dsub + 1, dsub)
        cent = F.element_at(
            lookup, (F.element_at(codes, s + 1) + 1).cast("int")
        )
        term = F.round(pair_l2sq_col(sub_q, cent), 6)
        total = term if total is None else total + term
    return F.round(total, 6)


def _topk_window_asc(
    scored: DataFrame, k: int, dist_col: str, rank_alias: str = "rank"
) -> DataFrame:
    """Ascending top-k per query.  NULL distances (null / wrong-dim
    vectors under the null-propagation rule) are DROPPED before
    ranking — Spark's ascending sort is NULLS FIRST, which would
    otherwise promote exactly the rows the encode guards demoted, and
    the ADC kernel path (which masks bad rows) must agree with the
    literal path row-for-row."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col(dist_col).asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.where(F.col(dist_col).isNotNull())
        .withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .where(F.col(rank_alias) <= k)
    )


def _exact_rerank(
    short: DataFrame, v: DataFrame, k: int
) -> DataFrame:
    """Shared PQ/IVF-PQ tail: join the bounded shortlist back to the
    raw vectors and re-rank by exact squared L2."""
    exact = short.join(
        v.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("nv")),
        "neighbor_id",
    ).join(
        v.select(F.col("vid").alias("query_id"), F.col("v").alias("qv2")),
        "query_id",
    ).withColumn(
        "l2_dist", F.round(pair_l2sq_col(F.col("qv2"), F.col("nv")), 6)
    )
    return _topk_window_asc(
        exact.select("query_id", "neighbor_id", "adc_dist", "l2_dist"),
        k, "l2_dist",
    )


def _pq_adc_kernel(
    books: list[list[tuple[int, list[float]]]],
    qrows: list[tuple[int, list[float]]],
    shortlist: int,
):
    """Arrow ADC scan — the production shape (FAISS's LUT scan): per
    query one m×ksub table of rounded subspace distances built ONCE,
    then every corpus code batch scored by m table lookups + adds, and
    pruned to the per-batch top-``shortlist`` INSIDE the kernel, so the
    scan emits ≈ queries·shortlist rows per batch instead of the full
    batch×queries pair matrix.  (Global top-shortlist over the union of
    per-batch top-shortlists is exact.)  Addition is an explicit left
    fold over subspaces of once-rounded terms — the literal
    ``_pq_adc_col`` order — and rounding emulates F.round's HALF_UP at
    6 decimals like ivf_cell_udf (same boundary caveat, same reason
    oracle queries keep the literal path; exact agreement is pinned by
    test on both sf corpora)."""
    import numpy as np

    m = len(books)
    dsub = len(books[0][0][1])
    dim = m * dsub
    C = np.array(
        [[cv for _, cv in book] for book in books], dtype=np.float64
    )  # m × ksub × dsub
    qids = np.array([q for q, _ in qrows], dtype=np.int64)
    Q = np.array([v for _, v in qrows], dtype=np.float64)
    qsub = Q.reshape(len(Q), m, dsub)
    lut = ((qsub[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
    lut = np.floor(lut * 1e6 + 0.5) / 1e6  # per-term HALF_UP round(…, 6)

    def gen(batches):
        for pdf in batches:
            nids_all = pdf["neighbor_id"].to_numpy()
            codes_all = pdf["codes"].to_numpy()
            good = np.array(
                [c is not None and len(c) == m for c in codes_all],
                dtype=bool,
            )
            if not good.any():
                yield pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "adc_dist": []}
                ).astype(
                    {"query_id": "int64", "neighbor_id": "int64",
                     "adc_dist": "float64"}
                )
                continue
            nids = nids_all[good].astype(np.int64)
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in codes_all[good]]
            )
            acc = np.zeros((len(qids), len(nids)), dtype=np.float64)
            for s in range(m):  # explicit left fold — literal-path order
                acc = acc + lut[:, s, :][:, codes[:, s]]
            adc = np.floor(acc * 1e6 + 0.5) / 1e6  # final round(…, 6)
            out_q, out_n, out_d = [], [], []
            L = min(shortlist, len(nids))
            for qi in range(len(qids)):
                row = adc[qi]
                mask = nids != qids[qi]  # self excluded like the != filter
                cand_n, cand_d = nids[mask], row[mask]
                order = np.lexsort((cand_n, cand_d))[:L]
                out_q.extend([qids[qi]] * len(order))
                out_n.extend(cand_n[order].tolist())
                out_d.extend(cand_d[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_dist": out_d}
            )

    return gen, dim


def pq_topk(
    embeddings: DataFrame,
    k: int = 3,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    shortlist: int = PQ_SHORTLIST,
    n_queries: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[tuple[int, list[float]]]] | None = None,
    method: str = "literal",
    adc: str = "literal",
) -> DataFrame:
    """PQ ANN top-k: encode the corpus once (m codes per vector — the
    21× compressed representation that streams), ADC-score each
    (query, code) pair with m lookup+add terms, keep the top
    ``shortlist`` per query by approximate distance, then re-rank that
    bounded set with EXACT squared L2 (one semi-join back to the raw
    vectors) — the IndexPQ → refine topology.

    Scale shape: the corpus side carries only codes (memory-resident at
    10^9 vectors), the bounded query side broadcasts, ADC is one scan
    with zero shuffle, and the exact re-rank touches shortlist·queries
    raw vectors — never the corpus.  ``method="udf"`` swaps the literal
    encode folds for the Arrow numpy kernel (mandatory at large
    m·ksub); ``adc="kernel"`` swaps the literal per-pair ADC expression
    for the LUT-scan Arrow kernel with IN-KERNEL top-shortlist pruning
    (requires a bounded ``n_queries``; the scan then never materializes
    the batch×queries pair matrix).  Oracle queries keep both on
    "literal"."""
    if books is None:
        books = pq_fit(embeddings, m, ksub, id_col, vec_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    if method == "udf":
        enc = pq_encode_udf(books)(F.col("v"))
    else:
        enc = pq_codes_col(F.col("v"), books)
    corpus = v.select(F.col("vid").alias("neighbor_id"), enc.alias("codes"))
    if adc == "kernel":
        if n_queries is None:
            raise ValueError("pq_topk: adc='kernel' needs bounded n_queries")
        from pyspark.sql import types as T

        # bounded probe-side collect — the same class as pq_fit's
        # model read (n_queries rows), never the corpus.  NULL or
        # wrong-dimension query vectors are skipped: the literal path
        # yields NULL distances for them (dropped by the ranking
        # window), so emitting no rows is the agreeing behavior.
        qdim = len(books) * len(books[0][0][1])
        qrows = [
            (int(r["vid"]), [float(x) for x in r["v"]])
            for r in v.where(F.col("vid") < n_queries).collect()
            if r["v"] is not None and len(r["v"]) == qdim
        ]
        gen, _dim = _pq_adc_kernel(books, qrows, shortlist)
        schema = T.StructType([
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ])
        batch_short = corpus.mapInPandas(gen, schema)
        short = _topk_window_asc(batch_short, shortlist, "adc_dist").drop(
            "rank"
        )
    else:
        queries = v.select(
            F.col("vid").alias("query_id"), F.col("v").alias("qv")
        )
        if n_queries is not None:
            queries = F.broadcast(queries.where(F.col("query_id") < n_queries))
        pairs = corpus.crossJoin(queries).where(
            F.col("query_id") != F.col("neighbor_id")
        )
        scored = pairs.withColumn(
            "adc_dist", _pq_adc_col(F.col("qv"), F.col("codes"), books)
        )
        short = _topk_window_asc(
            scored.select("query_id", "neighbor_id", "adc_dist"),
            shortlist, "adc_dist",
        ).drop("rank")
    return _exact_rerank(short, v, k)


# --- IVF-PQ: coarse cells + ADC inside probed cells ----------------------------

IVFPQ_NLIST, IVFPQ_NPROBE = IVF_NLIST, IVF_NPROBE


def ivfpq_fit_coarse(
    embeddings: DataFrame,
    nlist: int = IVFPQ_NLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Coarse quantizer for the L2 family: the nlist h56-ranked corpus
    vectors (cid, centroid) — ivf_fit's protocol minus the cosine
    norms, because IVF-PQ assigns cells by MIN squared L2 (metric
    consistency with the ADC stage)."""
    return [(cid, cv) for cid, cv, _ in ivf_fit(embeddings, nlist, id_col, vec_col)]


def _ivfpq_dist_entries(
    vec: Column, coarse: list[tuple[int, list[float]]]
) -> list[Column]:
    """(rounded-L2, cid) structs against the literal coarse centroids —
    shared by cell assignment (argmin) and probe ordering (sort)."""
    return [
        F.struct(
            F.round(l2sq_col(vec.cast("array<double>"), cv), 6).alias("d"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, cv in coarse
    ]


def ivfpq_cell_col(vec: Column, coarse: list[tuple[int, list[float]]]) -> Column:
    """Scan-side L2 cell assignment: argmin rounded squared-L2 over the
    literal coarse centroids (ties → smallest cid), zero shuffle."""
    return F.array_min(F.array(*_ivfpq_dist_entries(vec, coarse)))["cid"]


def ivfpq_probe_cells_col(
    vec: Column,
    coarse: list[tuple[int, list[float]]],
    nprobe: int = IVFPQ_NPROBE,
) -> Column:
    """The query's nprobe nearest cells under L2 (d asc, cid asc —
    includes its own cell first, so planted duplicates are always
    reachable)."""
    ordered = F.array_sort(F.array(*_ivfpq_dist_entries(vec, coarse)))
    return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["cid"])


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = 3,
    nlist: int = IVFPQ_NLIST,
    nprobe: int = IVFPQ_NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    shortlist: int = PQ_SHORTLIST,
    n_queries: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse: list[tuple[int, list[float]]] | None = None,
    books: list[list[tuple[int, list[float]]]] | None = None,
    method: str = "literal",
) -> DataFrame:
    """IVF-PQ ANN top-k — the FAISS IndexIVFPQ layout re-expressed as a
    DataFrame plan: every corpus vector gets (cell, codes) at scan time
    (both literal-fold columns, zero shuffle), the inverted lists hold
    ~12-byte codes instead of 256-byte vectors, queries probe their
    nprobe nearest cells, ADC scores ONLY vectors in probed cells
    (n·nprobe/nlist per query instead of n), and the bounded shortlist
    is re-ranked exactly.  At nlist ∝ √n this is the O(√n)-per-query
    scored-pair bound AND the 21× memory bound in one plan; general
    recall is cell-limited exactly like ann_ivf_topk (the ann_pq_recall
    query reports both paths against the exact-L2 truth)."""
    if coarse is None:
        coarse = ivfpq_fit_coarse(embeddings, nlist, id_col, vec_col)
    if books is None:
        books = pq_fit(embeddings, m, ksub, id_col, vec_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    if method == "udf":
        enc = pq_encode_udf(books)(F.col("v"))
    else:
        enc = pq_codes_col(F.col("v"), books)
    corpus = v.select(
        F.col("vid").alias("neighbor_id"),
        enc.alias("codes"),
        ivfpq_cell_col(F.col("v"), coarse).alias("cell"),
    )
    queries = v.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
    if n_queries is not None:
        queries = queries.where(F.col("query_id") < n_queries)
    probes = queries.select(
        "query_id", "qv",
        F.explode(
            ivfpq_probe_cells_col(F.col("qv"), coarse, nprobe)
        ).alias("cell"),
    )
    if n_queries is not None:
        probes = F.broadcast(probes)
    pairs = corpus.join(probes, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "adc_dist", _pq_adc_col(F.col("qv"), F.col("codes"), books)
    )
    short = _topk_window_asc(
        scored.select("query_id", "neighbor_id", "adc_dist"),
        shortlist, "adc_dist",
    ).drop("rank")
    return _exact_rerank(short, v, k)


def brute_l2_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_queries: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k — the truth ranking the PQ family's
    recall is measured against (brute_topk is the cosine analogue)."""
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    corpus = v.select(
        F.col("vid").alias("neighbor_id"), F.col("v").alias("nv")
    )
    queries = v.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
    if n_queries is not None:
        queries = F.broadcast(queries.where(F.col("query_id") < n_queries))
    pairs = corpus.crossJoin(queries).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(pair_l2sq_col(F.col("qv"), F.col("nv")), 6).alias("l2_dist"),
    )
    return _topk_window_asc(scored, k, "l2_dist")
