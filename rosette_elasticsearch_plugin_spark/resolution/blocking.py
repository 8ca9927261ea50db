"""R3/R4/R5 — blocking key generation.

Input: a names table ``(node, key)`` where ``node`` is the normalized
mention form (the cluster node identity) and ``key`` is the ER
canonical form used for blocking — the transliterated normalized name,
so cross-script variants collide (plans/er_pipeline.py computes it).

Three key families, unioned:

* ``x:`` exact canonical key              (R3)
* ``m:`` Double Metaphone primary/secondary per token (R4)
* ``h:`` MinHash-LSH band buckets over char-3-gram shingles (R5)

Output is the long format ``(node, block_key)`` — one row per
(node, key).  Long format scales: the downstream self-join shuffles on
``block_key``, so each family adds rows, never columns.

Scale notes (100 TB / 10^12 docs):
- blocking runs on the distinct-names table, which is orders of
  magnitude smaller than the mention table;
- hot blocks (ultra-common names) are capped/salted in pairs.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import (
    lsh_band_keys_col,
    minhash_params,
    minhash_sig_col,
    shingles_col,
)
from ..functions.phonetics import double_metaphone_udf


@dataclass(frozen=True)
class BlockingConfig:
    use_exact: bool = True
    use_metaphone: bool = True
    use_minhash: bool = True
    minhash_bands: int = 3
    minhash_rows: int = 2
    shingle_n: int = 3
    minhash_seed: int = 42
    # metaphone is keyed per whitespace token to survive token reordering
    metaphone_max_tokens: int = 4
    # opt-in token family (``t:`` keys) — high recall, Zipfian block
    # sizes; only sensible behind meta-blocking's purge+prune (see
    # resolution/metablocking.py), hence off by default
    use_tokens: bool = False
    token_min_len: int = 2
    # opt-in suffix family (``s:`` keys) — suffix-array blocking
    # (Aizawa & Oyama 2005): every suffix of the space-stripped key
    # with length >= suffix_min_len is a key, suffixes carried by more
    # than suffix_max_block names are purged.  Catches LEADING-character
    # variants (the blind spot of exact/metaphone/SNM, which all anchor
    # at the string head); off by default like the other recall add-ons
    use_suffix: bool = False
    suffix_min_len: int = 5
    suffix_max_block: int = 50
    # opt-in embedding family (``e:`` keys) — hashed char-trigram count
    # vectors bucketed by sign-LSH: a DENSE similarity signal, so names
    # sharing most trigram mass collide even when no single exact
    # key/code/band survives the edit (multi-typo variants).  2^planes
    # buckets must track the vocabulary (2^k ≳ names/50); hot buckets
    # are the cap/salt machinery's case like the minhash family
    use_embed: bool = False
    embed_dim: int = 32
    embed_planes: int = 6
    embed_seed: int = 42

    @property
    def num_perm(self) -> int:
        return self.minhash_bands * self.minhash_rows

    def params(self) -> list[tuple[int, int]]:
        return minhash_params(self.num_perm, self.minhash_seed)


def exact_blocks(names: DataFrame) -> DataFrame:
    """R3: one key per name — its canonical form."""
    return names.select(
        "node", F.concat(F.lit("x:"), F.col("key")).alias("block_key")
    )


def metaphone_blocks(
    names: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> DataFrame:
    """R4: per-token Double Metaphone primary+secondary keys.

    Tokenizing first makes 'aykroyd dan' and 'dan aykroyd' collide.
    Empty codes (e.g. CJK names) produce no key → those names rely on
    the other families.
    """
    toks = names.select(
        "node",
        F.explode(
            F.slice(F.split(F.col("key"), " "), 1, cfg.metaphone_max_tokens)
        ).alias("tok"),
    ).where(F.length("tok") > 0)
    coded = toks.select("node", double_metaphone_udf(F.col("tok")).alias("dm"))
    keys = coded.select(
        "node",
        F.explode(F.array_distinct(F.array("dm.primary", "dm.secondary"))).alias(
            "code"
        ),
    ).where(F.length("code") > 0)
    return keys.select(
        "node", F.concat(F.lit("m:"), F.col("code")).alias("block_key")
    ).distinct()


def minhash_blocks(
    names: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> DataFrame:
    """R5: banded MinHash-LSH bucket keys over char shingles."""
    # sig gets its own projection: lsh_band_keys_col pulls bands*rows
    # element_at's out of it, and inlining would re-evaluate the whole
    # MinHash expression per reference
    sigs = names.select(
        "node",
        minhash_sig_col(
            shingles_col(F.col("key"), cfg.shingle_n), cfg.params()
        ).alias("sig"),
    )
    keys = sigs.select(
        "node",
        F.explode(
            lsh_band_keys_col(F.col("sig"), cfg.minhash_bands, cfg.minhash_rows)
        ).alias("k"),
    )
    return keys.select(
        "node", F.concat(F.lit("h:"), F.col("k")).alias("block_key")
    )


def token_blocks(names: DataFrame, min_len: int = 2) -> DataFrame:
    """Token blocking: every whitespace token of the canonical key is a
    block key (``t:`` family).

    The classic high-recall / low-precision schema-agnostic family —
    any shared token makes two names candidates, so it catches variants
    the equality families miss (added middle names, reordered or
    partially-typo'd multi-token names) at the cost of huge blocks for
    common tokens.  It is intended to be consumed THROUGH
    ``resolution/metablocking.py`` (block purging + weighted pair
    pruning), never joined raw: token frequencies are Zipfian, so the
    raw family alone would produce quadratic pairs on stop-word-like
    tokens at corpus scale.

    Tokens shorter than ``min_len`` are dropped (single letters are
    initials/noise and would block half the vocabulary together).
    """
    toks = names.select(
        "node", F.explode(F.split(F.col("key"), " ")).alias("tok")
    ).where(F.length("tok") >= min_len)
    return toks.select(
        "node", F.concat(F.lit("t:"), F.col("tok")).alias("block_key")
    ).distinct()


def rare_token_blocks(names: DataFrame, min_len: int = 2) -> DataFrame:
    """Rarest-token blocking (``r:`` family) — the distributed surrogate
    for canopy clustering's cheap-distance pass (McCallum/Nigam/Ungar,
    KDD 2000).

    Each name gets exactly ONE key: the token of its canonical form with
    the LOWEST corpus frequency (ties broken lexicographically).  Rare
    tokens are the discriminative ones (a shared rare surname is strong
    evidence; a shared given name is weak), so this family yields small,
    high-precision blocks at a guaranteed one-key-per-name budget —
    where plain token blocking emits every token and relies on
    meta-blocking to tame the Zipfian blocks, rarest-token keeps the
    candidate count linear BY CONSTRUCTION.

    Scale shape: one groupBy over the exploded token table for the
    frequency dim (vocabulary-scale, AQE-broadcastable back-join), then
    one combinable ``min(struct(df, tok))`` aggregate per node — no
    window function, no skewed shuffle: the output blocks are the
    SMALLEST blocks the token universe admits.
    """
    toks = (
        names.select(
            "node", F.explode(F.split(F.col("key"), " ")).alias("tok")
        )
        .where(F.length("tok") >= min_len)
        .distinct()
    )
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    # min over (df, tok) structs = argmin by frequency with a
    # deterministic lexicographic tie-break, as a plain combinable agg
    return (
        toks.join(freq, "tok")
        .groupBy("node")
        .agg(F.min(F.struct("df", "tok")).alias("m"))
        .select(
            "node",
            F.concat(F.lit("r:"), F.col("m.tok")).alias("block_key"),
        )
    )


def suffix_blocks(
    names: DataFrame, min_len: int = 5, max_block: int = 50
) -> DataFrame:
    """Suffix-array blocking (``s:`` family) — Aizawa & Oyama, "A Fast
    Linkage Detection Scheme for Multi-Source Information Integration"
    (WIRI 2005), the standard high-recall complement for LEADING-
    character variation.

    Every suffix of the space-stripped canonical key with length >=
    ``min_len`` becomes a block key (a name shorter than that keys on
    its whole compact form), so two names that differ only near the
    head — the exact blind spot of exact-key, Double Metaphone (first-
    letter-anchored codes) and sorted-neighborhood (prefix order) —
    still share every suffix past the edit.  The classic frequency
    purge drops suffixes carried by more than ``max_block`` names:
    short common endings ("...sson", "...ovic") are Zipfian, and the
    purge bounds every surviving block, keeping the candidate budget
    linear without the cap/salt machinery.

    Scale shape: suffix explosion is a per-row ``transform(sequence)``
    expression (no UDF; output rows bounded by key length), the purge
    is one combinable count per suffix joined back — the same
    vocabulary-scale agg+join shape as ``rare_token_blocks``.
    """
    ck = F.regexp_replace(F.col("key"), " ", "")
    sufs = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(ck) - (min_len - 1), F.lit(1))
        ),
        lambda i: F.substring(ck, i, 0x7FFFFFFF),
    )
    d = (
        names.select("node", F.explode(sufs).alias("suf"))
        .where(F.length("suf") > 0)
        .distinct()
    )
    freq = d.groupBy("suf").agg(F.count("*").cast("long").alias("df"))
    return (
        d.join(freq, "suf")
        .where(F.col("df") <= max_block)
        .select(
            "node", F.concat(F.lit("s:"), F.col("suf")).alias("block_key")
        )
    )


def trigram_vector_col(key, dim: int = 32):
    """Hashed character-trigram count vector (array<double>): component
    j counts the key's trigrams with h56(tri) mod dim == j — the
    deterministic cheap stand-in for a learned name embedding, sharing
    its blocking-relevant property (dense cosine similarity under
    partial character overlap).  Pure per-row expression, no UDF; keys
    shorter than 3 chars embed to the zero vector (cosine 0 to
    everything — they never match through this family)."""
    from ..functions.hashing import h56_col

    n = F.length(key)
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.substring(key, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    mods = F.transform(tris, lambda t: h56_col(t) % dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.size(F.filter(mods, lambda m: m == j)).cast("double"),
    )


def trigram_vector_sql(expr: str, dim: int = 32) -> str:
    """DuckDB mirror of ``trigram_vector_col`` (same h56, same layout)."""
    from ..functions.hashing import h56_sql

    h = h56_sql("t")
    tris = (
        f"list_transform(range(1, greatest(length({expr}) - 2, 0) + 1), "
        f"i -> substr({expr}, cast(i as int), 3))"
    )
    return (
        f"list_transform(range(0, {dim}), j -> cast(len(list_filter("
        f"list_transform({tris}, t -> {h} % {dim}), m -> m = j)) as double))"
    )


def embed_bucket_udf(dim: int = 32, planes_k: int = 6, seed: int = 42):
    """Arrow sign-bucket kernel for the embed family — the production
    encode path, for the same reason as band_keys_udf: the literal
    trigram-vector expression re-evaluates its HOF lambdas per
    component (measured ~1.4 ms/name at 210k names — 294 s for one
    block build), while this kernel hashes each trigram once (memoized
    across the batch) and accumulates the plane dots with an explicit
    per-component left fold, so the sign agrees with the literal
    ``lsh_bucket_col`` fold except within float-summation noise of an
    exact zero dot (integer counts × 6-decimal literals — not
    observed; pinned equal on the fixture and a 20k synthetic sample).
    Oracle queries keep the literal path."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from ..operators.ann import hyperplanes

    planes = np.array(hyperplanes(dim, planes_k, seed), dtype=np.float64)

    @pandas_udf(LongType())
    def bucket(keys: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def mod(t: str) -> int:
            h = cache.get(t)
            if h is None:
                h = (
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:14], 16)
                    % dim
                )
                cache[t] = h
            return h

        out = []
        vecs = []
        idx = []
        for i, key in enumerate(keys):
            if key is None:
                out.append(None)
                continue
            v = np.zeros(dim, dtype=np.float64)
            for p in range(len(key) - 2):
                v[mod(key[p:p + 3])] += 1.0
            vecs.append(v)
            idx.append(i)
            out.append(0)
        if vecs:
            M = np.stack(vecs)  # b × dim
            acc = np.zeros((len(planes), len(M)), dtype=np.float64)
            for d in range(dim):  # explicit left fold per component —
                acc += np.outer(planes[:, d], M[:, d])  # matches dot_col
            b = ((acc >= 0.0).T * (1 << np.arange(len(planes)))).sum(axis=1)
            for j, i in enumerate(idx):
                out[i] = int(b[j])
        return pd.Series(out, dtype="Int64")

    return bucket.asNondeterministic()


def embed_blocks(
    names: DataFrame,
    dim: int = 32,
    planes_k: int = 6,
    seed: int = 42,
    method: str = "literal",
) -> DataFrame:
    """Embedding-LSH blocking (``e:`` family): sign-bucket of the
    hashed-trigram vector under seeded hyperplanes, MULTI-PROBED — each
    name keys on its own bucket plus every radius-1 bit flip (the
    multiprobe_topk pattern), so two names collide iff their sign
    buckets differ in ≤ 2 planes.  This is the dense-vector blocking
    used with learned name embeddings, exercised here with the
    deterministic trigram embedding so the oracle mirrors it exactly;
    it catches multi-typo variants whose every discrete key
    (exact/metaphone/band/suffix) differs but whose trigram mass
    mostly overlaps.  Measured on the labeled fixture: same-bucket
    alone co-blocks 0.20 of true pairs, radius-1 probing 0.79.
    planes_k+1 bounded keys per name, one scan-side expression, no
    shuffle until the bucket self-join."""
    from ..operators.ann import hyperplanes, lsh_bucket_col

    if method == "udf":
        bucket = embed_bucket_udf(dim, planes_k, seed)(F.col("key"))
    else:
        planes = hyperplanes(dim, planes_k, seed)
        # null-propagate to match the udf path: the raw literal fold
        # would map a NULL key to the zero vector (all-signs-positive
        # bucket) while embed_bucket_udf emits NULL
        bucket = F.when(
            F.col("key").isNull(), F.lit(None).cast("long")
        ).otherwise(
            lsh_bucket_col(trigram_vector_col(F.col("key"), dim), planes)
        )
    b = F.col("b")
    probes = F.array(
        b, *[b.bitwiseXOR(F.lit(1 << i)) for i in range(planes_k)]
    )
    return (
        names.select("node", bucket.alias("b"))
        .select("node", F.explode(probes).alias("pb"))
        .select(
            "node",
            F.concat(F.lit("e:"), F.col("pb").cast("string")).alias(
                "block_key"
            ),
        )
        .distinct()
    )


def all_blocks(
    names: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> DataFrame:
    """Union of enabled key families, deduped per (node, block_key)."""
    parts = []
    if cfg.use_exact:
        parts.append(exact_blocks(names))
    if cfg.use_metaphone:
        parts.append(metaphone_blocks(names, cfg))
    if cfg.use_minhash:
        parts.append(minhash_blocks(names, cfg))
    if cfg.use_tokens:
        parts.append(token_blocks(names, cfg.token_min_len))
    if cfg.use_suffix:
        parts.append(
            suffix_blocks(names, cfg.suffix_min_len, cfg.suffix_max_block)
        )
    if cfg.use_embed:
        parts.append(
            embed_blocks(
                names, cfg.embed_dim, cfg.embed_planes, cfg.embed_seed
            )
        )
    if not parts:
        raise ValueError("at least one blocking family must be enabled")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def global_rank(
    names: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Input columns + ``rank`` (0-based position in the total
    ``order_cols`` order) — computed WITHOUT the single-partition
    global window that ``row_number() OVER (ORDER BY …)`` plans to.

    Distributed two-phase rank: range-repartition on the order columns
    (each partition owns a contiguous key range), sort within
    partitions, then shift per-partition ``row_number``s by the
    cumulative partition counts (one P-row driver aggregate, P =
    partition count — bounded, never data-scale).  The rank is the
    position in the TOTAL order, so the result is deterministic no
    matter where the range sampler happens to place its boundaries.
    The range-partitioned input is pinned with ``localCheckpoint``
    because the counts job and the rank job must see the SAME
    boundaries (the range sampler is not seeded across jobs).
    """
    P = num_partitions or names.sparkSession.sparkContext.defaultParallelism
    part = (
        names.repartitionByRange(P, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["n"]
        for r in part.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in range(P):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = names.sparkSession.createDataFrame(
        offsets, "__pid int, __off long"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        part.join(F.broadcast(off_df), "__pid")
        .withColumn(
            "rank", (F.row_number().over(w) - F.lit(1) + F.col("__off"))
        )
        .drop("__pid", "__off")
    )


def sorted_neighborhood_pairs(
    names: DataFrame, window: int = 4, num_partitions: int | None = None
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo merge/purge):
    order the vocabulary by its ER canonical key and pair every name
    with its ``window - 1`` successors in that order.

    Complements the key-equality families: typo'd FIRST characters
    break exact/metaphone/MinHash collisions ("aykroyd" vs "qykroyd"),
    but sort-adjacency still catches variants that agree on the sort
    prefix, with a pair budget that is exactly linear —
    n·(window-1) − window·(window-1)/2 pairs, no quadratic blocks, no
    hot keys, no salting needed.  The join is rank-equi (ranks are
    unique integers), so the shuffle is perfectly uniform.

    names: (node, key) — key is the ER canonical form (the sort key);
    returns (node_a, node_b), node_a < node_b, each adjacent-in-window
    pair exactly once.
    """
    if window < 2:
        raise ValueError(f"window must be ≥ 2: {window}")
    ranked = global_rank(
        names.select("node", "key"), ["key", "node"], num_partitions
    ).select("node", "rank")
    left = ranked.select(
        F.col("node").alias("__na"),
        F.explode(
            F.sequence(
                F.col("rank") + F.lit(1), F.col("rank") + F.lit(window - 1)
            )
        ).alias("rank"),
    )
    right = ranked.select(F.col("node").alias("__nb"), "rank")
    return (
        left.join(right, "rank")
        .select(
            F.least("__na", "__nb").alias("node_a"),
            F.greatest("__na", "__nb").alias("node_b"),
        )
    )
