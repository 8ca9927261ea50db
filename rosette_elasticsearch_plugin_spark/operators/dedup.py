"""Deduplication operators for large-scale training-data pipelines.

Five families, all designed for 100 TB inputs:

* exact          — md5-groupBy; one shuffle on the hash, map-side combine.
* MinHash-LSH    — token-shingle MinHash signatures → banded keys →
                   bucket self-join (candidates only; never all-pairs) →
                   exact n-gram Jaccard verification.
* SimHash        — 56-bit signature per doc (JVM-side bit arithmetic);
                   near-dup = small Hamming distance within LSH buckets.
* n-gram Jaccard — exact verification metric, exposed standalone.
* IDF-weighted   — frequency-aware token Jaccard (rare tokens weigh
                   more) over the same LSH candidates; the weighting
                   that stops shared boilerplate reading as duplication.
* embedding      — cosine near-dup over the embeddings table (see ann.py).

Everything is pure column expressions over the cross-engine hash
(functions/hashing.py), so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import (
    h56_col,
    h56_sql,
    hashed_shingles_col,
    lsh_band_keys_col,
    minhash_params,
    minhash_sig_from_hashes_col,
    simhash_from_hashes_col,
)

# token 3-gram shingles ("w1 w2 w3") over lowercased word tokens.
# Token-less text (empty/NULL/no [a-z0-9] runs) must yield [] on BOTH
# engines: without the empty-gram filter, Spark's concat_ws swallows
# the NULL slice into '' and emits [''] — giving every token-less doc
# the SAME valid shingle set, hence identical MinHash signatures and a
# phantom all-empty-docs dedup bucket (DuckDB yielded [] already).
def token_shingles_col(text: Column, n: int = 3) -> Column:
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.filter(grams, lambda g: g != F.lit("")))


def token_shingles_sql(expr: str, n: int = 3) -> str:
    toks = f"regexp_extract_all(lower({expr}), '[a-z0-9]+')"
    return (
        f"list_distinct(list_filter(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')), "
        f"g -> g <> ''))"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_docs, keeper_doc_id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_perm: int = 12, seed: int = 42
) -> DataFrame:
    """Two-step plan: materialize hashed shingles once per row (one md5
    pass), then each permutation is pure long arithmetic — without the
    split Catalyst re-evaluates the whole shingle+md5 pipeline per
    permutation (measured 10× slower)."""
    params = minhash_params(num_perm, seed)
    hashed = docs.select(
        "doc_id",
        hashed_shingles_col(token_shingles_col(F.col(text_col))).alias("__h"),
    )
    return hashed.select(
        "doc_id", minhash_sig_from_hashes_col(F.col("__h"), params).alias("minhash_sig")
    )


# Hot-bucket cap for text LSH: above this size a band bucket must not
# self-join all-vs-all — ONE boilerplate bucket would go quadratic at
# 10^12 docs.  Over-cap buckets switch to STAR pairing (every member vs
# the bucket's min-id representative, linear): mega-duplicate groups
# share ALL their band keys across copies, so dropping them (as the ER
# name path does for low-information name blocks) would exempt exactly
# the most-duplicated content from dedup.
DEDUP_MAX_BUCKET = 1000
DEDUP_N_SALT, DEDUP_SALT_THRESHOLD = 8, 64


def band_key_table(
    docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, band_key) — the exploded LSH band table, materialized
    once (lazy ``localCheckpoint``).  At warehouse scale this is "write
    the signature table" — every downstream consumer (sizes aggregate,
    both self-join sides, the crossover row count) reads the
    materialized table instead of re-evaluating the shingle→md5→MinHash
    chain.  Docs whose text yields no shingles (null/empty/token-less)
    get NULL signature elements → NULL band keys (lsh_band_keys_col
    null-propagates, mirroring the SQL ``||``) and drop at the cheap
    post-explode filter — never a predicate over the hash chain itself,
    which Catalyst would collapse into the projection and evaluate the
    md5 work twice."""
    params = minhash_params(bands * rows, seed)
    hashed = docs.select(
        "doc_id",
        hashed_shingles_col(token_shingles_col(F.col(text_col))).alias("__h"),
    )
    # signature in its own projection: lsh_band_keys_col references the
    # sig array bands*rows times via element_at, and inlining the full
    # 12-perm expression there multiplies the MinHash work 12x per row
    # (CollapseProject keeps this split because "sig" is non-cheap and
    # multiply-referenced)
    sigs = hashed.select(
        "doc_id", minhash_sig_from_hashes_col(F.col("__h"), params).alias("sig")
    )
    keys = sigs.select(
        "doc_id",
        F.explode(lsh_band_keys_col(F.col("sig"), bands, rows)).alias("band_key"),
    ).where(F.col("band_key").isNotNull())
    return keys.localCheckpoint(eager=False)


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    seed: int = 42,
    max_bucket: int = DEDUP_MAX_BUCKET,
    keys: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash buckets.

    Scale shape: explode to (doc_id, band_key), self-join on band_key
    through the capped+salted grid join (resolution/pairs.py) — the
    shuffle key is the bucket, work is proportional to capped bucket
    sizes, never |docs|².  ``keys``: a prebuilt :func:`band_key_table`
    (avoids rebuilding it when the caller also consumes it)."""
    if keys is None:
        keys = band_key_table(docs, text_col, bands, rows, seed)
    from ..resolution.pairs import candidate_pairs

    return candidate_pairs(
        keys.select(F.col("doc_id").alias("node"), F.col("band_key").alias("block_key")),
        max_block_size=max_bucket,
        n_salt=DEDUP_N_SALT,
        salt_threshold=DEDUP_SALT_THRESHOLD,
        # star, not drop: over-cap buckets ARE the mega-duplicate
        # groups dedup exists to catch (all copies share all bands)
        hot_block_mode="star",
    ).select(
        F.col("node_a").alias("doc_id_a"), F.col("node_b").alias("doc_id_b")
    )


def ngram_jaccard_from_arrays_col(sa: Column, sb: Column) -> Column:
    """Jaccard of two precomputed shingle-array columns.  Prefer this
    over :func:`ngram_jaccard_col` in joins: shingling per DOCUMENT then
    joining arrays beats shingling per PAIR (a pair expression is also
    re-evaluated when a threshold filter is pushed into the projection)."""
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.round(F.when(union == 0, 0.0).otherwise(inter / union), 6)


def ngram_jaccard_col(a: Column, b: Column, n: int = 3) -> Column:
    """Exact token-n-gram Jaccard between two text columns."""
    return ngram_jaccard_from_arrays_col(
        token_shingles_col(a, n), token_shingles_col(b, n)
    )


def ngram_jaccard_from_arrays_sql(sa: str, sb: str) -> str:
    """DuckDB mirror of :func:`ngram_jaccard_from_arrays_col` over two
    precomputed shingle-list expressions.  Oracles should shingle per
    DOCUMENT in a materialized CTE and pass column refs here — inlining
    :func:`token_shingles_sql` per pair re-runs the whole
    regex+slice+concat pipeline up to 6× per candidate (DuckDB inlines
    CTE references), which dominated the correctness-gate wall clock."""
    return (
        f"round(case when len(list_distinct({sa} || {sb})) = 0 then 0.0 "
        f"else cast(len(list_intersect({sa}, {sb})) as double) "
        f"/ len(list_distinct({sa} || {sb})) end, 6)"
    )


def ngram_jaccard_sql(a: str, b: str, n: int = 3) -> str:
    return ngram_jaccard_from_arrays_sql(
        token_shingles_sql(a, n), token_shingles_sql(b, n)
    )


def candidate_jaccard_scores(
    docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    seed: int = 42,
    max_bucket: int = DEDUP_MAX_BUCKET,
    restrict_to_candidates: bool | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) for every LSH candidate pair —
    the unthresholded verification scores.

    ``restrict_to_candidates``: shingle only documents that appear in
    some candidate pair (semi-join first).  Physical-only choice — the
    output is identical either way.  Default ``None`` = auto by a cheap
    crossover estimate (see below)."""
    # the band table feeds the pair join AND the crossover count — one
    # materialization for both
    keys = band_key_table(docs, text_col, bands, rows, seed)
    # candidates are consumed twice (id universe + final join) — pin them
    cands = lsh_candidate_pairs(
        docs, text_col, bands, rows, seed, max_bucket, keys=keys
    ).localCheckpoint(eager=False)
    if restrict_to_candidates is None:
        # Crossover: the candidate-restriction semi-join pays off only
        # when candidate docs are a SMALL fraction of the corpus (the
        # 100 TB design point, where near-dups are rare).  Distinct
        # candidate ids are bounded by 2·n_pairs, so when 2·n_pairs ≥
        # n_docs/2 the restriction cannot shrink the shingle pass below
        # ~half the corpus, while its fixed cost (two extra jobs + a
        # shuffle join) dominates — exactly the measured +32% at sf0.1
        # in round 2.  Both counts read MATERIALIZED tables: n_pairs
        # the candidate checkpoint, n_docs the band-table checkpoint
        # (rows = bands per signed doc) — never a re-execution of
        # docs' upstream lineage, which may be an arbitrarily expensive
        # enrichment chain.  Docs with no signature (null/empty text)
        # are missing from the estimate; the heuristic is physical-only
        # and such docs can't appear in a candidate pair anyway.
        n_pairs = cands.count()
        n_docs = keys.count() // bands
        restrict_to_candidates = 2 * n_pairs < n_docs // 2
    if restrict_to_candidates:
        # verification shingles computed ONLY for documents appearing
        # in some candidate pair: candidates are a tiny fraction of a
        # 100 TB corpus, and without the restriction the shingle pass
        # would re-run over the FULL corpus once per join side
        cand_ids = (
            cands.select(F.col("doc_id_a").alias("doc_id"))
            .unionByName(cands.select(F.col("doc_id_b").alias("doc_id")))
            .distinct()
        )
        sh_src = docs.join(cand_ids, "doc_id", "left_semi")
    else:
        sh_src = docs
    # shingle once per document and join the arrays — never per pair
    sh = (
        sh_src.select("doc_id", token_shingles_col(F.col(text_col)).alias("__sh"))
        .localCheckpoint(eager=False)
    )
    j = (
        cands.join(
            sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("__sh", "sh_a"),
            "doc_id_a",
        ).join(
            sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("__sh", "sh_b"),
            "doc_id_b",
        )
    )
    return j.select(
        "doc_id_a",
        "doc_id_b",
        ngram_jaccard_from_arrays_col(F.col("sh_a"), F.col("sh_b")).alias(
            "jaccard"
        ),
    )


def near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = DEDUP_MAX_BUCKET,
    restrict_to_candidates: bool | None = None,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact n-gram Jaccard ≥ threshold."""
    scored = candidate_jaccard_scores(
        docs, text_col, bands, rows, seed, max_bucket, restrict_to_candidates
    )
    return scored.where(F.col("jaccard") >= threshold)


def doc_token_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token): the distinct word-token set per document — the
    unit the IDF weighting operates on (same token universe as SimHash:
    lowercased ``[a-z0-9]+`` runs)."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), F.lit(0))
    )
    return docs.select("doc_id", F.explode(toks).alias("token"))


def doc_token_table_sql(from_expr: str, text_expr: str = "text") -> str:
    return (
        f"select doc_id, unnest(list_distinct("
        f"regexp_extract_all(lower({text_expr}), '[a-z0-9]+'))) as token "
        f"from {from_expr}"
    )


def idf_weights(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, df, idf): smoothed inverse-document-frequency weights,
    ``idf = ln((N+1)/(df+1)) + 1`` over the corpus (N = |docs|).

    Rare tokens ⇒ high weight: the standard frequency-aware refinement
    of token similarity (a shared rare surname is strong match evidence;
    a shared stopword is none).  Scale shape: ONE groupBy over the
    exploded token table (map-side combine), output is vocabulary-scale
    (≪ corpus) — a broadcastable/AQE-joinable dim.  The corpus size
    enters via a broadcast single-row aggregate, never a driver-side
    collect."""
    df_tab = doc_token_table(docs, text_col).groupBy("token").agg(
        F.count("*").cast("long").alias("df")
    )
    n = docs.agg(F.count("*").cast("double").alias("__n"))
    return df_tab.crossJoin(F.broadcast(n)).select(
        "token",
        "df",
        F.round(
            F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0, 6
        ).alias("idf"),
    )


def idf_weights_sql(docs_from: str, text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`idf_weights` (ln is ≤1-ulp in both
    engines' libm; the 6dp round absorbs that before any downstream
    sum)."""
    tok = doc_token_table_sql(docs_from, text_expr)
    return (
        f"select token, cast(count(*) as bigint) as df, "
        f"round(ln(((select count(*) from {docs_from}) + 1.0) "
        f"/ (count(*) + 1.0)) + 1.0, 6) as idf "
        f"from ({tok}) group by token"
    )


def weighted_jaccard_scores(
    docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    seed: int = 42,
    max_bucket: int = DEDUP_MAX_BUCKET,
) -> DataFrame:
    """(doc_id_a, doc_id_b, token_jaccard, weighted_jaccard) for every
    LSH candidate pair: plain token-set Jaccard beside its IDF-weighted
    form  Σ_{t∈A∩B} idf(t) / Σ_{t∈A∪B} idf(t).

    Boilerplate-heavy near-dups (shared headers/footers of COMMON
    tokens) score lower weighted than plain; pairs sharing rare content
    score higher — the weighting a production dedup pipeline applies
    before thresholding so template reuse does not read as duplication.

    Scale shape: candidates come from the capped+salted LSH buckets
    (never all-pairs); the pair↔token expansion is two equi-joins over
    tokens of CANDIDATE docs only (semi-join restriction, same rationale
    as candidate_jaccard_scores); IDF is the one corpus-wide groupBy and
    joins in as a vocabulary-scale dim (AQE broadcasts when small).  No
    OR-condition joins, no per-pair re-tokenization."""
    cands = lsh_candidate_pairs(
        docs, text_col, bands, rows, seed, max_bucket
    ).localCheckpoint(eager=False)
    tok = doc_token_table(docs, text_col)
    cand_ids = (
        cands.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    tok_c = tok.join(cand_ids, "doc_id", "left_semi")
    ta = cands.join(
        tok_c.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a"
    ).select(
        "doc_id_a", "doc_id_b", "token",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    tb = cands.join(
        tok_c.withColumnRenamed("doc_id", "doc_id_b"), "doc_id_b"
    ).select(
        "doc_id_a", "doc_id_b", "token",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    pt = (
        ta.unionByName(tb)
        .groupBy("doc_id_a", "doc_id_b", "token")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # IDF over the FULL corpus (a corpus statistic), not the candidates
    w = pt.join(idf_weights(docs, text_col), "token")
    both = (F.col("in_a") == 1) & (F.col("in_b") == 1)
    return w.groupBy("doc_id_a", "doc_id_b").agg(
        F.round(
            F.sum(F.when(both, 1.0).otherwise(0.0)) / F.count("*"), 6
        ).alias("token_jaccard"),
        F.round(
            F.sum(F.when(both, F.col("idf")).otherwise(0.0)) / F.sum("idf"), 6
        ).alias("weighted_jaccard"),
    )


def weighted_jaccard_scores_sql(docs_from: str, text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`weighted_jaccard_scores` over an existing
    ``cand`` CTE of (doc_id_a, doc_id_b) — compose after
    ``_lsh_cand_ctes``-style candidate CTEs."""
    tok = doc_token_table_sql(docs_from, text_expr)
    idf = idf_weights_sql(docs_from, text_expr)
    return f"""
tok as materialized ({tok}),
idf as materialized ({idf}),
pt as (select doc_id_a, doc_id_b, token,
              max(in_a) as in_a, max(in_b) as in_b from (
         select c.doc_id_a, c.doc_id_b, t.token, 1 as in_a, 0 as in_b
         from cand c join tok t on t.doc_id = c.doc_id_a
         union all
         select c.doc_id_a, c.doc_id_b, t.token, 0, 1
         from cand c join tok t on t.doc_id = c.doc_id_b)
       group by doc_id_a, doc_id_b, token)
select p.doc_id_a, p.doc_id_b,
       round(sum(case when in_a = 1 and in_b = 1 then 1.0 else 0.0 end)
             / count(*), 6) as token_jaccard,
       round(sum(case when in_a = 1 and in_b = 1 then i.idf else 0.0 end)
             / sum(i.idf), 6) as weighted_jaccard
from pt p join idf i using (token)
group by p.doc_id_a, p.doc_id_b"""


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 56-bit signature over word tokens.  Token
    hashes are materialized once in a prior projection, then the 56 bit
    counters run over the long array (no per-bit re-hashing)."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), F.lit(0))
    )
    hashed = docs.select(
        "doc_id", F.transform(toks, lambda t: h56_col(t)).alias("__h")
    )
    return hashed.select("doc_id", simhash_from_hashes_col(F.col("__h")).alias("simhash"))


def simhash_hamming_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --- incremental near-duplicate detection ------------------------------------
# The dedup analogue of plans/incremental.py: the banded-MinHash index
# (doc_id, band_key) is PERSISTED between batches; a new batch runs the
# shingle→MinHash→band kernels over its OWN documents only, and
# candidate pairs are generated from the delta keys joined against the
# full index — old×old buckets are never re-paired.  Verification
# shingles only the documents appearing in some new candidate pair.
#
# Equivalence contract (proved by the full-recompute oracle): with
# MONOTONE doc ids (every new id sorts after every prior id — the shape
# of any append-only ingest key), the prior batch's verified pairs plus
# this function's output equal the full-corpus near_dup_pairs result
# exactly.  Monotonicity is what keeps over-cap star buckets stable:
# the min-id representative of a bucket never changes when ids only
# grow, so prior star pairs stay valid.  (A new doc CAN become the rep
# of an all-new bucket — handled below.)

def extend_band_index(
    prior_index: DataFrame | None,
    new_docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, band_key) over prior ∪ new docs; kernels on new only."""
    delta = band_key_table(new_docs, text_col, bands, rows, seed)
    if prior_index is None:
        return delta
    return prior_index.select("doc_id", "band_key").unionByName(delta)


def incremental_near_dup_pairs(
    docs: DataFrame,
    prior_index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = DEDUP_MAX_BUCKET,
) -> DataFrame:
    """Verified near-dup pairs involving ≥1 new document.

    docs: the full corpus (consulted only to shingle the candidate
    docs at verification time — in production, a point lookup by id).
    prior_index: committed (doc_id, band_key) table of prior batches.
    """
    # one shared delta feeds both the index union and the pair joins
    # (band_key_table checkpoints lazily, so the MinHash kernel runs
    # once however many consumers read it)
    delta = band_key_table(new_docs, text_col, bands, rows, seed)
    index = (
        prior_index.select("doc_id", "band_key")
        .unionByName(delta)
        .localCheckpoint(eager=False)
    )
    sizes = index.groupBy("band_key").agg(F.count("*").alias("__n"))
    small_keys = delta.join(sizes, "band_key").where(
        F.col("__n") <= max_bucket
    )
    # small buckets: delta members × full bucket (both orders collapse
    # under the a<b normalization; new×new pairs arise from delta×delta)
    small = (
        small_keys.select("band_key", F.col("doc_id").alias("d"))
        .join(index.withColumnRenamed("doc_id", "o"), "band_key")
        .where(F.col("d") != F.col("o"))
        .select(
            F.least("d", "o").alias("doc_id_a"),
            F.greatest("d", "o").alias("doc_id_b"),
        )
    )
    # over-cap buckets: star to the FULL bucket's min-id rep.  Pairs
    # touching the delta: (rep, m) for new members m, plus — when the
    # rep itself is new (an all-new bucket under monotone ids) — the
    # rep against every member.
    reps = index.groupBy("band_key").agg(F.min("doc_id").alias("rep"))
    hot = sizes.where(F.col("__n") > max_bucket).join(reps, "band_key")
    star_new_member = (
        delta.join(hot, "band_key")
        .where(F.col("doc_id") != F.col("rep"))
        .select(
            F.least("doc_id", "rep").alias("doc_id_a"),
            F.greatest("doc_id", "rep").alias("doc_id_b"),
        )
    )
    new_ids = new_docs.select("doc_id").distinct()
    star_new_rep = (
        hot.join(
            new_ids.withColumnRenamed("doc_id", "rep"), "rep", "left_semi"
        )
        .join(index.withColumnRenamed("doc_id", "m"), "band_key")
        .where(F.col("m") != F.col("rep"))
        .select(
            F.least("m", "rep").alias("doc_id_a"),
            F.greatest("m", "rep").alias("doc_id_b"),
        )
    )
    cands = (
        small.unionByName(star_new_member)
        .unionByName(star_new_rep)
        .distinct()
        .localCheckpoint(eager=False)
    )
    # candidate-restricted verification (the incremental path is BUILT
    # for the regime where candidates ≪ corpus, so always restrict)
    cand_ids = (
        cands.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", token_shingles_col(F.col(text_col)).alias("__sh"))
        .localCheckpoint(eager=False)
    )
    j = cands.join(
        sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed(
            "__sh", "sh_a"
        ),
        "doc_id_a",
    ).join(
        sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed(
            "__sh", "sh_b"
        ),
        "doc_id_b",
    )
    return j.select(
        "doc_id_a",
        "doc_id_b",
        ngram_jaccard_from_arrays_col(F.col("sh_a"), F.col("sh_b")).alias(
            "jaccard"
        ),
    ).where(F.col("jaccard") >= threshold)


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
    token_re: str = r"[a-z]+",
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document —
    the span-granular training-data dedup report (cf. Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": exact
    substring dedup via suffix arrays; here the distributed surrogate
    is positional word n-grams + document frequency + island merge,
    which finds every duplicated region of ≥ n tokens).

    Pipeline, all linear in corpus tokens (no pairs, no suffix array):
      1. positional word n-grams per doc — (doc_id, pos, gram);
      2. gram document frequency (one map-side-combinable groupBy on
         the gram key), keep grams in ≥ min_df distinct docs;
      3. back-join flagged grams to their positions (key-equi join on
         gram — the only shuffle of corpus-scale rows);
      4. gaps-and-islands per doc: consecutive flagged positions with
         gap ≤ n merge into one maximal span (a window over the doc
         key — same partitioning every per-doc stage uses).

    Returns (doc_id, span_start, span_end, n_grams): 1-based token
    offsets, end inclusive, and the number of flagged grams merged
    into the span.  A doc with no duplicated region emits no rows.
    """
    grams = gram_index(docs, text_col, n, token_re)
    grams = grams.localCheckpoint(eager=False)  # feeds df agg + back-join
    df_tab = grams.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("__df")
    )
    flagged = grams.join(
        df_tab.where(F.col("__df") >= min_df).select("gram"),
        "gram",
        "left_semi",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = flagged.withColumn(
        "__new",
        F.when(
            F.col("pos") - F.lag("pos", 1).over(w) <= n, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__isl", F.sum("__new").over(w))
    return (
        isl.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def gram_index(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    token_re: str = r"[a-z]+",
) -> DataFrame:
    """(doc_id, pos, gram) — the positional-gram table
    :func:`duplicated_spans` is built on, exposed so it can be
    committed and extended per batch (kernels run over the given docs
    only; union with a prior committed index for the cumulative one)."""
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(token_re), F.lit(0)
        ).alias("__toks"),
    )
    return toks.where(F.size("__toks") >= n).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)),
            )
        ).alias("__p0", "gram"),
    ).select("doc_id", (F.col("__p0") + 1).alias("pos"), "gram")


def extend_gram_df(
    prior_df: DataFrame | None, delta_index: DataFrame
) -> DataFrame:
    """(gram, df) over prior ∪ delta — the committed document-frequency
    state :func:`incremental_duplicated_spans` reads via ``prior_df``.
    Exact under append-only ingest with fresh doc ids (disjoint doc
    sets): df adds.  ``None`` starts from scratch."""
    d = delta_index.groupBy("gram").agg(
        F.count_distinct("doc_id").cast("long").alias("__d")
    )
    if prior_df is None:
        return d.select("gram", F.col("__d").alias("df"))
    return (
        prior_df.select("gram", F.col("df").cast("long").alias("__p"))
        .join(d, "gram", "full_outer")
        .select(
            "gram",
            (
                F.coalesce(F.col("__p"), F.lit(0))
                + F.coalesce(F.col("__d"), F.lit(0))
            ).alias("df"),
        )
    )


def incremental_duplicated_spans(
    prior_index: DataFrame,
    prior_spans: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
    token_re: str = r"[a-z]+",
    prior_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Maintain the duplicated-span report under append-only ingest —
    returns ``(new_index, spans)`` with ``spans`` exactly equal to the
    full recompute over prior ∪ new docs.

    The gram kernels run over the NEW docs only; the subtlety deletion
    never has is that appending can FLIP a gram over the df threshold,
    which changes the span report of OLD documents containing it.  So:

    * df is re-aggregated over the unioned index (one map-side-
      combinable groupBy on the gram key — the same vocabulary-scale
      aggregate the incremental near-dup path pays per batch);
    * touched docs = new docs ∪ old docs containing a NEWLY-flagged
      gram (df crossed min_df this batch — under append-only ingest df
      is monotone, so no gram ever unflags and untouched docs' flagged
      position sets are provably unchanged);
    * the island merge reruns for touched docs only, reading their
      positions from the committed index (never re-tokenizing old
      text); prior spans pass through for everyone else.

    prior_df: the committed (gram, df) table from the previous batch
    (distinct-doc counts).  With it, the per-batch df cost drops from
    re-aggregating the FULL positional index to aggregating the
    delta's grams plus one join of two pre-aggregated vocabulary
    tables (measured at 600 k docs / 1.7 % delta: full rebuild 71 s,
    recount-incremental 8.4 s, committed-df incremental 3.9 s — see
    BENCH.md §5d).  Exact because batches are append-only with fresh
    doc ids (prior and delta doc sets disjoint — the same monotone-id
    contract the incremental near-dup path documents), so
    df = df_prior + df_delta per gram.  ``None`` recomputes df from
    the index (no extra state to commit).  Maintain it per batch as
    ``extend_gram_df(prior_df, delta_df)`` — aggregate the returned
    index's delta once and merge.
    """
    prior_index = prior_index.select("doc_id", "pos", "gram")
    delta = gram_index(new_docs, text_col, n, token_re).localCheckpoint(
        eager=False
    )
    index = prior_index.unionByName(delta).localCheckpoint(eager=False)
    if prior_df is None:
        df_old = prior_index.groupBy("gram").agg(
            F.count_distinct("doc_id").alias("__dfo")
        )
    else:
        df_old = prior_df.select(
            "gram", F.col("df").cast("long").alias("__dfo")
        )
    df_delta = delta.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("__dfd")
    )
    df_new = (
        df_old.join(df_delta, "gram", "full_outer")
        .select(
            "gram",
            (
                F.coalesce(F.col("__dfo"), F.lit(0))
                + F.coalesce(F.col("__dfd"), F.lit(0))
            ).alias("__dfn"),
            F.coalesce(F.col("__dfo"), F.lit(0)).alias("__dfo"),
        )
        .localCheckpoint(eager=False)
    )
    flagged_grams = df_new.where(F.col("__dfn") >= min_df).select("gram")
    newly = df_new.where(
        (F.col("__dfn") >= min_df) & (F.col("__dfo") < min_df)
    ).select("gram")
    touched = (
        prior_index.join(newly, "gram", "left_semi")
        .select("doc_id")
        .unionByName(new_docs.select("doc_id"))
        .distinct()
    )
    flagged_pos = (
        index.join(touched, "doc_id", "left_semi")
        .join(flagged_grams, "gram", "left_semi")
        .select("doc_id", "pos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = flagged_pos.withColumn(
        "__new",
        F.when(
            F.col("pos") - F.lag("pos", 1).over(w) <= n, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__isl", F.sum("__new").over(w))
    recomputed = (
        isl.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )
    kept = prior_spans.select(
        "doc_id", "span_start", "span_end", "n_grams"
    ).join(touched, "doc_id", "left_anti")
    return index, kept.unionByName(recomputed)


def duplicated_spans_sql(
    docs_from: str,
    text_expr: str = "text",
    n: int = 3,
    min_df: int = 2,
    token_re: str = "[a-z]+",
) -> str:
    """DuckDB mirror of :func:`duplicated_spans` (full statement)."""
    return f"""
with toks as (
  select doc_id,
         regexp_extract_all(lower({text_expr}), '{token_re}') as t
  from {docs_from}),
grams as materialized (
  select doc_id, u.pos,
         array_to_string(t[u.pos : u.pos + {n} - 1], ' ') as gram
  from toks, unnest(range(1, len(t) - {n} + 2)) as u(pos)
  where len(t) >= {n}),
dfq as (select gram from grams
        group by gram having count(distinct doc_id) >= {min_df}),
flagged as (select g.doc_id, g.pos from grams g
            join dfq using (gram)),
isl as (select doc_id, pos,
               case when pos - lag(pos) over
                      (partition by doc_id order by pos) <= {n}
                    then 0 else 1 end as newf
        from flagged),
grp as (select doc_id, pos,
               sum(newf) over (partition by doc_id order by pos
                               rows unbounded preceding) as isl_id
        from isl)
select doc_id, min(pos) as span_start,
       max(pos) + {n} - 1 as span_end,
       cast(count(*) as bigint) as n_grams
from grp group by doc_id, isl_id
"""


def retract_near_dup_pairs(
    docs: DataFrame,
    prior_index: DataFrame,
    prior_pairs: DataFrame,
    removed: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = DEDUP_MAX_BUCKET,
) -> DataFrame:
    """Verified near-dup pairs after DELETING ``removed`` docs — the
    retraction half of index incrementality (GDPR erasure / source
    retraction), exactly equal to the full recompute over the
    surviving corpus (the oracle proves it by hash).

    No kernel (shingle/MinHash) ever runs over old docs: band keys are
    READ from the committed index, prior verified pairs are kept when
    both endpoints survive, and fresh candidate generation is confined
    to the DIRTY buckets deletion can actually change:

    * a bucket that was over the hot cap and shrinks to ≤ cap flips
      from star pairing back to all-pairs — regenerate all pairs among
      its survivors;
    * a hot bucket whose min-id representative was deleted re-stars to
      the new min survivor — regenerate its star pairs.

    Every other bucket's surviving pairs are unchanged (sizes only
    shrink, so small stays small and a surviving rep stays the rep).
    Only regenerated candidates not already kept are re-verified, so
    verification shingles touch the dirty buckets' members only.

    docs: the corpus including removed rows (only surviving candidate
    docs are shingled — in production, a point lookup by id).
    prior_index: committed (doc_id, band_key) rows (removed included).
    prior_pairs: the prior run's verified (doc_id_a, doc_id_b,
    jaccard) at the SAME threshold and max_bucket.
    """
    removed_ids = removed.select("doc_id").distinct().localCheckpoint(
        eager=False
    )
    surv = prior_index.select("doc_id", "band_key").join(
        removed_ids, "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    before = prior_index.groupBy("band_key").agg(
        F.count("*").alias("__n0"), F.min("doc_id").alias("__rep0")
    )
    after = surv.groupBy("band_key").agg(
        F.count("*").alias("__n1"), F.min("doc_id").alias("__rep1")
    )
    # inner join: a bucket with no survivors vanished and has no pairs
    dirty = (
        before.join(after, "band_key")
        .where(
            (F.col("__n0") > max_bucket)
            & (
                (F.col("__n1") <= max_bucket)
                | (F.col("__rep0") != F.col("__rep1"))
            )
        )
        .select("band_key", "__n1", "__rep1")
        .localCheckpoint(eager=False)
    )
    kept = (
        prior_pairs.select("doc_id_a", "doc_id_b", "jaccard")
        .join(
            removed_ids.withColumnRenamed("doc_id", "doc_id_a"),
            "doc_id_a",
            "left_anti",
        )
        .join(
            removed_ids.withColumnRenamed("doc_id", "doc_id_b"),
            "doc_id_b",
            "left_anti",
        )
        .localCheckpoint(eager=False)
    )
    small_m = surv.join(
        dirty.where(F.col("__n1") <= max_bucket).select("band_key"),
        "band_key",
    )
    small_pairs = (
        small_m.alias("a")
        .join(small_m.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    hot_pairs = (
        surv.join(
            dirty.where(F.col("__n1") > max_bucket).select(
                "band_key", "__rep1"
            ),
            "band_key",
        )
        .where(F.col("doc_id") != F.col("__rep1"))
        .select(
            F.least("doc_id", "__rep1").alias("doc_id_a"),
            F.greatest("doc_id", "__rep1").alias("doc_id_b"),
        )
    )
    cands = (
        small_pairs.unionByName(hot_pairs)
        .distinct()
        .join(kept.select("doc_id_a", "doc_id_b"),
              ["doc_id_a", "doc_id_b"], "left_anti")
        .localCheckpoint(eager=False)
    )
    cand_ids = (
        cands.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        docs.join(removed_ids, "doc_id", "left_anti")
        .join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", token_shingles_col(F.col(text_col)).alias("__sh"))
        .localCheckpoint(eager=False)
    )
    fresh = (
        cands.join(
            sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed(
                "__sh", "sh_a"
            ),
            "doc_id_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed(
                "__sh", "sh_b"
            ),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            ngram_jaccard_from_arrays_col(
                F.col("sh_a"), F.col("sh_b")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return kept.unionByName(fresh)


# --- exact set-similarity join via prefix filtering -----------------------------
# Vernica, Carey & Li (SIGMOD 2010): the LOSSLESS counterpart to the
# MinHash-LSH path.  Order each document's distinct tokens by global
# document frequency ascending (rarest first); if J(A, B) ≥ τ the two
# documents MUST share a token within their first
#     p = |d| − ⌈τ·|d|⌉ + 1
# tokens under any consistent global order (prefix-filtering
# principle), so joining on prefix tokens only generates a candidate
# superset with zero false negatives — and the df-ascending order makes
# those prefixes the RAREST tokens, keeping the self-join's per-token
# groups small by construction (the same Zipf argument as rarest-token
# blocking; AQE skew-join covers the residue).
#
# Verification is exact: shared-token counts via two equi-joins over
# the token table (semi-join-restricted to candidate docs), never
# per-pair re-tokenization, never all-pairs.
def prefix_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", tau: float = 0.6, n: int = 3
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_shared, jaccard) — every pair with
    shingle-set Jaccard ≥ τ, exactly (no LSH loss).  The set unit is
    the token n-gram shingle (same universe as the MinHash path), not
    the bare word token: order-sensitive shingles discriminate where a
    small word vocabulary cannot."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id",
        F.explode(token_shingles_col(F.col(text_col), n)).alias("token"),
    ).localCheckpoint(eager=False)
    df = tok.groupBy("token").agg(F.count("*").alias("df"))
    sz = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("token").asc()
    )
    prefix = (
        tok.join(df, "token")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, "doc_id")
        .where(
            F.col("rn")
            <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
        )
        .select("doc_id", "token")
    )
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand_ids = (
        cands.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    tok_c = tok.join(cand_ids, "doc_id", "left_semi")
    shared = (
        cands.join(
            tok_c.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a"
        )
        .join(
            tok_c.withColumnRenamed("doc_id", "doc_id_b"),
            ["doc_id_b", "token"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("sa"))
    sb = sz.select(F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("sb"))
    jac = F.col("n_shared").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared",
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )


def prefix_jaccard_pairs_sql(
    docs_from: str, text_expr: str = "text", tau: float = 0.6, n: int = 3
) -> str:
    """Brute-force all-pairs DuckDB oracle for
    :func:`prefix_jaccard_pairs` — deliberately structure-free (joins
    every shingle-sharing pair, no prefix), so a hash match PROVES the
    prefix filter lossless at fixture scale."""
    tok = (
        f"select doc_id, unnest({token_shingles_sql(text_expr, n)}) "
        f"as token from {docs_from}"
    )
    return f"""
with tok as materialized ({tok}),
sz as (select doc_id, cast(count(*) as bigint) as sz
       from tok group by doc_id),
shared as (select a.doc_id as doc_id_a, b.doc_id as doc_id_b,
                  cast(count(*) as bigint) as n_shared
           from tok a join tok b
             on a.token = b.token and a.doc_id < b.doc_id
           group by a.doc_id, b.doc_id)
select doc_id_a, doc_id_b, n_shared,
       round(cast(n_shared as double)
             / cast(sa.sz + sb.sz - n_shared as double), 6) as jaccard
from shared
join sz sa on sa.doc_id = doc_id_a
join sz sb on sb.doc_id = doc_id_b
where round(cast(n_shared as double)
            / cast(sa.sz + sb.sz - n_shared as double), 6) >= {tau}
"""


# --- content-defined chunking dedup --------------------------------------------
# Storage-style dedup at the byte level (Muthitacharoen et al., LBFS
# SOSP'01): chunk boundaries are declared wherever a hash of the
# trailing w-char window hits 0 mod a divisor, so boundaries depend
# only on LOCAL content — insert or delete a sentence and every chunk
# outside the edited region keeps its identity, which fixed-size
# chunking cannot do.  Cross-document shared-chunk counting then finds
# partially-overlapping documents (quoted passages, re-crawled pages
# with injected boilerplate, concatenated shards) that whole-document
# hashing misses and shingle-Jaccard only detects once most of the doc
# matches.
#
# The window hash is the repo's h56 (first-14-hex md5) so the DuckDB
# oracle re-derives identical boundaries from the parquet alone; a
# production deployment would swap in a rolling Gear/Rabin hash (the
# kernel recomputes a tiny w-char digest per position — same linear
# shape, ~constant-factor faster), which changes only `_cdc_h56` below.

CDC_WINDOW, CDC_DIVISOR = 8, 24
CDC_MAX_DOCS, CDC_THRESHOLD = 100, 0.5


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_len, chunk_hash): the
    content-defined chunking of every document — one Arrow pass over
    the corpus (mapInPandas), shuffle-free and linear in total bytes,
    the same flat-kernel shape as mention extraction.  Cut rule: after
    1-based position i ∈ [w, n] iff h56(text[i-w+1 .. i]) % divisor
    == 0; chunk k spans (bounds[k], bounds[k+1]] for bounds =
    [0] + cuts (+ [n] unless the last cut is already n).  Documents
    shorter than the window yield one whole-doc chunk; NULL/empty text
    yields no rows (both engines)."""
    import hashlib

    from pyspark.sql import types as T

    import pandas as pd

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("chunk_start", T.LongType()),
        T.StructField("chunk_len", T.LongType()),
        T.StructField("chunk_hash", T.LongType()),
    ])
    w, div = window, divisor

    def _cdc_h56(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "chunk_idx", "chunk_start", "chunk_len",
                    "chunk_hash")}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(text) == 0:
                    continue
                n = len(text)
                cuts = [
                    i for i in range(w, n + 1)
                    if _cdc_h56(text[i - w:i]) % div == 0
                ]
                bounds = [0] + cuts
                if not cuts or cuts[-1] != n:
                    bounds.append(n)
                for k in range(len(bounds) - 1):
                    s0, e0 = bounds[k], bounds[k + 1]
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(k)
                    out["chunk_start"].append(s0 + 1)
                    out["chunk_len"].append(e0 - s0)
                    out["chunk_hash"].append(_cdc_h56(text[s0:e0]))
            yield pd.DataFrame(out)

    flat = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return flat.mapInPandas(gen, schema)


def cdc_chunks_sql(
    docs_from: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> str:
    """DuckDB CTE block ending in ``cdcchunks`` — boundary-identical to
    ``cdc_chunks`` (same h56 window hash, same bounds assembly)."""
    w, div = window, divisor
    wh = h56_sql(f"substr(text, i - {w - 1}, {w})")
    ch = h56_sql("substr(text, bs[k] + 1, bs[k+1] - bs[k])")
    return f"""
cdcdocs as (select {id_expr}::bigint as doc_id, {text_expr} as text,
                   length({text_expr}) as n
            from {docs_from}
            where {text_expr} is not null and length({text_expr}) > 0),
cdcpos as (select doc_id, text, n, unnest(range({w}, n + 1)) as i
           from cdcdocs),
cdccuts as (select doc_id, i from cdcpos where {wh} % {div} = 0),
cdccl as (select doc_id, list_sort(list(i)) as cs from cdccuts
          group by doc_id),
cdcb as (select doc_id, text, n,
         case when len(cs) > 0 and cs[len(cs)] = n
              then list_prepend(0, cs)
              else list_append(list_prepend(0, cs), n) end as bs
         from (
           -- coalesce AFTER the left join: a no-cut doc has no cdccl
           -- row at all, so its cs is NULL here — without this the
           -- whole-doc-chunk case would lean on DuckDB's undocumented
           -- list_prepend(0, NULL) = [0] behavior
           select d.doc_id, d.text, d.n,
                  coalesce(c0.cs, cast([] as bigint[])) as cs
           from cdcdocs d left join cdccl c0 using (doc_id))
         ),
cdcchunks as (select doc_id,
              cast(k - 1 as bigint) as chunk_idx,
              cast(bs[k] + 1 as bigint) as chunk_start,
              cast(bs[k+1] - bs[k] as bigint) as chunk_len,
              {ch} as chunk_hash
              from (select *, unnest(range(1, len(bs))) as k from cdcb))
"""


def cdc_pairs(
    chunks: DataFrame,
    max_docs: int = CDC_MAX_DOCS,
    threshold: float = CDC_THRESHOLD,
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_shared, overlap): document pairs sharing
    ≥ threshold of the smaller side's DISTINCT chunk hashes.  Chunk
    hashes shared by more than ``max_docs`` documents are dropped
    before the self-join (boilerplate guard AND the scale cap — the
    DEDUP_MAX_BUCKET rule applied to chunks), so no hash group ever
    goes quadratic; everything else is one groupBy + one equi-join on
    chunk_hash, the bucketed shape that survives 100 TB."""
    hd = chunks.select("chunk_hash", "doc_id").distinct()
    sz = hd.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_chunks"))
    keep = (
        hd.groupBy("chunk_hash")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") <= max_docs)
        .select("chunk_hash")
    )
    k = hd.join(keep, "chunk_hash")
    pairs = (
        k.select(F.col("doc_id").alias("doc_id_a"), "chunk_hash")
        .join(
            k.select(F.col("doc_id").alias("doc_id_b"), "chunk_hash"),
            "chunk_hash",
        )
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    out = (
        pairs.join(
            sz.select(F.col("doc_id").alias("doc_id_a"),
                      F.col("n_chunks").alias("na")),
            "doc_id_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_id_b"),
                      F.col("n_chunks").alias("nb")),
            "doc_id_b",
        )
        .withColumn(
            "ov",
            F.col("n_shared") * F.lit(1.0) / F.least(F.col("na"), F.col("nb")),
        )
        .where(F.col("ov") >= threshold)
    )
    return out.select(
        "doc_id_a", "doc_id_b", "n_shared",
        F.round(F.col("ov"), 6).alias("overlap"),
    )


def cdc_pairs_sql(
    docs_from: str = "documents",
    max_docs: int = CDC_MAX_DOCS,
    threshold: float = CDC_THRESHOLD,
) -> str:
    """Full statement mirroring cdc_chunks → cdc_pairs."""
    return f"""
with {cdc_chunks_sql(docs_from)},
cdchd as (select distinct chunk_hash, doc_id from cdcchunks),
cdcsz as (select doc_id, cast(count(*) as bigint) as n_chunks from cdchd
          group by doc_id),
cdckeep as (select chunk_hash from cdchd group by chunk_hash
            having count(*) <= {max_docs}),
cdck as (select h.chunk_hash, h.doc_id from cdchd h
         join cdckeep using (chunk_hash)),
cdcpairs as (select a.doc_id as doc_id_a, b.doc_id as doc_id_b,
                    cast(count(*) as bigint) as n_shared
             from cdck a join cdck b
                  on a.chunk_hash = b.chunk_hash
                 and a.doc_id < b.doc_id
             group by 1, 2)
select p.doc_id_a, p.doc_id_b, p.n_shared,
       round(p.n_shared * 1.0 / least(sa.n_chunks, sb.n_chunks), 6)
           as overlap
from cdcpairs p
     join cdcsz sa on sa.doc_id = p.doc_id_a
     join cdcsz sb on sb.doc_id = p.doc_id_b
where p.n_shared * 1.0 / least(sa.n_chunks, sb.n_chunks) >= {threshold}
"""


# --- asymmetric containment join -----------------------------------------------
# C(A,B) = |S(A) ∩ S(B)| / |S(A)| over distinct token shingles — the
# quote/inclusion detector: a short document pasted inside a long one
# has high containment but LOW Jaccard, so the MinHash/prefix Jaccard
# paths structurally miss it (their band collision probability decays
# with the size ratio).  Candidate generation is the R-S variant of
# prefix filtering: only the CONTAINED side prunes to its
# ⌊(1−τ)·|A|⌋+1 globally-rarest shingles (any supra-τ containment must
# share one of them — the pigeonhole bound), the container side is the
# full shingle index df-capped at ``max_df`` (a contained doc whose
# whole prefix is boilerplate-frequent is the documented recall
# cutoff, exactly the hot-key discipline every family here uses).
# Threshold arithmetic is pure integers (τ = num/den), so both engines
# agree exactly on boundary sizes.

CONT_TAU_NUM, CONT_TAU_DEN = 4, 5  # τ = 0.8
CONT_MAX_DF = 100


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    tau_num: int = CONT_TAU_NUM,
    tau_den: int = CONT_TAU_DEN,
    n: int = 3,
    max_df: int = CONT_MAX_DF,
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_shared, containment): directed pairs with
    containment(A in B) ≥ τ, A ≠ B.  One df aggregate, one prefix
    window per doc, one equi-join on shingle, one grouped verify —
    never an all-pairs product."""
    from pyspark.sql import Window

    tok = (
        docs.select(
            "doc_id",
            F.explode(token_shingles_col(F.col(text_col), n)).alias("token"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    df = tok.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    sz = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("token").asc()
    )
    # ⌊(1−τ)·sz⌋+1 = sz − ⌈τ·sz⌉ + 1, with ⌈num·sz/den⌉ as exact
    # integer floor((num·sz + den − 1)/den)
    keep_n = (
        F.col("sz")
        - F.floor(
            (F.lit(tau_num) * F.col("sz") + F.lit(tau_den - 1))
            / F.lit(tau_den)
        )
        + 1
    )
    prefix = (
        tok.join(df, "token")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, "doc_id")
        .where(F.col("rn") <= keep_n)
        .where(F.col("df") <= max_df)
        .select("doc_id", "token")
    )
    idx = tok.join(
        df.where(F.col("df") <= max_df).select("token"), "token"
    )
    cands = (
        prefix.select(F.col("doc_id").alias("doc_id_a"), "token")
        .join(
            idx.select(F.col("doc_id").alias("doc_id_b"), "token"), "token"
        )
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    shared = (
        cands.join(
            tok.select(F.col("doc_id").alias("doc_id_a"), "token"),
            "doc_id_a",
        )
        .join(
            tok.select(F.col("doc_id").alias("doc_id_b"), "token"),
            ["doc_id_b", "token"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    out = shared.join(
        sz.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("sza")),
        "doc_id_a",
    ).where(
        F.col("n_shared") * tau_den >= F.col("sza") * tau_num
    )
    return out.select(
        "doc_id_a", "doc_id_b", "n_shared",
        F.round(
            F.col("n_shared") * F.lit(1.0) / F.col("sza"), 6
        ).alias("containment"),
    )


def containment_pairs_sql(
    docs_from: str = "documents",
    text_expr: str = "text",
    tau_num: int = CONT_TAU_NUM,
    tau_den: int = CONT_TAU_DEN,
    n: int = 3,
    max_df: int = CONT_MAX_DF,
) -> str:
    """Full-statement DuckDB mirror of ``containment_pairs``."""
    sh = token_shingles_sql(text_expr, n)
    return f"""
with ctok as materialized (
  select distinct doc_id, unnest({sh}) as token from {docs_from}),
cdf as (select token, cast(count(*) as bigint) as df from ctok
        group by token),
csz as (select doc_id, cast(count(*) as bigint) as sz from ctok
        group by doc_id),
cpfx as (select doc_id, token from (
         select t.doc_id, t.token, d.df, s.sz,
                row_number() over (partition by t.doc_id
                     order by d.df asc, t.token asc) as rn
         from ctok t join cdf d using (token) join csz s using (doc_id))
         where rn <= sz - floor(({tau_num} * sz + {tau_den - 1})
                                / {tau_den}) + 1
           and df <= {max_df}),
cidx as (select t.doc_id, t.token from ctok t
         join cdf d using (token) where d.df <= {max_df}),
ccand as (select distinct p.doc_id as doc_id_a, i.doc_id as doc_id_b
          from cpfx p join cidx i using (token)
          where p.doc_id <> i.doc_id),
cshared as (select c.doc_id_a, c.doc_id_b,
                   cast(count(*) as bigint) as n_shared
            from ccand c
                 join ctok ta on ta.doc_id = c.doc_id_a
                 join ctok tb on tb.doc_id = c.doc_id_b
                              and tb.token = ta.token
            group by c.doc_id_a, c.doc_id_b)
select s.doc_id_a, s.doc_id_b, s.n_shared,
       round(s.n_shared * 1.0 / z.sz, 6) as containment
from cshared s join csz z on z.doc_id = s.doc_id_a
where s.n_shared * {tau_den} >= z.sz * {tau_num}
"""


def extend_chunk_index(
    prior_index: DataFrame | None,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Chunk rows over prior ∪ new docs; the chunking kernel runs on
    NEW docs only (chunking is a pure per-doc function — committed
    rows never change), the extend_band_index discipline."""
    delta = cdc_chunks(new_docs, text_col, id_col, window, divisor)
    if prior_index is None:
        return delta
    return prior_index.select(*delta.columns).unionByName(delta)


def incremental_cdc_pairs(
    prior_index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    max_docs: int = CDC_MAX_DOCS,
    threshold: float = CDC_THRESHOLD,
) -> DataFrame:
    """Shared-chunk pairs involving ≥1 new document, against the
    committed chunk index — per-batch cost proportional to the delta:
    only new docs are chunked, candidates come from the new docs' kept
    hashes probing the index, and the verify counts run over those
    candidates only.  Unioned with the prior batch's pairs this equals
    the full recompute (old×old shared counts never change when docs
    are ADDED; a chunk hash crossing the df cap between batches is the
    retraction/compaction path's business, same caveat as the band
    index).  No full-corpus kernel, no all-pairs product."""
    delta = cdc_chunks(new_docs, text_col, id_col, window, divisor)
    index = (
        prior_index.select("doc_id", "chunk_hash")
        .unionByName(delta.select("doc_id", "chunk_hash"))
        .localCheckpoint(eager=False)
    )
    hd = index.distinct().localCheckpoint(eager=False)
    sz = hd.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_chunks"))
    keep = (
        hd.groupBy("chunk_hash")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") <= max_docs)
        .select("chunk_hash")
    )
    k = hd.join(keep, "chunk_hash")
    new_ids = new_docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    kn = k.join(new_ids, "doc_id", "left_semi")
    cands = (
        kn.select(F.col("doc_id").alias("d"), "chunk_hash")
        .join(k.select(F.col("doc_id").alias("o"), "chunk_hash"), "chunk_hash")
        .where(F.col("d") != F.col("o"))
        .select(
            F.least("d", "o").alias("doc_id_a"),
            F.greatest("d", "o").alias("doc_id_b"),
        )
        .distinct()
    )
    shared = (
        cands.join(
            k.select(F.col("doc_id").alias("doc_id_a"), "chunk_hash"),
            "doc_id_a",
        )
        .join(
            k.select(F.col("doc_id").alias("doc_id_b"), "chunk_hash"),
            ["doc_id_b", "chunk_hash"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    out = (
        shared.join(
            sz.select(F.col("doc_id").alias("doc_id_a"),
                      F.col("n_chunks").alias("na")),
            "doc_id_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_id_b"),
                      F.col("n_chunks").alias("nb")),
            "doc_id_b",
        )
        .withColumn(
            "ov",
            F.col("n_shared") * F.lit(1.0) / F.least(F.col("na"), F.col("nb")),
        )
        .where(F.col("ov") >= threshold)
    )
    return out.select(
        "doc_id_a", "doc_id_b", "n_shared",
        F.round(F.col("ov"), 6).alias("overlap"),
    )
