"""Deterministic text classifiers + text-quality statistics.

The reference's language/categories/sentiment processors call a remote
NLP service and keep the top-1 result (``LanguageProcessor.java:66``,
``CategoriesProcessor.java:66``, ``SentimentProcessor.java:67``).  Our
deterministic stand-ins are marker-lexicon counters with an
argmax-by-count (ties → earlier label wins), built as pure Spark
column expressions with exact DuckDB mirrors so the driver oracle can
verify them.  Output labels keep the reference's shapes: ISO 639-3
codes, IAB-style category labels, pos/neg/neu.

Also: token counting, quality scoring, and rolling-hash document
fingerprints for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- marker lexicons ---------------------------------------------------------
LANG_MARKERS: list[tuple[str, str]] = [
    # (ISO 639-3 label, RE2+Java-regex-compatible pattern over lower(text))
    ("eng", r"\b(the|and|is|of|this|that|very|with|for)\b"),
    ("spa", r"\b(el|la|los|las|de|que|es|una|y|en)\b"),
    ("deu", r"\b(der|die|das|und|ist|ein|nicht|mit)\b"),
    ("fra", r"\b(le|les|et|est|une|dans|pour|sur)\b"),
    ("rus", r"[а-яё]{2,}"),
    ("jpn", r"[ぁ-んァ-ヺ一-龯]"),
]

SENT_POS = (
    r"\b(love|great|good|excellent|happy|win|best|amazing|fast"
    r"|praised|pleased|delighted|magnificent)\b"
)
SENT_NEG = r"\b(hate|hated|bad|terrible|awful|lose|worst|sad|slow)\b"

CATEGORY_KEYWORDS: list[tuple[str, str]] = [
    ("SPORTS", r"\b(game|team|match|score|league|champion|tournament|sports?)\b"),
    ("TECHNOLOGY_AND_COMPUTING",
     r"\b(computer|software|data|spark|query|vector|hash|table|stream|batch)\b"),
    ("BUSINESS", r"\b(market|company|stock|trade|customer|order|price)\b"),
    ("ENTERTAINMENT", r"\b(film|movie|actor|music|show|series)\b"),
]

STOPWORDS = "the and is of this that very with for a an to in on at".split()

# BPE-ish token pattern: words, numbers, or single non-space symbols
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)))


def _count_sql(expr: str, pattern: str) -> str:
    esc = pattern.replace("'", "''")
    return f"len(regexp_extract_all(lower({expr}), '{esc}'))"


def argmax_label_col(c: Column, table: list[tuple[str, str]]) -> Column:
    """Label with the max marker count; ties → earlier entry; all-zero → null.

    Shape matters: each marker count appears exactly ONCE, inside an
    array of (count, -position, label) structs whose lexicographic
    array_max IS the argmax (ties → larger -position → earlier label).
    The previous >=-chain inlined every count into every other label's
    condition — O(labels²) regex sub-expressions blew the generated
    processNext() past janino's 64 KB method limit and dropped the
    whole stage to interpreted evaluation.  The DuckDB mirror keeps the
    chain form (DuckDB has no codegen limit); values are identical."""
    structs = [
        F.struct(
            _count(c, pat).alias("c"),
            F.lit(-i).alias("o"),
            F.lit(label).alias("l"),
        )
        for i, (label, pat) in enumerate(table)
    ]
    best = F.array_max(F.array(*structs))
    return F.when(best["c"] > 0, best["l"])


def argmax_label_sql(expr: str, table: list[tuple[str, str]]) -> str:
    counts = [(label, _count_sql(expr, pat)) for label, pat in table]
    total = " + ".join(c for _, c in counts)
    whens = []
    for i, (label, cnt) in enumerate(counts):
        conds = []
        for j, (_, other) in enumerate(counts):
            if j == i:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{cnt} {op} {other}")
        whens.append(f"when {' and '.join(conds)} then '{label}'")
    chain = " ".join(whens)
    return f"case when ({total}) > 0 then (case {chain} end) end"


def detect_language_col(c: Column) -> Column:
    return argmax_label_col(c, LANG_MARKERS)


def detect_language_sql(expr: str) -> str:
    return argmax_label_sql(expr, LANG_MARKERS)


def categorize_col(c: Column) -> Column:
    return argmax_label_col(c, CATEGORY_KEYWORDS)


def categorize_sql(expr: str) -> str:
    return argmax_label_sql(expr, CATEGORY_KEYWORDS)


def sentiment_col(c: Column) -> Column:
    """pos/neg/neu from lexicon counts (reference labels,
    ``SentimentProcessor.java:67`` + fixture ``sentiment_response.json``)."""
    p, n = _count(c, SENT_POS), _count(c, SENT_NEG)
    return (
        F.when(p > n, F.lit("pos"))
        .when(n > p, F.lit("neg"))
        .otherwise(F.lit("neu"))
    )


def sentiment_py(s: str) -> str:
    """Python mirror of sentiment_col/_sql.  ``re.ASCII`` pins ``\\b``
    to ASCII word characters, matching Java regex (Spark's default) and
    RE2 (DuckDB) — Python's default unicode ``\\b`` would treat e.g.
    'ё' as a word char and miss a boundary the other engines see."""
    import re

    low = (s or "").lower()
    p = len(re.findall(SENT_POS, low, re.ASCII))
    n = len(re.findall(SENT_NEG, low, re.ASCII))
    return "pos" if p > n else ("neg" if n > p else "neu")


def sentiment_sql(expr: str) -> str:
    p, n = _count_sql(expr, SENT_POS), _count_sql(expr, SENT_NEG)
    return (
        f"case when {p} > {n} then 'pos' "
        f"when {n} > {p} then 'neg' else 'neu' end"
    )


# --- training-data text statistics -------------------------------------------
def token_count_col(c: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))).cast("long")


def token_count_sql(expr: str) -> str:
    return f"cast({_count_sql(expr, TOKEN_PATTERN)} as bigint)"


def quality_score_col(c: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword hit.

    length band: 1 if 100<=len<=5000 else len/100 (short) or 5000/len (long);
    alpha ratio: alphabetic chars / total; stopword: any stopword present."""
    ln = F.length(c).cast("double")
    len_band = (
        F.when(ln >= 100, F.when(ln <= 5000, F.lit(1.0)).otherwise(5000.0 / ln))
        .otherwise(ln / 100.0)
    )
    alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-zа-яё]", "")).cast("double")
    alpha_ratio = F.when(ln > 0, alpha / ln).otherwise(F.lit(0.0))
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    has_stop = F.when(_count(c, stop_pat) > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * len_band + 0.4 * alpha_ratio + 0.2 * has_stop, 6)


def quality_score_sql(expr: str) -> str:
    ln = f"cast(length({expr}) as double)"
    len_band = (
        f"case when {ln} >= 100 then (case when {ln} <= 5000 then 1.0 "
        f"else 5000.0 / {ln} end) else {ln} / 100.0 end"
    )
    alpha = f"cast(length(regexp_replace(lower({expr}), '[^a-zа-яё]', '', 'g')) as double)"
    alpha_ratio = f"case when {ln} > 0 then {alpha} / {ln} else 0.0 end"
    stop_pat = "\\b(" + "|".join(STOPWORDS) + ")\\b"
    has_stop = f"case when {_count_sql(expr, stop_pat)} > 0 then 1.0 else 0.0 end"
    return f"round(0.4 * ({len_band}) + 0.4 * ({alpha_ratio}) + 0.2 * ({has_stop}), 6)"


FP_BASE = 131
FP_MOD = (1 << 31) - 1
# whitespace class with identical semantics in Java regex and RE2
# (\s differs: Java includes \x0B, RE2 does not)
FP_WS_CLASS = r"[ \t\n\r\f\x0B]+"


def fingerprint_col(c: Column) -> Column:
    """Rolling polynomial hash over whitespace tokens: fold of
    (acc*B + h56(token)) mod P.  Order-sensitive document fingerprint.
    NULL in → NULL out; empty/whitespace-only text → 0 (the fold's
    initial accumulator).  Tokens come from splitting on an EXPLICIT
    whitespace class with empty tokens dropped — not from ``trim``
    (DuckDB's strips Unicode spaces like U+00A0, Spark's only ASCII)
    and not from ``\\s`` (Java's includes \\x0B, RE2's does not); both
    ambiguities silently diverged the mirror on whitespace-edge
    texts."""
    toks = F.filter(
        F.split(F.lower(c), FP_WS_CLASS), lambda t: t != F.lit("")
    )
    from .hashing import h56_col

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + h56_col(t) % FP_MOD) % FP_MOD,
    )


def fingerprint_sql(expr: str) -> str:
    from .hashing import h56_sql

    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'[ \\t\\n\\r\\f\\x0B]+'), t -> t <> '')"
    )
    h = h56_sql("t")
    # explicit NULL guard: list_prepend(0, NULL) is [0] in DuckDB, so
    # without it a NULL text folds to 0 while Spark yields NULL
    return (
        f"case when {expr} is null then null else "
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform({toks}, t -> {h} % {FP_MOD})), "
        f"(acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) end"
    )


# --- character-bigram language model quality score ---------------------------
# A corpus-trained character LM is the classic cheap fluency filter for
# LLM training-data pipelines (a KenLM-perplexity stand-in that needs no
# external artifacts): train bigram counts over the corpus itself, then
# score each document by its average per-bigram log2 probability
# (Laplace-smoothed).  Gibberish, encoding noise, and wrong-charset docs
# score far below fluent text.
#
# Scale shape: training is ONE map-side-combinable groupBy over exploded
# bigrams (model size is ~alphabet², a broadcastable dim no matter the
# corpus size); scoring is a broadcast join + one groupBy(doc_id).
# Per-gram log-probs are rounded to 6dp and per-doc sums run in integer
# micro-units, so both engines aggregate exactly the same values.

def char_lm_model(docs, text_col: str = "text"):
    """(gram, cnt, logp) — Laplace-smoothed bigram log2-probabilities."""
    from .hashing import shingles_col

    g = docs.where(F.col(text_col).isNotNull()).select(
        F.explode(shingles_col(F.lower(F.col(text_col)), 2)).alias("gram")
    )
    counts = g.groupBy("gram").agg(F.count("*").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.count("*").cast("double").alias("vocab"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "gram",
        "cnt",
        F.round(
            F.log2((F.col("cnt") + 1.0) / (F.col("total") + F.col("vocab"))),
            6,
        ).alias("logp"),
        F.round(
            F.log2(1.0 / (F.col("total") + F.col("vocab"))), 6
        ).alias("logp_oov"),
    )


def char_lm_score(docs, model, id_col: str = "doc_id",
                  text_col: str = "text"):
    """(doc_id, n_bigrams, avg_logp2, ppl) per document.

    Unseen grams (scoring a corpus the model wasn't trained on) fall
    back to the model's out-of-vocabulary log-prob, carried on every
    model row so no second lookup table is needed.
    """
    from .hashing import shingles_col

    g = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            shingles_col(F.lower(F.col(text_col)), 2)
        ).alias("gram"),
    )
    oov = model.agg(F.max("logp_oov").alias("logp_oov"))
    scored = (
        g.join(F.broadcast(model.select("gram", "logp")), "gram", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce("logp", "logp_oov").alias("lp"),
        )
    )
    # integer micro-unit sum: engine-order-independent, hash-exact
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(F.round(F.col("lp") * 1e6).cast("long")).alias("sum_u"),
    )
    # 6dp mean via EXACT integer half-away rounding of the rational
    # sum_u/n_bigrams (sum_u is already micro-units), not
    # round(su/n/1e6, 6): docs where 2·|su| ≡ n (mod 2n) sit exactly
    # on a 6dp grid midpoint (1/2/14 docs at sf0.001/0.01/0.1), where
    # the two engines' round algorithms can disagree — the same
    # mechanism fixed in char_entropy.  Away from midpoints the value
    # is bit-identical to the old expression.
    su, n = F.col("sum_u"), F.col("n_bigrams")
    sgn = F.when(su < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    avg_micro = sgn * F.floor(
        (2 * F.abs(su) + n) / (2 * n)
    ).cast("long")
    avg = avg_micro / F.lit(1e6)
    return agg.select(
        id_col,
        "n_bigrams",
        avg.alias("avg_logp2"),
        F.round(F.pow(F.lit(2.0), -avg), 6).alias("ppl"),
    )


def char_lm_score_sql(docs_from: str, id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB mirror of char_lm_model + char_lm_score over one corpus."""
    from .hashing import shingles_sql

    grams = shingles_sql(f"lower({text_col})", 2)
    return f"""
with g as (
  select {id_col}, unnest({grams}) as gram
  from {docs_from} where {text_col} is not null),
counts as (select gram, count(*) as cnt from g group by gram),
tot as (select cast(sum(cnt) as double) as total,
               cast(count(*) as double) as vocab from counts),
model as (select gram,
                 round(log2((cnt + 1.0) / (total + vocab)), 6) as logp,
                 round(log2(1.0 / (total + vocab)), 6) as logp_oov
          from counts, tot),
scored as (select g.{id_col}, coalesce(m.logp, m2.logp_oov) as lp
           from g left join model m using (gram)
                  cross join (select max(logp_oov) as logp_oov
                              from model) m2),
agg as (select {id_col}, cast(count(*) as bigint) as n_bigrams,
               sum(cast(round(lp * 1e6) as bigint)) as sum_u
        from scored group by {id_col}),
aggm as (select {id_col}, n_bigrams,
                (case when sum_u < 0 then -1 else 1 end
                 * ((2 * abs(sum_u) + n_bigrams) // (2 * n_bigrams)))
                  / 1e6 as avg_logp2
         from agg)
select {id_col}, n_bigrams, avg_logp2,
       round(pow(2.0, -avg_logp2), 6) as ppl
from aggm
"""


# --- character-entropy quality signal ----------------------------------------
# Shannon entropy of a document's character distribution: near-zero for
# degenerate repetition ("aaaa…"), ~4.1 bits for fluent English, higher
# for uniform noise — the third cheap quality axis beside the LM score
# (fluency) and the repetition fraction (structure).  One explode + one
# groupBy per doc; per-character terms are quantized to integer
# nano-units before the per-doc sum, so both engines aggregate exactly
# the same values.

def char_entropy(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, entropy_bits) per non-empty document."""
    from pyspark.sql import functions as F

    src = docs.where(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(
        F.col(id_col),
        F.lower(F.col(text_col)).alias("__t"),
    )
    chars = src.select(
        id_col,
        F.length("__t").alias("__n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__t")),
                lambda i: F.col("__t").substr(i, F.lit(1)),
            )
        ).alias("__c"),
    )
    counts = chars.groupBy(id_col, "__n", "__c").agg(
        F.count("*").alias("__cnt")
    )
    # -p·log2(p) per character, quantized to nano-units (exact sum)
    p = F.col("__cnt").cast("double") / F.col("__n").cast("double")
    term = F.round(-p * F.log2(p) * 1e9).cast("long")
    agg = counts.groupBy(id_col, "__n").agg(F.sum(term).alias("__sum"))
    # 6dp output via EXACT integer half-up on the nano sum, not
    # round(s/1e9, 6): one doc in ~1000 lands exactly on a 6dp grid
    # midpoint (s % 1000 == 500), where Spark's BigDecimal HALF_UP on
    # the binary expansion and DuckDB's scaled-double round disagree —
    # observed as 3 last-digit flips at sf0.1.  (s + 500) div 1000 is
    # the same half-up decision made identically by both engines;
    # micro/1e6 is a correctly-rounded division, so non-midpoint
    # values are bit-identical to the old expression.
    micro = F.floor((F.col("__sum") + F.lit(500)) / F.lit(1000)).cast("long")
    return agg.select(
        id_col,
        F.col("__n").cast("long").alias("n_chars"),
        (micro / F.lit(1e6)).alias("entropy_bits"),
    )


def char_entropy_sql(docs_from: str, id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB mirror of char_entropy."""
    return f"""
with src as (
  select {id_col}, lower({text_col}) as t
  from {docs_from}
  where {text_col} is not null and length({text_col}) > 0),
chars as (
  select {id_col}, length(t) as n,
         unnest(list_transform(generate_series(1, length(t)),
                               i -> t[i])) as c
  from src),
counts as (select {id_col}, n, c, count(*) as cnt
           from chars group by {id_col}, n, c),
agg as (select {id_col}, n,
               sum(cast(round(-(cnt / cast(n as double))
                   * log2(cnt / cast(n as double)) * 1e9) as bigint))
                 as s
        from counts group by {id_col}, n)
select {id_col}, cast(n as bigint) as n_chars,
       ((s + 500) // 1000) / 1e6 as entropy_bits
from agg
"""
