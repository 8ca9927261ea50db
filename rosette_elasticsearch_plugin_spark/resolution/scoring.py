"""R7/R8 — vectorized pairwise scoring + match decision.

Score over the ER canonical key (transliterated normalized name):

  jw   = max(JaroWinkler(a,b), Jaro(sort_tokens(a), sort_tokens(b)),
             JaroWinkler(strip_spaces(a), strip_spaces(b)))
         (plain Jaro on the sorted alignment: sorting moves a shared
         surname to the front, and the Winkler prefix boost would
         inflate different-person pairs like "i almeida"/"p almeida")
  lev  = max(LevSim(a,b), LevSim(strip_spaces(a), strip_spaces(b)))
  jac  = token Jaccard
  cov  = 1 if both names have ≥2 tokens and every token of the shorter
         side aligns with some token of the other (prefix either way —
         initials "k svensson" ~ "karim svensson" — or token-level
         JW ≥ 0.85 — typos "lea" ~ "lena")
  raw  = 0.45·jw + 0.25·lev + 0.15·jac + 0.15·cov
  score = raw · 0.8  if token counts differ, min is a single token, and
                     the space-stripped forms differ (a bare surname
                     "petrov" must not match "b petrov"; concatenation
                     variants "ghostbusters" ~ "ghost busters" survive
                     because their stripped forms are equal)
          raw        otherwise

Execution: jw and cov need Python string loops → ONE Arrow-batched
pandas UDF computes both per batch (one Python hop, mirroring the
reference's one-HTTP-round-trip design, ``EntitiesProcessor.java:76-89``);
lev/jac/gate are JVM built-ins.  DuckDB mirror in ``score_sql`` is
value-identical (verified in tests) so the driver oracle can check
every score.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.similarity import (
    jaro_py,
    jaro_winkler_py,
    levenshtein_sim_col,
    levenshtein_sim_sql,
    token_jaccard_col,
    token_jaccard_sql,
)

TOKEN_JW_MIN = 0.85


@dataclass(frozen=True)
class ScoringConfig:
    w_jw: float = 0.45
    w_lev: float = 0.25
    w_jac: float = 0.15
    w_cov: float = 0.15
    single_token_penalty: float = 0.8
    threshold: float = 0.70


def sort_tokens_col(c: Column) -> Column:
    return F.array_join(F.array_sort(F.split(c, " ")), " ")


def sort_tokens_sql(expr: str) -> str:
    return f"array_to_string(list_sort(string_split({expr}, ' ')), ' ')"


def _tok_match(t: str, u: str) -> bool:
    return t.startswith(u) or u.startswith(t) or jaro_winkler_py(t, u) >= TOKEN_JW_MIN


def _cover_py(x: str, y: str) -> float:
    tx, ty = x.split(" "), y.split(" ")
    if len(tx) < 2 or len(ty) < 2:
        return 0.0
    if len(tx) == len(ty):
        # positional alignment of the *sorted* token lists: stops a bare
        # initial from matching the shared surname ("n nakamura" vs
        # "t nakamura" must not cover via n→nakamura)
        return 1.0 if all(_tok_match(t, u) for t, u in zip(sorted(tx), sorted(ty))) else 0.0
    short, long_ = (tx, ty) if len(tx) <= len(ty) else (ty, tx)
    for t in short:
        if not any(_tok_match(t, u) for u in long_):
            return 0.0
    return 1.0


_FEATURES_TYPE = T.StructType(
    [T.StructField("jw", T.DoubleType()), T.StructField("cov", T.DoubleType())]
)


@pandas_udf(_FEATURES_TYPE)
def pair_features_udf(
    a: pd.Series, b: pd.Series, sa: pd.Series, sb: pd.Series
) -> pd.DataFrame:
    """jw-best + token-cover per pair — one Python hop per batch."""
    av, bv = a.fillna("").to_numpy(), b.fillna("").to_numpy()
    sav, sbv = sa.fillna("").to_numpy(), sb.fillna("").to_numpy()
    jw, cov = [], []
    for x, y, sx, sy in zip(av, bv, sav, sbv):
        jw.append(
            max(
                jaro_winkler_py(x, y),
                jaro_py(sx, sy),
                jaro_winkler_py(x.replace(" ", ""), y.replace(" ", "")),
            )
        )
        cov.append(_cover_py(x, y))
    return pd.DataFrame({"jw": jw, "cov": cov})


def score_expr(a: Column, b: Column, cfg: ScoringConfig = ScoringConfig()) -> Column:
    sa, sb = sort_tokens_col(a), sort_tokens_col(b)
    feat = pair_features_udf(a, b, sa, sb)
    ca, cb = F.replace(a, F.lit(" "), F.lit("")), F.replace(b, F.lit(" "), F.lit(""))
    lev = F.greatest(levenshtein_sim_col(a, b), levenshtein_sim_col(ca, cb))
    jac = token_jaccard_col(a, b)
    raw = (
        F.lit(cfg.w_jw) * feat["jw"]
        + F.lit(cfg.w_lev) * lev
        + F.lit(cfg.w_jac) * jac
        + F.lit(cfg.w_cov) * feat["cov"]
    )
    na, nb = F.size(F.split(a, " ")), F.size(F.split(b, " "))
    gated = F.when(
        (na != nb) & (F.least(na, nb) == 1) & (ca != cb),
        raw * cfg.single_token_penalty,
    ).otherwise(raw)
    return F.round(gated, 6)


def score_pairs(
    pairs: DataFrame,
    a: str = "node_a",
    b: str = "node_b",
    cfg: ScoringConfig = ScoringConfig(),
    key_a: Column | None = None,
    key_b: Column | None = None,
) -> DataFrame:
    """Add a ``score`` column.  ``key_a``/``key_b`` override the scored
    expressions (e.g. the transliterated ER keys of node_a/node_b)."""
    ca = key_a if key_a is not None else F.col(a)
    cb = key_b if key_b is not None else F.col(b)
    return pairs.withColumn("score", score_expr(ca, cb, cfg))


def match_edges(
    scored: DataFrame, cfg: ScoringConfig = ScoringConfig()
) -> DataFrame:
    """R8: threshold; output edge list (node_a, node_b, score)."""
    return scored.where(F.col("score") >= cfg.threshold)


def _tok_match_sql(t: str, u: str) -> str:
    return (
        f"(starts_with({t}, {u}) or starts_with({u}, {t}) "
        f"or jaro_winkler_similarity({t}, {u}) >= {TOKEN_JW_MIN})"
    )


def cover_sql(a: str, b: str) -> str:
    ta, tb = f"string_split({a}, ' ')", f"string_split({b}, ' ')"
    sa_, sb_ = f"list_sort({ta})", f"list_sort({tb})"
    zipped = (
        f"list_bool_and(list_transform(generate_series(1, len({ta})), "
        f"i -> {_tok_match_sql(f'{sa_}[i]', f'{sb_}[i]')}))"
    )
    short = f"(case when len({ta}) <= len({tb}) then {ta} else {tb} end)"
    long_ = f"(case when len({ta}) <= len({tb}) then {tb} else {ta} end)"
    anymatch = (
        f"list_bool_and(list_transform({short}, "
        f"t -> len(list_filter({long_}, u -> {_tok_match_sql('t', 'u')})) > 0))"
    )
    return (
        f"(case when len({ta}) >= 2 and len({tb}) >= 2 then "
        f"(case when len({ta}) = len({tb}) then "
        f"(case when {zipped} then 1.0 else 0.0 end) "
        f"else (case when {anymatch} then 1.0 else 0.0 end) end) "
        f"else 0.0 end)"
    )


def score_sql(a: str, b: str, cfg: ScoringConfig = ScoringConfig()) -> str:
    """DuckDB mirror of score_expr (value-identical; round 6dp)."""
    sa, sb = sort_tokens_sql(a), sort_tokens_sql(b)
    ca, cb = f"replace({a}, ' ', '')", f"replace({b}, ' ', '')"
    jw = (
        f"greatest(jaro_winkler_similarity({a}, {b}), "
        f"jaro_similarity({sa}, {sb}), "
        f"jaro_winkler_similarity({ca}, {cb}))"
    )
    lev = f"greatest({levenshtein_sim_sql(a, b)}, {levenshtein_sim_sql(ca, cb)})"
    jac = token_jaccard_sql(a, b)
    cov = cover_sql(a, b)
    raw = (
        f"({cfg.w_jw} * ({jw}) + {cfg.w_lev} * ({lev}) "
        f"+ {cfg.w_jac} * ({jac}) + {cfg.w_cov} * ({cov}))"
    )
    na, nb = f"len(string_split({a}, ' '))", f"len(string_split({b}, ' '))"
    gate = f"({na} != {nb} and least({na}, {nb}) = 1 and {ca} != {cb})"
    return (
        f"round(case when {gate} then {raw} * {cfg.single_token_penalty} "
        f"else {raw} end, 6)"
    )
