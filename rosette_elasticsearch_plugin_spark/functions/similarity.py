"""R7 — pairwise string-similarity scoring.

The reference never scores pairs itself (it trusts the kb-linker's
``entityId``, ``EntitiesProcessor.java:140``); the north rule requires
batched Jaro-Winkler / Levenshtein / token-Jaccard.

Execution strategy:
* Levenshtein   → Spark built-in ``F.levenshtein`` (JVM, codegen).
* token-Jaccard → pure column expressions over split() arrays (JVM).
* Jaro-Winkler  → Arrow-batched pandas UDF (no JVM built-in exists).
  The Python implementation is the textbook Winkler variant (scaling
  p=0.1, boost threshold 0.7, prefix cap 4) and is kept value-identical
  to DuckDB's ``jaro_winkler_similarity`` so the driver oracle can
  verify it (cross-checked in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaro_py(s1: str, s2: str) -> float:
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0  # DuckDB jaro_winkler_similarity('','') = 0.0; keep parity
    if s1 == s2:
        return 1.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    match1 = [False] * n1
    match2 = [False] * n2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c1:
                match1[i] = True
                match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if match1[i]:
            while not match2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler_py(
    s1: str, s2: str, p: float = 0.1, threshold: float = 0.7
) -> float:
    jaro = jaro_py(s1, s2)
    if jaro <= threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * p * (1.0 - jaro)


# NOTE: Jaro-Winkler's Spark execution path is resolution/scoring.py's
# pair_features_udf (one Arrow hop computes jw + alignment features
# together); there is deliberately no standalone jw UDF here — an
# uncalled wrapper would carry unverified null semantics.


# --- JVM-side expressions ------------------------------------------------------
def levenshtein_sim_col(a: Column, b: Column) -> Column:
    """1 - lev/max_len, clamped to [0,1]; JVM built-in.

    The clamp is a no-op on the scorer's real domain (ER canonical
    keys are transliterated ASCII, where edit distance ≤ max length by
    construction) but keeps a similarity from going NEGATIVE on raw
    multibyte input, where DuckDB's byte-based levenshtein can exceed
    the char-based length.  Exact cross-engine value parity is
    guaranteed on the ASCII domain only — DuckDB counts bytes, Spark
    counts codepoints."""
    max_len = F.greatest(F.length(a), F.length(b))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        F.greatest(
            F.lit(0.0), 1.0 - F.levenshtein(a, b) / max_len.cast("double")
        )
    )


def token_jaccard_col(a: Column, b: Column) -> Column:
    """Jaccard over distinct whitespace tokens; JVM built-ins only."""
    ta = F.array_distinct(F.split(a, " "))
    tb = F.array_distinct(F.split(b, " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def token_jaccard_sql(a: str, b: str) -> str:
    """DuckDB mirror of token_jaccard_col."""
    ta = f"list_distinct(string_split({a}, ' '))"
    tb = f"list_distinct(string_split({b}, ' '))"
    return (
        f"case when len(list_distinct({ta} || {tb})) = 0 then 0.0 "
        f"else cast(len(list_intersect({ta}, {tb})) as double) "
        f"/ len(list_distinct({ta} || {tb})) end"
    )


def levenshtein_sim_sql(a: str, b: str) -> str:
    return (
        f"case when greatest(length({a}), length({b})) = 0 then 1.0 "
        f"else greatest(0.0, 1.0 - cast(levenshtein({a}, {b}) as double) "
        f"/ greatest(length({a}), length({b}))) end"
    )
