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


# --- numpy-batched Jaro / Jaro-Winkler -----------------------------------------
#
# Vectorized across PAIRS: the greedy matching loop runs over character
# POSITIONS (≤ max name length per batch, ~dozens), with each step a
# whole-batch boolean operation — so the per-pair Python interpreter
# cost drops out.  Float semantics are kept operation-for-operation
# identical to jaro_py/jaro_winkler_py (same division order, same /3.0,
# same winkler boost expression), so results are bit-identical and the
# DuckDB score mirror stays green (pinned by tests/test_similarity.py).


def _code_matrix(strs, n_max: int, ascii_ok: bool):
    """(N, n_max) codepoint matrix, 0-padded (0 never occurs in a real
    string, so 0 doubles as the 'past end' sentinel).  uint8 when every
    string is Latin-1-able (the ER-key domain is transliterated ASCII)
    — 4× less memory traffic than full codepoints."""
    import numpy as np

    lens = np.array([len(s) for s in strs], dtype=np.int64)
    if ascii_ok:
        flat = np.frombuffer("".join(strs).encode("latin-1"), dtype=np.uint8)
        M = np.zeros((len(strs), max(n_max, 1)), dtype=np.uint8)
    else:
        flat = np.frombuffer(
            "".join(strs).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        M = np.zeros((len(strs), max(n_max, 1)), dtype=np.int64)
    # row-major boolean scatter: M[mask] enumerates rows in order, and
    # flat is the row-order concatenation — one vector op, no per-string
    # python loop
    mask = np.arange(M.shape[1]) < lens[:, None]
    M[mask] = flat
    return M


def jaro_batch_np(a_list, b_list, winkler: bool = True):
    """Vectorized jaro_py / jaro_winkler_py over parallel string lists.

    Returns a float64 numpy array.  Bit-identical to the scalar
    implementations for every input (property-tested)."""
    import numpy as np

    N = len(a_list)
    n1 = np.array([len(s) for s in a_list], dtype=np.int64)
    n2 = np.array([len(s) for s in b_list], dtype=np.int64)
    La, Lb = int(n1.max(initial=1)), int(n2.max(initial=1))
    try:
        "".join(a_list).encode("latin-1")
        "".join(b_list).encode("latin-1")
        ascii_ok = True
    except UnicodeEncodeError:
        ascii_ok = False
    A = _code_matrix(a_list, La, ascii_ok)
    B = _code_matrix(b_list, Lb, ascii_ok)

    window = np.maximum(np.maximum(n1, n2) // 2 - 1, 0)
    match1 = np.zeros((N, La), dtype=bool)
    match2 = np.zeros((N, Lb), dtype=bool)
    jcols = np.arange(Lb, dtype=np.int64)
    rows = np.arange(N)
    hi_all = np.minimum(n2, window + 1)  # hi at i=0; grows by 1 per i
    for i in range(La):
        # a pad char (0) can only match B's pads, which sit at j >= n2
        # — outside the window bound — so no explicit i<n1 mask needed
        c = A[:, i]
        lo = np.maximum(0, i - window)
        hi = np.minimum(n2, hi_all + i)
        cand = (B == c[:, None]) & ~match2
        cand &= (jcols >= lo[:, None]) & (jcols < hi[:, None])
        j_first = cand.argmax(axis=1)
        found = cand[rows, j_first]
        match1[found, i] = True
        match2[rows[found], j_first[found]] = True
    m = match1.sum(axis=1)

    # transpositions: k-th matched char of a vs k-th matched char of b.
    # A[match1] yields matched chars row-major (= per-row in position
    # order); the same boolean scatter used in _code_matrix packs them
    # left-aligned.  Both sides have exactly m matches, so pads (0==0)
    # never count as transpositions.
    max_m = int(m.max(initial=0))
    MA = np.zeros((N, max(max_m, 1)), dtype=A.dtype)
    MB = np.zeros((N, max(max_m, 1)), dtype=B.dtype)
    pack = np.arange(MA.shape[1]) < m[:, None]
    MA[pack] = A[match1]
    MB[pack] = B[match2]
    t = (MA != MB).sum(axis=1) // 2

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / n1 + mf / n2 + (mf - t) / mf) / 3.0
    jaro = np.where((m == 0) | (n1 == 0) | (n2 == 0), 0.0, jaro)

    if not winkler:
        return jaro
    # common prefix up to 4 chars; zero-pad inequality keeps pads from
    # counting (a real codepoint is never 0)
    pw = min(4, La, Lb)
    if pw > 0:
        eq = (A[:, :pw] == B[:, :pw]) & (A[:, :pw] != 0)
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(N, dtype=np.int64)
    boosted = jaro + prefix * 0.1 * (1.0 - jaro)
    return np.where(jaro <= 0.7, jaro, boosted)


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
