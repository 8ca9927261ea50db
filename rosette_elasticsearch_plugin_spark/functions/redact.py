"""PII / contact-info redaction for training-data pipelines.

Large-scale corpus preparation scrubs emails, URLs, phone numbers and
long ID-like digit runs before training.  Pure chained
``regexp_replace`` column expressions (JVM-side, codegen-friendly) with
exact DuckDB mirrors ('g' flag).  Patterns are RE2+Java compatible: no
``\\w`` (RE2 is ASCII-only there), ``(?i)`` for case-insensitivity.

Order matters and is part of the spec: URLs first (they may embed
'@' and digits), then emails, then phones, then bare digit runs —
replacement tokens are letter-only so later patterns cannot re-match
inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

REDACTIONS: list[tuple[str, str]] = [
    ("URL", r"(?i)https?://[^\s]+"),
    ("EMAIL", r"(?i)[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"),
    # ≥3 digit groups joined by separators (no RE2 lookahead, so the
    # separator requirement is structural — a bare digit run is IDNUM)
    ("PHONE", r"\+?[0-9]{1,4}(?:[()\-\s]+[0-9]{1,4}){2,}"),
    ("IDNUM", r"[0-9]{6,}"),
]


def redact_col(c: Column) -> Column:
    out = c
    for label, pat in REDACTIONS:
        out = F.regexp_replace(out, pat, f"<{label}>")
    return out


def redact_sql(expr: str) -> str:
    out = expr
    for label, pat in REDACTIONS:
        esc = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{esc}', '<{label}>', 'g')"
    return out


def pii_count_col(c: Column) -> Column:
    """Total redactable matches, counted on the progressively redacted
    text exactly as the replace chain sees it.  NULL text yields NULL
    (not -4): Spark's legacy ``sizeOfNull`` makes ``size(...)`` return
    -1 per term on NULL input, while the DuckDB mirror's
    ``len(regexp_extract_all(NULL))`` sums to NULL — the explicit
    isNotNull guard keeps both engines identical."""
    out = c
    total = F.lit(0)
    for label, pat in REDACTIONS:
        total = total + F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0)))
        out = F.regexp_replace(out, pat, f"<{label}>")
    return F.when(c.isNotNull(), total).cast("long")


def pii_count_sql(expr: str) -> str:
    out = expr
    terms = []
    for label, pat in REDACTIONS:
        esc = pat.replace("'", "''")
        terms.append(f"len(regexp_extract_all({out}, '{esc}'))")
        out = f"regexp_replace({out}, '{esc}', '<{label}>', 'g')"
    return f"cast({' + '.join(terms)} as bigint)"
