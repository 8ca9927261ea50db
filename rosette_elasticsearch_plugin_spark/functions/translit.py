"""Deterministic Cyrillic→Latin transliteration (GOST-style).

Used in two places:
* ER canonical key (er_key): cross-script blocking + scoring — so
  "Владимир Путин" and "Vladimir Putin" land in the same blocks and
  score ~1.0 (the reference's kb-linker resolves cross-script mentions
  to one QID, ``entities_response.json`` entityId semantics).
* name-translation display output (P5), title-cased.

Multi-char letters via replace chain, 1:1 via translate — pure column
expressions with exact DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

CYR_MULTI: list[tuple[str, str]] = [
    ("ж", "zh"), ("х", "kh"), ("ц", "ts"), ("ч", "ch"),
    ("ш", "sh"), ("щ", "shch"), ("ю", "yu"), ("я", "ya"), ("ё", "yo"),
    # ß folds to "ss" here (standard German romanization) because its
    # CASE mapping diverges across engines — Python upper→"SS", Spark
    # initcap→"Ss", DuckDB/ICU upper→"ẞ" — so it must never survive to
    # the display-form title-casing step. Runs after lower(), which
    # also catches capital "ẞ" input in all three engines.
    ("ß", "ss"),
]
# ь/ъ at the tail with no counterpart → deleted (translate drops chars
# beyond the to-string's length, identically in Spark and DuckDB)
CYR_ONE_FROM = "абвгдезийклмнопрстуфыэьъ"
CYR_ONE_TO__ = "abvgdeziyklmnoprstufye"


def translit_lower_col(c: Column) -> Column:
    """Lower-cased transliteration; no-op for non-Cyrillic text."""
    out = F.lower(c)
    for src, dst in CYR_MULTI:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return F.translate(out, CYR_ONE_FROM, CYR_ONE_TO__)


def translit_lower_sql(expr: str) -> str:
    out = f"lower({expr})"
    for src, dst in CYR_MULTI:
        out = f"replace({out}, '{src}', '{dst}')"
    return f"translate({out}, '{CYR_ONE_FROM}', '{CYR_ONE_TO__}')"


_PY_TABLE = {
    ord(ch): (CYR_ONE_TO__[i] if i < len(CYR_ONE_TO__) else None)
    for i, ch in enumerate(CYR_ONE_FROM)
}


def translit_lower_py(s: str) -> str:
    """Pure-python mirror of translit_lower_col/_sql (same constants;
    used to PREcompute oracle-side values like Double Metaphone codes
    over transliterated tokens at SQL-build time)."""
    out = s.lower()
    for src, dst in CYR_MULTI:
        out = out.replace(src, dst)
    return out.translate(_PY_TABLE)


def has_cyrillic_py(s: str) -> bool:
    """Python mirror of has_cyrillic_col/_sql."""
    import re

    return re.search(r"[а-яё]", s.lower()) is not None


def has_cyrillic_col(c: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit("[а-яё]"), F.lit(0))) > 0


def has_cyrillic_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '[а-яё]')) > 0"
