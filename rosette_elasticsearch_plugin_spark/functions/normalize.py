"""R2 — name/text normalization.

Mirrors the ADM ``normalized`` mention strings of the reference
(``plugin/src/test/resources/mock_responses/entities_response.json:325,332``):
lowercase, fold common diacritics, strip punctuation, collapse
whitespace.  Unicode letters/digits are *kept* (Cyrillic and CJK
mentions like "Владимир Путин" must survive — cf.
``NameTranslationProcessorTest.java:33-49``).

Implemented as pure Spark column expressions (JVM-side) with an exact
ANSI-SQL mirror for the DuckDB oracle and a Python mirror for
driver-side fixtures.  Keep all three in lockstep.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed diacritic fold map (applied after lower()).  Small on purpose:
# deterministic and identical across Spark translate / DuckDB translate /
# Python str.translate.
ACCENT_FROM = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿšžœæß"
ACCENT_TO__ = "aaaaaaeeeeiiiiooooouuuucnyyszoas"

_NON_ALNUM = r"[^\p{L}\p{N}]+"


def normalize_col(c: Column) -> Column:
    """lower → fold accents → non-letter/digit runs → single space → trim."""
    out = F.lower(c)
    out = F.translate(out, ACCENT_FROM, ACCENT_TO__)
    out = F.regexp_replace(out, _NON_ALNUM, " ")
    return F.trim(out)


def normalize_sql(expr: str) -> str:
    """DuckDB mirror of :func:`normalize_col` (RE2 regex, 'g' flag)."""
    return (
        f"trim(regexp_replace(translate(lower({expr}), "
        f"'{ACCENT_FROM}', '{ACCENT_TO__}'), "
        r"'[^\p{L}\p{N}]+', ' ', 'g'))"
    )


_PY_TRANS = str.maketrans(ACCENT_FROM, ACCENT_TO__)
_PY_NON_ALNUM = re.compile(r"[\W_]+", re.UNICODE)


def normalize_py(s: str | None) -> str | None:
    """Python mirror (fixtures/tests). \\w ≈ \\p{L}\\p{N}_ so strip _ too."""
    if s is None:
        return None
    out = s.lower().translate(_PY_TRANS)
    out = _PY_NON_ALNUM.sub(" ", out)
    return out.strip()


def nfkd_fold_py(s: str) -> str:
    """Aggressive Python-only fold used by the synthetic corpus generator
    (NOT mirrored in SQL; generator-side only)."""
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", s) if not unicodedata.combining(ch)
    )
