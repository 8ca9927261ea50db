"""P1 — the guarded-stage contract of ``RosetteAbstractProcessor``.

Reference semantics (``RosetteAbstractProcessor.java:44-68``, tested in
``RosetteAbstractProcessorTest.java:42-70``):

1. target field already populated  → error            (:45-48)
2. input field missing or empty    → pass through      (:49-59)
3. otherwise                       → compute, set target (:66)
4. service returned nothing        → fail (processor-specific, e.g.
                                     ``LanguageProcessor.java:67-69``)

DataFrame mapping: enrichment never mutates — a stage *adds* its
target column plus a ``<target>__error`` column; rows whose error is
non-null are routed to quarantine by the pipeline (the reference's
``on_failure`` redirect, docs/...Doc-Enrichment.md:276-304).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

ERROR_SUFFIX = "__error"


class TargetOccupiedError(ValueError):
    """Schema-level equivalent of the reference's runtime 'field already
    exists' error (``RosetteAbstractProcessor.java:45-48``)."""


def error_col_name(target: str) -> str:
    return f"{target}{ERROR_SUFFIX}"


@dataclass(frozen=True)
class StageConfig:
    """Mirrors the (field, target_field) pair every reference processor
    takes (e.g. ``LanguageProcessor.java:82-84``) plus ES's generic
    per-processor ``ignore_failure`` flag (continue-and-drop-error)."""

    field: str = "text"
    target_field: str = ""
    ignore_failure: bool = False


def apply_guarded(
    df: DataFrame,
    src: str,
    target: str,
    value: Column,
    fail_on_empty_result: bool = True,
    ignore_failure: bool = False,
) -> DataFrame:
    """Apply one guarded enrichment stage.

    ``value`` is the stage's compute expression over ``src``.  Rows with
    null/empty input keep target null with no error (guard 2); rows
    where the compute yields null despite non-empty input get an error
    (guard 4) when ``fail_on_empty_result``.

    ``ignore_failure`` mirrors ES's per-processor flag (documented for
    the reference in docs/...Doc-Enrichment.md:259-304): failures are
    swallowed — the row continues through the pipeline with a null
    target and NO error recorded, as distinct from ``on_failure``
    quarantine routing (split_quarantine)."""
    if target in df.columns:
        raise TargetOccupiedError(
            f"target field [{target}] already exists in schema"
        )
    src_col = F.col(src)
    empty = src_col.isNull() | (F.length(src_col) == 0)
    out = df.withColumn(target, F.when(~empty, value))
    if fail_on_empty_result and not ignore_failure:
        err = F.when(
            ~empty & F.col(target).isNull(),
            F.lit(f"no result for [{target}]"),
        )
    else:
        err = F.lit(None).cast("string")
    return out.withColumn(error_col_name(target), err)


def overwrite_guard_errors(df: DataFrame, target: str) -> DataFrame:
    """Per-row variant of guard 1 for inputs that *already* carry the
    target column: rows with a pre-populated target are flagged."""
    return df.withColumn(
        error_col_name(target),
        F.when(
            F.col(target).isNotNull(),
            F.lit(f"field [{target}] already exists"),
        ),
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route rows with any ``*__error`` non-null to the quarantine side
    (reference ``on_failure`` redirect)."""
    err_cols = [c for c in df.columns if c.endswith(ERROR_SUFFIX)]
    if not err_cols:
        return df, df.limit(0)
    any_err = None
    for c in err_cols:
        cond = F.col(c).isNotNull()
        any_err = cond if any_err is None else (any_err | cond)
    return df.where(~any_err), df.where(any_err)
