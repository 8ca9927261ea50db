"""P3 — ``ros_category``: document categorization.

Reference: ``CategoriesProcessor.java:47-70`` — top-1 IAB-style label
("SPORTS"), error when empty.  Deterministic keyword-lexicon argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import categorize_col
from .base import StageConfig, apply_guarded

DEFAULT_TARGET = "ros_category"


def categories_stage(cfg: StageConfig | None = None):
    cfg = cfg or StageConfig(target_field=DEFAULT_TARGET)
    target = cfg.target_field or DEFAULT_TARGET

    def stage(df: DataFrame) -> DataFrame:
        return apply_guarded(
            df, cfg.field, target, categorize_col(F.col(cfg.field)),
            ignore_failure=cfg.ignore_failure,
        )

    return stage
