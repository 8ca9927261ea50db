"""P2 — ``ros_language``: document language identification.

Reference: ``LanguageProcessor.java:46-70`` — top-1 detected language
as an ISO 639-3 code string ("eng"), error when the service returns no
detections.  Our deterministic detector is a marker-lexicon argmax
(functions/textstats.py) — a pure JVM column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import detect_language_col
from .base import StageConfig, apply_guarded

DEFAULT_TARGET = "ros_language"  # LanguageProcessor.Parameters TARGET_FIELD


def language_stage(cfg: StageConfig | None = None):
    cfg = cfg or StageConfig(target_field=DEFAULT_TARGET)
    target = cfg.target_field or DEFAULT_TARGET

    def stage(df: DataFrame) -> DataFrame:
        return apply_guarded(
            df, cfg.field, target, detect_language_col(F.col(cfg.field)),
            ignore_failure=cfg.ignore_failure,
        )

    return stage
