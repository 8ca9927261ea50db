"""P4 — ``ros_sentiment``: document-level sentiment.

Reference: ``SentimentProcessor.java:49-71`` — top-1 label in
{pos, neg, neu}, error when empty.  Deterministic lexicon counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import sentiment_col
from .base import StageConfig, apply_guarded

DEFAULT_TARGET = "ros_sentiment"


def sentiment_stage(cfg: StageConfig | None = None):
    cfg = cfg or StageConfig(target_field=DEFAULT_TARGET)
    target = cfg.target_field or DEFAULT_TARGET

    def stage(df: DataFrame) -> DataFrame:
        return apply_guarded(
            df, cfg.field, target, sentiment_col(F.col(cfg.field)),
            ignore_failure=cfg.ignore_failure,
        )

    return stage
