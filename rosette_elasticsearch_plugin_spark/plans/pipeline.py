"""Sequential enrichment pipeline + config parsing.

Reference: an ES ingest pipeline is an ordered processor list built
from JSON (``it_processors/all.json:1-20``); each factory parses its
config at creation time (``EntitiesProcessor.java:109-127``).  Spark
mapping: parse a config list → list of DataFrame→DataFrame callables →
``reduce`` composition.  Build-time validation errors surface before
any job runs (same phase as the reference's factory errors).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.base import StageConfig, split_quarantine
from ..operators.categories import categories_stage
from ..operators.entities import entities_flat_stage
from ..operators.language import language_stage
from ..operators.name_translation import (
    ANY_LANGUAGE,
    ANY_SCRIPT,
    name_translation_stage,
)
from ..operators.sentiment import sentiment_stage

Stage = Callable[[DataFrame], DataFrame]

# P0 — processor registry (RosetteTextAnalysisPlugin.java:42-55): name →
# factory(spark, StageConfig, raw_cfg) -> Stage.  One shared dict per
# module, like the reference's one registry per node.  The full set
# matches the reference's five processors, so the composed
# ``it_processors/all.json`` pipeline (categories → language →
# sentiment → entities) builds as-is.
STAGES: dict[str, Callable] = {
    "ros_language": lambda spark, sc, cfg: language_stage(sc),
    "ros_categories": lambda spark, sc, cfg: categories_stage(sc),
    "ros_sentiment": lambda spark, sc, cfg: sentiment_stage(sc),
    # all six factory parameters (NameTranslationProcessor.java:96-134)
    "ros_name_translation": lambda spark, sc, cfg: name_translation_stage(
        spark, sc,
        target_language=cfg.get("target_language", "eng"),
        target_script=cfg.get("target_script", ANY_SCRIPT),
        entity_type=cfg.get("entity_type", "PERSON"),
        source_language=cfg.get("source_language", ANY_LANGUAGE),
        source_script=cfg.get("source_script", ANY_SCRIPT),
        source_language_of_origin=cfg.get(
            "source_language_of_origin", ANY_LANGUAGE
        ),
    ),
    # EntitiesProcessor.java:109-127 config surface; pattern/gazetteer
    # are the deterministic stand-ins for the remote NER model
    "ros_entities": lambda spark, sc, cfg: entities_flat_stage(spark, sc, cfg),
}

# accepted config keys per processor — ES rejects unconsumed
# properties at factory time ("doesn't support one or more provided
# configuration parameters"), and a silently-ignored typo (e.g.
# `target_feild`) would otherwise surface as mysteriously-missing
# output long after build
_COMMON_KEYS = {"field", "target_field", "ignore_failure"}
STAGE_KEYS: dict[str, frozenset[str]] = {
    "ros_language": frozenset(_COMMON_KEYS),
    "ros_categories": frozenset(_COMMON_KEYS),
    "ros_sentiment": frozenset(_COMMON_KEYS),
    "ros_name_translation": frozenset(
        _COMMON_KEYS
        | {
            "target_language", "target_script", "entity_type",
            "source_language", "source_script", "source_language_of_origin",
        }
    ),
    "ros_entities": frozenset(
        _COMMON_KEYS
        | {
            "include_offsets", "include_translation", "translation_language",
            "include_sentiment", "sentiment_window", "dictionary",
            "pattern", "gazetteer",
        }
    ),
}

# the two registries must never drift: a processor registered in
# STAGES without a STAGE_KEYS entry would turn the descriptive
# unknown-parameter ValueError below into a bare KeyError
assert STAGES.keys() == STAGE_KEYS.keys(), (
    "STAGES / STAGE_KEYS registries drifted: "
    f"{sorted(set(STAGES) ^ set(STAGE_KEYS))}"
)


def compose(stages: list[Stage]) -> Stage:
    """Ordered composition — the ingest pipeline itself (SURVEY.md §2.2)."""
    return lambda df: reduce(lambda acc, st: st(acc), stages, df)


def build_pipeline(
    spark: SparkSession, processors: list[dict]
) -> Stage:
    """Parse a reference-shaped processor config list, e.g.
    ``[{"ros_language": {"field": "text", "target_field": "language"}}, ...]``
    (cf. it_processors/*.json).  Unknown processor names raise at build
    time like ES's factory resolution."""
    stages: list[Stage] = []
    for p in processors:
        if len(p) != 1:
            raise ValueError(f"each processor entry must have one key: {p}")
        (name, cfg), = p.items()
        field = cfg.get("field", "text")
        target = cfg.get("target_field", "")
        sc = StageConfig(
            field=field,
            target_field=target,
            ignore_failure=bool(cfg.get("ignore_failure", False)),
        )
        factory = STAGES.get(name)
        if factory is None:
            raise ValueError(f"unknown processor [{name}]")
        unknown = sorted(set(cfg) - STAGE_KEYS[name])
        if unknown:
            raise ValueError(
                f"processor [{name}] doesn't support the configuration "
                f"parameter(s) {unknown}"
            )
        stages.append(factory(spark, sc, cfg))
    return compose(stages)


def run_with_quarantine(
    stage: Stage, df: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Apply a pipeline and split failed rows (on_failure routing)."""
    out = stage(df)
    return split_quarantine(out)
