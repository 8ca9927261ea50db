"""P5 — ``ros_translation``: name translation / transliteration.

Reference: ``NameTranslationProcessor.java:62-86`` treats the whole
field as a name and asks the Rosette RNT service for a translation
into (target_language, target_script); fixture golden:
"Владимир Путин" → "Vladimir Putin"
(``name-translation_response.json``; IT both directions
``RosetteTextAnalysisPluginIT.java:120-142``).

Spark-first re-creation, two layers:

1. dictionary lookup — a small translation dim table joined with an
   explicit ``F.broadcast`` hint (the reference's per-head-mention
   point lookup, ``EntitiesProcessor.java:160-171``);
2. deterministic GOST-style Cyrillic→Latin transliteration fallback as
   pure ``replace``/``translate`` column expressions (multi-char
   letters via replace chain, 1:1 letters via translate) with an exact
   DuckDB mirror.  Title-casing per word via initcap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .base import StageConfig, apply_guarded

DEFAULT_TARGET = "ros_translation"

# fixture-derived dictionary (NameTranslationProcessorTest.java:33-49 and
# docs/...Doc-Enrichment.md:252 Matt Damon example)
DEFAULT_DICTIONARY: list[tuple[str, str, str]] = [
    # (source name, target_language, translation)
    ("Владимир Путин", "eng", "Vladimir Putin"),
    ("Владимир Набоков", "eng", "Vladimir Nabokov"),
    ("マット・デイモン", "eng", "Matt Damon"),
    ("Vladimir Putin", "rus", "Владимир Путин"),
    ("Matt Damon", "jpn", "マット・デイモン"),
]

from ..functions.translit import (  # noqa: F401 (re-exported)
    has_cyrillic_col,
    has_cyrillic_sql,
    translit_lower_col,
    translit_lower_sql,
)


def transliterate_cyr_col(c: Column) -> Column:
    """Display form: transliterate + collapse spaces + title-case."""
    out = F.regexp_replace(translit_lower_col(c), r"\s+", " ")
    return F.initcap(F.trim(out))


def transliterate_cyr_sql(expr: str) -> str:
    out = f"regexp_replace({translit_lower_sql(expr)}, '\\s+', ' ', 'g')"
    # DuckDB has no initcap; title-case word-by-word
    return (
        f"array_to_string(list_transform(string_split(trim({out}), ' '), "
        f"w -> upper(w[1]) || w[2:]), ' ')"
    )


def translation_dim(spark: SparkSession, extra: list[tuple[str, str, str]] | None = None) -> DataFrame:
    rows = DEFAULT_DICTIONARY + (extra or [])
    return spark.createDataFrame(
        rows, "name string, target_language string, translation string"
    )


def name_translation_stage(
    spark: SparkSession,
    cfg: StageConfig | None = None,
    target_language: str = "eng",  # NameTranslationProcessor Parameters default
    dictionary: list[tuple[str, str, str]] | None = None,
):
    cfg = cfg or StageConfig(target_field=DEFAULT_TARGET)
    target = cfg.target_field or DEFAULT_TARGET
    dim = translation_dim(spark, dictionary).where(
        F.col("target_language") == target_language
    ).select(F.col("name").alias(cfg.field), F.col("translation").alias("__dict_xlat"))

    def stage(df: DataFrame) -> DataFrame:
        joined = df.join(F.broadcast(dim), cfg.field, "left")
        fallback = (
            F.when(has_cyrillic_col(F.col(cfg.field)),
                   transliterate_cyr_col(F.col(cfg.field)))
            if target_language == "eng"
            else F.lit(None).cast("string")
        )
        value = F.coalesce(F.col("__dict_xlat"), fallback)
        return apply_guarded(joined, cfg.field, target, value).drop("__dict_xlat")

    return stage
