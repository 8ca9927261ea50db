"""P5 — ``ros_translation``: name translation / transliteration.

Reference: ``NameTranslationProcessor.java:62-86`` treats the whole
field as a name and asks the Rosette RNT service for a translation; the
factory reads SIX parameters (``NameTranslationProcessor.java:96-134``,
Parameters enum :126-134):

  target_language            default "eng"
  target_script              default "Zyyy"  (ISO 15924 common = any)
  entity_type                default "PERSON"
  source_language            default "xxx"   (ISO 639-3 unknown = any)
  source_script              default "Zyyy"
  source_language_of_origin  default "xxx"

Fixture golden: "Владимир Путин" → "Vladimir Putin"
(``name-translation_response.json``; IT both directions
``RosetteTextAnalysisPluginIT.java:120-142``; full-param unit test
``NameTranslationProcessorTest.java:33-49``).

Spark-first re-creation, two layers:

1. dictionary lookup — a small translation dim table carrying all six
   attributes per row, broadcast-joined after slicing to the stage's
   parameter combination ("Zyyy"/"xxx" act as wildcards, exactly the
   reference's unknown/common defaults);
2. deterministic GOST-style Cyrillic→Latin transliteration fallback as
   pure ``replace``/``translate`` column expressions (multi-char
   letters via replace chain, 1:1 letters via translate) with an exact
   DuckDB mirror — applies only when the requested target is English
   in Latin (or any) script.  Title-casing per word via initcap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .base import StageConfig, apply_guarded

DEFAULT_TARGET = "ros_translation"

# ISO wildcard sentinels (NameTranslationProcessor.Parameters defaults)
ANY_SCRIPT = "Zyyy"
ANY_LANGUAGE = "xxx"


@dataclass(frozen=True)
class TranslationEntry:
    """One dictionary row — the deterministic stand-in for an RNT
    response, keyed by the same attributes RNT is asked with."""

    name: str
    translation: str
    target_language: str = "eng"
    target_script: str = "Latn"
    entity_type: str | None = "PERSON"  # None = applies to any type
    source_language: str = ANY_LANGUAGE
    source_script: str = ANY_SCRIPT
    source_language_of_origin: str = ANY_LANGUAGE


# fixture-derived dictionary (NameTranslationProcessorTest.java:33-49 and
# docs/...Doc-Enrichment.md:252 Matt Damon example)
DEFAULT_DICTIONARY: list[TranslationEntry] = [
    TranslationEntry("Владимир Путин", "Vladimir Putin", "eng", "Latn",
                     "PERSON", "rus", "Cyrl", "rus"),
    TranslationEntry("Владимир Набоков", "Vladimir Nabokov", "eng", "Latn",
                     "PERSON", "rus", "Cyrl", "rus"),
    TranslationEntry("マット・デイモン", "Matt Damon", "eng", "Latn",
                     "PERSON", "jpn", "Jpan", "eng"),
    TranslationEntry("Vladimir Putin", "Владимир Путин", "rus", "Cyrl",
                     "PERSON", "eng", "Latn", "rus"),
    TranslationEntry("Vladimir Nabokov", "Владимир Набоков", "rus", "Cyrl",
                     "PERSON", "eng", "Latn", "rus"),
    TranslationEntry("Matt Damon", "マット・デイモン", "jpn", "Jpan",
                     "PERSON", "eng", "Latn", "eng"),
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


def transliterate_cyr_py(s: str) -> str:
    """Python mirror of transliterate_cyr_col (used by the flat-field
    entities kernel, which runs wholly inside one Arrow pass)."""
    import re

    from ..functions.translit import translit_lower_py

    out = re.sub(r"\s+", " ", translit_lower_py(s)).strip()
    # initcap on already-lowercase words: first char upper, rest as-is
    return " ".join(w[:1].upper() + w[1:] for w in out.split(" "))


def transliterate_cyr_sql(expr: str) -> str:
    out = f"regexp_replace({translit_lower_sql(expr)}, '\\s+', ' ', 'g')"
    # DuckDB has no initcap; title-case word-by-word
    return (
        f"array_to_string(list_transform(string_split(trim({out}), ' '), "
        f"w -> upper(w[1]) || w[2:]), ' ')"
    )


_DIM_SCHEMA = (
    "name string, translation string, target_language string, "
    "target_script string, entity_type string, source_language string, "
    "source_script string, source_language_of_origin string"
)


def _as_entry(row) -> TranslationEntry:
    """Accept TranslationEntry or the legacy (name, target_language,
    translation) triple."""
    if isinstance(row, TranslationEntry):
        return row
    name, lang, translation = row
    return TranslationEntry(name, translation, target_language=lang)


def translation_dim(
    spark: SparkSession, extra: list | None = None
) -> DataFrame:
    rows = [_as_entry(r) for r in DEFAULT_DICTIONARY + list(extra or [])]
    return spark.createDataFrame(
        [
            (
                e.name, e.translation, e.target_language, e.target_script,
                e.entity_type, e.source_language, e.source_script,
                e.source_language_of_origin,
            )
            for e in rows
        ],
        _DIM_SCHEMA,
    )


def _slice_condition(
    target_language: str,
    target_script: str,
    entity_type: str,
    source_language: str,
    source_script: str,
    source_language_of_origin: str,
) -> Column:
    """Which dictionary rows satisfy this stage's parameter combination.
    "Zyyy"/"xxx" parameters are wildcards (match any row); a row's null
    entity_type means the row applies to every type."""
    cond = F.col("target_language") == target_language
    if target_script != ANY_SCRIPT:
        cond = cond & (F.col("target_script") == target_script)
    cond = cond & (
        F.col("entity_type").isNull() | (F.col("entity_type") == entity_type)
    )
    if source_language != ANY_LANGUAGE:
        cond = cond & (F.col("source_language") == source_language)
    if source_script != ANY_SCRIPT:
        cond = cond & (F.col("source_script") == source_script)
    if source_language_of_origin != ANY_LANGUAGE:
        cond = cond & (
            F.col("source_language_of_origin") == source_language_of_origin
        )
    return cond


def name_translation_stage(
    spark: SparkSession,
    cfg: StageConfig | None = None,
    target_language: str = "eng",  # Parameters defaults (:126-134)
    target_script: str = ANY_SCRIPT,
    entity_type: str = "PERSON",
    source_language: str = ANY_LANGUAGE,
    source_script: str = ANY_SCRIPT,
    source_language_of_origin: str = ANY_LANGUAGE,
    dictionary: list | None = None,
):
    cfg = cfg or StageConfig(target_field=DEFAULT_TARGET)
    target = cfg.target_field or DEFAULT_TARGET
    dim = (
        translation_dim(spark, dictionary)
        .where(
            _slice_condition(
                target_language, target_script, entity_type,
                source_language, source_script, source_language_of_origin,
            )
        )
        .select(
            F.col("name").alias(cfg.field),
            F.col("translation").alias("__dict_xlat"),
        )
        # a name can satisfy several rows of a sliced dictionary (e.g.
        # wildcard params); keep one deterministic translation per name
        .groupBy(cfg.field)
        .agg(F.min("__dict_xlat").alias("__dict_xlat"))
    )
    # the deterministic transliterator produces Latin English text — it
    # is a valid fallback only for (eng, Latn-or-any) requests from a
    # Cyrillic (or any) source script
    translit_ok = (
        target_language == "eng"
        and target_script in (ANY_SCRIPT, "Latn")
        and source_script in (ANY_SCRIPT, "Cyrl")
        and source_language in (ANY_LANGUAGE, "rus")
    )

    def stage(df: DataFrame) -> DataFrame:
        joined = df.join(F.broadcast(dim), cfg.field, "left")
        fallback = (
            F.when(has_cyrillic_col(F.col(cfg.field)),
                   transliterate_cyr_col(F.col(cfg.field)))
            if translit_ok
            else F.lit(None).cast("string")
        )
        value = F.coalesce(F.col("__dict_xlat"), fallback)
        return apply_guarded(
            joined, cfg.field, target, value,
            ignore_failure=cfg.ignore_failure,
        ).drop("__dict_xlat")

    return stage
