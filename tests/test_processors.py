"""P2-P6 golden-output tests, mirroring the reference's mocked unit
tests (LanguageProcessorTest → "eng", CategoriesProcessorTest →
"SPORTS", SentimentProcessorTest → "pos", NameTranslationProcessorTest
→ "Владимир Путин"→"Vladimir Putin", EntitiesProcessorTest →
Ghostbusters entity set with option-flag matrix)."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators.categories import categories_stage
from rosette_elasticsearch_plugin_spark.operators.entities import (
    EntitiesConfig,
    entities_stage,
)
from rosette_elasticsearch_plugin_spark.operators.language import language_stage
from rosette_elasticsearch_plugin_spark.operators.name_translation import (
    name_translation_stage,
)
from rosette_elasticsearch_plugin_spark.operators.sentiment import sentiment_stage
from rosette_elasticsearch_plugin_spark.schema import DOCUMENTS

ENGLISH = "This is a very English document. It should be identified as English."
SPORTS = "The football team won the match and the league championship game."
POSITIVE = "I love this great sentence and the excellent mood it brings."
RUSSIAN = "Владимир Путин посетил Москву вчера вечером."


def _one(spark, text, stage, col):
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    return stage(df).collect()[0][col]


def test_language_golden(spark):
    assert _one(spark, ENGLISH, language_stage(), "ros_language") == "eng"
    assert _one(spark, RUSSIAN, language_stage(), "ros_language") == "rus"


def test_categories_golden(spark):
    assert _one(spark, SPORTS, categories_stage(), "ros_category") == "SPORTS"


def test_sentiment_golden(spark):
    assert _one(spark, POSITIVE, sentiment_stage(), "ros_sentiment") == "pos"


def test_translation_golden(spark):
    stage = name_translation_stage(spark)
    df = spark.createDataFrame(
        [("d1", "Владимир Путин"), ("d2", "Дмитрий Петров"), ("d3", "plain name")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["ros_translation"] for r in stage(df).collect()}
    assert got["d1"] == "Vladimir Putin"       # dictionary hit
    assert got["d2"] == "Dmitriy Petrov"       # transliteration fallback
    assert got["d3"] is None                   # no translation available


GB_TEXT = (
    "the original Ghostbusters star Dan Aykroyd spoke to "
    "The Hollywood Reporter about it. later Aykroyd praised Ghostbusters "
    "again and fans of Ghostbusters agreed it was great. "
    "Владимир Путин was not involved."
)

GAZETTEER = [
    ("dan aykroyd", "PERSON"), ("aykroyd", "PERSON"),
    ("ghostbusters", "PRODUCT"),
    ("the hollywood reporter", "ORGANIZATION"),
    ("владимир путин", "PERSON"),
]
ENTITY_IDS = [
    ("dan aykroyd", "Q105221"), ("aykroyd", "Q105221"),
    ("ghostbusters", "Q108745"),
    ("the hollywood reporter", "Q61503"),
    ("владимир путин", "Q7747"),
]


def _gb_docs(spark):
    return spark.createDataFrame(
        [("gb1", [("text", GB_TEXT, None, 0)])], DOCUMENTS
    )


def _gb_entities(spark, cfg):
    gaz = spark.createDataFrame(GAZETTEER, "normalized string, type string")
    eids = spark.createDataFrame(ENTITY_IDS, "normalized string, entityId string")
    out = entities_stage(_gb_docs(spark), gaz, eids, cfg)
    ents = out.collect()[0]["ros_entities"]
    return {e["entityId"]: e for e in ents}


def test_entities_golden_counts_and_types(spark):
    by_id = _gb_entities(spark, EntitiesConfig())
    assert by_id["Q105221"]["mention"] == "dan aykroyd"
    assert by_id["Q105221"]["type"] == "PERSON"
    assert by_id["Q105221"]["count"] == 2      # Dan Aykroyd + Aykroyd
    assert by_id["Q108745"]["count"] == 3      # Ghostbusters ×3
    assert by_id["Q108745"]["type"] == "PRODUCT"
    assert by_id["Q61503"]["count"] == 1
    assert by_id["Q61503"]["type"] == "ORGANIZATION"
    # option flags off → fields absent (EntitiesProcessorTest.java:60-78)
    assert "offsets" not in by_id["Q105221"].asDict()
    assert "translation" not in by_id["Q105221"].asDict()
    assert "sentiment" not in by_id["Q105221"].asDict()


def test_entities_offsets(spark):
    by_id = _gb_entities(spark, EntitiesConfig(include_offsets=True))
    offs = [(o["start"], o["end"]) for o in by_id["Q105221"]["offsets"]]
    a1 = GB_TEXT.index("Dan Aykroyd")
    a2 = GB_TEXT.index("Aykroyd", a1 + len("Dan Aykroyd"))
    assert offs == [(a1, a1 + 11), (a2, a2 + 7)]
    g1 = GB_TEXT.index("Ghostbusters")
    assert by_id["Q108745"]["offsets"][0]["start"] == g1


def test_entities_translation_flag(spark):
    by_id = _gb_entities(spark, EntitiesConfig(include_translation=True))
    # P6f: only PERSON/LOCATION/ORGANIZATION eligible; Cyrillic PERSON
    # transliterates, Latin PERSON has nothing to translate, PRODUCT is null
    assert by_id["Q7747"]["translation"] == "Vladimir Putin"
    assert by_id["Q108745"]["translation"] is None


def test_entities_sentiment_flag(spark):
    by_id = _gb_entities(spark, EntitiesConfig(include_sentiment=True))
    assert by_id["Q105221"]["sentiment"] == "pos"  # "praised ... great"


def test_entities_duplicate_gazetteer_rows_do_not_multiply(spark):
    """A gazetteer with two rows for one name must TYPE the mention
    (deterministic min(type)), never duplicate it through the broadcast
    join — counts and entity rows stay identical to the unique-key
    dictionary."""
    dup_gaz = GAZETTEER + [("dan aykroyd", "ZPERSON")]  # dup key, loses to PERSON
    gaz = spark.createDataFrame(dup_gaz, "normalized string, type string")
    eids = spark.createDataFrame(ENTITY_IDS, "normalized string, entityId string")
    ents = entities_stage(_gb_docs(spark), gaz, eids, EntitiesConfig()).collect()[
        0
    ]["ros_entities"]
    by_id = {e["entityId"]: e for e in ents}
    ids = [e["entityId"] for e in ents]
    assert len(ids) == len(set(ids))
    assert by_id["Q105221"]["count"] == 2       # not inflated by the dup row
    assert by_id["Q105221"]["type"] == "PERSON"  # min(type) pick


def test_entities_translation_typed_beats_wildcard(spark):
    """A dictionary carrying BOTH a typed and a wildcard
    (entity_type=None) row for the same name must yield exactly ONE
    entity row with the TYPED translation — the dual join match used to
    duplicate the entity (ADVICE r2)."""
    from rosette_elasticsearch_plugin_spark.operators.name_translation import (
        TranslationEntry,
    )

    extra = (
        TranslationEntry("Владимир Путин", "Wildcard Putin", "eng", "Latn",
                         None, "rus", "Cyrl", "rus"),
        # wildcard-only name: the wildcard row must still apply
        TranslationEntry("Dan Aykroyd", "Wildcard Aykroyd", "eng", "Latn",
                         None, "xxx", "Zyyy", "xxx"),
    )
    by_id = _gb_entities(
        spark,
        EntitiesConfig(include_translation=True, extra_dictionary=extra),
    )
    # one row per entity (dict keyed by entityId would hide dups — check counts)
    gaz = spark.createDataFrame(GAZETTEER, "normalized string, type string")
    eids = spark.createDataFrame(ENTITY_IDS, "normalized string, entityId string")
    cfg = EntitiesConfig(include_translation=True, extra_dictionary=extra)
    ents = entities_stage(_gb_docs(spark), gaz, eids, cfg).collect()[0][
        "ros_entities"
    ]
    ids = [e["entityId"] for e in ents]
    assert len(ids) == len(set(ids)), f"duplicated entity rows: {ids}"
    # typed DEFAULT_DICTIONARY row wins over the wildcard extra row
    assert by_id["Q7747"]["translation"] == "Vladimir Putin"
    # wildcard-only extra row applies where no typed row exists
    assert by_id["Q105221"]["translation"] == "Wildcard Aykroyd"
