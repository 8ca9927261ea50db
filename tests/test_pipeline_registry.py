"""P0 registry completeness + composed-pipeline parity.

Mirrors the reference IT ``RosetteTextAnalysisPluginIT.java:183-204``
(testAll): the ``it_processors/all.json`` pipeline — categories →
language → sentiment → entities — built through the STAGES registry and
run over the IT's exact input text.  Plus the round-2 fidelity items:
per-entity sentiment (P6b), the full name-translation parameter matrix
(``NameTranslationProcessorTest.java:33-49``), translation_language
wiring in P6f, and the ``ignore_failure`` flag.
"""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators.base import error_col_name
from rosette_elasticsearch_plugin_spark.operators.entities import (
    EntitiesConfig,
    entities_stage,
)
from rosette_elasticsearch_plugin_spark.operators.language import language_stage
from rosette_elasticsearch_plugin_spark.operators.name_translation import (
    name_translation_stage,
)
from rosette_elasticsearch_plugin_spark.operators.base import StageConfig
from rosette_elasticsearch_plugin_spark.plans.pipeline import (
    STAGES,
    build_pipeline,
)
from rosette_elasticsearch_plugin_spark.schema import DOCUMENTS

# the IT's exact input document (RosetteTextAnalysisPluginIT.java:185-188)
IT_TEXT = (
    "Original Ghostbuster Dan Aykroyd, who also co-wrote the 1984 "
    "Ghostbusters film, couldn’t be more pleased with the new all-female "
    "Ghostbusters cast, telling The Hollywood Reporter, “The Aykroyd "
    "family is delighted by this inheritance of the Ghostbusters torch by "
    "these most magnificent women in comedy.”"
)

ALL_JSON = [  # it_processors/all.json:1-20
    {"ros_categories": {"field": "text"}},
    {"ros_language": {"field": "text"}},
    {"ros_sentiment": {"field": "text"}},
    {
        "ros_entities": {
            "field": "text",
            "include_offsets": False,
            "include_translation": False,
            "include_sentiment": False,
        }
    },
]


def test_registry_has_all_reference_processors():
    assert set(STAGES) == {
        "ros_language", "ros_categories", "ros_sentiment",
        "ros_name_translation", "ros_entities",
    }


def test_pipeline_all_mirrors_reference_it(spark):
    df = spark.createDataFrame([(1, IT_TEXT)], "doc_id long, text string")
    out = build_pipeline(spark, ALL_JSON)(df).collect()[0]
    # reference asserts eng / ARTS_AND_ENTERTAINMENT / pos / entity[0]
    # mention "Original Ghostbuster Dan Aykroyd" (:193-203); our
    # deterministic label space maps the category to ENTERTAINMENT and
    # the mention to its normalized form
    assert out["ros_language"] == "eng"
    assert out["ros_category"] == "ENTERTAINMENT"
    assert out["ros_sentiment"] == "pos"
    ents = out["ros_entities"]
    assert ents, "composed pipeline must produce entities"
    assert ents[0]["mention"] == "original ghostbuster dan aykroyd"


def test_pipeline_all_empty_input_passthrough(spark):
    df = spark.createDataFrame(
        [(1, IT_TEXT), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in build_pipeline(spark, ALL_JSON)(df).collect()}
    for d in (2, 3):
        assert rows[d]["ros_entities"] is None
        assert rows[d]["ros_language"] is None
        assert rows[d][error_col_name("ros_language")] is None


def test_entity_sentiment_divergence(spark):
    """P6b: two entities in ONE document get different labels (ADM
    per-entity sentiment, sentiment_adm_response.json)."""
    text = (
        "Maria Lindqvist praised the great show downtown and the crowd "
        "cheered for a long while afterwards. Hours later in the quiet "
        "calm evening Tomas Berg hated the terrible mess outside."
    )
    docs = spark.createDataFrame([("d1", [("text", text, None, 0)])], DOCUMENTS)
    out = entities_stage(docs, cfg=EntitiesConfig(include_sentiment=True))
    ents = {e["mention"]: e["sentiment"] for e in out.collect()[0]["ros_entities"]}
    assert ents["maria lindqvist"] == "pos"
    assert ents["tomas berg"] == "neg"


def test_entities_translation_language_wiring(spark):
    """P6f: cfg.translation_language selects the dictionary slice
    (EntitiesProcessor.java:112-114, 156-176)."""
    text = "Vladimir Putin met Dan Aykroyd."
    docs = spark.createDataFrame([("d1", [("text", text, None, 0)])], DOCUMENTS)
    gaz = spark.createDataFrame(
        [("vladimir putin", "PERSON"), ("dan aykroyd", "PERSON")],
        "normalized string, type string",
    )
    # → rus: dictionary row (Vladimir Putin → Владимир Путин); no
    # transliteration fallback for non-English targets
    out = entities_stage(
        docs, gaz,
        cfg=EntitiesConfig(include_translation=True, translation_language="rus"),
    )
    ents = {e["mention"]: e["translation"] for e in out.collect()[0]["ros_entities"]}
    assert ents["vladimir putin"] == "Владимир Путин"
    assert ents["dan aykroyd"] is None  # no rus dictionary entry


def _xlat(spark, name, **kw):
    df = spark.createDataFrame([("d1", name)], "doc_id string, text string")
    stage = name_translation_stage(spark, **kw)
    return stage(df).collect()[0]["ros_translation"]


def test_translation_param_matrix(spark):
    """NameTranslationProcessorTest.java:33-49 full-parameter call plus
    the wildcard/filter semantics of each of the six parameters."""
    # the unit test's exact parameter set: eng/Latn/PERSON/rus/Cyrl/unknown
    assert _xlat(
        spark, "Владимир Путин",
        target_language="eng", target_script="Latn", entity_type="PERSON",
        source_language="rus", source_script="Cyrl",
        source_language_of_origin="xxx",
    ) == "Vladimir Putin"
    # both directions (IT :120-142): eng → rus via dictionary
    assert _xlat(
        spark, "Vladimir Putin", target_language="rus"
    ) == "Владимир Путин"
    # target_script filter: eng dictionary rows are Latn; requesting
    # Cyrillic English excludes them AND the Latin transliterator
    assert _xlat(
        spark, "Владимир Путин", target_language="eng", target_script="Cyrl"
    ) is None
    # entity_type filter: dictionary rows are PERSON
    assert _xlat(
        spark, "Vladimir Putin", target_language="rus", entity_type="LOCATION"
    ) is None
    # source_language filter: a Japanese-source request must not use the
    # Russian dictionary row or the Cyrillic transliterator
    assert _xlat(
        spark, "Владимир Путин", target_language="eng", source_language="jpn"
    ) is None
    # source hints satisfied → dictionary row still found
    assert _xlat(
        spark, "マット・デイモン", target_language="eng",
        source_language="jpn", source_script="Jpan",
        source_language_of_origin="eng",
    ) == "Matt Damon"
    # transliteration fallback still works under default wildcards
    assert _xlat(spark, "Дмитрий Петров") == "Dmitriy Petrov"


def _flat_vs_interleaved(spark, texts, gaz):
    """Run BOTH ros_entities paths — the single-pass flat-field kernel
    and the interleaved-span pipeline (extract → groupBy → project →
    join) — over the same (doc_id, text) rows with all option flags on.
    Returns (flat_out_df, got, want): the flat stage's output DataFrame
    plus both results as {doc_id: [entity dicts] | None}.  The ONE
    canonical harness for kernel/path parity — any change to the
    invocation shape (a new EntitiesConfig flag, a spans schema field)
    lands here once."""
    from rosette_elasticsearch_plugin_spark.operators.entities import (
        entities_flat_stage,
        entities_stage,
    )

    df = spark.createDataFrame(texts, "doc_id long, text string")
    cfg_dict = {
        "field": "text",
        "include_offsets": True,
        "include_translation": True,
        "include_sentiment": True,
        "gazetteer": gaz,
    }
    flat_out = entities_flat_stage(
        spark, StageConfig(field="text", target_field="ros_entities"), cfg_dict
    )(df)
    docs = df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    gaz_df = spark.createDataFrame(gaz, "normalized string, type string")
    cfg = EntitiesConfig(
        include_offsets=True, include_translation=True, include_sentiment=True
    )
    ref = entities_stage(docs, gaz_df, None, cfg).select(
        "doc_id", "ros_entities"
    )

    def as_plain(rows):
        return {
            str(r["doc_id"]): None
            if r["ros_entities"] is None
            else [e.asDict(recursive=True) for e in r["ros_entities"]]
            for r in rows
        }

    got = as_plain(flat_out.select("doc_id", "ros_entities").collect())
    want = as_plain(ref.collect())
    return flat_out, got, want


def test_flat_entities_stage_shuffle_free_and_path_parity(spark):
    """The flat-field ros_entities stage computes the per-doc entity
    array inside ONE Arrow pass: (a) its physical plan contains no
    Exchange, (b) its output — all option flags on — is value-identical
    to the interleaved-span path (extract → groupBy → project → join)."""
    texts = [
        (1, "Dan Aykroyd praised the great Ghostbusters. Dan Aykroyd "
            "laughed. Владимир Путин hated the terrible weather."),
        (2, "Дмитрий Петров met J. Svensson."),   # translit fallback
        (3, "nothing capitalized here"),          # no mentions → NULL
        (4, ""),                                  # empty → NULL
        (5, None),                                # null → NULL
    ]
    gaz = [
        ("dan aykroyd", "PERSON"),
        ("ghostbusters", "PRODUCT"),
        ("владимир путин", "PERSON"),
        ("дмитрий петров", "PERSON"),  # no dict row → translit fallback
    ]
    flat_out, got, want = _flat_vs_interleaved(spark, texts, gaz)
    plan = flat_out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"flat stage must not shuffle:\n{plan}"
    for d in map(str, range(1, 6)):
        assert got[d] == want.get(d), f"doc {d}: {got[d]} != {want.get(d)}"


def test_flat_entities_random_soup_parity(spark):
    """Seeded random-text parity between the single-pass kernel and the
    interleaved path: 60 docs of mixed Latin/Cyrillic/punctuation soup
    with planted dictionary names, all option flags on.  One Spark job
    per path — broad coverage without per-example job overhead."""
    import random

    rng = random.Random(7)
    words = (
        "alpha Bravo charlie Дмитрий Петров delta O'Neil J. K. Rowling "
        "great terrible the Ghostbusters Владимир Путин love hated x-ray "
        "écho Ñandú zeta 42 . , ! ?"
    ).split(" ")
    texts = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    gaz = [
        ("дмитрий петров", "PERSON"),
        ("владимир путин", "PERSON"),
        ("ghostbusters", "PRODUCT"),
        ("bravo", "LOCATION"),
    ]
    _flat_out, got, want = _flat_vs_interleaved(spark, texts, gaz)
    assert got == want


def test_ignore_failure_flag(spark):
    """ES's per-processor ignore_failure: failures swallowed, row
    continues with null target and NO error (distinct from on_failure
    quarantine routing)."""
    df = spark.createDataFrame([("d1", "zzz qqq xyzzy")], "doc_id string, text string")
    strict = language_stage(StageConfig())(df).collect()[0]
    assert strict["ros_language"] is None
    assert strict[error_col_name("ros_language")] is not None
    lax = language_stage(StageConfig(ignore_failure=True))(df).collect()[0]
    assert lax["ros_language"] is None
    assert lax[error_col_name("ros_language")] is None


def test_ignore_failure_via_config(spark):
    df = spark.createDataFrame([("d1", "zzz qqq xyzzy")], "doc_id string, text string")
    stage = build_pipeline(
        spark, [{"ros_language": {"field": "text", "ignore_failure": True}}]
    )
    out = stage(df).collect()[0]
    assert out["ros_language"] is None
    assert out[error_col_name("ros_language")] is None


def test_unknown_config_param_rejected_at_build(spark):
    """ES factories reject unconsumed properties at creation time; a
    silently-ignored typo would surface as missing output much later."""
    import pytest

    from rosette_elasticsearch_plugin_spark.plans.pipeline import (
        build_pipeline,
    )

    with pytest.raises(ValueError, match=r"doesn't support.*bogus_param"):
        build_pipeline(
            spark, [{"ros_language": {"field": "text", "bogus_param": 1}}]
        )
    with pytest.raises(ValueError, match=r"doesn't support.*target_feild"):
        build_pipeline(
            spark,
            [{"ros_entities": {"field": "text", "target_feild": "oops"}}],
        )
    # every documented key still builds
    build_pipeline(
        spark,
        [
            {"ros_name_translation": {
                "field": "text", "target_field": "tr",
                "target_language": "eng", "target_script": "Latn",
                "entity_type": "PERSON", "source_language": "rus",
                "source_script": "Cyrl", "source_language_of_origin": "rus",
                "ignore_failure": True,
            }},
            {"ros_entities": {
                "field": "text", "include_offsets": True,
                "include_translation": True, "translation_language": "eng",
                "include_sentiment": True, "sentiment_window": 30,
                "dictionary": (), "pattern": "[a-z]{2,}",
            }},
        ],
    )
