"""End-to-end mirror of the reference's docker black-box scenario
(``/root/reference/docker/test.sh:33-193``):

* TWO pipelines built through the registry — ``rosapi`` (with
  ``ros_categories``) and ``rosapi_jpn`` (without — "Pipeline without
  categories since it only supports English", test.sh:89), both ending
  in two ``ros_entities`` stages (full-flags → ``entities_sentiment``,
  bare → ``entities``) and ``ros_name_translation`` (field ``name``,
  target_language ``rus``);
* THREE documents — the Ghostbusters IT text, a Japanese news text,
  and the Nabokov text carrying a ``name`` field (test.sh:158-181);
* the typed output mapping (test.sh:138-154) asserted on the result
  schema;
* the closing constant_score/exists search on the enriched
  ``language`` field (test.sh:185-195) returning every document.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rosette_elasticsearch_plugin_spark.operators.base import error_col_name
from rosette_elasticsearch_plugin_spark.plans.pipeline import build_pipeline

from test_pipeline_registry import IT_TEXT

JPN_TEXT = (
    "バングラデシュ政府、ロヒンギャ難民の島への移動を計画 "
    "テンガール・チャール島は約10年前に、メグナ川の堆積土で形成され、"
    "高潮の際には数十センチの水に囲まれてしまう。"
    "約30キロ西には60万人が住むハティア島があり、現在の難民キャンプからの"
    "移動には9時間かかる。"
)

NABOKOV_TEXT = (
    "Vladimir Vladimirovich Nabokov was a Russian-American novelist and "
    "entomologist. His first nine novels were in Russian, and he achieved "
    "international prominence after he began writing English prose."
)

# the shared pipeline tail (test.sh:35-85 processors after categories)
_TAIL = [
    {"ros_sentiment": {"field": "text", "target_field": "sentiment"}},
    {
        "ros_entities": {
            "field": "text",
            "target_field": "entities_sentiment",
            "include_sentiment": True,
            "include_offsets": True,
            "include_translation": True,
            "translation_language": "eng",
        }
    },
    {
        "ros_entities": {
            "field": "text",
            "target_field": "entities",
            "include_sentiment": False,
            "include_offsets": False,
            "include_translation": False,
            "translation_language": "eng",
        }
    },
    {
        "ros_name_translation": {
            "field": "name",
            "target_field": "translation",
            "target_language": "rus",
        }
    },
]

ROSAPI = [
    {"ros_language": {"field": "text", "target_field": "language"}},
    {"ros_categories": {"field": "text", "target_field": "category"}},
    *_TAIL,
]
ROSAPI_JPN = [
    {"ros_language": {"field": "text", "target_field": "language"}},
    *_TAIL,
]


def _index(spark):
    """Docs 1+3 through rosapi, doc 2 through rosapi_jpn, unioned into
    one 'index' (the jpn pipeline has no category → null, like a
    mapping field the pipeline never set)."""
    schema = "doc_id long, text string, name string"
    eng = spark.createDataFrame(
        [(1, IT_TEXT, None), (3, NABOKOV_TEXT, "Vladimir Nabokov")], schema
    )
    jpn = spark.createDataFrame([(2, JPN_TEXT, None)], schema)
    out_eng = build_pipeline(spark, ROSAPI)(eng)
    out_jpn = build_pipeline(spark, ROSAPI_JPN)(jpn)
    return out_eng.unionByName(out_jpn, allowMissingColumns=True)


def test_docker_smoke_scenario(spark):
    out = _index(spark)
    rows = {r["doc_id"]: r for r in out.collect()}

    # --- typed mapping (test.sh:138-154): keyword scalars, nested
    # entities, text translation
    sch = {f.name: f.dataType for f in out.schema.fields}
    for kw in ("language", "category", "sentiment", "translation"):
        assert sch[kw] == T.StringType()
    for nested in ("entities", "entities_sentiment"):
        assert isinstance(sch[nested], T.ArrayType)
        assert isinstance(sch[nested].elementType, T.StructType)
    bare = sch["entities"].elementType.fieldNames()
    full = sch["entities_sentiment"].elementType.fieldNames()
    assert bare == ["mention", "entityId", "type", "count"]
    assert full == [
        "mention", "entityId", "type", "count",
        "offsets", "translation", "sentiment",
    ]

    # --- doc 1 (IT text through rosapi): the reference asserts
    # eng / entertainment-category / pos / Aykroyd head mention
    d1 = rows[1]
    assert d1["language"] == "eng"
    assert d1["category"] == "ENTERTAINMENT"
    assert d1["sentiment"] == "pos"
    assert d1["entities"][0]["mention"] == "original ghostbuster dan aykroyd"
    # per-entity sentiment is window-local: the head entity's ±40 chars
    # carry no markers (neu), but entities near "pleased"/"delighted"
    # label pos — per-entity labels genuinely differ from each other
    ent_sent = {e["mention"]: e["sentiment"] for e in d1["entities_sentiment"]}
    assert "pos" in ent_sent.values()
    assert d1["translation"] is None  # no name field → guard-2 passthrough
    assert d1[error_col_name("translation")] is None

    # --- doc 2 (Japanese through rosapi_jpn): language detected, no
    # category stage ran
    d2 = rows[2]
    assert d2["language"] == "jpn"
    assert d2["category"] is None
    assert error_col_name("category") not in [
        f.name for f in out_jpn_schema_fields(spark)
    ]

    # --- doc 3 (Nabokov + name field): eng text; the rus-target name
    # translation resolves through the dictionary like the demo's RNT
    d3 = rows[3]
    assert d3["language"] == "eng"
    assert d3["translation"] == "Владимир Набоков"
    # our deterministic categorizer has no label for this text →
    # guard 4 error recorded (the engine's documented on_failure shape)
    assert d3["category"] is None
    assert d3[error_col_name("category")] is not None

    # --- exists search (test.sh:185-195): every indexed doc has the
    # enriched language field
    assert out.where(F.col("language").isNotNull()).count() == 3


def out_jpn_schema_fields(spark):
    return build_pipeline(spark, ROSAPI_JPN)(
        spark.createDataFrame(
            [(2, JPN_TEXT, None)], "doc_id long, text string, name string"
        )
    ).schema.fields
