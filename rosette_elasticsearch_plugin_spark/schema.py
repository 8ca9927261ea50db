"""Schemas for the engine's tables.

The reference's document model is a schemaless map mutated in place
(``RosetteAbstractProcessor.java:54`` get / ``LanguageProcessor.java:66``
set).  Spark-first, we fix an explicit schema and enrichment only ever
*adds* columns (never mutates ``spans`` — the per-row span-sequence
invariant from ``BASELINE.json`` ``input_hint``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- primary input (BASELINE.json input_hint) -------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # 'text'|'image'|'audio'|'video'
        T.StructField("text", T.StringType()),       # null for media spans
        T.StructField("media_ref", T.StringType()),  # null for text spans
        T.StructField("offset", T.IntegerType()),    # order / char position
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

# --- mention layer (cf. ADM mentions, entities_response.json:319-338) -------
MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("mention_id", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("normalized", T.StringType()),
        T.StructField("source", T.StringType()),      # 'kb-linker'|'statistical'
        T.StructField("type", T.StringType()),        # PERSON|PRODUCT|ORGANIZATION|...
        T.StructField("entity_label", T.StringType()),  # ground-truth cluster (tests only)
    ]
)

# --- ros_entities output struct (EntitiesProcessor.java:132-184) ------------
OFFSET = T.StructType(
    [T.StructField("start", T.IntegerType()), T.StructField("end", T.IntegerType())]
)


def entity_struct(
    include_offsets: bool = False,
    include_translation: bool = False,
    include_sentiment: bool = False,
) -> T.StructType:
    """Entity struct mirroring ``EntitiesProcessor.java:139-181``:
    always {mention, entityId, type, count}; offsets / translation /
    sentiment only when the matching flag is on (absent, not null —
    cf. ``EntitiesProcessorTest.java:60-78``)."""
    fields = [
        T.StructField("mention", T.StringType()),
        T.StructField("entityId", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("count", T.IntegerType()),
    ]
    if include_offsets:
        fields.append(T.StructField("offsets", T.ArrayType(OFFSET)))
    if include_translation:
        fields.append(T.StructField("translation", T.StringType()))
    if include_sentiment:
        fields.append(T.StructField("sentiment", T.StringType()))
    return T.StructType(fields)


# --- labeled pairs for F1 evaluation (FIXTURES.md §4) ------------------------
LABELED_PAIRS = T.StructType(
    [
        T.StructField("mention_id_a", T.StringType()),
        T.StructField("mention_id_b", T.StringType()),
        T.StructField("block_key", T.StringType()),
        T.StructField("is_match", T.BooleanType()),
    ]
)
