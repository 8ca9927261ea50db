"""Multimodal plumbing: mapInPandas schema/batching, deterministic fake
decode, NotImplementedError on the real-decode path."""

import pytest

from rosette_elasticsearch_plugin_spark.operators.media import decode_media
from rosette_elasticsearch_plugin_spark.schema import DOCUMENTS

DOCS = [
    ("d1", [("text", "hello", None, 0), ("image", None, "img://a", 5)]),
    ("d2", [("video", None, "vid://b", 0), ("audio", None, "aud://c", 1)]),
    ("d3", [("text", "only text", None, 0)]),
]


def test_decode_media_fake(spark):
    docs = spark.createDataFrame(DOCS, DOCUMENTS)
    out = decode_media(docs).collect()
    by_ref = {r["media_ref"]: r for r in out}
    assert set(by_ref) == {"img://a", "vid://b", "aud://c"}
    img = by_ref["img://a"]
    assert img["kind"] == "image" and img["n_frames"] == 1
    assert 64 <= img["width"] < 64 + 1920 and 64 <= img["height"] < 64 + 1080
    assert by_ref["vid://b"]["n_frames"] > 1
    # determinism
    again = {r["media_ref"]: r for r in decode_media(docs).collect()}
    assert {k: tuple(v) for k, v in by_ref.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_decode_media_real_path_stubbed(spark):
    docs = spark.createDataFrame(DOCS, DOCUMENTS)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(docs, fake_decode=False).collect()
