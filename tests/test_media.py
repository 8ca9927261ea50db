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


def test_media_phash_bits_and_determinism(spark):
    from pyspark.sql import functions as F

    from rosette_elasticsearch_plugin_spark.operators.media import (
        media_phash_col,
    )

    docs = spark.createDataFrame(DOCS, DOCUMENTS)
    meta = decode_media(docs)
    ph = meta.select(
        "media_ref", "sha", media_phash_col(F.col("sha")).alias("phash")
    ).collect()
    assert len(ph) == 3
    for r in ph:
        assert 0 <= r["phash"] < 256
        # bit i set iff feature byte i >= 128 (sign of the feature comp)
        expect = sum(
            1 << i
            for i in range(8)
            if int(r["sha"][2 * i : 2 * i + 2], 16) >= 128
        )
        assert r["phash"] == expect
    with pytest.raises(ValueError, match="bits"):
        media_phash_col(F.col("sha"), bits=9)


def test_media_near_pairs_matches_brute_force(spark):
    """Pigeonhole recall: the 2-band bucketed join finds EXACTLY the
    brute-force Hamming<=1 pair set (and never reports hamming > 1)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from rosette_elasticsearch_plugin_spark.operators.media import (
        media_near_pairs,
    )

    # 40 refs: sha-derived phashes give a dense-enough 8-bit space that
    # both same-band collisions and cross-band misses occur
    rows = [(f"img://p/{i}", None) for i in range(40)]
    ph_src = spark.createDataFrame(
        [(r,) for r, _ in rows], "media_ref string"
    ).select(
        "media_ref",
        F.conv(F.substring(F.sha2(F.col("media_ref"), 256), 1, 2), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    got = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in media_near_pairs(ph_src, bits=8, bands=2, max_hamming=1).collect()
    }
    local = {r["media_ref"]: r["phash"] for r in ph_src.collect()}
    want = {}
    for a, b in combinations(sorted(local), 2):
        h = bin(local[a] ^ local[b]).count("1")
        if h <= 1:
            want[(a, b)] = h
    assert got == want and want  # non-vacuous
    with pytest.raises(ValueError, match="bands"):
        media_near_pairs(ph_src, bits=8, bands=3)
