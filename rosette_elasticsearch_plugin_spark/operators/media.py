"""Multimodal (image/audio/video) span plumbing.

Media spans are opaque references/bytes with typed metadata.  The real
decode/feature-extraction step needs codec libraries that are not in
this container, so the decode kernel is STUBBED with a deterministic
fake (``fake_decode=True``, the default) or raises NotImplementedError
(``fake_decode=False``) — but the Spark-side plumbing is real:

* schema: (doc_id, media_ref, kind, width, height, n_frames, sha)
* execution: ``mapInPandas`` — Arrow record batches in/out, the shape a
  vectorized image decoder (PIL/ffmpeg worker) would use at scale;
* partitioning: media work is per-span, embarrassingly parallel; the
  explode keeps it row-distributed with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sha", T.StringType()),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Project the non-text spans: (doc_id, kind, media_ref)."""
    ex = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] != F.lit("text"))
        ).alias("span"),
    )
    return ex.select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
    )


def _fake_decode(ref: str, kind: str) -> tuple[int, int, int, str]:
    """Deterministic stand-in for the codec: dimensions derived from the
    ref's sha256 so tests are stable and distribution-friendly."""
    h = hashlib.sha256(ref.encode()).hexdigest()
    width = 64 + int(h[:4], 16) % 1920
    height = 64 + int(h[4:8], 16) % 1080
    n_frames = 1 if kind == "image" else 1 + int(h[8:12], 16) % 300
    return width, height, n_frames, h[:16]


def decode_media(docs: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Media metadata table via mapInPandas (Arrow-batched)."""
    spans = media_spans(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; run with fake_decode=True"
                )
            rows = [
                (d, r, k, *_fake_decode(r, k))
                for d, k, r in zip(pdf["doc_id"], pdf["kind"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "kind",
                    "width", "height", "n_frames", "sha",
                ],
            )

    return spans.mapInPandas(batches, MEDIA_META)


def _h4_sql(sha_expr: str, pos: int) -> str:
    return f"cast(concat('0x', substring({sha_expr}, {pos}, 4)) as bigint)"


def decode_media_sql(doc_id_expr: str, ref_expr: str, kind_expr: str) -> str:
    """DuckDB mirror of the fake decode (sha256-derived dims) as a
    select-list fragment; yields width, height, n_frames, sha."""
    sha = f"sha256({ref_expr})"
    return (
        f"cast({doc_id_expr} as varchar) as doc_id, {ref_expr} as media_ref, "
        f"{kind_expr} as kind, "
        f"cast(64 + {_h4_sql(sha, 1)} % 1920 as int) as width, "
        f"cast(64 + {_h4_sql(sha, 5)} % 1080 as int) as height, "
        f"cast(case when {kind_expr} = 'image' then 1 "
        f"else 1 + {_h4_sql(sha, 9)} % 300 end as int) as n_frames, "
        f"substring({sha}, 1, 16) as sha"
    )


def resize_dims(meta: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving downscale targets (never upscale) — pure column
    math, the planning half of a resize kernel; the pixel work would be
    a Pandas UDF over the decoded bytes."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return meta.select(
        "doc_id",
        "media_ref",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int")
        .alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int")
        .alias("out_h"),
    )


def resize_dims_sql(max_w: int = 224, max_h: int = 224) -> str:
    scale = (
        f"least(cast({max_w} as double) / width, "
        f"cast({max_h} as double) / height, 1.0)"
    )
    return (
        f"select doc_id, media_ref, width, height, "
        f"cast(greatest(floor(width * {scale}), 1) as int) as out_w, "
        f"cast(greatest(floor(height * {scale}), 1) as int) as out_h"
    )


def sample_frames(meta: DataFrame, stride: int = 30) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index (0, stride,
    2*stride, … < n_frames).  The decode of each sampled frame is the
    stubbed kernel; the explode IS the real distribution shape (frame
    rows stay partition-local, no shuffle).

    Rows with n_frames ≤ 0 (a real decoder's corrupt/empty video) are
    dropped BEFORE the sequence: Spark's ``sequence(0, -1, 30)`` throws
    where DuckDB's generate_series returns empty — filtering keeps the
    engines value-identical and the stage alive."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
    return meta.where(F.col("n_frames") > 0).select(
        "doc_id",
        "media_ref",
        "n_frames",
        F.explode(idx).alias("frame_idx"),
    )


def media_feature_col(sha_col: Column, dim: int = 8) -> Column:
    """Deterministic fake feature vector from the decode sha — stands in
    for an image-embedding Pandas UDF; array<double> in [-1, 1).

    dim is bounded by the 16 stored hex chars (8 byte pairs): beyond it
    Spark would silently emit nulls while DuckDB errors on the empty
    hex cast — fail fast instead."""
    if dim > 8:
        raise ValueError(f"dim must be <= 8 (16 stored sha hex chars): {dim}")
    comps = [
        F.round(
            F.conv(F.substring(sha_col, 2 * i + 1, 2), 16, 10).cast("double")
            / 255.0
            * 2.0
            - 1.0,
            6,
        )
        for i in range(dim)
    ]
    return F.array(*comps)


def media_phash_col(sha_col: Column, bits: int = 8) -> Column:
    """Sign-quantized perceptual hash over the decoded feature bytes:
    bit i is set iff feature byte i >= 128 (equivalently, the i-th
    ``media_feature_col`` component >= 0).  Stands in for a DCT pHash —
    the real kernel would emit the same integer column from pixel data —
    while the banding / Hamming-verify plumbing downstream
    (`media_near_pairs`) is the production shape.  At scale you would
    widen to 64 bits and 4 bands; the stored sha bounds this stub to 8.
    """
    if bits > 8:
        raise ValueError(f"bits must be <= 8 (16 stored sha hex chars): {bits}")
    out = F.lit(0).cast("long")
    for i in range(bits):
        byte = F.conv(F.substring(sha_col, 2 * i + 1, 2), 16, 10).cast("long")
        out = out + F.when(byte >= 128, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def media_phash_sql(sha_expr: str, bits: int = 8) -> str:
    if bits > 8:
        raise ValueError(f"bits must be <= 8 (16 stored sha hex chars): {bits}")
    terms = [
        f"case when cast(concat('0x', substring({sha_expr}, {2 * i + 1}, 2)) "
        f"as bigint) >= 128 then {1 << i} else 0 end"
        for i in range(bits)
    ]
    return "cast(" + " + ".join(terms) + " as bigint)"


def media_near_pairs(
    phashed: DataFrame,
    bits: int = 8,
    bands: int = 2,
    max_hamming: int = 1,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: banded LSH self-join over
    the phash, exact Hamming verify — never all-pairs.

    Pigeonhole recall guarantee: with ``bands`` equal-width bit bands,
    a pair at Hamming distance <= bands-1 leaves at least one band
    untouched, so the banded join finds EVERY pair within
    ``max_hamming`` <= bands-1 — the DuckDB oracle exploits this by
    checking the bucketed plan against brute-force all-pairs SQL.
    Input: (media_ref, phash); output (ref_a, ref_b, hamming), one row
    per unordered pair of distinct refs.  Cost is per-bucket quadratic
    only; at web scale widen bits/bands (64/4) so buckets stay small —
    the same budget lever as the MinHash band family."""
    if bits % bands:
        raise ValueError(f"bands must divide bits: {bits} % {bands}")
    w = bits // bands
    nodes = phashed.select("media_ref", "phash").distinct()
    banded = nodes.select(
        "media_ref",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("phash"), b * w)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("media_ref", "phash", "band.band_idx", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def media_feature_sql(sha_expr: str, dim: int = 8) -> str:
    if dim > 8:
        raise ValueError(f"dim must be <= 8 (16 stored sha hex chars): {dim}")
    comps = [
        f"round(cast(concat('0x', substring({sha_expr}, {2 * i + 1}, 2)) as bigint)"
        f" / 255.0 * 2.0 - 1.0, 6)"
        for i in range(dim)
    ]
    return "[" + ", ".join(comps) + "]"
