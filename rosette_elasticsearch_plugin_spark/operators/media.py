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
from pyspark.sql import DataFrame, functions as F
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
