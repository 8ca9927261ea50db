"""Privacy-preserving record linkage (PPRL) encodings: Bloom-filter
bigram encodings + Dice similarity.

Schnell/Bachteler/Reiher-style cryptographic long-term key: each name's
canonical key is reduced to its character bigrams; each bigram sets
``k`` positions (independent salted hashes) in an ``m``-bit Bloom
filter; two records are compared ONLY through their filters with the
Dice coefficient 2·|A∩B| / (|A|+|B|).  A party holding just the
encodings can link records without ever seeing a name — the setting
where two index owners (reference: two enriched Elasticsearch indices)
must link entities without exchanging plaintext.

Representation: the filter is the SORTED DISTINCT array of set bit
positions (array<int>), not a packed bitmask — set sizes here are ≤
2·bigrams ≪ m, array_intersect is a built-in, and the encoding stays
engine-portable (DuckDB mirrors every step).  All hashing is the
repo-standard h56 (first 14 md5 hex digits), salted per hash index, so
both engines produce identical positions.

Scale: encoding is a per-row column expression (no UDF, no shuffle);
comparison runs only on blocked candidate pairs.  m=64/k=2 keeps the
arrays tiny; production CLKs (m=1000, k=20) are the same expressions
with different literals.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .hashing import h56_col, h56_sql, shingles_col, shingles_sql

BLOOM_M = 64  # filter size (bit positions)
BLOOM_K = 2  # hash functions per bigram


def bloom_positions_col(
    key: Column, m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """Sorted distinct Bloom bit positions (array<int>) for a key's
    character bigrams. NULL key → NULL (null-propagating like every
    other encoder in functions/)."""
    grams = shingles_col(key, 2)

    # closure factory, NOT `lambda g, i=i`: F.transform treats a
    # 2-positional-arg lambda as (element, array_index) and would
    # overwrite the salt with the gram position
    def _hash_i(i: int):
        pre = F.lit(f"{i}:")
        return lambda g: (h56_col(F.concat(pre, g)) % F.lit(m)).cast("int")

    per_hash = [F.transform(grams, _hash_i(i)) for i in range(k)]
    return F.array_sort(F.array_distinct(F.flatten(F.array(*per_hash))))


def bloom_positions_sql(expr: str, m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    grams = shingles_sql(expr, 2)
    parts = []
    for i in range(k):
        salted = h56_sql(f"concat('{i}:', g)")
        parts.append(
            f"list_transform({grams}, g -> cast({salted} % {m} as int))"
        )
    per_hash = " || ".join(parts)
    return f"list_sort(list_distinct({per_hash}))"


def dice_col(pa: Column, pb: Column) -> Column:
    """Dice coefficient over two position arrays, rounded to 6dp."""
    inter = F.size(F.array_intersect(pa, pb)).cast("double")
    denom = (F.size(pa) + F.size(pb)).cast("double")
    return F.round(
        F.when(denom == 0, 0.0).otherwise(2.0 * inter / denom), 6
    )


def dice_sql(pa: str, pb: str) -> str:
    return (
        f"round(case when len({pa}) + len({pb}) = 0 then 0.0 "
        f"else 2.0 * len(list_intersect({pa}, {pb})) "
        f"/ (len({pa}) + len({pb})) end, 6)"
    )
