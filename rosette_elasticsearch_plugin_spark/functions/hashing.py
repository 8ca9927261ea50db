"""Deterministic cross-engine hashing + MinHash / SimHash primitives.

The reference's blocking is delegated to the Rosette kb-linker; we build
it natively (SURVEY.md §2.4 R5).  Everything here is a pure Spark column
expression with an exact DuckDB-SQL mirror, so the driver's oracle can
verify signatures value-for-value.

Common 56-bit hash h56(s):
  Spark : conv(substring(md5(s), 1, 14), 16, 10) :: long
  DuckDB: cast(concat('0x', substring(md5(s), 1, 14)) as bigint)
Both read the first 14 hex digits of the MD5 → [0, 2^56), no sign issues.

MinHash permutation i over a shingle set S:
  sig_i = min_{x in S} (A_i * (h56(x) % P) + B_i) % P,  P = 2^31 - 1
A_i * (h56 % P) < 2^31 * 2^31 = 2^62 → no int64 overflow on either engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1  # 2147483647, prime


def h56_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("long")


def h56_sql(expr: str) -> str:
    return f"cast(concat('0x', substring(md5({expr}), 1, 14)) as bigint)"


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs; A_i in [1, P), B_i in [0, P)."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(num_perm)
    ]


# --- char-shingles ------------------------------------------------------------
def shingles_col(c: Column, n: int = 3) -> Column:
    """Character n-grams of a string as an array; whole string if len < n.
    transform over sequence(1, len-n+1) keeps everything JVM-side."""
    short = F.array(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.when(F.length(c) < n, short).otherwise(grams)


def shingles_sql(expr: str, n: int = 3) -> str:
    return (
        f"case when length({expr}) < {n} then [{expr}] "
        f"else list_transform(generate_series(1, length({expr}) - {n - 1}), "
        f"i -> substring({expr}, i, {n})) end"
    )


# --- MinHash signature --------------------------------------------------------
def hashed_shingles_col(shingles: Column) -> Column:
    """h56 % P per shingle, as array<long> — materialize this ONCE per row
    (own projection) so the md5 work is not repeated per permutation."""
    return F.transform(shingles, lambda x: h56_col(x) % F.lit(MERSENNE_P))


def hashed_shingles_sql(shingles_expr: str) -> str:
    return (
        f"list_transform({shingles_expr}, x -> {h56_sql('x')} % {MERSENNE_P})"
    )


def minhash_sig_from_hashes_col(
    hashes: Column, params: list[tuple[int, int]]
) -> Column:
    """Array<long> signature from pre-hashed shingles: pure arithmetic
    per permutation (no re-hashing)."""
    p = F.lit(MERSENNE_P)

    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % p

    sig = [F.array_min(F.transform(hashes, perm(a, b))) for a, b in params]
    return F.array(*sig)


def minhash_sig_from_hashes_sql(
    hashes_expr: str, params: list[tuple[int, int]]
) -> str:
    parts = [
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for a, b in params
    ]
    return "[" + ", ".join(parts) + "]"


def minhash_sig_col(shingles: Column, params: list[tuple[int, int]]) -> Column:
    """Array<long> signature: per permutation, min over shingles.
    Convenience one-expression form; for wide inputs prefer the
    two-step hashed_shingles_col → minhash_sig_from_hashes_col."""
    return minhash_sig_from_hashes_col(hashed_shingles_col(shingles), params)


def minhash_sig_sql(shingles_expr: str, params: list[tuple[int, int]]) -> str:
    h = h56_sql("x")
    parts = [
        f"list_min(list_transform({shingles_expr}, "
        f"x -> ({a} * ({h} % {MERSENNE_P}) + {b}) % {MERSENNE_P}))"
        for a, b in params
    ]
    return "[" + ", ".join(parts) + "]"


def lsh_band_keys_col(sig: Column, bands: int, rows: int) -> Column:
    """Array of band keys 'b:<i>:<v1>_<v2>_...' from an array signature.

    F.concat, NOT concat_ws: a NULL signature element (MinHash over an
    empty shingle set) must produce a NULL key — concat_ws silently
    DROPS nulls, which collapsed every unsignable doc onto the shared
    key 'b<i>' (a phantom all-empty-docs bucket) and diverged from the
    SQL mirror, where ``||`` null-propagates.  NULL keys drop out of
    every downstream equi-join; explode consumers filter them eagerly
    (operators/dedup.band_key_table)."""
    keys = []
    for b in range(bands):
        vals = [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
        parts = [F.lit(f"b{b}")]
        for v in vals:
            parts += [F.lit("_"), v.cast("string")]
        keys.append(F.concat(*parts))
    return F.array(*keys)


def lsh_band_keys_sql(sig_expr: str, bands: int, rows: int) -> str:
    keys = []
    for b in range(bands):
        vals = " || '_' || ".join(
            f"cast({sig_expr}[{b * rows + r + 1}] as varchar)" for r in range(rows)
        )
        keys.append(f"'b{b}' || '_' || {vals}")
    return "[" + ", ".join(keys) + "]"


# --- SimHash (56-bit, over token sets) -----------------------------------------
def simhash_from_hashes_col(hashes: Column, bits: int = 56) -> Column:
    """SimHash from a precomputed array<long> of token hashes — hash each
    token once, not once per bit (56× cheaper than hashing inline).

    Shape: ONE ``aggregate`` fold that zip-adds each hash's 56-bit
    vector into a running per-bit counter array, then one zip with the
    power-of-two literals.  The previous form summed 56 independent
    ``size(filter(...))`` terms in a single expression — the generated
    processNext() exceeded janino's 64 KB method limit and the stage
    fell back to interpreted evaluation.  Same per-row op count, small
    constant-size expression tree.  (``call_function('shiftright', …)``
    because the pyspark wrapper only accepts a literal shift amount,
    while the underlying expression takes any column.)"""
    n = F.size(hashes)
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda j: (F.call_function("shiftright", h, j) % 2).cast("int"),
            ),
            lambda a, b: a + b,
        ),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    majority = F.zip_with(
        counts,
        powers,
        lambda cnt, p: F.when(cnt * 2 > n, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(majority, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_from_hashes_sql(hashes_expr: str, bits: int = 56) -> str:
    terms = []
    for j in range(bits):
        cnt = f"len(list_filter({hashes_expr}, h -> (h // {1 << j}) % 2 = 1))"
        terms.append(
            f"(case when 2 * {cnt} > len({hashes_expr}) "
            f"then cast({1 << j} as bigint) else 0 end)"
        )
    # NULL guard: Spark's aggregate over a NULL array yields NULL, but
    # the per-bit cases fall to their ELSE 0 when len() is NULL
    return (
        f"(case when {hashes_expr} is null then null else "
        + " + ".join(terms)
        + " end)"
    )


def simhash_col(tokens: Column, bits: int = 56) -> Column:
    """Sum of 2^j over bits j where the majority of token hashes set bit j.
    Strict majority (2*cnt > n) keeps parity with the SQL mirror."""
    return simhash_from_hashes_col(
        F.transform(tokens, lambda t: h56_col(t)), bits
    )


def simhash_sql(tokens_expr: str, bits: int = 56) -> str:
    h = h56_sql("t")
    terms = []
    for j in range(bits):
        cnt = f"len(list_filter({tokens_expr}, t -> ({h} // {1 << j}) % 2 = 1))"
        terms.append(
            f"(case when 2 * {cnt} > len({tokens_expr}) "
            f"then cast({1 << j} as bigint) else 0 end)"
        )
    # NULL guard: same semantics as simhash_from_hashes_sql
    return (
        f"(case when {tokens_expr} is null then null else "
        + " + ".join(terms)
        + " end)"
    )
