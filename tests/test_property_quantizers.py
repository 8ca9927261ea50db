"""Property tests for the round-5 exact-integer 6dp quantizers.

The grid-midpoint fixes (char_entropy, char_lm, Monge-Elkan) replaced
`round(double, 6)` with integer formulas that must equal the EXACT
half-up / half-away-from-zero decimal quantization of the underlying
rational for every input — not just the fixture values the oracle gate
sees.  Ground truth here is `fractions.Fraction` + integer floor, with
no doubles anywhere, so a counterexample is a real formula bug."""
from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _true_half_up6(q: Fraction) -> int:
    """Exact ROUND_HALF_UP of q to 6dp, in micro-units (q >= 0)."""
    scaled = q * 1_000_000
    return (scaled.numerator * 2 + scaled.denominator) // (
        2 * scaled.denominator
    )


def _true_half_away6(q: Fraction) -> int:
    """Exact ROUND_HALF_AWAY_FROM_ZERO of q to 6dp, micro-units."""
    if q < 0:
        return -_true_half_up6(-q)
    return _true_half_up6(q)


# --- char_entropy: (s + 500) // 1000 over nano sums ------------------------------
@settings(max_examples=500)
@given(st.integers(min_value=0, max_value=10**13))
def test_entropy_nano_quantizer_is_exact_half_up(s):
    micro = (s + 500) // 1000
    assert micro == _true_half_up6(Fraction(s, 10**9))


def test_entropy_nano_quantizer_midpoints():
    # the exact s % 1000 == 500 ties that flipped at sf0.1 round up
    for s in (4131227500, 4143841500, 500, 1500):
        assert (s + 500) // 1000 == s // 1000 + 1


# --- char_lm: sign-aware (2|su| + n) // (2n) over micro sums ---------------------
@settings(max_examples=500)
@given(
    st.integers(min_value=-10**12, max_value=10**12),
    st.integers(min_value=1, max_value=10**6),
)
def test_char_lm_mean_quantizer_is_exact_half_away(su, n):
    sgn = -1 if su < 0 else 1
    micro = sgn * ((2 * abs(su) + n) // (2 * n))
    assert micro == _true_half_away6(Fraction(su, n * 10**6))


# --- monge-elkan: (2p + q) // (2q) on the micro-sum rationals --------------------
@settings(max_examples=500)
@given(
    st.integers(min_value=0, max_value=10**7),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0, max_value=10**7),
    st.integers(min_value=1, max_value=64),
)
def test_monge_elkan_quantizers_are_exact_half_up(sa, na, sb, nb):
    me_ab = (2 * sa + na) // (2 * na)
    me_ba = (2 * sb + nb) // (2 * nb)
    me = (2 * (sa * nb + sb * na) + 2 * na * nb) // (4 * na * nb)
    assert me_ab == _true_half_up6(Fraction(sa, na * 10**6))
    assert me_ba == _true_half_up6(Fraction(sb, nb * 10**6))
    # me quantizes the exact mean of the two UNROUNDED ratios
    mean = (Fraction(sa, na) + Fraction(sb, nb)) / 2 / 10**6
    assert me == _true_half_up6(mean)


# --- the double-division implementations cannot drift from the integers ----------
# Spark computes floor((2p + q) / (2q)) with a DOUBLE division; the
# operator relies on that equalling integer (2p + q) // (2q).  That
# holds whenever (a) the numerator stays below 2^53 (exact conversion)
# and (b) the quotient's rational granularity 1/(2q) exceeds the ulp
# at the quotient's magnitude — both true across the operators'
# envelope: char_lm has |su| ≤ n·24e6 with n ≤ ~1e7 bigrams/doc
# (quotient ≤ 2.4e7, ulp 3.7e-9 ≪ granularity 2.5e-8), monge-elkan
# has micro-sums ≤ tokens·1e6 with tiny token counts.  Exercise that
# envelope; a failure means the envelope argument broke.
@settings(max_examples=500)
@given(
    st.integers(min_value=0, max_value=24 * 10**13),
    st.integers(min_value=1, max_value=10**7),
)
def test_float_floor_division_matches_integer_division(p, q):
    import math

    assert math.floor((2 * p + q) / (2 * q)) == (2 * p + q) // (2 * q)
