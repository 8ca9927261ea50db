"""R4 — Double Metaphone phonetic keys for blocking.

Pure-Python implementation of Lawrence Philips' Double Metaphone
(C/C++ algorithm published in CUJ, June 2000 — public knowledge),
wrapped in an Arrow-batched pandas UDF.  Used as one of the three
blocking key families (SURVEY.md §2.4 R4): two names land in the same
phonetic block when either of their (primary, secondary) codes collide.

Non-Latin input (Cyrillic, CJK) has no Latin phonetics; we return the
empty code so those names rely on the normalized-name and MinHash-LSH
blockers instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

VOWELS = frozenset("AEIOUY")


def _is_slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def double_metaphone(value: str | None, max_len: int = 4) -> tuple[str, str]:
    """Return (primary, secondary) codes, each up to ``max_len`` chars."""
    if not value:
        return ("", "")
    s = "".join(ch for ch in value.upper() if "A" <= ch <= "Z" or ch == " ")
    s = s.replace(" ", "")
    if not s:
        return ("", "")
    length = len(s)
    last = length - 1
    sg = _is_slavo_germanic(s)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, q: str | None = None) -> None:
        pri.append(p)
        sec.append(p if q is None else q)

    def ch(i: int) -> str:
        return s[i] if 0 <= i < length else ""

    def sub(i: int, n: int) -> str:
        return s[i : i + n] if i >= 0 else ""

    i = 0
    # skip silent initial letters
    if sub(0, 2) in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if ch(0) == "X":  # initial X → S (Xavier)
        add("S")
        i = 1

    while i < length and (len(pri) < max_len or len(sec) < max_len):
        c = ch(i)
        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
        elif c == "B":
            add("P")
            i += 2 if ch(i + 1) == "B" else 1
        elif c == "C":
            if i > 1 and ch(i - 2) not in VOWELS and sub(i - 1, 3) == "ACH" and (
                ch(i + 2) != "I"
                and (ch(i + 2) != "E" or sub(i - 2, 6) in ("BACHER", "MACHER"))
            ):
                add("K")
                i += 2
            elif i == 0 and sub(i, 6) == "CAESAR":
                add("S")
                i += 2
            elif sub(i, 4) == "CHIA":
                add("K")
                i += 2
            elif sub(i, 2) == "CH":
                if i > 0 and sub(i, 4) == "CHAE":
                    add("K", "X")
                elif i == 0 and (
                    sub(i + 1, 5) in ("HARAC", "HARIS")
                    or sub(i + 1, 3) in ("HOR", "HYM", "HIA", "HEM")
                ) and sub(0, 5) != "CHORE":
                    add("K")
                elif (
                    sub(0, 4) in ("VAN ", "VON ")
                    or sub(0, 3) == "SCH"
                    or sub(i - 2, 6) in ("ORCHES", "ARCHIT", "ORCHID")
                    or ch(i + 2) in ("T", "S")
                    or (
                        (ch(i - 1) in ("A", "O", "U", "E") or i == 0)
                        and ch(i + 2) in ("L", "R", "N", "M", "B", "H", "F", "V", "W", "")
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if sub(0, 2) == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif sub(i, 2) == "CZ" and sub(i - 2, 4) != "WICZ":
                add("S", "X")
                i += 2
            elif sub(i + 1, 3) == "CIA":
                add("X")
                i += 3
            elif sub(i, 2) == "CC" and not (i == 1 and ch(0) == "M"):
                if ch(i + 2) in ("I", "E", "H") and sub(i + 2, 2) != "HU":
                    if (i == 1 and ch(i - 1) == "A") or sub(i - 1, 5) in (
                        "UCCEE",
                        "UCCES",
                    ):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif sub(i, 2) in ("CK", "CG", "CQ"):
                add("K")
                i += 2
            elif sub(i, 2) in ("CI", "CE", "CY"):
                if sub(i, 3) in ("CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if sub(i + 1, 2) in (" C", " Q", " G"):
                    i += 3
                elif ch(i + 1) in ("C", "K", "Q") and sub(i + 1, 2) not in ("CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if sub(i, 2) == "DG":
                if ch(i + 2) in ("I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
            elif sub(i, 2) in ("DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if ch(i + 1) == "F" else 1
        elif c == "G":
            if ch(i + 1) == "H":
                if i > 0 and ch(i - 1) not in VOWELS:
                    add("K")
                elif i == 0:
                    if ch(i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                elif (
                    (i > 1 and ch(i - 2) in ("B", "H", "D"))
                    or (i > 2 and ch(i - 3) in ("B", "H", "D"))
                    or (i > 3 and ch(i - 4) in ("B", "H"))
                ):
                    pass  # silent GH
                else:
                    if i > 2 and ch(i - 1) == "U" and ch(i - 3) in (
                        "C",
                        "G",
                        "L",
                        "R",
                        "T",
                    ):
                        add("F")
                    elif i > 0 and ch(i - 1) != "I":
                        add("K")
                i += 2
            elif ch(i + 1) == "N":
                if i == 1 and ch(0) in VOWELS and not sg:
                    add("KN", "N")
                elif sub(i + 2, 2) != "EY" and ch(i + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif sub(i + 1, 2) == "LI" and not sg:
                add("KL", "L")
                i += 2
            elif i == 0 and (
                ch(i + 1) == "Y"
                or sub(i + 1, 2)
                in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
            ):
                add("K", "J")
                i += 2
            elif (sub(i + 1, 2) == "ER" or ch(i + 1) == "Y") and sub(0, 6) not in (
                "DANGER",
                "RANGER",
                "MANGER",
            ) and ch(i - 1) not in ("E", "I") and sub(i - 1, 3) not in ("RGY", "OGY"):
                add("K", "J")
                i += 2
            elif ch(i + 1) in ("E", "I", "Y") or sub(i - 1, 4) in ("AGGI", "OGGI"):
                if sub(0, 4) in ("VAN ", "VON ") or sub(0, 3) == "SCH" or sub(
                    i + 1, 2
                ) == "ET":
                    add("K")
                elif sub(i + 1, 4) == "IER ":
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if ch(i + 1) == "G" else 1
        elif c == "H":
            if (i == 0 or ch(i - 1) in VOWELS) and ch(i + 1) in VOWELS:
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if sub(i, 4) == "JOSE" or sub(0, 4) == "SAN ":
                if (i == 0 and ch(i + 4) == " ") or sub(0, 4) == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                i += 1
            elif i == 0 and sub(i, 4) != "JOSE":
                add("J", "A")
                i += 1
            else:
                if ch(i - 1) in VOWELS and not sg and ch(i + 1) in ("A", "O"):
                    add("J", "H")
                elif i == last:
                    add("J", "")
                elif ch(i + 1) not in frozenset("LTKSNMBZ") and ch(i - 1) not in (
                    "S",
                    "K",
                    "L",
                ):
                    add("J")
                i += 2 if ch(i + 1) == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if ch(i + 1) == "K" else 1
        elif c == "L":
            if ch(i + 1) == "L":
                if (
                    i == length - 3 and sub(i - 1, 4) in ("ILLO", "ILLA", "ALLE")
                ) or (
                    (sub(last - 1, 2) in ("AS", "OS") or ch(last) in ("A", "O"))
                    and sub(i - 1, 4) == "ALLE"
                ):
                    add("L", "")
                    i += 2
                else:
                    add("L")
                    i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if (sub(i - 1, 3) == "UMB" and (i + 1 == last or sub(i + 2, 2) == "ER")) or ch(
                i + 1
            ) == "M":
                i += 2
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if ch(i + 1) == "N" else 1
        elif c == "P":
            if ch(i + 1) == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if ch(i + 1) in ("P", "B") else 1
        elif c == "Q":
            add("K")
            i += 2 if ch(i + 1) == "Q" else 1
        elif c == "R":
            if (
                i == last
                and not sg
                and sub(i - 2, 2) == "IE"
                and sub(i - 4, 2) not in ("ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if ch(i + 1) == "R" else 1
        elif c == "S":
            if sub(i - 1, 3) in ("ISL", "YSL"):
                i += 1
            elif i == 0 and sub(i, 5) == "SUGAR":
                add("X", "S")
                i += 1
            elif sub(i, 2) == "SH":
                if sub(i + 1, 4) in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
            elif sub(i, 3) in ("SIO", "SIA") or sub(i, 4) == "SIAN":
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                i += 3
            elif (i == 0 and ch(i + 1) in ("M", "N", "L", "W")) or ch(i + 1) == "Z":
                add("S", "X")
                i += 2 if ch(i + 1) == "Z" else 1
            elif sub(i, 2) == "SC":
                if ch(i + 2) == "H":
                    if sub(i + 3, 2) in ("OO", "ER", "EN", "UY", "ED", "EM"):
                        if sub(i + 3, 2) in ("ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and ch(3) not in VOWELS and ch(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                elif ch(i + 2) in ("I", "E", "Y"):
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
            else:
                if i == last and sub(i - 2, 2) in ("AI", "OI"):
                    add("", "S")
                else:
                    add("S")
                i += 2 if ch(i + 1) in ("S", "Z") else 1
        elif c == "T":
            if sub(i, 4) == "TION" or sub(i, 3) in ("TIA", "TCH"):
                add("X")
                i += 3
            elif sub(i, 2) == "TH" or sub(i, 3) == "TTH":
                if sub(i + 2, 2) in ("OM", "AM") or sub(0, 4) in ("VAN ", "VON ") or sub(
                    0, 3
                ) == "SCH":
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if ch(i + 1) in ("T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if ch(i + 1) == "V" else 1
        elif c == "W":
            if sub(i, 2) == "WR":
                add("R")
                i += 2
            elif i == 0 and (ch(i + 1) in VOWELS or sub(i, 2) == "WH"):
                if ch(i + 1) in VOWELS:
                    add("A", "F")
                else:
                    add("A")
                i += 1
            elif (
                (i == last and ch(i - 1) in VOWELS)
                or sub(i - 1, 5) in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or sub(0, 3) == "SCH"
            ):
                add("", "F")
                i += 1
            elif sub(i, 4) in ("WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
            else:
                i += 1
        elif c == "X":
            if not (
                i == last
                and (sub(i - 3, 3) in ("IAU", "EAU") or sub(i - 2, 2) in ("AU", "OU"))
            ):
                add("KS")
            i += 2 if ch(i + 1) in ("C", "X") else 1
        elif c == "Z":
            if ch(i + 1) == "H":
                add("J")
                i += 2
            else:
                if ch(i + 1) in ("Z", "O", "I", "A") and (
                    sg or (i > 0 and ch(i - 1) != "T")
                ):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if ch(i + 1) == "Z" else 1
        else:
            i += 1

    p = "".join(pri)[:max_len]
    q = "".join(sec)[:max_len]
    return (p, q)


@pandas_udf(
    T.StructType(
        [
            T.StructField("primary", T.StringType()),
            T.StructField("secondary", T.StringType()),
        ]
    )
)
def double_metaphone_udf(names: pd.Series) -> pd.DataFrame:
    """Arrow-batched Double Metaphone; loop is per batch, not per Spark row."""
    out = [double_metaphone(x) for x in names.fillna("")]
    return pd.DataFrame(out, columns=["primary", "secondary"])
