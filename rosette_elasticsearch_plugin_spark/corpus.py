"""Deterministic synthetic corpus of interleaved text+media documents.

Shape per BASELINE.json ``input_hint``:
  (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)

Ground truth comes from *name-variant families*: each family is one
entity (label like the fixtures' Wikidata QIDs, e.g. Q105221 "Dan
Aykroyd" — ``mock_responses/entities_response.json:319-338``) with
deterministic surface variants (typo, token swap, diacritics,
initials).  Documents embed mentions at known char offsets inside text
spans; media spans are interleaved between them.  The generator
returns both the document table and the labeled mention table, so
tests can score pairwise F1 against planted truth.

Everything is seeded — same seed, same corpus, everywhere.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from .functions.normalize import normalize_py

# Fixture-derived seed families (reference test corpus; see FIXTURES.md §5)
FIXTURE_FAMILIES: list[tuple[str, str, str, list[str]]] = [
    # (entity_label, canonical, type, extra variants)
    ("Q105221", "Dan Aykroyd", "PERSON", ["Dan Akroyd", "Daniel Aykroyd", "Aykroyd Dan"]),
    ("Q108745", "Ghostbusters", "PRODUCT", ["Ghost Busters", "Ghostbustres"]),
    ("Q61503", "The Hollywood Reporter", "ORGANIZATION",
     ["Hollywood Reporter", "The Holywood Reporter"]),
    ("Q7747", "Vladimir Putin", "PERSON", ["Владимир Путин", "Vladimír Pútin", "Putin Vladimir"]),
    ("Q36591", "Vladimir Nabokov", "PERSON", ["Владимир Набоков", "Vladimir Nabokow"]),
    ("Q483118", "Matt Damon", "PERSON", ["Mat Damon", "Matthew Damon"]),
]

# no near-duplicate first names (e.g. Lena/Elena): distinct planted
# entities with near-identical full names are irreducibly ambiguous
# from surface forms, and the F1≥0.99 target assumes resolvable truth
_FIRST = ["Karim", "Lena", "Tomas", "Aiko", "Marta", "Dmitri", "Sofia", "Pavel",
          "Ingrid", "Rafael", "Yusuf", "Hana", "Viktor", "Gustav", "Bruno", "Nadia"]
_LAST = ["Svensson", "Okafor", "Ivanov", "Tanaka", "Moreau", "Kowalski", "Herrera",
         "Lindqvist", "Petrov", "Nakamura", "Fischer", "Almeida", "Novak", "Berg"]
_TYPES = ["PERSON", "ORGANIZATION", "LOCATION", "PRODUCT"]

_FILLER = ("the report said that ", "according to sources ", "yesterday ",
           "in other news ", "analysts noted ", "meanwhile ", "officials stated ")

# Opt-in nickname families (n_nickname_families > 0): formal given name
# + a surname DISJOINT from _LAST (so they never interact with the
# default families' initials/typo variants), with diminutive surface
# variants from functions/aliases.NICKNAMES.  A fixed table, no rng
# draws — appending them never perturbs the default families.
NICKNAME_FAMILIES: list[tuple[str, str, str, list[str]]] = [
    ("NCK0000", "William Whitfield", "PERSON",
     ["Bill Whitfield", "Billy Whitfield"]),
    ("NCK0001", "Robert Oduya", "PERSON", ["Bob Oduya", "Bobby Oduya"]),
    ("NCK0002", "Elizabeth Marchetti", "PERSON",
     ["Liz Marchetti", "Beth Marchetti"]),
    ("NCK0003", "Margaret Sandoval", "PERSON",
     ["Peggy Sandoval", "Meg Sandoval"]),
    ("NCK0004", "Richard Krejci", "PERSON",
     ["Dick Krejci", "Rick Krejci"]),
    ("NCK0005", "Katherine Tanabe", "PERSON",
     ["Kate Tanabe", "Kathy Tanabe"]),
    ("NCK0006", "Edward Olofsson", "PERSON",
     ["Ted Olofsson", "Ned Olofsson"]),
    ("NCK0007", "James Duarte", "PERSON", ["Jim Duarte", "Jimmy Duarte"]),
]


def _typo(rng: random.Random, s: str) -> str:
    """One deterministic char-level perturbation, restricted to mid-token
    lowercase positions: a typo that deletes a space or a capital would
    change the token/capitalization structure and make the planted
    surface unextractable — the F1≥0.99 target presumes resolvable truth."""
    eligible = [
        i
        for i in range(1, len(s) - 2)
        if s[i - 1].islower() and s[i].islower() and s[i + 1].islower()
    ]
    if not eligible:
        return s
    i = rng.choice(eligible)
    kind = rng.randrange(3)
    if kind == 0:  # drop
        return s[:i] + s[i + 1:]
    if kind == 1:  # swap
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    return s[:i] + s[i] + s[i:]  # double


@dataclass
class SyntheticCorpus:
    docs: list[tuple]       # (doc_id, [ (kind, text, media_ref, offset) ])
    mentions: list[tuple]   # MENTIONS schema rows
    families: list[tuple[str, str, str, list[str]]]


def make_families(n_extra: int = 40, seed: int = 42,
                  n_nickname_families: int = 0):
    rng = random.Random(seed)
    fams = list(FIXTURE_FAMILIES)
    if n_nickname_families:
        if n_nickname_families > len(NICKNAME_FAMILIES):
            raise ValueError(
                f"n_nickname_families={n_nickname_families} exceeds the "
                f"{len(NICKNAME_FAMILIES)} fixed nickname families"
            )
        fams += NICKNAME_FAMILIES[:n_nickname_families]
    # (first-initial, last) must be unique across families, else the
    # initials variant ("K. Svensson") is genuinely ambiguous and no
    # resolver can hit F1≥0.99 on planted truth
    used = {("d", "aykroyd"), ("v", "putin"), ("v", "nabokov"), ("m", "damon")}
    # the signature pool is finite (~|_FIRST initials| × |_LAST|); fail
    # fast instead of spinning forever when n_extra exceeds it
    pool = len({f[0].lower() for f in _FIRST}) * len(_LAST)
    if n_extra > pool - len(used):
        raise ValueError(
            f"n_extra={n_extra} exceeds the {pool - len(used)} unique "
            f"(first-initial, last-name) signatures available"
        )
    k = 0
    while k < n_extra:
        first, last = rng.choice(_FIRST), rng.choice(_LAST)
        sig = (first[0].lower(), last.lower())
        if sig in used:
            continue
        used.add(sig)
        canonical = f"{first} {last}"
        etype = _TYPES[k % len(_TYPES)]
        variants = [
            f"{first[0]}. {last}",               # initials
            f"{last} {first}",                    # token swap
            _typo(rng, canonical),                # typo
        ]
        fams.append((f"SYN{k:04d}", canonical, etype, variants))
        k += 1
    return fams


def generate(
    n_docs: int = 120, seed: int = 42, n_extra_families: int = 40,
    mentions_per_doc: tuple[int, int] = (1, 3), media_prob: float = 0.5,
    n_nickname_families: int = 0,
) -> SyntheticCorpus:
    rng = random.Random(seed)
    fams = make_families(n_extra_families, seed, n_nickname_families)
    docs: list[tuple] = []
    mention_rows: list[tuple] = []
    seen_canonical: set[str] = set()

    for d in range(n_docs):
        doc_id = f"doc{d:05d}"
        spans: list[tuple] = []
        offset = 0
        n_m = rng.randint(*mentions_per_doc)
        # leading media span sometimes (interleaving invariant exercise)
        if rng.random() < media_prob:
            spans.append(("image", None, f"img://{doc_id}/head.png", offset))
            offset += 1
        for m in range(n_m):
            fam = fams[rng.randrange(len(fams))]
            label, canonical, etype, variants = fam
            # canonical surface appears at least once per family: variant
            # chains resolve through the canonical hub (a family whose
            # canonical never occurs can split into unconnected variants)
            if label not in seen_canonical:
                surface = canonical
                seen_canonical.add(label)
            else:
                surface = rng.choice([canonical] + variants)
            pre = rng.choice(_FILLER)
            post = " and the story continued. "
            text = pre + surface + post
            start = len(pre)
            end = start + len(surface)
            spans.append(("text", text, None, offset))
            mention_rows.append(
                (doc_id, f"{doc_id}:m{m}", start, end, surface,
                 normalize_py(surface), "statistical", etype, label)
            )
            offset += len(text)
            if rng.random() < media_prob:
                kind = rng.choice(["image", "audio", "video"])
                spans.append((kind, None, f"{kind[:3]}://{doc_id}/{m}.bin", offset))
                offset += 1
        docs.append((doc_id, spans))
    return SyntheticCorpus(docs=docs, mentions=mention_rows, families=fams)


def to_spark(spark, corpus: SyntheticCorpus):
    """Materialize (documents_df, mentions_df) with the canonical schemas."""
    from .schema import DOCUMENTS, MENTIONS

    docs_df = spark.createDataFrame(corpus.docs, DOCUMENTS)
    mentions_df = spark.createDataFrame(corpus.mentions, MENTIONS)
    return docs_df, mentions_df
