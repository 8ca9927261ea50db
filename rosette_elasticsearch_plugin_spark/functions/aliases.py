"""Nickname / diminutive canonicalization for person-name matching.

"Bill Lindqvist" and "William Lindqvist" share no character-level
signal the engine's families can use: the tokens disagree at the first
character (Jaro-Winkler low, initials feature inapplicable), Double
Metaphone codes differ (PL vs ALM), and the 2-shingle MinHash overlap
is surname-only — so neither blocking nor scoring links them.  Every
production name matcher closes this gap with a *dictionary*: a fixed
public list of English diminutive→formal given-name pairs (the same
device as the reference's kb-linker resolving aliases to one entityId,
``mock_responses/entities_response.json`` entityId semantics — the
Rosette API applies alias tables server-side;
``EntitiesProcessor.java:132-184`` just projects its output).

The mapping is applied token-wise to the ER canonical key (lower-cased
transliterated form, see ``plans/er_pipeline.er_key_col``), so both
blocking AND scoring see the formal form: alias variants land in the
same exact block and score 1.0.  Pure column expressions — a literal
``create_map`` lookup inside ``transform`` — with an exact DuckDB
mirror (CASE chain inside ``list_transform``); no UDF, no shuffle, no
per-row Python.

Ambiguity policy: each nickname maps to its single most common formal
form (``alex`` → ``alexander``, not ``alexandra``).  A wrong expansion
can only merge two names that already share a surname token — the same
risk class as the initials feature — and the decision layer still
requires the full-key score to clear the threshold.

All pairs are public knowledge (standard English diminutives as found
in any name-etymology dictionary; cf. the public pd-nickname /
"name_tools" style lists).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# nickname (lowercase token) -> formal given name.  Keys and values
# must be lowercase ASCII: the map is applied AFTER translit_lower.
NICKNAMES: dict[str, str] = {
    "abe": "abraham",
    "al": "albert",
    "alex": "alexander",
    "andy": "andrew",
    "art": "arthur",
    "becky": "rebecca",
    "ben": "benjamin",
    "bert": "albert",
    "beth": "elizabeth",
    "betsy": "elizabeth",
    "betty": "elizabeth",
    "bill": "william",
    "billy": "william",
    "bob": "robert",
    "bobby": "robert",
    "cathy": "catherine",
    "charlie": "charles",
    "chris": "christopher",
    "chuck": "charles",
    "dan": "daniel",
    "danny": "daniel",
    "dave": "david",
    "davey": "david",
    "deb": "deborah",
    "debbie": "deborah",
    "dick": "richard",
    "dottie": "dorothy",
    "ed": "edward",
    "eddie": "edward",
    "fred": "frederick",
    "freddy": "frederick",
    "gerry": "gerald",
    "greg": "gregory",
    "hank": "henry",
    "harry": "harold",
    "jack": "john",
    "jackie": "jacqueline",
    "jen": "jennifer",
    "jenny": "jennifer",
    "jim": "james",
    "jimmy": "james",
    "joe": "joseph",
    "joey": "joseph",
    "johnny": "john",
    "jon": "jonathan",
    "kate": "katherine",
    "kathy": "katherine",
    "katie": "katherine",
    "ken": "kenneth",
    "kenny": "kenneth",
    "larry": "lawrence",
    "len": "leonard",
    "leo": "leonard",
    "liz": "elizabeth",
    "lou": "louis",
    "maggie": "margaret",
    "mandy": "amanda",
    "marge": "margaret",
    "matt": "matthew",
    "meg": "margaret",
    "mike": "michael",
    "mickey": "michael",
    "nate": "nathaniel",
    "ned": "edward",
    "nick": "nicholas",
    "pat": "patricia",
    "patty": "patricia",
    "peggy": "margaret",
    "pete": "peter",
    "phil": "philip",
    "rick": "richard",
    "ricky": "richard",
    "rob": "robert",
    "ron": "ronald",
    "ronnie": "ronald",
    "sam": "samuel",
    "sammy": "samuel",
    "sandy": "sandra",
    "steve": "stephen",
    "stevie": "stephen",
    "sue": "susan",
    "susie": "susan",
    "ted": "edward",
    "teddy": "edward",
    "terry": "terence",
    "tim": "timothy",
    "timmy": "timothy",
    "toby": "tobias",
    "tom": "thomas",
    "tommy": "thomas",
    "tony": "anthony",
    "trish": "patricia",
    "vicky": "victoria",
    "walt": "walter",
    "wendy": "gwendolyn",
    "will": "william",
    "willy": "william",
    "zach": "zachary",
}

# literal map, built once per process — a constant expression tree the
# optimizer folds; ~190 literals is far below any codegen limit
_MAP_LITS: list[Column] | None = None


def _nick_map() -> Column:
    global _MAP_LITS
    if _MAP_LITS is None:
        _MAP_LITS = [
            F.lit(x) for kv in sorted(NICKNAMES.items()) for x in kv
        ]
    return F.create_map(*_MAP_LITS)


def alias_canonical_col(c: Column) -> Column:
    """Token-wise nickname→formal rewrite of an already-normalized
    (lowercase) name column.  NULL-propagating; unknown tokens pass
    through unchanged."""
    return F.array_join(
        F.transform(
            F.split(c, " "),
            lambda t: F.coalesce(F.element_at(_nick_map(), t), t),
        ),
        " ",
    )


def alias_canonical_sql(expr: str) -> str:
    """DuckDB mirror of ``alias_canonical_col`` — CASE chain inside
    list_transform (DuckDB lambdas cannot reference correlated
    subqueries, so the dictionary inlines as CASE arms)."""
    arms = " ".join(
        f"when '{k}' then '{v}'" for k, v in sorted(NICKNAMES.items())
    )
    return (
        f"array_to_string(list_transform(string_split({expr}, ' '), "
        f"t -> case t {arms} else t end), ' ')"
    )


def alias_canonical_py(s: str | None) -> str | None:
    """Python mirror (used to precompute oracle VALUES keys)."""
    if s is None:
        return None
    return " ".join(NICKNAMES.get(t, t) for t in s.split(" "))
