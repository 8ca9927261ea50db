"""Meta-blocking: weight-based pruning of a redundancy-positive
blocking collection (Papadakis et al., "Meta-Blocking: Taking Entity
Resolution to the Next Level", TKDE 2014 — published technique).

The reference plugin resolves entities by delegating to a remote
linking service per document (`RosetteEntitiesProcessor.java`); a
Spark-native pipeline at 10^12 docs instead has to keep its OWN
candidate-pair budget linear.  The key observation of meta-blocking:
when several blocking families are unioned (exact + metaphone +
MinHash + token — see ``blocking.all_blocks`` / ``token_blocks``),
the NUMBER of blocks two names co-occur in is itself a cheap
similarity signal.  Pairs sharing many blocks are very likely
matches; pairs sharing one giant token block are almost never.
Pruning on that weight removes the quadratic tail of the high-recall
families before the (much more expensive) pairwise scorer runs.

Two standard steps, both pure DataFrame algebra:

* **block purging** — drop block keys with more than
  ``max_block_size`` members outright.  Zipfian token frequencies put
  most of the would-be pair volume in a handful of stop-word blocks
  that carry no signal; purging bounds per-block pair count at
  max_block_size²/2, which makes the self-join shuffle safe at any
  corpus scale (the same cap the scored pipeline applies in
  ``pairs.candidate_pairs``).
* **weighted edge pruning (WEP)** — weight every surviving co-occurring
  pair with CBS (common-blocks count) and its Jaccard normalization
  JS = |blocks(a) ∩ blocks(b)| / |blocks(a) ∪ blocks(b)|, then keep
  pairs with JS ≥ tau.

Scale shape (SURVEY.md §4): one shuffle on ``block_key`` for the
self-join (bounded by purging), one shuffle on the pair key for the
CBS aggregate (map-side combinable count), two broadcast-or-shuffle
joins against the per-node block-count table (vocabulary-scale, tiny
next to the pair table).  No UDFs anywhere — the whole graph stays in
whole-stage codegen.  The JS division is a single IEEE double op on
exactly-representable small integers, so the DuckDB oracle mirrors it
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def purge_blocks(blocks: DataFrame, max_block_size: int) -> DataFrame:
    """Block purging: drop keys with more than ``max_block_size``
    members.  ``blocks`` is the long-format (node, block_key) table
    (already distinct per (node, key) — `all_blocks`/`token_blocks`
    guarantee that)."""
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("__bn"))
    return (
        blocks.join(sizes, "block_key")
        .where(F.col("__bn") <= max_block_size)
        .select("node", "block_key")
    )


def meta_block_weights(
    blocks: DataFrame, max_block_size: int = 50
) -> DataFrame:
    """(node_a, node_b, cbs, js) for every pair co-occurring in ≥1
    purged block; node_a < node_b.

    cbs = number of distinct shared block keys (common-blocks scheme);
    js  = cbs / (|blocks(a)| + |blocks(b)| − cbs), the Jaccard of the
    two names' purged key sets.  Per-node counts are computed AFTER
    purging so the weight reflects only blocks that actually produced
    candidates (the standard meta-blocking formulation).
    """
    purged = blocks.transform(lambda b: purge_blocks(b, max_block_size))
    # purged feeds the self-join twice plus the per-node counts —
    # materialize once so the blocking expression tree (metaphone UDF,
    # MinHash chain) isn't re-executed per consumer
    purged = purged.localCheckpoint(eager=False)
    a = purged.select(F.col("node").alias("node_a"), "block_key")
    b = purged.select(F.col("node").alias("node_b"), "block_key")
    co = a.join(b, "block_key").where(F.col("node_a") < F.col("node_b"))
    cbs = co.groupBy("node_a", "node_b").agg(
        F.count("*").cast("long").alias("cbs")
    )
    nb = purged.groupBy("node").agg(F.count("*").cast("long").alias("nb"))
    return (
        cbs.join(nb.withColumnRenamed("node", "node_a"), "node_a")
        .withColumnRenamed("nb", "nb_a")
        .join(nb.withColumnRenamed("node", "node_b"), "node_b")
        .withColumnRenamed("nb", "nb_b")
        .select(
            "node_a",
            "node_b",
            "cbs",
            (
                F.col("cbs").cast("double")
                / (F.col("nb_a") + F.col("nb_b") - F.col("cbs")).cast("double")
            ).alias("js"),
        )
    )


def weighted_edge_pruning(
    blocks: DataFrame, tau: float, max_block_size: int = 50
) -> DataFrame:
    """WEP: the meta-blocked candidate set — pairs with JS ≥ tau."""
    return meta_block_weights(blocks, max_block_size).where(
        F.col("js") >= tau
    )
