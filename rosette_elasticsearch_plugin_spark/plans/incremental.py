"""Incremental entity resolution — fold a NEW batch of names into an
existing resolved state without re-scoring the old world.

The daily production shape at 10^12 documents: yesterday's corpus is
resolved; today's delta arrives.  Re-running the full pipeline re-pays
pair scoring over the whole vocabulary; incremental resolution pays
only for pairs that involve a new name:

  1. delta      = new names not in the prior state (anti-join);
  2. blocking   re-keys the combined vocabulary (per-name, cheap —
     blocking is vocabulary-scale, not document-scale);
  3. candidates are filtered to pairs with ≥1 NEW side before the
     Arrow-batched scoring hop — old×old pairs, the quadratic bulk,
     are never re-scored;
  4. the prior clustering enters the graph as star edges
     (node → its cluster id), and hash-min connected components runs
     over star ∪ new-edges.

Equivalence to a full recompute (tested in tests/test_incremental.py,
oracle-checked in the driver): components depend only on connectivity,
and components(star(prior)) = components(old edges) by construction,
so components(new_edges ∪ star(prior)) = components(all edges) — the
incremental result IS the batch result whenever blocking is stable.
The one divergence case: a block whose size crosses ``max_block_size``
only once the delta arrives — the full recompute drops its old pairs,
the incremental keeps the edges it already found (strictly better
recall; the cap is a meta-blocking cost heuristic, not a semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..resolution.blocking import all_blocks
from ..resolution.clustering import connected_components
from ..resolution.pairs import candidate_pairs
from ..resolution.scoring import match_edges, score_pairs
from .er_pipeline import ERConfig, er_key_col


def extend_name_index(
    prior_index: DataFrame | None,
    new_names: DataFrame,
    cfg: ERConfig = ERConfig(),
) -> DataFrame:
    """(node, key, block_key) over prior ∪ new names — the UNCAPPED
    resolution block index, extended so the blocking kernels (the
    Double Metaphone pandas UDF and the MinHash/shingle chain) run over
    the DELTA names only.

    This is the piece that makes per-batch cost truly
    delta-proportional: without it, every increment re-keys the whole
    accumulated vocabulary even though old names' keys never change
    (blocking is a pure per-name function).  Commit the returned index
    to a SnapshotTable beside the clusters table and feed it back as
    ``prior_index`` on the next batch (streaming/resolve.py does this).
    ``prior_index=None`` builds the index from scratch."""
    n = new_names.select(F.col(new_names.columns[0]).alias("node")).distinct()
    if prior_index is not None:
        n = n.join(
            prior_index.select("node").distinct(), "node", "left_anti"
        )
    keyed = n.select(
        "node", er_key_col(F.col("node"), cfg.alias_names).alias("key")
    )
    # LEFT join from keyed: a name that produces zero block keys (not
    # reachable under exact blocking — one key per name — but possible
    # under a custom BlockingConfig) must still be carried in the index
    # with a NULL block_key, or it would (a) violate the contract that
    # the index node set equals prior ∪ new and (b) be re-keyed on
    # every later batch.  NULL block_key rows never match a block join
    # downstream, so they add no pairs — exactly like the full
    # recompute, where a keyless name simply has no blocks.
    delta_index = keyed.join(
        all_blocks(keyed, cfg.blocking), "node", "left"
    ).select("node", "key", "block_key")
    out = (
        delta_index
        if prior_index is None
        else prior_index.select("node", "key", "block_key").unionByName(
            delta_index
        )
    )
    # materialized once: consumers read it for the pair grid, the
    # per-node key join-back, and (in streaming) the index commit
    return out.localCheckpoint(eager=False)


def incremental_resolve(
    prior_clusters: DataFrame,
    new_names: DataFrame,
    cfg: ERConfig = ERConfig(),
    name_index: DataFrame | None = None,
) -> DataFrame:
    """(node, cluster) over old ∪ new names; old×old pairs never
    re-scored.

    prior_clusters: (node, cluster) — output of resolve_names (or a
    previous incremental_resolve) read back from its snapshot table.
    new_names: (node) — distinct normalized names of the new batch.
    name_index: optional (node, key, block_key) index over old ∪ new
    names (from :func:`extend_name_index`) — its node set must equal
    prior ∪ new.  With it, blocking keys are READ, not recomputed, so
    the per-batch blocking cost is the delta's, not the vocabulary's.
    Without it, the combined vocabulary is re-keyed in place (exact
    same result — blocking is a pure per-name function).
    """
    old_nodes = prior_clusters.select("node")
    delta = (
        new_names.select(F.col(new_names.columns[0]).alias("node"))
        .distinct()
        .join(old_nodes, "node", "left_anti")
    )
    all_names = old_nodes.unionByName(delta).localCheckpoint(eager=True)

    if name_index is not None:
        index = name_index.select("node", "key", "block_key")
    else:
        keyed_all = all_names.select(
            "node", er_key_col(F.col("node"), cfg.alias_names).alias("key")
        )
        index = (
            all_blocks(keyed_all, cfg.blocking)
            .join(keyed_all, "node")
            .select("node", "key", "block_key")
            .localCheckpoint(eager=False)
        )
    # restrict the pair grid to blocks the delta TOUCHES: a pair with
    # ≥1 new side can only come from a block containing a new node, so
    # untouched (old-only) blocks — the vocabulary-scale bulk — never
    # enter the self-join at all.  Touched blocks keep ALL their
    # members, so cap/salt size decisions match the full recompute for
    # every block that can produce a kept pair (exactness: the kept
    # pairs after the ≥1-new-side filter below are identical).  The
    # touched slice is materialized ONCE — candidate_pairs references
    # its input several times, and the per-pair key join-backs read the
    # same slice, so nothing downstream of this point scans the
    # vocabulary-scale index again (measured numbers: BENCH.md §3).
    touched_keys = (
        index.join(delta, "node", "left_semi")
        .select("block_key")
        .distinct()
    )
    touched = index.join(touched_keys, "block_key", "left_semi").localCheckpoint(
        eager=False
    )
    pairs = candidate_pairs(
        touched.select("node", "block_key"),
        cfg.max_block_size,
        cfg.n_salt,
        cfg.salt_threshold,
    )
    # precomputed-key join-back (translit once per name, not per pair);
    # every pair node is a touched-block member, so the key dim is the
    # touched slice, not the vocabulary
    keyed = touched.select("node", "key").dropDuplicates(["node"])
    pairs = pairs.join(
        keyed.select(F.col("node").alias("node_a"), F.col("key").alias("key_a")),
        "node_a",
    ).join(
        keyed.select(F.col("node").alias("node_b"), F.col("key").alias("key_b")),
        "node_b",
    )
    # keep only pairs with at least one new side — BEFORE the scoring
    # hop, so the Python/Arrow cost is delta-proportional
    old_flag = prior_clusters.select(
        "node", F.lit(True).alias("__old")
    ).localCheckpoint(eager=True)
    p = (
        pairs.join(
            old_flag.withColumnRenamed("node", "node_a")
            .withColumnRenamed("__old", "__old_a"),
            "node_a",
            "left",
        )
        .join(
            old_flag.withColumnRenamed("node", "node_b")
            .withColumnRenamed("__old", "__old_b"),
            "node_b",
            "left",
        )
        .where(F.col("__old_a").isNull() | F.col("__old_b").isNull())
        .drop("__old_a", "__old_b")
    )
    scored = score_pairs(
        p,
        cfg=cfg.scoring,
        key_a=F.col("key_a"),
        key_b=F.col("key_b"),
    )
    new_edges = match_edges(scored, cfg.scoring).select("node_a", "node_b")
    star = prior_clusters.where(F.col("node") != F.col("cluster")).select(
        F.col("node").alias("node_a"), F.col("cluster").alias("node_b")
    )
    return connected_components(
        new_edges.unionByName(star), nodes=all_names, max_iter=cfg.cc_max_iter
    )


def stable_relabel(
    new_clusters: DataFrame, prior_clusters: DataFrame
) -> DataFrame:
    """Re-label incremental output with ID-STABLE cluster ids.

    ``incremental_resolve`` returns min-node labels (batch-equivalent,
    hence oracle-checkable) — but a min-node id CHANGES when a
    lexicographically smaller variant joins an existing cluster, which
    breaks downstream references.  Production id rule: a component that
    contains members of prior clusters keeps the smallest PRIOR id
    among them (merges collapse deterministically to the older id);
    all-new components keep their min-node id."""
    prior_ids = prior_clusters.select(
        "node", F.col("cluster").alias("__prior_id")
    )
    stable = (
        new_clusters.join(prior_ids, "node", "left")
        .groupBy("cluster")
        .agg(F.min("__prior_id").alias("__stable"))
        .withColumn("__stable", F.coalesce("__stable", F.col("cluster")))
    )
    return new_clusters.join(stable, "cluster").select(
        "node", F.col("__stable").alias("cluster")
    )


def retract_names(
    prior_clusters: DataFrame,
    removed_names: DataFrame,
    cfg: ERConfig = ERConfig(),
    name_index: DataFrame | None = None,
) -> DataFrame:
    """(node, cluster) over prior-minus-removed names — the DELETE half
    of the incremental story (GDPR erasure, source-record retraction).
    Only clusters a removed name can influence are re-resolved; the
    vocabulary-scale bulk passes through untouched.

    Exactness vs a full recompute on the remaining names (the driver
    oracle for ``er_retract``): deleting nodes only ever REMOVES edges
    — except under the block-size cap, where shrinking an over-cap
    block back under ``max_block_size`` re-admits its pairs.  So the
    re-resolved slice is the union of
      1. remaining members of clusters that contained a removed name
         (deleting a bridge variant can SPLIT such a cluster), and
      2. full prior clusters of every member of a newly-uncapped block
         (its re-admitted pairs can MERGE previously separate
         clusters).
    Any candidate pair between that slice and an untouched name scores
    below threshold — if it didn't, its endpoints would already share
    a prior cluster (edges are a deterministic pair function and the
    pair was a candidate before the delete too) and the untouched side
    wouldn't be untouched — so re-clustering the slice alone, with
    block sizes taken from the FULL remaining universe, reproduces the
    full recompute label-for-label (untouched clusters keep identical
    membership, hence identical min-node labels).

    prior_clusters: (node, cluster) from resolve_names /
    incremental_resolve, read back from its snapshot table.
    removed_names: (node) names to erase; unknown names are ignored.
    name_index: optional (node, key, block_key) persisted index over
    the PRIOR universe (extend_name_index) — with it, no blocking
    kernel runs at all (deletes touch no new names); without it the
    prior vocabulary is re-keyed in place (same result, vocabulary
    cost).  At 10^12 names keep the index committed beside the
    clusters table; the block-size aggregates below are single
    groupBy passes over it, never self-joins.
    """
    prior_nodes = prior_clusters.select("node")
    removed = (
        removed_names.select(
            F.col(removed_names.columns[0]).alias("node")
        )
        .distinct()
        .join(prior_nodes, "node", "left_semi")
        .localCheckpoint(eager=True)
    )
    remaining = prior_clusters.join(removed, "node", "left_anti")

    if name_index is not None:
        index = name_index.select("node", "key", "block_key").join(
            prior_nodes, "node", "left_semi"
        )
    else:
        keyed = prior_nodes.select(
            "node", er_key_col(F.col("node")).alias("key")
        )
        index = (
            all_blocks(keyed, cfg.blocking)
            .join(keyed, "node")
            .select("node", "key", "block_key")
        )
    index = index.localCheckpoint(eager=False)
    rem_index = index.join(removed, "node", "left_anti").localCheckpoint(
        eager=False
    )

    # blocks that shrink from over-cap to within-cap re-admit their
    # pair space; everyone they touch (and those members' whole prior
    # clusters) must re-resolve so cap-crossing merges are reproduced
    before = index.groupBy("block_key").agg(F.count("*").alias("n_before"))
    after = rem_index.groupBy("block_key").agg(F.count("*").alias("n_after"))
    uncapped = (
        before.join(after, "block_key")
        .where(
            (F.col("n_before") > cfg.max_block_size)
            & (F.col("n_after") <= cfg.max_block_size)
            & (F.col("n_after") >= 2)
        )
        .select("block_key")
    )
    uncap_nodes = rem_index.join(uncapped, "block_key", "left_semi").select(
        "node"
    )

    seed = removed.unionByName(uncap_nodes)
    affected_ids = (
        prior_clusters.join(seed, "node", "left_semi")
        .select("cluster")
        .distinct()
    )
    affected = (
        remaining.join(affected_ids, "cluster", "left_semi")
        .select("node")
        .localCheckpoint(eager=True)
    )
    untouched = remaining.join(affected_ids, "cluster", "left_anti")
    if affected.limit(1).count() == 0:  # pure-singleton deletes
        return untouched.select("node", "cluster")

    # touched blocks keep ALL remaining members so candidate_pairs sees
    # the true remaining-universe size for every cap/salt decision;
    # pairs are then narrowed to both-sides-affected BEFORE the Arrow
    # scoring hop (cross pairs are provably sub-threshold, see above)
    touched_keys = (
        rem_index.join(affected, "node", "left_semi")
        .select("block_key")
        .distinct()
    )
    touched = rem_index.join(
        touched_keys, "block_key", "left_semi"
    ).localCheckpoint(eager=False)
    pairs = candidate_pairs(
        touched.select("node", "block_key"),
        cfg.max_block_size,
        cfg.n_salt,
        cfg.salt_threshold,
    )
    pairs = pairs.join(
        affected.withColumnRenamed("node", "node_a"), "node_a", "left_semi"
    ).join(
        affected.withColumnRenamed("node", "node_b"), "node_b", "left_semi"
    )
    keyed = touched.select("node", "key").dropDuplicates(["node"])
    pairs = pairs.join(
        keyed.select(F.col("node").alias("node_a"), F.col("key").alias("key_a")),
        "node_a",
    ).join(
        keyed.select(F.col("node").alias("node_b"), F.col("key").alias("key_b")),
        "node_b",
    )
    scored = score_pairs(
        pairs, cfg=cfg.scoring, key_a=F.col("key_a"), key_b=F.col("key_b")
    )
    edges = match_edges(scored, cfg.scoring).select("node_a", "node_b")
    sub = connected_components(edges, nodes=affected, max_iter=cfg.cc_max_iter)
    return untouched.select("node", "cluster").unionByName(
        sub.select("node", "cluster")
    )
