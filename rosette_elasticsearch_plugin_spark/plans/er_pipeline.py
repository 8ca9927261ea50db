"""End-to-end entity-resolution plan (SURVEY.md §7 step 2, R1-R10).

docs → text spans → mention extraction → normalization → blocking
(exact + Double Metaphone + MinHash-LSH) → candidate pairs (capped +
salted) → vectorized scoring → threshold → hash-min connected
components → cluster assignment.

Key scale property: blocking/pairing/clustering run over *distinct
normalized names*, not mention rows — at 10^12 documents the distinct
name table is orders of magnitude smaller, and mention rows get their
cluster by one final broadcast-or-shuffle join (R10).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F

from ..functions.translit import translit_lower_col
from ..operators.entities import extract_mentions
from ..resolution.blocking import BlockingConfig, all_blocks
from ..resolution.clustering import assign_cluster_ids, connected_components
from ..resolution.pairs import candidate_pairs
from ..resolution.scoring import ScoringConfig, match_edges, score_pairs


@dataclass(frozen=True)
class ERConfig:
    blocking: BlockingConfig = dc_field(default_factory=BlockingConfig)
    scoring: ScoringConfig = dc_field(default_factory=ScoringConfig)
    max_block_size: int = 50
    n_salt: int = 8
    salt_threshold: int = 16
    cc_max_iter: int = 25


def er_key_col(c):
    """ER canonical form: transliterated normalized name — cross-script
    variants share blocks and score ~1.0."""
    return translit_lower_col(c)


def resolve_names(names: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """(node) distinct normalized names → (node, cluster).  cluster =
    lexicographic min node in the connected component; singletons map
    to themselves."""
    keyed = names.select("node", er_key_col(F.col("node")).alias("key"))
    blocks = all_blocks(keyed, cfg.blocking)
    pairs = candidate_pairs(
        blocks, cfg.max_block_size, cfg.n_salt, cfg.salt_threshold
    )
    scored = score_pairs(
        pairs,
        cfg=cfg.scoring,
        key_a=er_key_col(F.col("node_a")),
        key_b=er_key_col(F.col("node_b")),
    )
    edges = match_edges(scored, cfg.scoring)
    return connected_components(
        edges, nodes=names, max_iter=cfg.cc_max_iter
    )


def resolve_documents(
    docs: DataFrame,
    gazetteer: DataFrame | None = None,
    cfg: ERConfig = ERConfig(),
    pattern: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline over interleaved-span documents.

    Returns (mentions_with_cluster, name_clusters)."""
    from ..operators.entities import MENTION_PATTERN

    mentions = extract_mentions(docs, gazetteer, pattern or MENTION_PATTERN)
    # the mention table feeds three consumers (distinct names, the CC
    # loop's edge materialization, and the final cluster-assignment
    # join); without persisting, the Arrow extraction UDF — the single
    # most expensive stage — re-runs once per consumer.  At cluster
    # scale this is the "write the mention table to storage once"
    # step; locally MEMORY_AND_DISK is the same play.
    mentions = mentions.persist()
    names = mentions.select(F.col("normalized").alias("node")).distinct()
    name_clusters = resolve_names(names, cfg)
    assigned = assign_cluster_ids(mentions, name_clusters, "normalized")
    return assigned, name_clusters
