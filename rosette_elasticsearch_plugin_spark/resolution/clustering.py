"""R9/R10 — transitive clustering: iterative hash-min connected
components over the match-edge graph, then stable min-id cluster labels.

Algorithm (label = lexicographic min node reachable so far):
  labels_0(v) = v
  step(v)     = min(labels_t(v), min over neighbors u of labels_t(u))
  labels_{t+1}(v) = min(step(v), labels_t(step(v)))   ← pointer halving
until no label changes.  The label-of-label jump (one extra
vocabulary-scale join per round) turns plain O(diameter) propagation
into O(log diameter) — name-variant clusters have tiny diameters
(2-4) where both are ~3 rounds, but CHAIN-shaped components (e.g.
versioned near-duplicate documents A~B~C~…, which dedup_canonical
clusters over) would exhaust a fixed iteration budget under plain
propagation and abort; with halving, 25 rounds cover any component a
real corpus can produce.  The jump preserves the invariant that a
node's label is always a member of its own component, so the fixed
point (component min) is unchanged.

Scale handling (SURVEY.md §4):
* ``localCheckpoint`` each round cuts the growing lineage (mandatory —
  an un-checkpointed loop re-executes the whole history every round).
* every round is one shuffle on ``node``; AQE handles residual skew.
* convergence check is a cheap aggregate on the changed-count.

The matching DuckDB oracle is a recursive CTE computing min reachable
node (see plans/er_pipeline.py), so the driver can verify clusters
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "node_a",
    dst: str = "node_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, cluster) — cluster = min node in the component.

    edges: undirected edge list (each pair once is fine).
    nodes: optional node universe (isolated nodes become singletons);
           defaults to nodes appearing in edges.
    """
    # Materialize the edge list BEFORE symmetrizing: the union below
    # references ``edges`` twice, and an unmaterialized edges plan (the
    # full blocking+scoring pipeline) would (a) execute twice and
    # (b) inline its whole expression tree into both union branches of
    # ONE generated stage — measured to blow janino's 64 KB method
    # limit and drop the stage to interpreted evaluation.  The edge
    # list is tiny (matched name pairs), so an eager checkpoint is
    # cheap at any corpus scale.
    edges = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if nodes is None:
        node_df = sym.select(F.col("u").alias("node")).distinct()
    else:
        node_df = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()

    labels = node_df.select("node", F.col("node").alias("cluster"))
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    if sym.limit(1).count() == 0:  # no edges → all singletons, skip loop
        return labels

    n_changed = 1
    for _ in range(max_iter):
        # min label among neighbors
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels["node"] == nbr["u"], "left").select(
            "node",
            F.col("cluster").alias("__old"),
            F.least(
                F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
            ).alias("__mid"),
        )
        # pointer halving: jump to the current label OF the label —
        # labels are component members, so this shortcuts chains
        # without ever leaving the component
        jump = labels.select(
            F.col("node").alias("__mid"), F.col("cluster").alias("__jump")
        )
        new = stepped.join(jump, "__mid", "left").select(
            "node",
            F.least(
                F.col("__mid"), F.coalesce(F.col("__jump"), F.col("__mid"))
            ).alias("cluster"),
            F.col("__old"),
        )
        new = new.withColumn(
            "changed", F.col("cluster") < F.col("__old")
        ).drop("__old")
        new = new.localCheckpoint(eager=True)
        n_changed = new.where(F.col("changed")).limit(1).count()
        labels = new.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        # silent non-convergence would split one true component into
        # several clusters with no signal that the cause is the
        # iteration budget rather than scoring — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter exceeds the budget); raise max_iter"
        )
    return labels


def assign_cluster_ids(
    mentions: DataFrame, name_clusters: DataFrame, name_col: str = "normalized"
) -> DataFrame:
    """R10: propagate name-level clusters back to mention rows.

    Names not present in the cluster table (unblocked singletons)
    cluster as themselves.
    """
    joined = mentions.join(
        name_clusters.withColumnRenamed("node", name_col), name_col, "left"
    )
    return joined.withColumn("cluster", F.coalesce("cluster", F.col(name_col)))
