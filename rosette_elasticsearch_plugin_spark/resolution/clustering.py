"""R9/R10 — transitive clustering: iterative hash-min connected
components over the match-edge graph, then stable min-id cluster labels.

Algorithm (label = lexicographic min node reachable so far):
  labels_0(v) = v
  step(v)     = min(labels_t(v), min over neighbors u of labels_t(u))
  labels_{t+1}(v) = step(v)                       (early rounds)
  labels_{t+1}(v) = min(step(v), labels_t(step(v)))   (pointer halving)
until no label changes.  The label-of-label jump (one extra
vocabulary-scale join per round) turns plain O(diameter) propagation
into O(log diameter) — but it costs a second shuffle + checkpoint per
round, and the dominant workload (name-variant clusters, diameter
2-4) converges in ~3 plain rounds, never needing it.  So halving is
ADAPTIVE: rounds 0..halving_after-1 run plain propagation; if the
loop is still changing after that, the jump join switches on, and
the remaining budget covers any chain a real corpus can produce
(e.g. versioned near-duplicate documents A~B~C~…, which
dedup_canonical clusters over: halving_after=3 + 22 halving rounds
handles diameters beyond 2^20).  The jump preserves the invariant
that a node's label is always a member of its own component, so the
fixed point (component min) is unchanged.

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
    halving_after: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Return (node, cluster) — cluster = min node in the component.

    edges: undirected edge list (each pair once is fine).
    nodes: optional node universe (isolated nodes become singletons);
           defaults to nodes appearing in edges.
    halving_after: number of plain min-propagation rounds before the
           pointer-halving jump join switches on (0 = halve from the
           first round — for callers that KNOW the graph is
           chain-shaped).  Small-diameter graphs converge before the
           threshold and never pay the extra join.
    stats: optional dict populated with convergence telemetry —
           ``rounds`` (total executed), ``changed_per_round`` (exact
           changed-label count per round) and ``halving_from_round``
           (round index where halving engaged, or None).  Passing it
           upgrades the per-round convergence probe from an
           any-changed check to an exact count (same shuffle shape,
           one cheap aggregate over the checkpointed label table).
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
    if stats is not None:
        stats["changed_per_round"] = []
        stats["halving_from_round"] = None
        stats["rounds"] = 0
    if sym.limit(1).count() == 0:  # no edges → all singletons, skip loop
        return labels

    n_changed = 1
    for rnd in range(max_iter):
        halve = rnd >= halving_after
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
        if halve:
            # pointer halving: jump to the current label OF the label —
            # labels are component members, so this shortcuts chains
            # without ever leaving the component.  Only engaged once
            # plain propagation has failed to converge within
            # halving_after rounds (chain-shaped components).
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
        else:
            new = stepped.select(
                "node", F.col("__mid").alias("cluster"), F.col("__old")
            )
        new = new.withColumn(
            "changed", F.col("cluster") < F.col("__old")
        ).drop("__old")
        new = new.localCheckpoint(eager=True)
        changed_df = new.where(F.col("changed"))
        if stats is not None:
            n_changed = changed_df.count()
            stats["changed_per_round"].append(n_changed)
            stats["rounds"] = rnd + 1
            if halve and stats["halving_from_round"] is None:
                stats["halving_from_round"] = rnd
        else:
            n_changed = changed_df.limit(1).count()
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


def alternating_star_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "node_a",
    dst: str = "node_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """(node, cluster = min node of the component) via alternating
    large-star / small-star rounds (Kiveris, Lattanzi, Mirrokni,
    Rastogi, Vassilvitskii — "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the published web-scale alternative to the
    hash-min label table ``connected_components`` maintains.

    Per round, on the CURRENT edge set E:

    * large-star: symmetrize; per node u let m = min(N(u) ∪ {u});
      rewire every LARGER neighbor v > u to m.  Strictly monotone
      (Σ edge endpoints decreases) and safe: m is in u's component.
    * small-star: orient every edge to (hi, lo); per hi let
      m = min(N_lo(hi) ∪ {hi}) = min(lo); rewire hi and all its
      smaller neighbors to m.

    The fixed point is a star forest rooted at each component's
    minimum — exactly the hash-min fixed point, so the same
    recursive-CTE oracle verifies both implementations and callers
    can swap them freely.

    When to prefer it over ``connected_components``: hash-min carries
    a node-universe-sized label table through every round (two
    vocabulary-scale joins per round once halving engages) and its
    per-round cost never shrinks.  The star rounds touch ONLY the
    edge list, which contracts geometrically as components collapse
    into stars — on edge-heavy graphs (near-dup components at crawl
    scale, |E| ≫ |V| inside hot buckets) later rounds get cheaper
    instead of staying flat, and the groupBy key distribution
    re-randomizes every round as nodes re-point (no persistent hot
    label key).  On the vocabulary-scale name graphs the flagship
    resolves (diameter 2-4) hash-min's 3 plain rounds win — which is
    why this is offered as an alternative, not the default.

    Scale shape per round: two groupBy shuffles on the node key (AQE
    handles residual skew), one eager checkpoint to cut lineage; the
    convergence probe is an exact edge count (cheap aggregate).  No
    driver-side graph state ever.

    stats (optional): ``rounds`` and ``edges_per_round`` telemetry.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes is None:
        node_df = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .distinct()
        )
    else:
        node_df = nodes.select(
            F.col(nodes.columns[0]).alias("node")
        ).distinct()
    if stats is not None:
        stats["rounds"] = 0
        stats["edges_per_round"] = []

    n_edges = e.count()
    converged = n_edges == 0
    for rnd in range(max_iter):
        if converged:
            break
        # --- large-star: rewire larger neighbors to the local min ----
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("vmin"))
        m = mins.select(
            "u", F.least(F.col("vmin"), F.col("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star: orient (hi, lo); rewire hi + smaller nbrs ---
        hi_lo = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = hi_lo.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            hi_lo.join(mins2, "u")
            .select(F.col("v").alias("x"), "m")
            .unionByName(
                mins2.select(F.col("u").alias("x"), "m")
            )
            .where(F.col("x") != F.col("m"))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_n = small.count()
        if stats is not None:
            stats["rounds"] = rnd + 1
            stats["edges_per_round"].append(new_n)
        # fixed point: the edge set is already a min-rooted star
        # forest, so a full round maps it to itself.  Output of
        # small-star is canonical (u > v), same as e — set equality
        # is a cheap anti-join probe once the counts agree.
        if new_n == n_edges:
            converged = (
                small.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
            )
        e, n_edges = small, new_n
    if not converged:
        raise RuntimeError(
            f"alternating_star_components did not converge in {max_iter} "
            f"rounds; raise max_iter"
        )
    # at the fixed point every non-root points at its component root
    roots = e.groupBy("u").agg(F.min("v").alias("cluster"))
    return node_df.join(
        roots, node_df["node"] == roots["u"], "left"
    ).select(
        "node", F.coalesce(F.col("cluster"), F.col("node")).alias("cluster")
    )


def best_match_edges(
    scored: DataFrame,
    threshold: float,
    mutual: bool = False,
) -> DataFrame:
    """Chaining-resistant edge restriction over scored candidate pairs
    (the star / mutual-best decision layers of the classic clustering
    taxonomy — cf. Hassanzadeh et al., "Framework for Evaluating
    Clustering Algorithms in Duplicate Detection", VLDB 2009).

    Transitive closure over ALL supra-threshold edges lets a hub node
    with many barely-matching neighbors glue unrelated entities into
    one component.  Here each node contributes exactly ONE edge — to
    its best-scoring neighbor at or above ``threshold`` (ties broken
    by smallest neighbor id, so the restriction is deterministic and
    engine-independent given bit-identical scores):

    * star (``mutual=False``): keep the union of per-node best edges.
      A hub's fan-out collapses to one edge; components become
      star/path shaped.
    * mutual (``mutual=True``): keep an edge only when each endpoint
      is the other's best match (reciprocal best hit).  This provably
      cuts score-descending chains: in A−B−C with score(AB)>score(BC),
      B's best is A, so BC drops and C separates.

    Input: (node_a, node_b, score) with node_a < node_b.  Output: the
    restricted undirected edge list (node_a, node_b) — feed it to
    ``connected_components``.

    Scale shape: one symmetrizing union (narrow), one window over the
    node key (single shuffle, vocabulary-scale — same key as every
    other per-node stage), and for mutual one self-semi-join on the
    (u, v) pair key.  No corpus access, no driver collection.
    """
    m = scored.where(F.col("score") >= F.lit(threshold)).select(
        "node_a", "node_b", "score"
    )
    directed = m.select(
        F.col("node_a").alias("u"), F.col("node_b").alias("v"), "score"
    ).unionByName(
        m.select(F.col("node_b").alias("u"), F.col("node_a").alias("v"), "score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("v"))
    best = (
        directed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("u", "v")
    )
    if mutual:
        # materialize: the reciprocity semi-join reads best from BOTH
        # sides — unmaterialized, the window subtree executes twice
        best = best.localCheckpoint(eager=False)
        flipped = best.select(F.col("v").alias("u"), F.col("u").alias("v"))
        return (
            best.join(flipped, ["u", "v"], "left_semi")
            .where(F.col("u") < F.col("v"))
            .select(F.col("u").alias("node_a"), F.col("v").alias("node_b"))
        )
    return best.select(
        F.least("u", "v").alias("node_a"),
        F.greatest("u", "v").alias("node_b"),
    ).distinct()


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


def cluster_repair(
    names: DataFrame,
    edges: DataFrame,
    tau_repair: float,
    max_iter: int = 25,
) -> DataFrame:
    """Weak-link cluster repair: re-cluster after dropping nodes whose
    strongest incident edge is below ``tau_repair``.

    Transitive closure merges everything a chain of barely-over-
    threshold edges connects; one noisy bridge absorbs a whole entity.
    The standard post-processing is to audit each node's attachment
    strength (max incident match score) and split out nodes that never
    scored a confident match — they keep their own singleton cluster,
    and the remaining subgraph is re-clustered so components severed by
    the removal genuinely separate.

    Returns (node, cluster_before, cluster_after, moved).

    Scale shape: strength is one map-side-combinable aggregate over the
    edge list (union of both endpoints); the re-clustering runs the
    same hash-min CC on the filtered edges — strictly fewer edges than
    the first pass.  Nothing touches the corpus.
    """
    edges = edges.select("node_a", "node_b", "score").localCheckpoint(
        eager=False
    )
    before = connected_components(edges, nodes=names, max_iter=max_iter)
    strength = (
        edges.select(F.col("node_a").alias("node"), "score")
        .unionByName(edges.select(F.col("node_b").alias("node"), "score"))
        .groupBy("node")
        .agg(F.max("score").alias("s"))
    )
    strong = strength.where(F.col("s") >= tau_repair).select("node")
    sedges = edges.join(
        strong.withColumnRenamed("node", "node_a"), "node_a", "left_semi"
    ).join(strong.withColumnRenamed("node", "node_b"), "node_b", "left_semi")
    after = connected_components(
        sedges, nodes=names, max_iter=max_iter
    ).withColumnRenamed("cluster", "cluster_after")
    return (
        before.withColumnRenamed("cluster", "cluster_before")
        .join(after, "node")
        .select(
            "node",
            "cluster_before",
            "cluster_after",
            (F.col("cluster_before") != F.col("cluster_after")).alias(
                "moved"
            ),
        )
    )


def bfs_depths(
    edges: DataFrame,
    roots: DataFrame,
    max_rounds: int = 30,
) -> DataFrame:
    """Per-node shortest hop count from its component root — the
    convergence CERTIFICATE for hash-min clustering: a component whose
    max depth is d needs d plain min-propagation rounds (and is the
    quantity the adaptive halving_after threshold in
    ``connected_components`` keys on).

    ``edges`` (node_a, node_b) undirected; ``roots`` one column of
    root nodes (cluster labels — the component min under hash-min, so
    depth-from-root = the propagation distance of the label).  Level-
    synchronous frontier expansion: each round joins ONLY the frontier
    against the adjacency (one shuffle), first visit pins the depth,
    ``localCheckpoint`` cuts the loop lineage exactly like the CC
    loop.  Raises after ``max_rounds`` (matching the recursive-CTE
    oracle's depth cap) rather than silently truncating."""
    a, b = edges.columns[0], edges.columns[1]
    sym = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(
            edges.select(F.col(b).alias("u"), F.col(a).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = roots.select(
        F.col(roots.columns[0]).alias("node"), F.lit(0).cast("long").alias("depth")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist.select("node")
    # one extra iteration beyond max_rounds: depths themselves are
    # capped at max_rounds (matching the recursive-CTE mirror's
    # w.depth < cap), but a BFS that COMPLETES at exactly depth ==
    # max_rounds must return, not raise — only a frontier still
    # expanding past the cap is an error
    for r in range(1, max_rounds + 2):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(r).cast("long").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return dist
        if r > max_rounds:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    raise RuntimeError(
        f"bfs_depths: frontier still expanding after {max_rounds} rounds"
    )
