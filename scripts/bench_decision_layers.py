"""Decision layers at vocabulary scale: threshold-CC vs star vs mutual.

Synthesizes a deterministic scored-pair graph with the shapes the
restriction exists for — HUB components (one node supra-threshold-
matching many weak neighbors, the snowball-merge hazard) and CHAIN
components (score-descending paths, the transitive-glue hazard) plus a
bulk of clean 2-cliques — then measures the three decision layers over
the identical edge set:

* threshold — all supra-threshold edges straight into CC (flagship)
* star      — per-node best edge (clustering.best_match_edges)
* mutual    — reciprocal best edges only

Reported per layer: restricted edge count, wall clock (edge
restriction + CC + cluster count action), and the number of clusters —
showing what the restriction costs (one window shuffle over the node
key) and what it buys (hub fan-outs collapse; chains cut at their
weakest reciprocity point).

Usage: python3 scripts/bench_decision_layers.py
[env: SPARK_GRAFT_CPUS, SPARK_GRAFT_DL_GROUPS (default 50_000 of each
shape, ~1.0 M nodes / ~0.9 M scored pairs)]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GROUPS = int(os.environ.get("SPARK_GRAFT_DL_GROUPS", "50000"))
TAU = 0.5


def main():
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        best_match_edges,
        connected_components,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("bench_decision_layers")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    g = spark.range(GROUPS).withColumnRenamed("id", "g").repartition(CPUS)
    pad = F.lpad(F.col("g").cast("string"), 7, "0")

    def node(tag, i):
        return F.concat(F.lit(tag), pad, F.lit(f"_{i}"))

    # hub: h matches 8 spokes at 0.55..0.62 and one partner at 0.9 —
    # threshold glues all 10; star keeps only h→partner plus each
    # spoke's own edge to h; mutual keeps h↔partner alone
    hub_edges = []
    for i in range(8):
        hub_edges.append((node("h", "c"), node("h", f"s{i}"), 0.55 + 0.01 * i))
    hub_edges.append((node("h", "c"), node("h", "p"), 0.9))
    # chain: a−b−c−d with descending scores 0.9/0.7/0.6 — mutual cuts
    # after the reciprocal pair
    chain_edges = [
        (node("c", "a"), node("c", "b"), 0.9),
        (node("c", "b"), node("c", "c"), 0.7),
        (node("c", "c"), node("c", "d"), 0.6),
    ]
    # clean duplicate pair
    pair_edges = [(node("p", "a"), node("p", "b"), 0.95)]
    # bridged pairs: two strong pairs joined by one weak bridge whose
    # endpoints BOTH have better partners — the snowball merge star is
    # built to cut (threshold glues all 4; star and mutual drop the
    # bridge because it is nobody's best edge)
    bridge_edges = [
        (node("b", "x1"), node("b", "x2"), 0.95),
        (node("b", "y1"), node("b", "y2"), 0.95),
        (node("b", "x2"), node("b", "y1"), 0.6),
    ]

    dfs = []
    for edges in (hub_edges, chain_edges, pair_edges, bridge_edges):
        sel = [
            F.struct(
                a.alias("node_a"), b.alias("node_b"), F.lit(s).alias("score")
            )
            for a, b, s in edges
        ]
        dfs.append(
            g.select(F.explode(F.array(*sel)).alias("e")).select("e.*")
        )
    scored = dfs[0]
    for extra in dfs[1:]:
        scored = scored.unionByName(extra)
    scored = scored.localCheckpoint()
    n_pairs = scored.count()
    nodes = (
        scored.select(F.col("node_a").alias("node"))
        .unionByName(scored.select(F.col("node_b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()

    def run(layer):
        t0 = time.time()
        if layer == "threshold":
            edges = scored.where(F.col("score") >= TAU).select(
                "node_a", "node_b"
            )
        else:
            edges = best_match_edges(scored, TAU, mutual=(layer == "mutual"))
        n_edges = edges.count()
        cl = connected_components(edges, nodes=nodes)
        n_clusters = cl.select("cluster").distinct().count()
        return {
            "edges": n_edges,
            "clusters": n_clusters,
            "sec": round(time.time() - t0, 2),
        }

    out = {
        "metric": "decision_layers_at_scale",
        "n_nodes": n_nodes,
        "n_scored_pairs": n_pairs,
        "tau": TAU,
        "cpus": CPUS,
    }
    for layer in ("threshold", "star", "mutual"):
        out[layer] = run(layer)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
