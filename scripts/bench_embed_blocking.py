#!/usr/bin/env python
"""Embedding-LSH blocking at vocabulary scale: key volume is FIXED at
planes+1 keys per name (the multi-probe set), so unlike suffix/token
families there is no purge to measure — the scale knob is the plane
count: 2^planes buckets must track the vocabulary (2^k ≳ n/50) or
every bucket goes hot and the cap machinery star-pairs them all.

Usage: python3 scripts/bench_embed_blocking.py [N_NAMES] [PLANES]
(default 250k names, 12 planes ≈ 4096 buckets; local[$SPARK_GRAFT_CPUS])

Same deterministic Spark-side vocabulary as bench_suffix_blocking
(uniform first names over 4000, cubic-skewed surnames over 1000).
Reports, one JSON line: block-size distribution at the chosen plane
count, capped candidate pairs + wall, the marginal pairs the family
adds over exact+metaphone+minhash, and a planted-typo co-block check
(every name gets a 2-char-edit twin; fraction sharing an ``e:`` key —
the recall the family buys at this bucket granularity)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
PLANES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CAP = 500

_FIRST_POOL = 4000
_LAST_POOL = 1000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import er_key_col
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        BlockingConfig,
        all_blocks,
        embed_blocks,
    )
    from rosette_elasticsearch_plugin_spark.resolution.pairs import (
        candidate_pairs,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .appName("bench_embed_blocking")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(N).repartition(CPUS)
    first_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(_FIRST_POOL))
    u = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1_000_000)).cast(
        "double"
    ) / F.lit(1e6)
    last_idx = F.floor(F.pow(u, F.lit(3.0)) * _LAST_POOL).cast("long")
    names = ids.select(
        F.concat(
            F.lit("fn"),
            first_idx.cast("string"),
            F.lit(" ln"),
            last_idx.cast("string"),
        ).alias("node")
    ).distinct()
    keyed = names.select(
        "node", er_key_col(F.col("node")).alias("key")
    ).localCheckpoint(eager=True)
    n_names = keyed.count()

    # --- e-family blocks at the chosen plane count ------------------------
    t0 = time.time()
    eblocks = embed_blocks(keyed, planes_k=PLANES, method="udf").localCheckpoint(
        eager=True
    )
    t_blocks = time.time() - t0
    estats = (
        eblocks.groupBy("block_key")
        .count()
        .agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.expr("percentile_approx(count, 0.99)").alias("p99_block"),
            F.sum(
                (F.col("count") * (F.col("count") - 1) / 2).cast("long")
            ).alias("raw_pairs"),
        )
        .collect()[0]
    )
    n_keys = eblocks.count()
    t0 = time.time()
    epairs = candidate_pairs(eblocks, CAP).localCheckpoint(eager=True)
    n_epairs = epairs.count()
    t_pairs = time.time() - t0

    # --- marginal over the default families -------------------------------
    base_blocks = all_blocks(keyed, BlockingConfig()).localCheckpoint(
        eager=True
    )
    base_pairs = candidate_pairs(base_blocks, CAP).localCheckpoint(eager=True)
    n_base = base_pairs.count()
    n_marginal = epairs.join(
        base_pairs, ["node_a", "node_b"], "left_anti"
    ).count()

    # --- planted-typo co-block recall at this granularity ------------------
    # twin = swap two interior chars of the compact key (a 2-edit typo
    # no exact/prefix key survives); recall = twins sharing an e: key
    twin_key = F.concat(
        F.substring("key", 1, 2),
        F.substring("key", 4, 1),
        F.substring("key", 3, 1),
        F.expr("substring(key, 5)"),
    )
    sample = keyed.where(F.length("key") >= 6).limit(20_000)
    twins = sample.select(
        F.concat(F.lit("T:"), F.col("node")).alias("node"),
        twin_key.alias("key"),
    )
    both = sample.unionByName(twins).localCheckpoint(eager=True)
    bblocks = embed_blocks(both, planes_k=PLANES, method="udf")
    orig = bblocks.where(~F.col("node").startswith("T:")).select(
        F.col("node"), F.col("block_key")
    )
    tw = bblocks.where(F.col("node").startswith("T:")).select(
        F.expr("substring(node, 3)").alias("node"), F.col("block_key")
    )
    n_sample = sample.count()
    n_coblocked = (
        orig.join(tw, ["node", "block_key"]).select("node").distinct().count()
    )

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "embed_blocking_budget",
                "n_names": n_names,
                "cpus": CPUS,
                "cap": CAP,
                "planes": PLANES,
                "keys_per_name": PLANES + 1,
                "e_family": {
                    "t_blocks_sec": round(t_blocks, 2),
                    "keys": n_keys,
                    "n_blocks": estats["n_blocks"],
                    "max_block": estats["max_block"],
                    "p99_block": estats["p99_block"],
                    "raw_pairs": estats["raw_pairs"],
                    "capped_pairs": n_epairs,
                    "t_capped_sec": round(t_pairs, 2),
                },
                "base_family_pairs": n_base,
                "marginal_pairs_over_base": n_marginal,
                "marginal_ratio": round(n_marginal / n_base, 4)
                if n_base
                else None,
                "planted_typo": {
                    "n_sample": n_sample,
                    "n_coblocked": n_coblocked,
                    "recall": round(n_coblocked / n_sample, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
