#!/usr/bin/env python
"""Meta-blocking at vocabulary scale: measure what the purge+prune
stages buy on a Zipfian-skewed synthetic name vocabulary.

Usage: python3 scripts/bench_metablocking.py  [N_NAMES]
(default 250k names; local[$SPARK_GRAFT_CPUS], default 32)

The vocabulary is synthesized Spark-side (no driver loop, no external
data): first names uniform over a 200-token pool, surnames drawn from a
1000-token pool through a cubic power transform so the head tokens get
corpus-realistic hot blocks.  Reported:

* block build wall + block-count / max-block-size,
* the ANALYTIC pair count the raw token family would produce with no
  purge (sum nb·(nb−1)/2 — never executed; this is the quadratic cliff
  meta-blocking exists to avoid),
* default capped candidate generation (pairs.candidate_pairs) wall +
  pair count,
* meta-blocking weighted pruning (metablocking.weighted_edge_pruning)
  wall + kept-pair count + pruning ratio vs the capped default.

One JSON line on stdout; prose goes to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAU = 0.1
CAP = 500

_FIRST_POOL = 200
_LAST_POOL = 1000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import er_key_col
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        BlockingConfig,
        all_blocks,
    )
    from rosette_elasticsearch_plugin_spark.resolution.metablocking import (
        weighted_edge_pruning,
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
        .appName("bench_metablocking")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # deterministic synthetic vocabulary, generated executor-side
    ids = spark.range(N).repartition(CPUS)
    u = (F.col("id") % _LAST_POOL).cast("double") / F.lit(float(_LAST_POOL))
    last_idx = F.floor(F.pow(u, F.lit(3.0)) * _LAST_POOL).cast("long")
    names = ids.select(
        F.concat(
            F.lit("fn"),
            ((F.col("id") * 31) % _FIRST_POOL).cast("string"),
            F.lit(" ln"),
            last_idx.cast("string"),
            # a per-row numeric tail keeps every node distinct without
            # changing the token blocks (tokens come from the two
            # leading tokens; the tail is its own rare token)
            F.lit(" v"),
            F.col("id").cast("string"),
        ).alias("node")
    )
    keyed = names.select(
        "node", er_key_col(F.col("node")).alias("key")
    ).localCheckpoint(eager=True)

    t0 = time.time()
    blocks = all_blocks(
        keyed, BlockingConfig(use_tokens=True)
    ).localCheckpoint(eager=True)
    t_blocks = time.time() - t0
    sizes = blocks.groupBy("block_key").count()
    stats = sizes.agg(
        F.count("*").alias("n_blocks"),
        F.max("count").alias("max_block"),
        F.sum(
            (F.col("count") * (F.col("count") - 1) / 2).cast("long")
        ).alias("raw_pairs"),
    ).collect()[0]

    # count() (a map-side-combined aggregate), never a checkpoint: the
    # pair tables run to tens of millions of rows and pinning them in
    # the single local JVM would OOM — and is not what the measurement
    # is about (generation throughput, not retention)
    t0 = time.time()
    n_default = candidate_pairs(blocks, CAP).count()
    t_default = time.time() - t0

    t0 = time.time()
    n_meta = weighted_edge_pruning(blocks, TAU, CAP).count()
    t_meta = time.time() - t0

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "metablocking_pruning",
                "n_names": N,
                "cpus": CPUS,
                "tau": TAU,
                "cap": CAP,
                "t_blocks_sec": round(t_blocks, 2),
                "n_blocks": stats["n_blocks"],
                "max_block": stats["max_block"],
                "raw_unpurged_pairs": stats["raw_pairs"],
                "capped_pairs": n_default,
                "t_capped_sec": round(t_default, 2),
                "meta_kept_pairs": n_meta,
                "t_meta_sec": round(t_meta, 2),
                "pruning_ratio_vs_capped": round(1 - n_meta / n_default, 4)
                if n_default
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
