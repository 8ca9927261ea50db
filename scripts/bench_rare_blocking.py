#!/usr/bin/env python
"""Rarest-token blocking at vocabulary scale: quantify the linear
candidate budget the canopy-surrogate family buys vs raw token
blocking, and the soft-TF-IDF scorer's throughput over its pairs.

Usage: python3 scripts/bench_rare_blocking.py  [N_NAMES]
(default 250k names; local[$SPARK_GRAFT_CPUS], default 32)

The vocabulary is synthesized Spark-side (no driver loop, no external
data): two-token names, first names uniform over a 4000-token pool,
surnames drawn from a 1000-token pool through a cubic power transform
so head surnames get corpus-realistic hot blocks.  Unlike
bench_metablocking's vocabulary there is NO unique per-row tail token —
every token is shared — because a guaranteed-unique token would make
rarest-token blocking degenerate (every name would block alone).

Reported, one JSON line on stdout (prose goes to BENCH.md):

* t-family (raw token blocking): block build wall, max block size, and
  the ANALYTIC pair count sum nb·(nb−1)/2 (the quadratic cliff), plus
  the capped candidate_pairs wall + count;
* r-family (rarest-token): block build wall (includes the global token
  frequency pass), max block size, capped candidate_pairs wall + count;
* the budget ratio r/t, and TF-IDF cosine scoring wall + throughput
  over the r-family pairs (the end-to-end canopy→score path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CAP = 500

_FIRST_POOL = 4000
_LAST_POOL = 1000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import er_key_col
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        rare_token_blocks,
        token_blocks,
    )
    from rosette_elasticsearch_plugin_spark.resolution.pairs import (
        candidate_pairs,
    )
    from rosette_elasticsearch_plugin_spark.resolution.scoring import (
        tfidf_cosine_scores,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .appName("bench_rare_blocking")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic vocabulary, generated executor-side;
    # first/last indices come from two INDEPENDENT xxhash64 streams
    # (a shared modulus would correlate them and collapse the
    # distinct() to one name per first token, which makes rarest-token
    # blocking degenerate); distinct() because a few of the 4M
    # (first, last) combinations repeat at 250k draws
    ids = spark.range(N).repartition(CPUS)
    first_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(_FIRST_POOL))
    u = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1_000_000)).cast(
        "double"
    ) / F.lit(1e6)
    # cubic transform: P(last=0) = 0.1 — one corpus-realistic hot
    # surname block of ~N/10 names (the quadratic cliff for raw
    # token blocking), with a long tail of rare surnames
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

    def block_stats(blocks):
        return blocks.groupBy("block_key").count().agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.sum(
                (F.col("count") * (F.col("count") - 1) / 2).cast("long")
            ).alias("raw_pairs"),
        ).collect()[0]

    # --- raw token family -------------------------------------------------
    t0 = time.time()
    tblocks = token_blocks(keyed).localCheckpoint(eager=True)
    t_tblocks = time.time() - t0
    tstats = block_stats(tblocks)
    t0 = time.time()
    n_tpairs = candidate_pairs(tblocks, CAP).count()
    t_tpairs = time.time() - t0

    # --- rarest-token family ----------------------------------------------
    t0 = time.time()
    rblocks = rare_token_blocks(keyed).localCheckpoint(eager=True)
    t_rblocks = time.time() - t0
    rstats = block_stats(rblocks)
    t0 = time.time()
    rpairs = candidate_pairs(rblocks, CAP).localCheckpoint(eager=True)
    n_rpairs = rpairs.count()
    t_rpairs = time.time() - t0

    # --- TF-IDF cosine over the r-family candidates ------------------------
    t0 = time.time()
    n_scored = tfidf_cosine_scores(rpairs, keyed).count()
    t_score = time.time() - t0

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "rare_token_blocking_budget",
                "n_names": n_names,
                "cpus": CPUS,
                "cap": CAP,
                "t_family": {
                    "t_blocks_sec": round(t_tblocks, 2),
                    "n_blocks": tstats["n_blocks"],
                    "max_block": tstats["max_block"],
                    "raw_unpurged_pairs": tstats["raw_pairs"],
                    "capped_pairs": n_tpairs,
                    "t_capped_sec": round(t_tpairs, 2),
                },
                "r_family": {
                    "t_blocks_sec": round(t_rblocks, 2),
                    "n_blocks": rstats["n_blocks"],
                    "max_block": rstats["max_block"],
                    "raw_pairs": rstats["raw_pairs"],
                    "capped_pairs": n_rpairs,
                    "t_capped_sec": round(t_rpairs, 2),
                },
                "budget_ratio_r_vs_t_capped": round(n_rpairs / n_tpairs, 4)
                if n_tpairs
                else None,
                "tfidf_scored_pairs": n_scored,
                "t_tfidf_sec": round(t_score, 2),
                "tfidf_pairs_per_sec": round(n_scored / t_score)
                if t_score
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
