#!/usr/bin/env python
"""Suffix-array blocking at vocabulary scale: quantify the key volume,
the df purge's effect on block sizes, and the candidate budget the
``s:`` family adds on top of the default families.

Usage: python3 scripts/bench_suffix_blocking.py  [N_NAMES]
(default 250k names; local[$SPARK_GRAFT_CPUS], default 32)

Same deterministic Spark-side vocabulary as bench_rare_blocking (two-
token names, uniform first names over 4000, cubic-skewed surnames over
1000 — one hot surname carried by ~N/10 names).  Suffix blocking's
risk profile at scale is different from token blocking's: the key
VOLUME is ~|key|−4 keys per name (bounded, ~10×), while the hot blocks
come from shared ENDINGS — the skewed surname pool gives plenty.  The
df purge (suffixes carried by more than ``suffix_max_block`` names are
dropped) is the family's built-in answer; this bench measures what
survives it.

Reported, one JSON line on stdout (prose goes to BENCH.md):

* key volume before the purge (distinct (node, suffix) rows, keys per
  name) and the purge survival rate;
* post-purge block stats (count, max — bounded by suffix_max_block by
  construction) and the analytic pair budget sum nb·(nb−1)/2;
* candidate_pairs wall + count over the purged s-family alone, and the
  MARGINAL pairs the family adds on top of exact+metaphone+minhash
  (the number a deployment actually pays for the leading-typo recall).
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
MIN_LEN = 5
MAX_BLOCK = 50

_FIRST_POOL = 4000
_LAST_POOL = 1000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import er_key_col
    from rosette_elasticsearch_plugin_spark.resolution.blocking import (
        BlockingConfig,
        all_blocks,
        suffix_blocks,
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
        .appName("bench_suffix_blocking")
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

    # --- pre-purge key volume (the explosion the purge must tame) ---------
    ck = F.regexp_replace(F.col("key"), " ", "")
    sufs = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(ck) - (MIN_LEN - 1), F.lit(1))
        ),
        lambda i: F.substring(ck, i, 0x7FFFFFFF),
    )
    t0 = time.time()
    n_raw_keys = (
        keyed.select("node", F.explode(sufs).alias("suf"))
        .where(F.length("suf") > 0)
        .distinct()
        .count()
    )
    t_raw = time.time() - t0

    # --- purged family ----------------------------------------------------
    t0 = time.time()
    sblocks = suffix_blocks(keyed, MIN_LEN, MAX_BLOCK).localCheckpoint(
        eager=True
    )
    t_sblocks = time.time() - t0
    sstats = (
        sblocks.groupBy("block_key")
        .count()
        .agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.sum(
                (F.col("count") * (F.col("count") - 1) / 2).cast("long")
            ).alias("raw_pairs"),
        )
        .collect()[0]
    )
    n_kept_keys = sblocks.count()
    t0 = time.time()
    spairs = candidate_pairs(sblocks, CAP).localCheckpoint(eager=True)
    n_spairs = spairs.count()
    t_spairs = time.time() - t0

    # --- marginal pairs on top of the default families --------------------
    base_blocks = all_blocks(keyed, BlockingConfig()).localCheckpoint(
        eager=True
    )
    base_pairs = candidate_pairs(base_blocks, CAP).localCheckpoint(eager=True)
    n_base = base_pairs.count()
    n_marginal = spairs.join(
        base_pairs, ["node_a", "node_b"], "left_anti"
    ).count()

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "suffix_blocking_budget",
                "n_names": n_names,
                "cpus": CPUS,
                "cap": CAP,
                "min_len": MIN_LEN,
                "max_block": MAX_BLOCK,
                "raw_suffix_keys": n_raw_keys,
                "raw_keys_per_name": round(n_raw_keys / n_names, 2),
                "t_raw_keys_sec": round(t_raw, 2),
                "s_family": {
                    "t_blocks_sec": round(t_sblocks, 2),
                    "kept_keys": n_kept_keys,
                    "purge_survival": round(n_kept_keys / n_raw_keys, 4),
                    "n_blocks": sstats["n_blocks"],
                    "max_block": sstats["max_block"],
                    "raw_pairs": sstats["raw_pairs"],
                    "capped_pairs": n_spairs,
                    "t_capped_sec": round(t_spairs, 2),
                },
                "base_family_pairs": n_base,
                "marginal_pairs_over_base": n_marginal,
                "marginal_ratio": round(n_marginal / n_base, 4)
                if n_base
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
