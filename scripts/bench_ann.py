#!/usr/bin/env python
"""Similarity-search path comparison: exact brute-force vs banded-LSH
vs IVF top-k over the same embeddings, same k and query set.

Usage: python3 scripts/bench_ann.py [sf_dir]   (default /root/testdata/sf0.1)

Prints one JSON line with per-path wall seconds (noop sink, one warmup
pass) plus the candidate-pair counts each approximate path actually
scored — the scale argument is the scored-pair ratio, the small-scale
wall clock mostly measures fixed overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import ann
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        ANN_K,
        ANN_QUERIES,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("bench_ann")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rosette_elasticsearch_plugin_spark.sources.adapter import (
        parallelize_scan,
    )

    e = parallelize_scan(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    n = e.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    paths = {
        "brute": lambda: ann.brute_topk(e, k=ANN_K, n_queries=ANN_QUERIES),
        "lsh": lambda: ann.lsh_topk(e, k=ANN_K),
        "ivf": lambda: ann.ivf_topk(e, k=ANN_K, n_queries=ANN_QUERIES),
    }
    force(paths["brute"]())  # warm the JVM/codegen once
    timings = {}
    for name, thunk in paths.items():
        t0 = time.time()
        force(thunk())
        timings[name] = round(time.time() - t0, 3)

    # scored-pair counts: the scale-relevant quantity
    pairs = {"brute": n * ANN_QUERIES - ANN_QUERIES}
    pairs["lsh"] = ann.banded_candidates(e).count() * 2  # symmetrized
    model = ann.ivf_fit(e)
    cells = ann.ivf_assign(e, model)
    probes = e.select(
        F.col("vec_id"),
        F.explode(
            ann.ivf_probe_cells_col(
                F.col("embedding"), ann.norm_col(F.col("embedding")), model
            )
        ).alias("cell"),
    ).where(F.col("vec_id") < ANN_QUERIES)
    pairs["ivf"] = (
        probes.join(cells.groupBy("cell").count(), "cell")
        .agg(F.sum("count"))
        .collect()[0][0]
        - ANN_QUERIES  # self matches excluded by the != filter
    )
    spark.stop()
    # lsh_topk ranks the WHOLE corpus (its candidate set spans n queries,
    # not n_queries), so normalize to scored pairs per query — the
    # quantity that scales with corpus size at the design point
    per_query = {
        "brute": round(pairs["brute"] / ANN_QUERIES, 1),
        "lsh": round(pairs["lsh"] / n, 1),
        "ivf": round(pairs["ivf"] / ANN_QUERIES, 1),
    }
    print(
        json.dumps(
            {
                "metric": "ann_path_comparison",
                "unit": "sec",
                "sf_dir": SF_DIR,
                "n_vectors": n,
                "n_queries": ANN_QUERIES,
                "k": ANN_K,
                "wall_sec": timings,
                "scored_pairs": pairs,
                "scored_pairs_per_query": per_query,
            }
        )
    )


if __name__ == "__main__":
    main()
