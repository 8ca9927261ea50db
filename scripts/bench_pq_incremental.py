#!/usr/bin/env python
"""Incremental vs full PQ index maintenance at scale.

Replicates the sf embeddings table R× (deterministic id offsets, each
replica's vectors rotated by a per-replica scalar so codes differ
across replicas), then measures:

* FULL — pq encode of the whole corpus under a fixed codebook
         (nightly index rebuild)
* INCR — encode of a ~5% delta only, unioned with the committed base
         codes (the daily append shape of a production vector index;
         ann_pq_codes_incremental's plan)

The claim under test: with the codebook frozen at index-build time
(the FAISS retrain-offline practice), folding appends in costs one
delta scan — per-batch cost tracks the delta, not the corpus.
Usage: python3 scripts/bench_pq_incremental.py
[env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PQ_REPL
(default 40 ≈ 80k vectors)]."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_PQ_REPL", "40"))


def main():
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import ann

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("bench_pq_incremental")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    reps = spark.range(REPL).withColumnRenamed("id", "rep")
    corpus = (
        base.repartition(CPUS)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: x * (1.0 + F.col("rep").cast("double") / REPL),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_vecs = corpus.count()
    delta_lo = (REPL - 2) * 10_000_000
    base_vecs = corpus.where(F.col("vec_id") < delta_lo)
    delta_vecs = corpus.where(F.col("vec_id") >= delta_lo)
    n_delta = delta_vecs.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def encode(df, books):
        return df.select(
            "vec_id", ann.pq_encode_udf(books)(F.col("embedding")).alias("c")
        )

    # codebook frozen at index-build time: fit once on the base
    books = ann.pq_fit(base_vecs)
    tiny = corpus.limit(500).localCheckpoint(eager=True)
    force(encode(tiny, books))  # warm the Arrow worker pool

    t0 = time.time()
    force(encode(corpus, books))
    t_full = round(time.time() - t0, 2)

    committed = encode(base_vecs, books).localCheckpoint(eager=True)
    t0 = time.time()
    force(committed.unionByName(encode(delta_vecs, books)))
    t_incr = round(time.time() - t0, 2)

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "pq_incremental_vs_full",
                "n_vecs": n_vecs,
                "n_delta": n_delta,
                "delta_frac": round(n_delta / n_vecs, 4),
                "full_sec": t_full,
                "incr_sec": t_incr,
                "speedup": round(t_full / max(t_incr, 1e-9), 2),
                "full_vecs_per_sec": round(n_vecs / t_full, 1),
                "incr_delta_vecs_per_sec": round(n_delta / t_incr, 1),
                "repl": REPL,
            }
        )
    )


if __name__ == "__main__":
    main()
