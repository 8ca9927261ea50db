#!/usr/bin/env python
"""Incremental vs full content-defined-chunking dedup at scale.

Replicates the sf documents table R× (deterministic id offsets, texts
prefixed per replica so chunk streams drift without losing shared
chunks), then measures:

* FULL — cdc_chunks + cdc_pairs over the whole corpus (nightly rebuild)
* INCR — incremental_cdc_pairs folding a ~5% delta against the
         committed chunk index of the other 95% (the daily shape)

The claim under test: the chunking kernel (the dominant cost — one md5
per char position) runs over the delta ONLY, so per-batch cost tracks
the delta.  Usage: python3 scripts/bench_cdc_incremental.py
[env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_CDC_REPL
(default 40 ≈ 200k docs)]."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_CDC_REPL", "40"))


def main():
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("bench_cdc_incremental")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(REPL).withColumnRenamed("id", "rep")
    corpus = (
        base.repartition(CPUS)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()
    delta_lo = (REPL - 2) * 10_000_000
    prior_docs = corpus.where(F.col("doc_id") < delta_lo)
    delta_docs = corpus.where(F.col("doc_id") >= delta_lo)
    n_delta = delta_docs.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    tiny = corpus.limit(500).localCheckpoint(eager=True)
    force(dedup.cdc_pairs(dedup.cdc_chunks(tiny)))
    force(
        dedup.incremental_cdc_pairs(
            dedup.extend_chunk_index(None, tiny.limit(400)),
            tiny.where(F.col("doc_id") % 10 == 0),
        )
    )

    t0 = time.time()
    force(dedup.cdc_pairs(dedup.cdc_chunks(corpus)))
    t_full = round(time.time() - t0, 2)

    prior_index = dedup.extend_chunk_index(None, prior_docs).localCheckpoint(
        eager=True
    )
    t0 = time.time()
    force(dedup.incremental_cdc_pairs(prior_index, delta_docs))
    t_incr = round(time.time() - t0, 2)

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "cdc_incremental_vs_full",
                "n_docs": n_docs,
                "n_delta": n_delta,
                "delta_frac": round(n_delta / n_docs, 4),
                "full_sec": t_full,
                "incr_sec": t_incr,
                "speedup": round(t_full / max(t_incr, 1e-9), 2),
                "full_docs_per_sec": round(n_docs / t_full, 1),
                "incr_delta_docs_per_sec": round(n_delta / t_incr, 1),
                "repl": REPL,
            }
        )
    )


if __name__ == "__main__":
    main()
