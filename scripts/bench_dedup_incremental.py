"""Incremental vs full near-dup detection at scale.

Replicates the sf documents table R× (deterministic id offsets, text
perturbed per replica so replicas aren't trivial exact dups), then
measures:

* FULL    — near_dup_pairs over the whole corpus (the nightly rebuild)
* INCR    — incremental_near_dup_pairs folding a ~5% delta against the
            committed band index of the other 95% (the daily shape)

The claim under test: per-batch cost is delta-proportional — the
shingle→MinHash→band kernels run over the delta only, candidate pairs
come from delta-bucket joins, and verification shingles only candidate
docs.  At 10^12 docs the full rebuild is off the table; this ratio is
the whole reason the incremental path exists.

Usage: python3 scripts/bench_dedup_incremental.py  [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_DEDUP_REPL (default 40 ≈ 200k docs)]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_DEDUP_REPL", "40"))


def main():
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("bench_dedup_incremental")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    reps = spark.range(REPL).withColumnRenamed("id", "rep")
    # per-replica text mixing (prepend the replica tag as tokens) so
    # replicas are near- but not exact-duplicates of each other — the
    # realistic "re-crawl with boilerplate drift" shape
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
    delta_lo = (REPL - 2) * 10_000_000  # last 2 replicas ≈ 5% delta
    prior_docs = corpus.where(F.col("doc_id") < delta_lo)
    delta_docs = corpus.where(F.col("doc_id") >= delta_lo)
    n_delta = delta_docs.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup (codegen/janino compile) at tiny scale
    tiny = corpus.limit(500).localCheckpoint(eager=True)
    force(dedup.near_dup_pairs(tiny, threshold=0.8))
    force(
        dedup.incremental_near_dup_pairs(
            tiny,
            dedup.extend_band_index(None, tiny.limit(400)),
            tiny.where(F.col("doc_id") % 10 == 0),
            threshold=0.8,
        )
    )

    t0 = time.time()
    force(dedup.near_dup_pairs(corpus, threshold=0.8))
    t_full = round(time.time() - t0, 2)

    # committed state (untimed: built once by the previous run)
    prior_index = dedup.extend_band_index(None, prior_docs).localCheckpoint(
        eager=True
    )
    t0 = time.time()
    force(
        dedup.incremental_near_dup_pairs(
            corpus, prior_index, delta_docs, threshold=0.8
        )
    )
    t_incr = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "dedup_incremental_vs_full",
                "n_docs": n_docs,
                "n_delta": n_delta,
                "delta_frac": round(n_delta / n_docs, 4),
                "full_sec": t_full,
                "incr_sec": t_incr,
                "speedup": round(t_full / max(t_incr, 1e-9), 2),
                "full_docs_per_sec": round(n_docs / t_full, 1),
                "incr_delta_docs_per_sec": round(n_delta / t_incr, 1),
                "sf_base_docs": n_base,
                "repl": REPL,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
