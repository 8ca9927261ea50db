#!/usr/bin/env python
"""Incremental vs full duplicated-span maintenance at scale.

Replicates the sf documents table R× with per-replica token drift (so
replicas share most grams but are not byte-identical), then measures:

* FULL — duplicated_spans over the whole corpus (nightly rebuild)
* INCR — incremental_duplicated_spans folding a ~5% delta against the
         committed gram index of the other 95% (the daily shape)

The claim under test: gram kernels run over the delta only; the
per-batch costs that remain — the df re-aggregation over the unioned
index (map-side combinable) and the island merge over TOUCHED docs —
amortize as the corpus grows, while the avoided full-corpus gram pass
scales with |corpus|.  Touched-doc count is reported too: on the
word-soup corpus most old docs share newly-flagged grams (worst case);
on real prose the touched set shrinks toward the delta.

Usage: python3 scripts/bench_spans_incremental.py  [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_SPANS_REPL (default 40 ≈ 200k docs)]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_SPANS_REPL", "40"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("bench_spans_incremental")
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
    force(dedup.duplicated_spans(tiny))
    t1 = tiny.where(F.col("doc_id") % 10 != 0)
    force(
        dedup.incremental_duplicated_spans(
            dedup.gram_index(t1),
            dedup.duplicated_spans(t1),
            tiny.where(F.col("doc_id") % 10 == 0),
        )[1]
    )

    t0 = time.time()
    force(dedup.duplicated_spans(corpus))
    t_full = round(time.time() - t0, 2)

    # committed state (untimed: built once by previous batches)
    prior_index = dedup.gram_index(prior_docs).localCheckpoint(eager=True)
    prior_spans = dedup.duplicated_spans(prior_docs).localCheckpoint(
        eager=True
    )
    prior_df = dedup.extend_gram_df(None, prior_index).localCheckpoint(
        eager=True
    )

    t0 = time.time()
    _idx, spans = dedup.incremental_duplicated_spans(
        prior_index, prior_spans, delta_docs
    )
    force(spans)
    t_incr_recount = round(time.time() - t0, 2)

    t0 = time.time()
    _idx, spans = dedup.incremental_duplicated_spans(
        prior_index, prior_spans, delta_docs, prior_df=prior_df
    )
    force(spans)
    t_incr_df = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "spans_incremental_vs_full",
                "n_docs": n_docs,
                "n_delta": n_delta,
                "delta_frac": round(n_delta / n_docs, 3),
                "full_sec": t_full,
                "incr_recount_sec": t_incr_recount,
                "incr_committed_df_sec": t_incr_df,
                "speedup_vs_full": round(t_full / t_incr_df, 2),
                "cpus": CPUS,
                "repl": REPL,
            }
        )
    )


if __name__ == "__main__":
    main()
