#!/usr/bin/env python
"""Similarity-search path comparison: exact brute-force vs banded-LSH
vs IVF vs single-table multi-probe top-k over the same embeddings,
same k and query set.

Usage:
    python3 scripts/bench_ann.py [sf_dir]   (default /root/testdata/sf0.1)
    python3 scripts/bench_ann.py --scale

Default mode prints one JSON line with per-path wall seconds (noop
sink, one warmup pass) plus the candidate-pair counts each approximate
path actually scored — the scale argument is the scored-pair ratio,
the small-scale wall clock mostly measures fixed overhead.

--scale runs IVF at a REALISTIC quantizer size: a deterministic
synthetic corpus of $SPARK_GRAFT_ANN_N vectors (default 256k, dim 64,
per-row seeded numpy — no external data) with planted near-duplicates,
nlist=$SPARK_GRAFT_ANN_NLIST (default 256 ≈ √n) and
nprobe=$SPARK_GRAFT_ANN_NPROBE (default 16).  It measures the Arrow
matmul kernels (``method="udf"`` — assignment AND probing), pins
recall@planted-top1 against exact brute-force ground truth, and probes
the literal fold path at the same nlist on a small row slice to show
why it can't serve this regime (O(nlist·dim) expression tree)."""

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

    books = ann.pq_fit(e)
    coarse = ann.ivfpq_fit_coarse(e)
    paths = {
        "brute": lambda: ann.brute_topk(e, k=ANN_K, n_queries=ANN_QUERIES),
        "lsh": lambda: ann.lsh_topk(e, k=ANN_K),
        "ivf": lambda: ann.ivf_topk(e, k=ANN_K, n_queries=ANN_QUERIES),
        "multiprobe": lambda: ann.multiprobe_topk(e, k=ANN_K),
        # PQ paths run the Arrow encode kernel (the large-codebook
        # production method); the oracle-checked literal path exists
        # for parity, not speed
        "pq": lambda: ann.pq_topk(
            e, k=ANN_K, n_queries=ANN_QUERIES, books=books, method="udf",
            adc="kernel",
        ),
        "ivfpq": lambda: ann.ivfpq_topk(
            e, k=ANN_K, n_queries=ANN_QUERIES, books=books, coarse=coarse,
            method="udf",
        ),
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
    # multi-probe: each query scores the occupants of its own bucket
    # plus its b radius-1 buckets (hot buckets capped away like the
    # banded path)
    mplanes = ann.hyperplanes(64, ann.MP_BITS)
    bk = e.select(
        F.col("vec_id").alias("vid"),
        ann.lsh_bucket_col(F.col("embedding"), mplanes).alias("bucket"),
    ).localCheckpoint(eager=True)
    sizes = bk.groupBy("bucket").count().where(
        F.col("count") <= ann.ANN_MAX_BUCKET
    )
    mprobes = bk.select(
        "vid",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.expr(f"bucket ^ {1 << i}").cast("long")
                    for i in range(ann.MP_BITS)
                ],
            )
        ).alias("bucket"),
    )
    pairs["multiprobe"] = (
        mprobes.join(sizes, "bucket").agg(F.sum("count")).collect()[0][0] - n
    )
    # PQ: every corpus vector is ADC-scored from its ~12-byte codes
    # (code-lookup adds, not float folds); only the shortlist is scored
    # at full precision — that is the float-pair budget reported here.
    # IVF-PQ ADC-scores just the probed cells' occupants.
    pairs["pq"] = ANN_QUERIES * min(ann.PQ_SHORTLIST, n - 1)
    ivfpq_cells = e.select(
        F.col("vec_id"),
        ann.ivfpq_cell_col(F.col("embedding"), coarse).alias("cell"),
    )
    ivfpq_probes = e.select(
        F.col("vec_id"),
        F.explode(
            ann.ivfpq_probe_cells_col(F.col("embedding"), coarse)
        ).alias("cell"),
    ).where(F.col("vec_id") < ANN_QUERIES)
    adc_ivfpq = (
        ivfpq_probes.join(ivfpq_cells.groupBy("cell").count(), "cell")
        .agg(F.sum("count"))
        .collect()[0][0]
        - ANN_QUERIES
    )
    pairs["ivfpq"] = ANN_QUERIES * min(
        ann.PQ_SHORTLIST, max(adc_ivfpq // ANN_QUERIES, 1)
    )
    adc_code_pairs_per_query = {
        "pq": n - 1,
        "ivfpq": round(adc_ivfpq / ANN_QUERIES, 1),
    }
    spark.stop()
    # lsh_topk ranks the WHOLE corpus (its candidate set spans n queries,
    # not n_queries), so normalize to scored pairs per query — the
    # quantity that scales with corpus size at the design point
    per_query = {
        "brute": round(pairs["brute"] / ANN_QUERIES, 1),
        "lsh": round(pairs["lsh"] / n, 1),
        "ivf": round(pairs["ivf"] / ANN_QUERIES, 1),
        "multiprobe": round(pairs["multiprobe"] / n, 1),
        "pq": round(pairs["pq"] / ANN_QUERIES, 1),
        "ivfpq": round(pairs["ivfpq"] / ANN_QUERIES, 1),
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
                "adc_code_pairs_per_query": adc_code_pairs_per_query,
            }
        )
    )


def _synth_corpus(spark, n: int, dim: int):
    """Deterministic synthetic embeddings: per-row numpy PCG64 seeded
    by vec_id — identical values at any partitioning or parallelism."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = [
                np.random.default_rng(int(i)).standard_normal(dim).tolist()
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema)
    )


def run_scale() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.operators import ann

    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "256000"))
    nlist = int(os.environ.get("SPARK_GRAFT_ANN_NLIST", "256"))
    nprobe = int(os.environ.get("SPARK_GRAFT_ANN_NPROBE", "16"))
    lit_rows = int(os.environ.get("SPARK_GRAFT_ANN_LIT_ROWS", "2000"))
    dim, n_queries, k = 64, 100, 3

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("bench_ann_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    base = _synth_corpus(spark, n, dim)
    # plant a near-duplicate (cosine ≈ 0.99) for each query vector so
    # recall has an unambiguous target — same protocol as the sf-corpus
    # recall tests
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = (
        base.where(F.col("vec_id") < n_queries)
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
                "embedding"
            ),
        )
    )
    corpus = base.unionByName(planted).localCheckpoint(eager=True)

    t0 = time.time()
    model = ann.ivf_fit(corpus, nlist)
    t_fit = round(time.time() - t0, 3)

    # Arrow-kernel IVF end-to-end (assignment + probing + in-cell exact)
    force(ann.ivf_topk(corpus, k=k, nprobe=nprobe, n_queries=n_queries,
                       model=model, method="udf"))  # warm
    t0 = time.time()
    force(ann.ivf_topk(corpus, k=k, nprobe=nprobe, n_queries=n_queries,
                       model=model, method="udf"))
    t_ivf = round(time.time() - t0, 3)

    # exact brute-force ground truth (same queries) + its wall clock
    t0 = time.time()
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    t_brute = round(time.time() - t0, 3)

    got = ann.ivf_topk(corpus, k=k, nprobe=nprobe, n_queries=n_queries,
                       model=model, method="udf").collect()
    found: dict = {}
    for r in got:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = round(hits / len(truth), 3)

    # literal-path feasibility probe at the same nlist, on a SMALL row
    # slice: the wall clock is plan/codegen-dominated — the point is
    # that it cannot serve a corpus this size, not that it's merely slow
    lit = corpus.limit(lit_rows).localCheckpoint(eager=True)
    t0 = time.time()
    force(ann.ivf_assign(lit, model, method="literal"))
    t_lit = round(time.time() - t0, 3)
    t0 = time.time()
    force(ann.ivf_assign(corpus, model, method="udf"))
    t_udf_assign = round(time.time() - t0, 3)

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "ann_ivf_scale",
                "unit": "sec",
                "n_vectors": n + n_queries,
                "dim": dim,
                "nlist": nlist,
                "nprobe": nprobe,
                "k": k,
                "n_queries": n_queries,
                "recall_at_planted_top1": recall,
                "wall_sec": {
                    "ivf_fit": t_fit,
                    "ivf_topk_udf": t_ivf,
                    "brute_topk_exact": t_brute,
                    f"ivf_assign_udf_{n + n_queries}rows": t_udf_assign,
                    f"ivf_assign_literal_{lit_rows}rows": t_lit,
                },
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale":
        run_scale()
    else:
        main()
