"""spark-submit entry point: full ER pipeline over the interleaved
adapter view (BASELINE.json north_star run mode).

    spark-submit --master 'local[8]' --py-files /tmp/pipeline.zip \
        scripts/run_pipeline.py [sf_dir] [output_dir]

Reads documents from sf_dir (default /root/testdata/sf0.001), resolves
entities, and writes the cluster-assigned mention table to output_dir
(default: a noop materialization, for throughput runs).  Imports only
from the zip — no repo-root sys.path — so it validates the --py-files
packaging.
"""

import sys
import time

from pyspark.sql import SparkSession

from rosette_elasticsearch_plugin_spark.plans.er_pipeline import resolve_documents
from rosette_elasticsearch_plugin_spark.sources.adapter import load_documents


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    spark = SparkSession.builder.appName("er_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = load_documents(spark, sf_dir)
    assigned, clusters = resolve_documents(docs, pattern=r"[a-z]{2,}")
    out = assigned.select("doc_id", "mention_id", "surface", "normalized", "cluster")
    if out_dir:
        out.write.mode("overwrite").parquet(out_dir)
    else:
        out.write.format("noop").mode("overwrite").save()
    n_docs = docs.count()
    dt = time.time() - t0
    print(
        f"resolved {n_docs} docs in {dt:.1f}s "
        f"({n_docs / dt:.1f} docs/sec); clusters={clusters.count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
