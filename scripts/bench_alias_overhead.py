#!/usr/bin/env python
"""Cost of the nickname-dictionary key rewrite at vocabulary scale.

``ERConfig.alias_names`` adds one literal-map lookup per token inside
the ER canonical key (functions/aliases.alias_canonical_col).  This
measures the full keying pass (transliteration chain ± the alias
transform) over a synthetic vocabulary, so the dictionary's cost story
is a number, not an assertion: the rewrite is a constant per-name
column expression with no shuffle, so it should price at roughly the
cost of one more projection.

Vocabulary: two-token names; 1-in-4 first tokens is drawn from the
nickname dictionary (so the rewrite branch actually fires), the rest
from a 4000-token pool.  Usage:
python3 scripts/bench_alias_overhead.py [N_NAMES]  (default 250k)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from rosette_elasticsearch_plugin_spark.functions.aliases import NICKNAMES
    from rosette_elasticsearch_plugin_spark.plans.er_pipeline import er_key_col

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .appName("bench_alias_overhead")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nicks = sorted(NICKNAMES)
    nick_arr = F.array(*[F.lit(x) for x in nicks])
    ids = spark.range(N).repartition(CPUS)
    h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(4000))
    h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000))
    h3 = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(len(nicks)))
    first = F.when(
        F.pmod(F.col("id"), F.lit(4)) == 0,
        F.element_at(nick_arr, (h3 + 1).cast("int")),
    ).otherwise(F.concat(F.lit("fn"), h1.cast("string")))
    names = ids.select(
        F.concat(first, F.lit(" ln"), h2.cast("string")).alias("node")
    ).localCheckpoint(eager=True)
    n = names.count()

    def timed(aliases: bool) -> float:
        t0 = time.time()
        # checksum action forces full evaluation of every key
        names.select(
            er_key_col(F.col("node"), aliases).alias("key")
        ).agg(F.expr("bit_xor(xxhash64(key))")).collect()
        return round(time.time() - t0, 3)

    # warm both plans once (codegen), then best-of-3 each, interleaved
    timed(False), timed(True)
    plain = min(timed(False) for _ in range(3))
    aliased = min(timed(True) for _ in range(3))
    rewritten = names.select(
        er_key_col(F.col("node"), False).alias("a"),
        er_key_col(F.col("node"), True).alias("b"),
    ).where(F.col("a") != F.col("b")).count()
    print(
        json.dumps(
            {
                "metric": "alias_rewrite_overhead",
                "n_names": n,
                "cpus": CPUS,
                "plain_key_sec": plain,
                "alias_key_sec": aliased,
                "overhead_ratio": round(aliased / plain, 3),
                "names_rewritten": rewritten,
            }
        )
    )


if __name__ == "__main__":
    main()
