"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and order-insensitive
values.  Usage: python3 scripts/check_oracles.py [sf_dir] [name ...]
With ``--json PATH`` (first arg), additionally write a driver-format
correctness artifact (one rows/schema/hash entry per query)."""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df, float_dp=6):
    """pandas DataFrame → sorted list of row tuples with canonical values."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, float_dp))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, out


def main():
    import duckdb
    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries

    args = sys.argv[1:]
    json_path = None
    if args and args[0] == "--json":
        json_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    unknown = only - set(queries())
    if unknown:
        # a typo'd/renamed name must not silently verify nothing and
        # exit green
        print(f"unknown query names: {sorted(unknown)}")
        sys.exit(2)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("check_oracles")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = queries(), oracle_sql()
    failures = []
    report = {}

    def record(name, rows_match, schema_match, hash_match, sr, orr, err):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": sr,
            "oracle_rows": orr, "err": err,
        }
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            record(name, False, False, False, None, None,
                   f"spark error: {str(e)[:200]}")
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in os_:
            print(f"skip  {name}: no oracle (rows-only) — spark rows={len(sdf)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            record(name, False, False, False, len(sdf), None,
                   f"duckdb error: {str(e)[:200]}")
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        scols, svals = canon(sdf)
        dcols, dvals = canon(ddf)
        if scols != dcols:
            failures.append(name)
            record(name, len(svals) == len(dvals), False, False,
                   len(svals), len(dvals), None)
            print(f"FAIL  {name}: columns differ: spark={scols} duck={dcols}")
            continue
        if len(svals) != len(dvals):
            failures.append(name)
            record(name, False, True, False, len(svals), len(dvals), None)
            print(f"FAIL  {name}: rows differ: spark={len(svals)} duck={len(dvals)}")
            continue
        bad = [(a, b) for a, b in zip(svals, dvals) if a != b]
        if bad:
            failures.append(name)
            record(name, True, True, False, len(svals), len(dvals), None)
            print(f"FAIL  {name}: {len(bad)} value mismatches; first: {bad[0]}")
            continue
        record(name, True, True, True, len(svals), len(dvals), None)
        print(f"ok    {name}: rows={len(svals)} [{time.time()-t0:.1f}s]")

    spark.stop()
    if json_path:
        import json
        import os

        if only and os.path.exists(json_path):
            # targeted run: MERGE into the existing artifact (update
            # only the queries just run, drop entries for queries no
            # longer in the registry) instead of clobbering the full
            # record with a partial one
            with open(json_path) as f:
                prior = json.load(f)
            merged = {k: v for k, v in prior.items() if k in qs}
            merged.update(report)
            report = {k: merged[k] for k in qs if k in merged}
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path} ({len(report)} entries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
