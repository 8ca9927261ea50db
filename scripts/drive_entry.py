"""Smoke-drive the driver contract: run entry(spark) like the driver
does and show the result shape."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from __spark_entry__ import entry

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .appName("drive_entry")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
df = entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s")
print("schema:", df.schema.simpleString())
for r in rows[:5]:
    print(" ", r)
spark.stop()
