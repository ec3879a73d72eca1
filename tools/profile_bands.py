"""Profile priority_bands at sf0.1: per-phase wall times to find where
the ~5.7 s goes (range-prefix persist/collect vs window vs final agg)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spider_spark import frontier

t0 = time.time()
o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
o.count()
print(f"read+count: {time.time()-t0:.2f}s rows={o.count()}")

for rep in range(3):
    t0 = time.time()
    banded = frontier.batch_priority_band(o, score_col="o_totalprice",
                                          tiebreak="o_orderkey")
    t1 = time.time()
    out = banded.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("band_value"))
    rows = out.collect()
    t2 = time.time()
    print(f"rep{rep}: build(band incl. persist/collect)={t1-t0:.2f}s "
          f"final agg+collect={t2-t1:.2f}s total={t2-t0:.2f}s rows={len(rows)}")
spark.stop()
