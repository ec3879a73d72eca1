"""Partitioned task sinks (S4) — the OutputWithFilePrefix role.

The reference's reducers write per-shard / per-task files
(``fetcher_3_task_7``; crawler/crawler/control/schedule/schedule.cc:95-97,
schedule_to_fetcher_id.cc:96-101, output_to_shard.cc:43-48). The Spark
rendering is ``partitionBy`` on write: one directory per (fetcher, task),
which a fetcher fleet consumes by partition pruning on its own id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frontier import binpack_fetchers, chunk_tasks


def write_fetch_tasks(scheduled: DataFrame, out_dir: str,
                      n_fetchers: int = 43, chunk_size: int = 1000,
                      ip_col: str = "ip", cost_col: str = "cost") -> None:
    """The schedule→fetcher sink (§3.1 step 9): greedy bin-pack ips to
    fetcher nodes (T4), cut fixed-size task chunks per fetcher (T5), and
    write partitioned by (fetcher_id, task_id). ``scheduled`` needs
    (url, ip, cost) — cost from selector.ip_load_estimate."""
    # binpack_fetchers expects the canonical (ip, cost) names — alias
    # here so a non-default ip_col/cost_col actually works
    ip_costs = scheduled.groupBy(F.col(ip_col).alias("ip")).agg(
        F.sum(cost_col).alias("cost")
    )
    packed = binpack_fetchers(ip_costs, n_fetchers).select(
        F.col("ip").alias(ip_col), "fetcher_id"
    )
    routed = scheduled.join(F.broadcast(packed), ip_col, "left").withColumn(
        "fetcher_id", F.coalesce(F.col("fetcher_id"), F.lit(0))
    )
    chunked = chunk_tasks(routed, "fetcher_id", ["url"], chunk_size)
    (
        chunked.write.mode("overwrite")
        .partitionBy("fetcher_id", "task_id")
        .parquet(out_dir)
    )


def read_fetch_task(spark: SparkSession, out_dir: str, fetcher_id: int,
                    task_id: int | None = None) -> DataFrame:
    """Fetcher-side read: partition pruning on (fetcher_id[, task_id]) —
    the scan touches only that fetcher's directories."""
    df = spark.read.parquet(out_dir).filter(
        F.col("fetcher_id") == fetcher_id
    )
    if task_id is not None:
        df = df.filter(F.col("task_id") == task_id)
    return df


def list_task_files(out_dir: str) -> list[tuple[int, int]]:
    """Donelist-style enumeration of written (fetcher_id, task_id) pairs
    from the partition directory layout."""
    out = []
    for fdir in sorted(os.listdir(out_dir)):
        if not fdir.startswith("fetcher_id="):
            continue
        fid = int(fdir.split("=")[1])
        for tdir in sorted(os.listdir(os.path.join(out_dir, fdir))):
            if tdir.startswith("task_id="):
                out.append((fid, int(tdir.split("=")[1])))
    return out
