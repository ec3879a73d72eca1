"""Partitioned task sink (S4) + paginator (E4) + bad-page filter (D4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import selector as sel
from spider_spark import sinks


def test_write_and_read_fetch_tasks(spark, tmp_path):
    rows = [
        ("http://h%d.com/%d" % (i % 5, i), "ip%d" % (i % 5), 1.0)
        for i in range(200)
    ]
    scheduled = spark.createDataFrame(rows, "url string, ip string, cost double")
    out = str(tmp_path / "tasks")
    sinks.write_fetch_tasks(scheduled, out, n_fetchers=3, chunk_size=40)

    pairs = sinks.list_task_files(out)
    assert pairs, "no task partitions written"
    fetchers = {f for f, _ in pairs}
    assert fetchers <= {0, 1, 2} and len(fetchers) >= 2

    # round-trip: union of all per-fetcher reads == input urls
    all_urls = set()
    for fid in fetchers:
        part = sinks.read_fetch_task(spark, out, fid)
        urls = {r["url"] for r in part.select("url").collect()}
        # chunking respected
        counts = part.groupBy("task_id").count().collect()
        assert all(r["count"] <= 40 for r in counts)
        all_urls |= urls
    assert all_urls == {r[0] for r in rows}

    # partition pruning reaches the scan
    plan = sinks.read_fetch_task(spark, out, 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan or "fetcher_id" in plan


def test_paginate_list_urls(spark):
    df = spark.createDataFrame(
        [("http://shop.com/list?cat=5&page=2",),
         ("http://shop.com/item/9",)],
        "url string",
    )
    out = sel.paginate_list_urls(df, n_next=3)
    got = sorted(r["next_url"] for r in out.collect())
    assert got == [
        "http://shop.com/list?cat=5&page=3",
        "http://shop.com/list?cat=5&page=4",
        "http://shop.com/list?cat=5&page=5",
    ]


def test_bad_page_filter(spark):
    docs = spark.createDataFrame(
        [(1, 111), (2, 222), (3, 333)], "doc_id long, simhash long"
    )
    bad = spark.createDataFrame([(222,)], "bad_sign long")
    kept = {r["doc_id"] for r in sel.bad_page_filter(docs, bad).collect()}
    assert kept == {1, 3}


def test_write_fetch_tasks_custom_ip_col(spark, tmp_path):
    """A non-default ip_col must work end-to-end (the bin-pack stage
    expects canonical (ip, cost) names internally)."""
    from spider_spark import sinks

    scheduled = spark.createDataFrame(
        [(f"http://h{i % 4}/p", f"ip-{i % 4}", 1.0) for i in range(40)],
        "url string, host_ip string, cost double",
    )
    out = str(tmp_path / "tasks2")
    sinks.write_fetch_tasks(scheduled, out, n_fetchers=2, chunk_size=10,
                            ip_col="host_ip")
    back = spark.read.parquet(out)
    assert back.count() == 40
    assert back.select("fetcher_id").distinct().count() <= 2
