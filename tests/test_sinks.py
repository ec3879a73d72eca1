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
