"""Structured-Streaming crawl loop: foreachBatch rounds, session windows,
TTL gate (SURVEY §2.11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spider_spark import streaming as st


def test_frontier_stream_foreachbatch(spark, tmp_path):
    delta_dir = str(tmp_path / "deltas")
    ck = str(tmp_path / "ck")
    os.makedirs(delta_dir)
    # two delta files = two (or batched) frontier pushes
    spark.createDataFrame(
        [("http://a.com/1", 0, None)], st.FRONTIER_DELTA_SCHEMA
    ).write.mode("append").parquet(delta_dir)
    spark.createDataFrame(
        [("http://b.com/2", 1, "http://a.com/1")], st.FRONTIER_DELTA_SCHEMA
    ).write.mode("append").parquet(delta_dir)

    got: list[tuple[int, list[str]]] = []

    def process(batch_df, batch_id):
        got.append(
            (batch_id, sorted(r["url"] for r in batch_df.collect()))
        )

    q = st.run_stream_rounds(
        st.frontier_stream(spark, delta_dir, max_files_per_trigger=1),
        process, ck,
    )
    q.awaitTermination(120)
    urls = sorted(u for _, batch in got for u in batch)
    assert urls == ["http://a.com/1", "http://b.com/2"]

    # exactly-once: restarting over the same checkpoint reprocesses nothing
    got2: list = []
    q2 = st.run_stream_rounds(
        st.frontier_stream(spark, delta_dir, max_files_per_trigger=1),
        lambda df, bid: got2.append(df.count()), ck,
    )
    q2.awaitTermination(120)
    assert sum(got2) == 0


def test_sessionized_pv_stream(spark, tmp_path):
    src = str(tmp_path / "pv")
    os.makedirs(src)
    rows = [
        ("u1", "2024-01-01 00:00:00"),
        ("u1", "2024-01-01 00:02:00"),   # same session (< 5 min gap)
        ("u1", "2024-01-01 01:00:00"),   # new session
        ("u2", "2024-01-01 00:00:30"),
    ]
    spark.createDataFrame(rows, "uid string, ts_s string").select(
        "uid", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema("uid string, ts timestamp").parquet(src)
    sessions = st.sessionized_pv_stream(stream)
    q = (
        sessions.writeStream.format("memory").queryName("sess")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select uid, n_hits from sess order by uid, n_hits").collect()
    got = [(r["uid"], r["n_hits"]) for r in out]
    assert got == [("u1", 1), ("u1", 2), ("u2", 1)]


def test_stateful_host_budget_stream(spark, tmp_path):
    """applyInPandasWithState politeness: cumulative per-host cap carried
    across micro-batches (cross-round LoadController state)."""
    src = str(tmp_path / "frontier")
    os.makedirs(src)
    # batch 1: two urls on h1, one on h2
    spark.createDataFrame(
        [("h1", "http://h1/a"), ("h1", "http://h1/b"), ("h2", "http://h2/a")],
        "host string, url string",
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: three more urls on h1 — only one fits under cap=3
    spark.createDataFrame(
        [("h1", "http://h1/c"), ("h1", "http://h1/d"), ("h1", "http://h1/e")],
        "host string, url string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("host string, url string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    admitted = st.stateful_host_budget_stream(stream, total_cap=3)
    q = (
        admitted.writeStream.format("memory").queryName("adm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select host, url, n_admitted_so_far from adm order by host, url"
    ).collect()
    got = [(r["host"], r["url"], r["n_admitted_so_far"]) for r in rows]
    h1 = [g for g in got if g[0] == "h1"]
    h2 = [g for g in got if g[0] == "h2"]
    # h1 admitted exactly 3 across the stream, cumulative counter carried
    assert [g[2] for g in h1] == [1, 2, 3]
    assert len(h1) == 3
    assert h2 == [("h2", "http://h2/a", 1)]


def test_ttl_gate(spark):
    cand = spark.createDataFrame(
        [("http://a/",), ("http://b/",), ("http://c/",)], "url string"
    )
    status = spark.createDataFrame(
        [("http://a/", 1000), ("http://b/", 99_000)],
        "url string, latest_crawl_ts long",
    )
    out = st.ttl_gate(cand, status, now_ts=100_000, ttl_s=86_400)
    # a: crawled at 1000 < 100000-86400=13600 → stale → re-admit
    # b: fresh → dropped; c: never crawled → admit
    assert {r["url"] for r in out.collect()} == {"http://a/", "http://c/"}


def test_session_sign_batch_streaming_equality(spark):
    """Session identity sign (session_segment_util.h:20-24): the batch
    sessionizer (logs.sessionize with_sign) and the session_window twin
    (streaming.session_signs over the drained aggregate) produce the SAME
    md5 signs for the same pv data."""
    from spider_spark import logs

    rows = [
        ("u1", "2024-01-01 00:00:00"),
        ("u1", "2024-01-01 00:02:00"),   # same session
        ("u1", "2024-01-01 01:00:00"),   # new session
        ("u2", "2024-01-01 00:00:30"),
        ("u2", "2024-01-01 02:00:00"),
    ]
    pv = spark.createDataFrame(rows, "uid string, ts_s string").select(
        "uid", F.col("ts_s").cast("timestamp").alias("ts")
    )
    batch = logs.sessionize(pv, ref_col=None, no_ref_gap=300,
                            with_sign=True)
    want = {(r["uid"], r["session_sign"]) for r in batch.collect()}
    # session_window works identically on a bounded frame (the drained
    # stream); signs ride the per-uid session ordinal
    sessions = (
        pv.groupBy(F.session_window(F.col("ts"), "5 minutes").alias("s"),
                   F.col("uid"))
        .agg(F.min("ts").alias("first_hit"))
    )
    got = {(r["uid"], r["session_sign"])
           for r in st.session_signs(sessions).collect()}
    assert got == want
    assert len({s for _, s in want}) == 4  # one sign per session, unique
