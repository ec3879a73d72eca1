"""Structured-Streaming rendering of the online crawl loop (SURVEY §2.11).

The reference's "streaming" is hand-rolled queue polling
(crawler2/general_crawler/scheduler.cc:316-438: reserve job → validate →
seen-check → score → dispatch). The Spark-native mapping:

- frontier deltas arrive as files in a watched directory (the beanstalkd
  tube role) → ``readStream`` file source
- each micro-batch runs the same candidate-hygiene + admission pipeline
  as the batch round via ``foreachBatch`` (so batch and streaming share
  one implementation — no twin drift)
- recrawl-TTL (scheduler.cc:381-393, 86400s) maps to an event-time
  condition; late/duplicate URLs older than the TTL pass the seen-filter
- watermarked session/window aggregations over the pv stream
  (log_analysis sessions, §2.10) use ``session_window``/``window``

Tests drive this with the ``availableNow`` trigger (bounded drain —
deterministic), which is also the production backfill mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRONTIER_DELTA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("referer", T.StringType(), True),
    ]
)


def frontier_stream(spark: SparkSession, delta_dir: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of frontier deltas (the scheduler tube)."""
    reader = (
        spark.readStream.schema(FRONTIER_DELTA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 10)
    )
    return reader.parquet(delta_dir)


def run_stream_rounds(
    stream: DataFrame,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drive micro-batch crawl rounds over a frontier stream. Each batch
    is handed to ``process_batch(batch_df, batch_id)`` — in production the
    CrawlRun round body; the checkpoint dir gives exactly-once file
    tracking (donelist role). Returns the streaming query (caller awaits
    termination)."""
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionized_pv_stream(pv_stream: DataFrame, gap: str = "5 minutes",
                          watermark: str = "30 minutes",
                          ts_col: str = "ts",
                          uid_col: str = "uid") -> DataFrame:
    """Streaming analogue of logs.sessionize: per-uid session windows with
    a watermark bounding late data (pvlog_segmenter.h:80-94 semantics at
    stream granularity)."""
    return (
        pv_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                 F.col(uid_col))
        .agg(
            F.count("*").alias("n_hits"),
            F.min(ts_col).alias("first_hit"),
            F.max(ts_col).alias("last_hit"),
        )
    )


def session_signs(sessions: DataFrame, uid_col: str = "uid") -> DataFrame:
    """Session identity sign over :func:`sessionized_pv_stream` output
    (session_segment_util.h:20-24: md5 of ``agentid \\t first-hit-ts \\t
    1-based session ordinal``) — the streaming twin of
    ``logs.sessionize(with_sign=True)``. Runs on the DRAINED aggregate
    (availableNow / foreachBatch output): the per-uid ordinal is a rank
    over session starts, which needs the uid's finished session list.

    Parity caveats vs the batch path (inherent, not bugs): (1) a hit
    EXACTLY ``gap`` after its predecessor closes the session here
    (``session_window`` merges on ``< gap``) but not in the batch
    segmenter (splits on ``> gap``) — real clickstream timestamps don't
    sit on the boundary, and the reference's own two segmenters share
    this looseness; (2) the md5 input stringifies ``first_hit``, so both
    pipelines must feed the SAME ts type (timestamp here; a micros-long
    batch twin produces different — equally valid — signs)."""
    w = Window.partitionBy(uid_col).orderBy(F.asc("first_hit"))
    sid = F.row_number().over(w)
    return sessions.withColumn(
        "session_sign",
        F.md5(F.concat_ws(
            "\t", F.col(uid_col).cast("string"),
            F.col("first_hit").cast("string"), sid.cast("string"),
        )),
    )


def windowed_host_counts(stream: DataFrame, window: str = "10 seconds",
                         watermark: str = "30 seconds",
                         ts_col: str = "ts",
                         host_col: str = "host") -> DataFrame:
    """Tumbling-window per-host fetch counts — the streaming view of the
    per-host QPS accounting (load_controller.cc:149-201)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"),
                 F.col(host_col))
        .agg(F.count("*").alias("n_fetches"))
        .select(
            F.col("w.start").alias("window_start"),
            host_col,
            "n_fetches",
        )
    )


def stateful_host_budget_stream(stream: DataFrame, total_cap: int,
                                host_col: str = "host",
                                url_col: str = "url") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-host admission with a CUMULATIVE cap carried across micro-batches
    (the LoadController's cross-round state, load_controller.cc:204-242,
    as true streaming state instead of the batch path's host_state table).

    Per host, admits URLs in deterministic (url) order until the host has
    admitted ``total_cap`` URLs over the stream's lifetime; the admitted
    count is the GroupState. Emits (host, url, n_admitted_so_far).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField(host_col, T.StringType(), False),
        T.StructField(url_col, T.StringType(), False),
        T.StructField("n_admitted_so_far", T.IntegerType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("admitted", T.IntegerType(), False),
    ])

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        host = key[0]
        admitted = state.get[0] if state.exists else 0
        outs = []
        # concatenate the group's Arrow chunks BEFORE sorting: slicing
        # each chunk independently would make which urls consume the
        # lifetime cap depend on chunk boundaries — not the documented
        # deterministic (url) order (determinism rule §4)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        room = total_cap - admitted
        if chunks and room > 0:
            urls = np.sort(
                np.concatenate([c[url_col].to_numpy() for c in chunks])
            )[:room]
            outs.append(pd.DataFrame({
                host_col: host,
                url_col: urls,
                "n_admitted_so_far": np.arange(
                    admitted + 1, admitted + len(urls) + 1, dtype=np.int32
                ),
            }))
            admitted += len(urls)
        state.update((admitted,))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return (
        stream.groupBy(host_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def ttl_gate(candidates: DataFrame, url_status: DataFrame,
             now_ts: int, ttl_s: int = 86_400) -> DataFrame:
    """Recrawl-TTL seen-gate (scheduler.cc:289-314, 381-393): a URL whose
    latest crawl is older than ``ttl_s`` is re-admitted; fresher ones are
    dropped. ``url_status``: (url, latest_crawl_ts)."""
    j = candidates.join(url_status, "url", "left")
    keep = (
        F.col("latest_crawl_ts").isNull()
        | (F.col("latest_crawl_ts") < F.lit(now_ts - ttl_s))
    )
    return j.filter(keep).drop("latest_crawl_ts")
