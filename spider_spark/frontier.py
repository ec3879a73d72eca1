"""Frontier scoring, priority banding, per-host budgets.

Re-expresses the reference's selector/scheduler math (cites into
/root/reference):

- UV weights   ``ComputeUV`` crawler/crawler/control/task_prepare/mr/
  uv_data.cc:544-591 (search-click 10.0, wiki 5.0, forum/blog 0.4,
  taobao item 1e-4, default 1.0; search-log flat 2.0)
- UV admission uv > 1.99, try < 3    uv_data.cc:47,53
- per-user cap (one UV per user-url) uv_data.cc:293-433 → groupBy max
- priority banding (batch)  split_by_pri.sh:23-116 — sorted frontier split
  by ratios (p4=5%, p3=80%, p2=15%)
- priority banding (online) scheduler.cc:192-205 — score thresholds to
  band ranges with deterministic in-band spread
- per-host top-k budget     dispatcher/reducer_compress_control.cc:40-169
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ComputeUV weight table (uv_data.cc:544-591) — data, not code
UV_WEIGHTS = {
    "search_click": 10.0,
    "wiki": 5.0,
    "forum": 0.4,
    "blog": 0.4,
    "taobao_item": 0.0001,
    "search_log": 2.0,
    "default": 1.0,
}
UV_LOWERBOUND = 1.99   # uv_data.cc:47
MAX_TRY_TIMES = 3      # uv_data.cc:53


def uv_weight(source_kind: Column) -> Column:
    """Weight lookup as a CASE chain (codegen'd; the table is tiny)."""
    expr = F.lit(UV_WEIGHTS["default"])
    for kind, w in UV_WEIGHTS.items():
        if kind != "default":
            expr = F.when(source_kind == kind, F.lit(w)).otherwise(expr)
    return expr


def uv_aggregate(logs: DataFrame, user_col: str = "user_id",
                 url_col: str = "url", kind_col: str = "source_kind") -> DataFrame:
    """A1: per-(user,url) capped UV then per-url sum.

    The reference does the per-user cap map-side with a bounded dict flushed
    at 1.2M entries (uv_data.cc:380-407) — Spark's two-level hash aggregate
    (partial → final) is the same algorithm, built in.
    """
    per_user = logs.withColumn("w", uv_weight(F.col(kind_col))).groupBy(
        user_col, url_col
    ).agg(F.max("w").alias("uv_user"))
    return per_user.groupBy(url_col).agg(F.sum("uv_user").alias("uv"))


def fetched_status_barrier(frontier: DataFrame, status: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """A2: any prior success for a url cancels re-crawl; failures re-emit
    with try+1, drop at MAX_TRY_TIMES (uv_data.cc:437-541)."""
    agg = status.groupBy(url_col).agg(
        F.max(F.when(F.col("success"), 1).otherwise(0)).alias("any_success"),
        F.max("try_times").alias("max_try"),
    )
    out = frontier.join(agg, url_col, "left")
    return (
        out.filter(
            (F.col("any_success").isNull() | (F.col("any_success") == 0))
            & (F.coalesce(F.col("max_try"), F.lit(0)) < MAX_TRY_TIMES)
        )
        .withColumn("try_times", F.coalesce(F.col("max_try"), F.lit(0)) + 1)
        .drop("any_success", "max_try")
    )


# --------------------------------------------------------------------------
# Scale-safe global ranking: range partitioning + partition prefix sums
# --------------------------------------------------------------------------

def _range_prefixed(df: DataFrame, sort_cols: list, agg_col,
                    n_partitions: int | None = None,
                    reliable: bool = False):
    """Range-partition ``df`` by ``sort_cols`` and attach, per row, the
    EXCLUSIVE prefix aggregate of ``agg_col`` over all earlier range
    partitions (``_prefix``), plus ``_pid``.

    This is the tera-sort prefix trick: an unpartitioned window would move
    the whole table into ONE task; instead the range shuffle keeps the sort
    parallel, per-partition totals are a tiny aggregate (one row per
    partition, collected to the driver), and the cumulative offsets come
    back as a broadcast join. Within-partition windows then run on
    ``_pid`` — every task bounded by one range partition.

    ``_pid`` must be computed EXACTLY once: a recompute (AQE may coalesce
    the range shuffle differently per job) would pair rows with driver
    offsets collected under a different partitioning. A ``localCheckpoint``
    enforces that by construction — lineage is truncated, so the
    partitioning can never silently re-derive; block loss (executor
    death) fails the job loudly instead. The checkpoint is LAZY: the
    totals collect below is the first action and covers every partition,
    so it materializes (and finalizes) the checkpoint as a side effect —
    an eager checkpoint would spend one extra full pass for the same
    guarantee (A/B at local[32]/sf0.1: ~0.25 s of priority_bands' wall).
    Lifetime is tied to the returned DataFrame: the ContextCleaner frees
    the blocks when it becomes unreachable, so repeated ranking calls
    (bench reps, driver queries) don't leak pinned cache.

    ``reliable=True`` is the cluster escape hatch (executor loss /
    dynamic allocation / decommissioning): checkpoint to the persistent
    ``spark.sparkContext.setCheckpointDir`` store instead of executor
    blocks — survives executor death at the cost of a write to stable
    storage. Default False keeps the local-mode fast path.
    Returns (checkpointed_df_with_pid_and_prefix, grand_total).
    """
    spark = df.sparkSession
    n_part = n_partitions or spark.sparkContext.defaultParallelism * 2
    ranged = df.repartitionByRange(n_part, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if reliable:
        ranged = ranged.checkpoint(eager=False)
    else:
        ranged = ranged.localCheckpoint(eager=False)
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(agg_col.alias("t")).collect()
    }
    is_int = all(isinstance(v, int) for v in totals.values())
    offs, acc = [], (0 if is_int else 0.0)
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc = acc + (totals[pid] or 0)
    off_df = spark.createDataFrame(
        offs or [(0, 0 if is_int else 0.0)],
        f"_pid int, _prefix {'long' if is_int else 'double'}",
    )
    return ranged.join(F.broadcast(off_df), "_pid", "left"), acc


# --------------------------------------------------------------------------
# Priority banding
# --------------------------------------------------------------------------

# split_by_pri.sh:41 auto ratios: (p5, p4, p3, p2, p1) = (0, .05, .8, .15, 0)
BATCH_BAND_RATIOS = (0.0, 0.05, 0.80, 0.15, 0.0)


def batch_priority_band(frontier: DataFrame, score_col: str = "uv",
                        tiebreak: str = "url",
                        reliable: bool = False) -> DataFrame:
    """T2: total-order sort by score desc, cut at cumulative ratios into
    priority 5..1 (split_by_pri.sh:23-116; the sort itself is the tera-sort
    the reference shells out to, sort.sh:24-31).

    Scale-safe plan: NO unpartitioned window. Range partition on the sort
    key, per-partition row counts → cumulative offsets (driver-side, one
    row per partition), global rank = offset + within-partition row_number.
    percent-rank is exact as long as (score, tiebreak) is a total order —
    the same uniqueness PERCENT_RANK itself needs for a stable cut.
    """
    sort_cols = [F.desc(score_col), F.asc(tiebreak)]
    prefixed, n = _range_prefixed(frontier, sort_cols, F.count(F.lit(1)),
                                  reliable=reliable)
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    pr = (F.row_number().over(w) + F.col("_prefix") - 1) / F.lit(max(n - 1, 1))
    band = None
    acc = 0.0
    lowest_nonzero = next(
        5 - i for i in reversed(range(5)) if BATCH_BAND_RATIOS[i] > 0
    )
    for i, ratio in enumerate(BATCH_BAND_RATIOS):
        acc += ratio
        if ratio == 0.0:
            continue  # zero-width band admits no rows
        cond = pr <= F.lit(acc)
        band = F.when(cond, 5 - i) if band is None else band.when(cond, 5 - i)
    band = band.otherwise(lowest_nonzero)
    return prefixed.withColumn("priority", band).drop("_pid", "_prefix")


def online_priority(score: Column, url: Column) -> Column:
    """T6 (scheduler.cc:192-205): score ≥500 → p∈[0,10), ≥100 → [10,30),
    ≥10 → [30,50), else [50,100). The reference spreads within the band with
    rand(); we spread deterministically by url hash (§4 determinism rule)."""
    spread = lambda lo, width: F.lit(lo) + F.pmod(F.xxhash64(url), F.lit(width))
    return (
        F.when(score >= 500, spread(0, 10))
        .when(score >= 100, spread(10, 20))
        .when(score >= 10, spread(30, 20))
        .otherwise(spread(50, 50))
    ).cast("int")


# --------------------------------------------------------------------------
# Per-host budgets / chunking / bin-packing
# --------------------------------------------------------------------------

def per_host_topk(frontier: DataFrame, budget: DataFrame,
                  host_col: str = "host", default_budget: int = 100) -> DataFrame:
    """T3/J7: keep top-``budget(host)`` rows per host. Order mirrors the
    dispatcher comparator (reducer_compress_control.cc:40-61): resource type
    first, then source rank, then shorter url. Budget dim is broadcast."""
    w = Window.partitionBy(host_col).orderBy(
        F.asc("type_rank"), F.asc("from_rank"), F.length("url"), F.asc("url")
    )
    joined = frontier.join(F.broadcast(budget), host_col, "left")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.coalesce(F.col("budget"), F.lit(default_budget)))
        .drop("rn", "budget")
    )


def chunk_tasks(df: DataFrame, partition_col: str, order_cols: list[str],
                chunk_size: int) -> DataFrame:
    """T5 (schedule_to_fetcher_id.cc:81-104): running row number per
    partition cut into fixed-size task files → ``task_id`` column; writers
    ``partitionBy(partition_col, task_id)``."""
    w = Window.partitionBy(partition_col).orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn(
        "task_id",
        F.floor((F.row_number().over(w) - 1) / chunk_size).cast("int"),
    )


def binpack_fetchers(ip_costs: DataFrame, n_fetchers: int,
                     reliable: bool = False) -> DataFrame:
    """T4 (ip_to_fetcher_id.py:9-33): greedy bin-pack of ips to fetcher
    nodes — sort by cost desc, cumulative fill to total/n per node.

    Scale-safe plan: the running sum is NOT one unpartitioned window cumsum
    (10^7+ ips in one task at crawl scale) — range partition on the sort
    key, per-partition cost sums → driver prefix offsets, cumsum = offset +
    within-partition window cumsum, each task bounded by its range
    partition. Grand total rides the same per-partition sums (no separate
    agg job)."""
    sort_cols = [F.desc("cost"), F.asc("ip")]
    prefixed, total = _range_prefixed(ip_costs, sort_cols, F.sum("cost"),
                                      reliable=reliable)
    per_node = max((total or 0.0) / n_fetchers, 1e-9)
    w = Window.partitionBy("_pid").orderBy(*sort_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("cost").over(w) + F.col("_prefix")
    return prefixed.withColumn(
        "fetcher_id",
        F.least(
            F.floor((cum - F.col("cost") / 2) / per_node),
            F.lit(n_fetchers - 1),
        ).cast("int"),
    ).drop("_pid", "_prefix")
