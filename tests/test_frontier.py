"""Frontier scoring / banding / budget / chunking (A1-A2, T2-T6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import frontier as fr


def test_uv_aggregate_per_user_cap(spark):
    """A1 (uv_data.cc:293-433): one UV per (user,url) — max weight — then
    sum per url."""
    logs = spark.createDataFrame(
        [
            ("u1", "http://x.com/a", "search_click"),   # 10.0
            ("u1", "http://x.com/a", "default"),        # capped with above
            ("u2", "http://x.com/a", "wiki"),           # 5.0
            ("u1", "http://x.com/b", "forum"),          # 0.4
        ],
        "user_id string, url string, source_kind string",
    )
    got = {r["url"]: r["uv"] for r in fr.uv_aggregate(logs).collect()}
    assert got["http://x.com/a"] == 15.0
    assert abs(got["http://x.com/b"] - 0.4) < 1e-9


def test_fetched_status_barrier(spark):
    """A2 (uv_data.cc:437-541): success cancels, failures retry to cap."""
    frontier = spark.createDataFrame(
        [("http://x.com/ok",), ("http://x.com/fail1",),
         ("http://x.com/fail3",), ("http://x.com/new",)],
        "url string",
    )
    status = spark.createDataFrame(
        [
            ("http://x.com/ok", True, 1),
            ("http://x.com/fail1", False, 1),
            ("http://x.com/fail3", False, 3),
        ],
        "url string, success boolean, try_times int",
    )
    out = {r["url"]: r["try_times"]
           for r in fr.fetched_status_barrier(frontier, status).collect()}
    assert "http://x.com/ok" not in out        # success → no recrawl
    assert out["http://x.com/fail1"] == 2      # retry with try+1
    assert "http://x.com/fail3" not in out     # at max_try → dropped
    assert out["http://x.com/new"] == 1


def test_batch_priority_band_ratios(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("http://x.com/"), F.col("id")).alias("url"),
        (1000 - F.col("id")).cast("double").alias("uv"),
    )
    out = fr.batch_priority_band(df, "uv")
    counts = {r["priority"]: r["count"]
              for r in out.groupBy("priority").count().collect()}
    # ratios (0, .05, .8, .15, 0) → p4≈50, p3≈800, p2≈150 (split_by_pri.sh:41)
    assert abs(counts.get(4, 0) - 50) <= 2
    assert abs(counts.get(3, 0) - 800) <= 2
    assert abs(counts.get(2, 0) - 150) <= 2
    # band follows the sort: highest uv rows sit in the highest band present
    top = out.orderBy(F.desc("uv")).first()
    assert top["priority"] == 4


def test_online_priority_bands(spark):
    df = spark.createDataFrame(
        [("http://x.com/a", 600.0), ("http://x.com/b", 200.0),
         ("http://x.com/c", 50.0), ("http://x.com/d", 1.0)],
        "url string, score double",
    )
    got = {r["url"]: r["p"] for r in df.select(
        "url", fr.online_priority(F.col("score"), F.col("url")).alias("p")
    ).collect()}
    assert 0 <= got["http://x.com/a"] < 10     # scheduler.cc:192-205
    assert 10 <= got["http://x.com/b"] < 30
    assert 30 <= got["http://x.com/c"] < 50
    assert 50 <= got["http://x.com/d"] < 100


def test_per_host_topk(spark):
    rows = [("h1", "http://h1/%02d" % i, 1, 1) for i in range(10)]
    rows += [("h2", "http://h2/%02d" % i, 1, 1) for i in range(3)]
    df = spark.createDataFrame(
        rows, "host string, url string, type_rank int, from_rank int"
    )
    budget = spark.createDataFrame([("h1", 4)], "host string, budget int")
    out = fr.per_host_topk(df, budget, default_budget=5)
    counts = {r["host"]: r["count"]
              for r in out.groupBy("host").count().collect()}
    assert counts == {"h1": 4, "h2": 3}
    # order: shorter/lexicographically-first urls kept
    kept = sorted(r["url"] for r in out.filter(F.col("host") == "h1").collect())
    assert kept == ["http://h1/%02d" % i for i in range(4)]


def test_chunk_tasks(spark):
    df = spark.createDataFrame(
        [(0, "u%02d" % i) for i in range(10)], "fetcher_id int, url string"
    )
    out = fr.chunk_tasks(df, "fetcher_id", ["url"], chunk_size=4)
    counts = {r["task_id"]: r["count"]
              for r in out.groupBy("task_id").count().collect()}
    assert counts == {0: 4, 1: 4, 2: 2}  # schedule_to_fetcher_id.cc:96-97


def test_binpack_fetchers(spark):
    df = spark.createDataFrame(
        [("ip%d" % i, float(c)) for i, c in
         enumerate([50, 30, 20, 10, 10, 10])],
        "ip string, cost double",
    )
    out = fr.binpack_fetchers(df, n_fetchers=2)
    load = {r["fetcher_id"]: r["s"] for r in out.groupBy("fetcher_id")
            .agg(F.sum("cost").alias("s")).collect()}
    assert set(load) == {0, 1}
    total = sum(load.values())
    # greedy fill: neither node exceeds ~70% of total
    assert max(load.values()) <= 0.75 * total


# --------------------------------------------------------------------------
# Scale-safety plan assertions: the global sort/cumsum operators must not
# funnel the whole table through one task (VERDICT r1 "What's wrong" §2)
# --------------------------------------------------------------------------

def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_batch_priority_band_no_single_partition_exchange(spark):
    df = spark.range(10_000).select(
        F.concat(F.lit("http://x.com/"), F.col("id")).alias("url"),
        (10_000 - F.col("id")).cast("double").alias("uv"),
    )
    plan = _physical_plan(fr.batch_priority_band(df, "uv"))
    assert "SinglePartition" not in plan, plan
    # the range shuffle happens at checkpoint materialization (lineage
    # truncated — _pid can never recompute); downstream reads the
    # checkpointed RDD and windows per _pid
    assert "ExistingRDD" in plan, plan
    assert "windowspecdefinition(_pid" in plan, plan


def test_binpack_no_single_partition_exchange(spark):
    costs = spark.range(5_000).select(
        F.concat(F.lit("ip-"), F.col("id")).alias("ip"),
        (F.col("id") % 97 + 1).cast("double").alias("cost"),
    )
    plan = _physical_plan(fr.binpack_fetchers(costs, n_fetchers=8))
    assert "SinglePartition" not in plan, plan


def test_batch_priority_band_exact_vs_serial_rank(spark):
    """Differential: the range-prefix rank reproduces the serial
    percent-rank banding exactly (ties broken by the unique tiebreak)."""
    import random

    rnd = random.Random(7)
    rows = [(f"http://x.com/{i}", float(rnd.randint(0, 50))) for i in range(997)]
    df = spark.createDataFrame(rows, "url string, uv double")
    got = {r["url"]: r["priority"]
           for r in fr.batch_priority_band(df, "uv").collect()}
    # serial reference
    srt = sorted(rows, key=lambda t: (-t[1], t[0]))
    n = len(srt)
    want = {}
    for rank, (u, _) in enumerate(srt):
        pr = rank / (n - 1)
        want[u] = 4 if pr <= 0.05 else (3 if pr <= 0.85 else 2)
    assert got == want


def test_binpack_exact_vs_serial_cumsum(spark):
    """Differential: partition-prefix cumsum bin ids == serial greedy."""
    import random

    rnd = random.Random(11)
    rows = [(f"ip-{i}", float(rnd.randint(1, 1000))) for i in range(800)]
    df = spark.createDataFrame(rows, "ip string, cost double")
    got = {r["ip"]: r["fetcher_id"]
           for r in fr.binpack_fetchers(df, n_fetchers=8).collect()}
    srt = sorted(rows, key=lambda t: (-t[1], t[0]))
    total = sum(c for _, c in srt)
    per_node = max(total / 8, 1e-9)
    want, cum = {}, 0.0
    for ip, c in srt:
        cum += c
        want[ip] = min(int((cum - c / 2) // per_node), 7)
    assert got == want


def test_hash_params_top_bit_coverage():
    """_hash_params draws uniform odd 64-bit multipliers — the top bit must
    be set for ~half the family (a randint(0,2^62)*2+1 draw never sets it)."""
    import numpy as np

    from spider_spark.dedup import _hash_params

    a, b = _hash_params(256, seed=42)
    assert np.all(a % 2 == 1)
    top = int(np.count_nonzero(a >> np.uint64(63)))
    assert 64 <= top <= 192  # ~binomial(256, .5)
    assert int(np.count_nonzero(b >> np.uint64(63))) > 0


def test_interleaved_ranking_calls_stay_exact(spark):
    """Three lazy ranking results built BEFORE any is evaluated (the
    ADVICE _RANGED_LIVE scenario): with checkpoint-backed _pid, late
    evaluation cannot recompute partition ids against stale offsets."""
    import random

    rnd = random.Random(3)
    rows = [(f"http://x.com/{i}", float(rnd.randint(0, 50))) for i in range(500)]
    df = spark.createDataFrame(rows, "url string, uv double")
    costs = spark.createDataFrame(
        [(f"ip-{i}", float(rnd.randint(1, 100))) for i in range(300)],
        "ip string, cost double",
    )
    p1 = fr.batch_priority_band(df, "uv")
    p2 = fr.binpack_fetchers(costs, n_fetchers=4)
    p3 = fr.batch_priority_band(df.withColumn("uv", F.col("uv") + 1), "uv")
    # evaluate in reverse build order
    got3 = {r["url"]: r["priority"] for r in p3.collect()}
    got2 = p2.groupBy("fetcher_id").count().count()
    got1 = {r["url"]: r["priority"] for r in p1.collect()}
    srt = sorted(rows, key=lambda t: (-t[1], t[0]))
    n = len(srt)
    want = {}
    for rank, (u, _) in enumerate(srt):
        pr = rank / (n - 1)
        want[u] = 4 if pr <= 0.05 else (3 if pr <= 0.85 else 2)
    assert got1 == want and got3 == want and got2 == 4


def test_range_prefixed_reliable_checkpoint(spark, tmp_path):
    """Cluster escape hatch: with a checkpoint dir set, reliable=True
    routes through a persistent checkpoint and the banding stays exact."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(500).select(
        (F.col("id") % 97).cast("double").alias("uv"),
        F.concat(F.lit("http://u/"), F.col("id").cast("string")).alias("url"),
    )
    out = fr.batch_priority_band(df, "uv", reliable=True)
    serial = sorted(df.collect(), key=lambda r: (-r["uv"], r["url"]))
    got = {r["url"]: r["priority"] for r in out.collect()}
    n = len(serial)
    for rank, row in enumerate(serial):
        pr = rank / max(n - 1, 1)
        exp = 4 if pr <= 0.05 else (3 if pr <= 0.85 else 2)
        assert got[row["url"]] == exp, (row["url"], rank)
