"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the operator families that dominate a 100-TB crawl round:
partial-agg scan (pricing_summary), broadcast-join chain
(revenue_per_nation), global sort+band (priority_bands), window top-k
(topk_per_group), the pandas-UDF canonicalizer (canonicalize_urls),
minhash-LSH near-dup (minhash_near_dups), simhash signatures
(simhash_signs), brute-force ANN (knn_cosine), and a full synthetic
crawl round (crawl_round).

Also reports two-parallelism scaling (local[N/4] vs local[N]) for the
north-rule's two-cluster-size criterion when SPARK_GRAFT_SCALING=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "pricing_summary",
    "revenue_per_nation",
    "priority_bands",
    "topk_per_group",
    "sessionize",
    "canonicalize_urls",
    "minhash_near_dups",
    "simhash_signs",
    "knn_cosine",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        assert n >= 0
    return times


def crawl_round_bench(spark) -> tuple[float, int]:
    """One politeness-gated crawl round over a synthetic web scaled to the
    bench size: returns (seconds, urls_scheduled)."""
    import shutil
    import tempfile

    from spider_spark.politeness import PolitenessSpec, synthetic_robots
    from spider_spark.round import CrawlRun, RoundSpec
    from spider_spark.spans import WebSpec, generate_documents

    spec = WebSpec(n_hosts=2000, pages_per_host=30, skew_hosts=5,
                   skew_pages=10_000, links_per_page=10)
    work = tempfile.mkdtemp(prefix="bench_crawl_")
    # materialize the synthetic web once — the engine's real input is a
    # stored Iceberg table, so table generation is not part of the round
    generate_documents(spark, spec).write.mode("overwrite").parquet(
        work + "/docs"
    )
    docs = spark.read.parquet(work + "/docs")
    robots = synthetic_robots(spark, spec.n_hosts)
    run = CrawlRun(
        spark, docs, robots, work + "/ck",
        RoundSpec(n_buckets=64, max_depth=3, max_rounds=3,
                  politeness=PolitenessSpec(qps=10.0, round_seconds=5.0),
                  collect_ordering=False),
    )
    # deterministic host-spread seed sample (limit() on a parquet read can
    # land entirely on the skew hosts' files and politeness-starve round 0)
    from pyspark.sql import functions as F

    seeds = docs.select(docs.doc_id.alias("url")).filter(
        F.pmod(F.xxhash64("url"), F.lit(12)) == 0
    )
    t0 = time.time()
    run.bootstrap(seeds)
    scheduled = 0
    for r in range(2):
        scheduled += run.run_round(r)["admitted"]
    dt = time.time() - t0
    shutil.rmtree(work, ignore_errors=True)
    return dt, scheduled


def bench_at(cpus: int, sf_dir: str, with_crawl: bool = True) -> dict:
    from spider_spark.session import get_spark

    spark = get_spark(app=f"bench{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    try:
        t0 = time.time()
        times = run_queries(spark, sf_dir)
        out = {"queries": times, "total": round(time.time() - t0, 3)}
        if with_crawl:
            crawl_s, scheduled = crawl_round_bench(spark)
            out["queries"]["crawl_round"] = round(crawl_s, 3)
            out["urls_scheduled"] = scheduled
            out["urls_scheduled_per_sec"] = round(scheduled / crawl_s, 1)
            out["total"] = round(out["total"] + crawl_s, 3)
        return out
    finally:
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    res = bench_at(CPUS, SF_DIR)
    line = {
        "metric": "headline query wall-time + crawl-round URLs scheduled/sec",
        "value": res["total"],
        "unit": "sec",
        "queries": res["queries"],
        "sf": float(sf) if sf else None,
        "cpus": CPUS,
        "urls_scheduled_per_sec": res.get("urls_scheduled_per_sec"),
    }
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        small = max(CPUS // 4, 1)
        res_small = bench_at(small, SF_DIR)
        tput_big = res["urls_scheduled_per_sec"]
        tput_small = res_small["urls_scheduled_per_sec"]
        line["scaling"] = {
            "cpus_small": small,
            "cpus_big": CPUS,
            "crawl_round_sec_small": res_small["queries"]["crawl_round"],
            "crawl_round_sec_big": res["queries"]["crawl_round"],
            "urls_per_sec_small": tput_small,
            "urls_per_sec_big": tput_big,
            "efficiency": round(tput_big / (tput_small * (CPUS / small)), 3),
        }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
