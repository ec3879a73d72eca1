"""SparkSession factory tuned for the crawl workload.

Design targets a 1000-executor cluster reading ~100 TB; the same confs are
correct (if oversized) on local[N]:

- AQE on (runtime coalescing, skew-join splitting, auto broadcast demotion).
- Arrow on for every pandas-UDF boundary (the reference's C++ mappers become
  vectorized Arrow batches, never per-row Python).
- shuffle partitions sized for the local test box; production submits override
  via ``spark.sql.shuffle.partitions`` / AQE advisory sizes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (the spark-submit
    --py-files role, done programmatically so a plain ``python script.py``
    from any cwd works too). Idempotent per session."""
    if getattr(spark, "_spider_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(),
                        f"spider_spark_pyfiles_{os.getpid()}")
    zip_path = shutil.make_archive(base, "zip",
                                   root_dir=os.path.dirname(pkg_dir),
                                   base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    spark._spider_shipped = True


def get_spark(
    app: str = "spider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard confs."""
    master = master or f"local[{DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: the scalar pandas kernels (canonicalize,
        # simhash, minhash) measure consistently faster with fewer batch
        # boundaries (cold-JVM A/B pairs, BENCH.md r5); cogrouped stages
        # are whole-group batches either way. ~100 B/url × 64k ≈ 6 MB per
        # in-flight batch — far under executor headroom at any scale.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark 4's DataFrame debugging wraps EVERY DataFrame API call
        # with a conf.get + PySparkCurrentOrigin.set/clear (3 py4j round
        # trips) plus a Python stack walk, to attach Python call sites to
        # error messages. A crawl round issues ~300 such calls of pure
        # plan construction, so the wrapper alone costs ~1 s/round of
        # driver time (cold-JVM A/B, BENCH.md). Error messages still
        # carry the JVM-side context; static conf, so it must be set
        # here, not per-query. Override via extra_conf to debug.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # FAIR job scheduling: every crawl round commits its four state
        # tables as CONCURRENT write jobs (round.run_round step 7). Under
        # FIFO the earliest job's stages get strict priority, so whenever
        # one has fewer runnable tasks than cores the later jobs backfill
        # only behind it; FAIR round-robins task slots across the four
        # jobs and keeps the executor saturated. Cold-JVM alternating
        # A/B at cpus=32/large web, 6 pairs: FAIR wins 4, median crawl
        # 28.1 s vs 38.5 s, best rep 24.1 s vs 27.0 s. No pool file —
        # all jobs share the default pool, which is exactly the
        # even-share behavior the concurrent commit wants.
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
