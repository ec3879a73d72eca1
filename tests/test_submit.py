"""The north-rule packaging contract: the engine runs via
``spark-submit --py-files spider_spark.zip jobs/crawl_job.py`` with NO
repo on the python path — the exact invocation a multi-executor cluster
uses (jobs/crawl_job.py docstring). One smoke crawl, cold JVM."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(spark, tmp_path):
    from spider_spark.spans import WebSpec, generate_documents

    docs_dir = str(tmp_path / "docs")
    generate_documents(
        spark,
        WebSpec(n_hosts=10, pages_per_host=4, skew_hosts=2, skew_pages=16,
                links_per_page=3),
    ).write.parquet(docs_dir)

    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip",
        root_dir=REPO, base_dir="spider_spark",
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = dict(os.environ)
    # the zip must be the ONLY way the job finds the package
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "crawl_job.py"),
         "--docs", docs_dir, "--ckpt", str(tmp_path / "ck"),
         "--rounds", "2", "--n-hosts", "10", "--n-buckets", "4"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["rounds"] >= 1
    assert line["urls_scheduled"] > 0
    assert line["last_round"] >= 1
    # the submitted run committed real snapshots with per-file lineage
    mf = os.path.join(str(tmp_path / "ck"), "round=0001", "manifest.json")
    with open(mf) as f:
        m = json.load(f)
    assert m["metrics"]["admitted"] > 0
    assert sum(x["rows"] for x in m["files"]["frontier"]) == m["metrics"][
        "frontier_next"]
