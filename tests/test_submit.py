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


def test_spark_submit_dedup_job(spark, tmp_path):
    """The dedup pipeline runs via the same --py-files contract: exact
    pre-pass + minhash near-dup + cluster resolution over a corpus with
    planted exact and near duplicates."""
    base = [
        " ".join(f"tok{i}_{j}" for j in range(30)) for i in range(12)
    ]
    rows = [(f"doc{i:03d}", t) for i, t in enumerate(base)]
    # exact dups of doc000 (collapse in the pre-pass)
    rows += [("doc900", base[0]), ("doc901", base[0])]
    # near-dup chain of doc001: one token changed per copy — pairwise
    # jaccard far above 0.5, so a~b and b~c must collapse to ONE survivor
    toks = base[1].split()
    rows += [
        ("doc910", " ".join(toks[:-1] + ["changedA"])),
        ("doc911", " ".join(toks[:-2] + ["changedA", "changedB"])),
    ]
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        docs_dir)

    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip",
        root_dir=REPO, base_dir="spider_spark",
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "out")
    out = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "dedup_job.py"),
         "--docs", docs_dir, "--out", out_dir,
         "--method", "minhash", "--threshold", "0.5"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["n_docs"] == 16
    assert line["exact_kept"] == 14            # doc900/doc901 collapsed
    assert line["kept"] == 12                  # near chain → one survivor
    kept_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out_dir + "/kept").collect()
    }
    assert "doc001" in kept_ids                # min-id canonical survivor
    assert {"doc900", "doc901", "doc910", "doc911"}.isdisjoint(kept_ids)
    clusters = {
        r["id"]: r["keep_id"]
        for r in spark.read.parquet(out_dir + "/near_clusters").collect()
    }
    assert clusters["doc910"] == "doc001"
    assert clusters["doc911"] == "doc001"


def test_spark_submit_dedup_job_embedding(spark, tmp_path):
    """--method embedding: pairs mined from the embedding table, with
    endpoints remapped through the exact pass's keep mapping — a pair
    naming an exactly-dropped id must still collapse onto the byte-dup
    group's surviving keeper."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.normal(size=(8, 16))
    texts = {f"doc{i}": " ".join(f"w{i}_{j}" for j in range(20))
             for i in range(8)}
    texts["doc900"] = texts["doc0"]         # byte-dup of doc0 (dropped)
    vecs = {f"doc{i}": base[i] for i in range(8)}
    vecs["doc900"] = base[0] + 0.0          # same embedding as doc0
    # doc901: near doc900's vector — its pair is (doc900, doc901) in the
    # raw table, and the remap must turn it into keep_id doc0
    vecs["doc901"] = base[0] + 0.01 * rng.normal(size=16)
    texts["doc901"] = "totally different text " + texts["doc1"]

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    ).write.parquet(docs_dir)
    emb_dir = str(tmp_path / "emb")
    spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(vecs.items())],
        "doc_id string, embedding array<double>",
    ).write.parquet(emb_dir)

    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip",
        root_dir=REPO, base_dir="spider_spark",
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "out")
    out = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "dedup_job.py"),
         "--docs", docs_dir, "--out", out_dir,
         "--method", "embedding", "--embeddings", emb_dir,
         "--cosine-threshold", "0.95"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["n_docs"] == 10 and line["exact_kept"] == 9
    kept_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out_dir + "/kept").collect()
    }
    # doc900 fell in the exact pass; doc901's (doc900, doc901) pair
    # remapped to (doc0, doc901) -> doc901 drops, doc0 stays
    assert "doc0" in kept_ids
    assert {"doc900", "doc901"}.isdisjoint(kept_ids)
    assert line["kept"] == 8
    clusters = {
        r["id"]: r["keep_id"]
        for r in spark.read.parquet(out_dir + "/near_clusters").collect()
    }
    assert clusters["doc901"] == "doc0"


def test_spark_submit_signals_job(spark, tmp_path):
    """The log-analysis signal pipeline runs via the same contract and
    reproduces the ComputeUV weight semantics: per-(user,url) max weight
    across sources, summed per url."""
    pv_dir = str(tmp_path / "pv")
    spark.createDataFrame(
        [("u1", 1, "http://a.example.com/"),
         ("u1", 2, "http://a.example.com/"),   # dup view: capped per user
         ("u2", 3, "http://b.example.com/")],
        "uid string, ts long, url string",
    ).write.parquet(pv_dir)
    search_dir = str(tmp_path / "search")
    spark.createDataFrame(
        [("u1", 5, "http://s.example.com/q1", "http://a.example.com/"),
         ("u3", 6, "http://s.example.com/q2", None)],
        "uid string, ts long, url string, click_url string",
    ).write.parquet(search_dir)

    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip",
        root_dir=REPO, base_dir="spider_spark",
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "signals")
    out = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "signals_job.py"),
         "--pv", pv_dir, "--search", search_dir, "--out", out_dir],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    got = {r["url"]: r["uv"]
           for r in spark.read.parquet(out_dir).collect()}
    # a: u1 max(default 1.0, search_click 10.0) = 10; b: u2 default 1.0;
    # each search page: one user at search_log 2.0
    assert got == {"http://a.example.com/": 10.0,
                   "http://b.example.com/": 1.0,
                   "http://s.example.com/q1": 2.0,
                   "http://s.example.com/q2": 2.0}
    assert line["urls"] == 4 and abs(line["uv_sum"] - 15.0) < 1e-9
    # the output is exactly the shape crawl_job --signals consumes
    assert set(spark.read.parquet(out_dir).columns) == {"url", "uv"}


def test_spark_submit_signals_job_md5_logs(spark, tmp_path):
    """--md5-map: an md5-keyed pv log resolves through the J5 join first
    (latest-timestamp map row wins); unresolvable md5s drop."""
    pv_dir = str(tmp_path / "pv")
    spark.createDataFrame(
        [("u1", 1, "m1"), ("u2", 2, "m1"), ("u3", 3, "m_unknown")],
        "uid string, ts long, url_md5 string",
    ).write.parquet(pv_dir)
    map_dir = str(tmp_path / "map")
    spark.createDataFrame(
        [("m1", "http://old.example.com/", 10),
         ("m1", "http://new.example.com/", 20)],   # latest ts wins
        "md5 string, url string, ts long",
    ).write.parquet(map_dir)

    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip",
        root_dir=REPO, base_dir="spider_spark",
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "signals")
    out = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "signals_job.py"),
         "--pv", pv_dir, "--md5-map", map_dir, "--out", out_dir],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    got = {r["url"]: r["uv"]
           for r in spark.read.parquet(out_dir).collect()}
    # two users at default weight on the LATEST mapping; m_unknown dropped
    assert got == {"http://new.example.com/": 2.0}
