"""Similarity search: brute-force exact top-k + IVF recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(200, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.cache()


@pytest.fixture(scope="module")
def query(emb):
    return list(emb.filter(F.col("vec_id") == 0).first()["embedding"])


def test_knn_brute_matches_numpy(emb, query):
    got = sim.knn_brute(emb, query, k=5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    q = np.array(query)
    cos = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items()
    }
    want = sorted(cos, key=lambda i: (-cos[i], i))[:5]
    assert [r["vec_id"] for r in got] == want
    for r in got:
        assert abs(r["cosine"] - cos[r["vec_id"]]) < 1e-9


def test_knn_ivf_recall(emb, query):
    """IVF with generous probes must recover most of the exact top-10."""
    exact = {r["vec_id"] for r in sim.knn_brute(emb, query, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in sim.knn_ivf(emb, query, k=10, n_centroids=8,
                             n_probe=6).collect()
    }
    assert len(exact & approx) >= 7


def test_knn_lsh_probe_all_is_exact(emb, query):
    """hamming_probe >= n_planes probes every bucket, so the LSH path must
    reproduce the brute-force top-k exactly (the driver-oracle config)."""
    exact = sim.knn_brute(emb, query, k=10).collect()
    lsh = sim.knn_lsh(emb, query, k=10, n_planes=6,
                      hamming_probe=6).collect()
    assert [r["vec_id"] for r in lsh] == [r["vec_id"] for r in exact]
    for a, b in zip(lsh, exact):
        assert abs(a["cosine"] - b["cosine"]) < 1e-9


def test_knn_lsh_partial_probe_recall_and_pruning(spark):
    """A small Hamming radius must (a) scan strictly fewer rows than the
    corpus and (b) still recover most of the TRUE near neighbors — for
    cosine ~0.95 each sign bit flips with p ≈ 0.1, so planted neighbors
    concentrate in the low-Hamming buckets (random far vectors, θ ≈ 60°,
    do not — which is the pruning). The module fixture has no real
    neighbors (top cosines ~0.5), so this test plants its own."""
    rng = np.random.RandomState(7)
    q = rng.normal(size=24)
    planted = [q + 0.18 * rng.normal(size=24) for _ in range(10)]
    noise = rng.normal(size=(190, 24))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(planted)] + [
        (100 + i, [float(x) for x in v]) for i, v in enumerate(noise)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [float(x) for x in q]
    exact = [r["vec_id"] for r in sim.knn_brute(emb, query, k=10).collect()]
    assert set(exact) == set(range(10))  # the planted rows ARE the top-10
    approx = {
        r["vec_id"]
        for r in sim.knn_lsh(emb, query, k=10, n_planes=6,
                             hamming_probe=2).collect()
    }
    assert len(set(exact) & approx) >= 8
    # pruning is real: rebuild the probe set (same construction as
    # knn_lsh) and check it admits a strict fraction of the corpus
    from itertools import combinations

    planes = sim._deterministic_planes(24, 6, 42)
    qbits = planes @ q >= 0
    qbucket = 0
    for b in qbits:
        qbucket = qbucket * 2 + int(b)
    probe = [
        qbucket ^ sum(1 << (5 - f) for f in flips)
        for d in range(3) for flips in combinations(range(6), d)
    ]  # C(6,0)+C(6,1)+C(6,2) = 22 of 64 keys
    bucket = sim.hyperplane_bucket(F.col("embedding"), emb, n_planes=6)
    probed_rows = (
        emb.withColumn("b", bucket).filter(F.col("b").isin(probe)).count()
    )
    assert probed_rows < emb.count()


def test_hyperplane_bucket_groups_identical_vectors(spark, emb):
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    )
    b = doubled.select(
        "vec_id",
        sim.hyperplane_bucket(F.col("embedding"), doubled, n_planes=8)
        .alias("bucket"),
    )
    buckets = {r["vec_id"]: r["bucket"] for r in b.collect()}
    for i in range(200):
        assert buckets[i] == buckets[i + 1000]  # identical vec → same bucket


def test_knn_ivf_plan_shuffle_free(emb, query):
    """The centroid assignment must be a per-row argmax (flat literal
    struct array), not a crossJoin + per-id window: no Window operator and
    no hash-partition exchange anywhere in the plan (VERDICT r1 §3)."""
    from spider_spark.similarity import knn_ivf

    out = knn_ivf(emb, query, k=5, n_centroids=8, n_probe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_knn_lsh_plan_shuffle_free(emb, query):
    """The LSH probe must stay one scan: bucket key + probe-set filter
    computed per-row (planes are plan literals), final top-k a
    TakeOrderedAndProject (per-partition heap + driver merge) — no
    Window, no hash-partition exchange, no full sort."""
    out = sim.knn_lsh(emb, query, k=5, n_planes=6, hamming_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_zero_vector_never_tops_knn(spark):
    """cosine(0, q) is defined as 0, not NaN — Spark sorts NaN above every
    real value, so an unguarded 0/0 would rank an all-zeros embedding as
    the #1 neighbor."""
    from pyspark.sql import functions as F

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
            (3, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = sim.knn_brute(emb, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    zero_row = sim.knn_brute(emb, [1.0, 0.0], k=4).collect()[-1]
    assert zero_row["vec_id"] == 2 and zero_row["cosine"] == 0.0
