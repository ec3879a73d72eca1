"""Similarity search over embedding columns (array<float>).

- :func:`cosine_expr` / :func:`dot_expr` — JVM-side higher-order-function
  kernels (zip_with → aggregate), whole-stage-codegen'd, no Python.
- :func:`knn_brute` — exact top-k cosine against a query vector: broadcast
  the query, score every row, range-partitioned top-k. The correctness
  baseline.
- :func:`knn_ivf` — IVF-style scale path: k-means-lite centroids
  (deterministic seeded sample), assign rows to nearest centroid once
  (write-time partition at scale), probe only the closest ``n_probe``
  partitions at query time.
- :func:`hyperplane_bucket` — random-hyperplane LSH bucket key for
  pair-style joins (used by dedup.embedding_near_duplicates).
- :func:`knn_lsh` — LSH-bucketed scale path: rows keyed by their
  hyperplane sign bucket (write-time partition key at scale), the query
  multi-probing only the buckets within a small Hamming radius of its
  own bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Zero-norm guard: 0.0/0.0 is NaN in Spark's double division, and
    Spark sorts NaN ABOVE every real value — an all-zeros embedding would
    rank as the #1 nearest neighbor in a desc top-k. Define cosine(0,·)=0
    (the Python twin in knn_ivf guards identically)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def knn_brute(emb: DataFrame, query_vec: list[float], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine. The query vector is a literal array (no join
    needed — it ships inside the plan); ordering ties break on id.

    Scale: one scan + a k-row total-order head (Spark's takeOrdered-style
    sort on k rows per partition then merge) — no full sort materialized."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _deterministic_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def hyperplane_bucket(vec: Column, emb: DataFrame, n_planes: int = 16,
                      seed: int = 42, dim: int | None = None) -> Column:
    """SimHash-for-vectors bucket id: sign bits of ``n_planes`` seeded
    random hyperplane dot products, packed into a long. Column-only math —
    the planes are literal arrays folded into the plan."""
    if dim is None:
        first = emb.select(F.size(vec).alias("d")).first()
        dim = int(first["d"])
    planes = _deterministic_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(dot_expr(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def knn_lsh(emb: DataFrame, query_vec: list[float], k: int = 10,
            n_planes: int = 6, hamming_probe: int = 1,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> DataFrame:
    """LSH-bucketed approximate top-k: every row keyed by its hyperplane
    sign bucket, the query probing only buckets within ``hamming_probe``
    bit flips of its own bucket (multi-probe LSH: a near neighbor
    disagrees with the query on few hyperplane signs, so the low-Hamming
    buckets hold almost all of the true top-k; for cosine θ each sign
    bit flips with probability θ/π).

    ``hamming_probe >= n_planes`` probes every bucket → exactly the
    brute-force top-k (the driver-oracle config; partial-probe recall is
    the pytest differential).

    Scale: the bucket is data-independent (no centroid sample, no join —
    the planes are literals folded into the plan), so at 100 TB it is
    computed once at write time and used as the table's partition key; a
    query then scans Σ_{d≤h} C(n_planes,d) / 2^n_planes of the data via
    partition pruning, and the probe-set filter below pushes down to the
    scan. The final top-k is TakeOrdered (per-partition heap + driver
    merge), never a full sort."""
    from itertools import combinations

    qv = np.asarray(query_vec, dtype=float)
    planes = _deterministic_planes(len(qv), n_planes, seed)
    qbits = planes @ qv >= 0
    qbucket = 0
    for b in qbits:
        qbucket = qbucket * 2 + int(b)
    h = min(hamming_probe, n_planes)
    # hyperplane_bucket packs plane i at bit position (n_planes-1-i)
    probe = [
        qbucket ^ sum(1 << (n_planes - 1 - f) for f in flips)
        for d in range(h + 1)
        for flips in combinations(range(n_planes), d)
    ]
    bucket = hyperplane_bucket(F.col(vec_col), emb, n_planes=n_planes,
                               seed=seed, dim=len(qv))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.withColumn("_bucket", bucket)
        .filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_ivf(emb: DataFrame, query_vec: list[float], k: int = 10,
            n_centroids: int = 16, n_probe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> DataFrame:
    """IVF-lite approximate top-k: centroids = deterministic seeded sample
    of rows (one tiny collect); every row assigned to its nearest centroid;
    the query probes the ``n_probe`` nearest centroid partitions only.

    At 100 TB the assignment is computed once at write time and used as the
    table's partition key — a query then scans n_probe/n_centroids of the
    data (partition pruning), which is the whole point of IVF."""
    # deterministic "k-means--": hash-order head as centroids. orderBy +
    # limit compiles to TakeOrderedAndProject — a per-partition top-16 heap
    # merged on the driver, NOT a materialized full sort (verified in the
    # physical plan), so the sample costs one scan at any scale.
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col) + seed), F.lit(997)),
                 F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in sample]

    # centroid assignment: per-row argmax over a FLAT literal array of
    # (cosine, centroid) structs — array_max's lexicographic struct order
    # picks the best centroid with NO shuffle (the old plan crossJoined
    # then row_number'd over a window partitioned by vec_id: a full
    # n×n_centroids shuffle just to take an argmax of 16 values). The
    # negated index makes ties resolve to the LOWEST centroid id. A flat
    # array is linear in plan size — unlike a nested CASE chain, which
    # re-inlines the running best and explodes (see round-1 incident).
    scored = F.array(*[
        F.struct(
            cosine_expr(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])
            ).alias("c_cos"),
            F.lit(-ci).alias("neg_centroid"),
        )
        for ci, c in enumerate(centroids)
    ])
    assigned = emb.withColumn(
        "centroid", -F.array_max(scored)["neg_centroid"]
    )
    qv = np.array(query_vec, dtype=float)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    probe = sorted(
        range(len(centroids)),
        key=lambda ci: (-cos(np.array(centroids[ci]), qv), ci),
    )[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("centroid").isin(probe))
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
