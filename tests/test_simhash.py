"""Simhash (D1) + Manku block-permutation candidates (D2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import simhash as sh


def _sign(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return df.withColumn("simhash", sh.simhash64(F.col("text")))


def test_simhash_deterministic(spark):
    a = {r["doc_id"]: r["simhash"]
         for r in _sign(spark, ["hello world foo", "bar baz"]).collect()}
    b = {r["doc_id"]: r["simhash"]
         for r in _sign(spark, ["hello world foo", "bar baz"]).collect()}
    assert a == b


def test_simhash_similar_texts_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base + "extra token"
    far = "completely different content about spark shuffles and parquet files"
    rows = {r["doc_id"]: r["simhash"]
            for r in _sign(spark, [base, near, far]).collect()}
    d_near = bin((rows[0] ^ rows[1]) & ((1 << 64) - 1)).count("1")
    d_far = bin((rows[0] ^ rows[2]) & ((1 << 64) - 1)).count("1")
    assert d_near < d_far


def test_block_pairs_cover_hamming3():
    """3 flipped bits leave ≥2 of 5 blocks intact → some table matches
    (dedup_util.cc:12-55 guarantee)."""
    assert len(sh.BLOCK_PAIRS) == 10
    widths = [hi - lo for lo, hi in sh.BLOCK_BOUNDS]
    assert sum(widths) == 64 and widths == [13, 13, 13, 13, 12]


def test_candidates_find_near_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    # identical text → hamming 0 (guaranteed candidate); synthetic
    # few-token perturbations drift many bits (tie-heavy votes), which is
    # why the recall guarantee is tested exhaustively below instead
    texts = [base, base, "unrelated words entirely different content " * 8]
    docs = _sign(spark, texts)
    pairs = sh.simhash_candidates(docs, "doc_id", "simhash", max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(p[1] != 2 and p[0] != 2 for p in got)


def test_candidates_exhaustive_recall(spark):
    """Differential vs brute force: every pair within hamming ≤3 must be
    found by the block index (the Manku recall guarantee)."""
    import itertools

    base = "w%d"
    texts = [" ".join(base % (i * 17 + j) for j in range(40)) for i in range(12)]
    # clone a few docs with small perturbations
    texts += [texts[0] + " tweak", texts[5] + " nudge"]
    docs = _sign(spark, texts).cache()
    signs = {r["doc_id"]: r["simhash"] for r in docs.collect()}
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(signs), 2)
        if bin((signs[a] ^ signs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {(r["a"], r["b"])
           for r in sh.simhash_candidates(docs, "doc_id", "simhash").collect()}
    assert got == brute
