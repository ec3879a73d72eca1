"""Text analysis: token counting, quality, language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import textstats as ts


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", ts.token_count) == 3
    assert _one(spark, "   ", ts.token_count) == 0
    assert _one(spark, "one", ts.token_count) == 1


def test_bpe_ish_token_count(spark):
    n = _one(spark, "hello, world!", ts.bpe_ish_token_count)
    assert n == 4  # hello | , | world | !


def test_stopword_count(spark):
    assert _one(spark, "The cat and THE dog", ts.stopword_count) == 3  # the, and, the
    assert _one(spark, "and", ts.stopword_count) == 1


def test_quality_score_bounds(spark):
    q_long = _one(spark, "the quick brown fox " * 50, ts.quality_score)
    q_short = _one(spark, "zz", ts.quality_score)
    assert 0.0 <= q_short < q_long <= 1.5


def test_detect_language(spark):
    cases = {
        "the cat sat of the mat and a dog": "en",
        "el perro y la casa de que": "es",
        "der hund und die katze das zu": "de",
        "xyzzy plugh qwer": "und",
    }
    for text, want in cases.items():
        assert _one(spark, text, ts.detect_language) == want, text


def test_doc_fingerprint_matches_md5(spark):
    import hashlib

    got = _one(spark, "hello", ts.doc_fingerprint)
    assert got == hashlib.md5(b"hello").hexdigest()


def test_corpus_stats(spark):
    df = spark.createDataFrame(
        [("en", "the quick fox"), ("en", "a lazy dog"), ("fr", "le chat")],
        "lang string, text string",
    )
    out = {r["grp"]: r.asDict() for r in ts.corpus_stats(df).collect()}
    assert out["en"]["n_docs"] == 2
    assert out["en"]["total_tokens"] == 6
    assert out["fr"]["total_tokens"] == 2


def test_token_count_null_text_is_zero(spark):
    """Documented contract: 0 for empty AND null text (a bare
    length(trim(NULL)) check returns NULL instead)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(None,), ("",), ("  ",), ("a b",)], "text string")
    got = [r["n"] for r in
           df.select(ts.token_count(F.col("text")).alias("n")).collect()]
    assert got == [0, 0, 0, 2]
