"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All column-expression (JVM, codegen'd) — deliberately SQL-expressible so
each op has a DuckDB oracle. The heuristics are simple but the *shapes*
are the production ones: per-doc scalar features → corpus-level rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword tables (data, not code)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "de", "et", "que"],
    "de": ["der", "die", "und", "das", "zu"],
}

STOPWORDS_FLAT = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null). NULL text must coalesce
    BEFORE the length test — length(trim(NULL)) is NULL, the WHEN
    condition would be neither true nor false, and the count would come
    out NULL against the documented contract."""
    t = F.coalesce(text, F.lit(""))
    return F.when(
        F.length(F.trim(t)) == 0, F.lit(0)
    ).otherwise(F.size(tokens(t)))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of word pieces + punctuation runs via regex
    split on word/non-word boundaries — a deterministic stand-in for a
    real tokenizer's piece count."""
    pieces = F.split(text, r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+")
    return F.size(F.filter(pieces, lambda p: F.trim(p) != ""))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_FLAT)])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(sw, t))
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length factor × stopword-ratio factor ×
    mean-token-length sanity. Deterministic, SQL-replicable."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    sw_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    len_factor = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    mean_tok = n_chars / F.greatest(n_tok, F.lit(1))
    tok_sanity = F.when((mean_tok >= 2) & (mean_tok <= 12), 1.0).otherwise(0.5)
    return F.round(len_factor * (F.lit(0.5) + sw_ratio) * tok_sanity, 6)


def detect_language(text: Column) -> Column:
    """n-gram-free language ID heuristic: argmax of per-language stopword
    hits; 'und' when nothing matches (including NULL text — coalesced so
    the NULL can't leak through a CASE chain differently than the DuckDB
    twin, whose all-NULL comparisons fall to the ELSE branch)."""
    toks = tokens(F.lower(F.coalesce(text, F.lit(""))))
    counts = {
        lang: F.size(
            F.filter(
                toks,
                lambda t: F.array_contains(
                    F.array(*[F.lit(w) for w in ws]), t
                ),
            )
        )
        for lang, ws in LANG_STOPWORDS.items()
    }
    best_lang = F.lit("und")
    best_cnt = F.lit(0)
    for lang in sorted(LANG_STOPWORDS):  # deterministic tie order
        c = counts[lang]
        better = c > best_cnt
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(better, c).otherwise(best_cnt)
    return best_lang


def doc_fingerprint(text: Column) -> Column:
    """Stable 32-hex content fingerprint (rolling-hash role); md5 is the
    SQL-portable choice (DuckDB md5() matches bit-for-bit)."""
    return F.md5(text)


def corpus_stats(docs: DataFrame, text_col: str = "text",
                 group_col: str = "lang") -> DataFrame:
    """Per-group rollup: docs, tokens, avg quality. Partial agg built-in."""
    t = F.col(text_col)
    return (
        docs.select(
            F.col(group_col).alias("grp"),
            token_count(t).alias("n_tok"),
            quality_score(t).alias("q"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
        )
    )
