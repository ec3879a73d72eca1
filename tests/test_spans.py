"""Interleaved-document generator + span-operator tests.

The span-sequence invariant (kind, text, media_ref, order) is the per-row
contract vs the reference (BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.spans import (
    WebSpec,
    extract_outlinks,
    extract_outlinks_regex,
    generate_documents,
    span_signature,
    validate_spans,
)

SPEC = WebSpec(n_hosts=8, pages_per_host=4, skew_hosts=2, skew_pages=16,
               links_per_page=3)


@pytest.fixture(scope="module")
def docs(spark):
    d = generate_documents(spark, SPEC).cache()
    d.count()
    return d


def test_generator_deterministic(spark, docs):
    """Same spec → byte-identical table (no rand(), no wall clock)."""
    again = generate_documents(spark, SPEC)
    assert docs.exceptAll(again).count() == 0
    assert again.exceptAll(docs).count() == 0


def test_doc_count_and_ids(docs):
    assert docs.count() == SPEC.n_docs
    # doc_id universe matches the pure-Python twin used by the simulator
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids == {SPEC.url_of(i) for i in range(SPEC.n_docs)}


def test_span_invariant(docs):
    v = validate_spans(docs)
    assert v.filter(~F.col("spans_valid")).count() == 0


def test_span_signature_stable(docs):
    a = {r["doc_id"]: r["span_sig"] for r in span_signature(docs).collect()}
    b = {r["doc_id"]: r["span_sig"] for r in span_signature(docs).collect()}
    assert a == b


def test_regex_extraction_matches_span_native(docs):
    """E1 (regex over markup) and E3 (span-native) must agree — the
    differential pair for ExtractHtml (text_handler.cc:102-137)."""
    a = extract_outlinks(docs)
    b = extract_outlinks_regex(docs)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_outlinks_deduped_per_page(docs):
    """A9: per-page sort+unique (text_handler.cc:133-136)."""
    out = extract_outlinks(docs)
    dup = (
        out.groupBy("doc_id", "outlink").count().filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_skew_segment_lands_on_few_hosts(spark, docs):
    from spider_spark import urlkit

    hosts = docs.select(
        urlkit.url_host(F.col("doc_id")).alias("host")
    ).groupBy("host").count()
    top = hosts.orderBy(F.desc("count")).first()
    # skew pages concentrate on the first skew_hosts hosts
    assert top["count"] >= SPEC.pages_per_host + SPEC.skew_pages // SPEC.skew_hosts
