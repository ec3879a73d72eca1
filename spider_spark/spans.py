"""Interleaved text+media documents: schema, generator, span operators.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
interleaved documents:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

This is the Spark rendering of the reference's ``Resource`` protobuf
(crawler/crawler/proto2/resource.proto:180-186): ``kind`` mirrors
ResourceType (resource.proto:13-23), ``media_ref`` mirrors the
css/image/anchor url arrays (resource.proto:119-126) and nested
CssFile/ImageFile urls (resource.proto:87-99), ``offset`` preserves
in-document order. Per-row invariant vs the reference: span-sequence
equality ``(kind, text, media_ref, order)``.

The synthetic web generator is fully distributed (``spark.range`` + column
expressions, zero Python in the data path) and deterministic: every page,
span, and outlink is a pure hash function of ``(doc index, seed)``. It
scales to 10^10 rows by construction — no driver-side loops, no rand().
Host skew is built in (a configurable share of pages concentrates on a few
mega-hosts) to exercise the salted-shuffle path (SURVEY.md §7.4-3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_KINDS = ("text", "anchor", "css", "image")  # ≈ ResourceType subset

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE, False), False),
    ]
)

_VOCAB = (
    "crawl frontier spark shuffle parquet bloom filter host robots anchor "
    "page index rank score batch round seed link fetch merge"
).split()


@dataclass(frozen=True)
class WebSpec:
    """Deterministic synthetic web layout.

    Doc universe = two segments:
      base segment  — ``n_hosts * pages_per_host`` docs, page ``i`` of the
                      segment lives on host ``i % n_hosts``;
      skew segment  — ``skew_pages`` extra docs all packed onto the first
                      ``skew_hosts`` hosts (the deterministic mega-host,
                      mirroring the big_family_host skew the reference works
                      around in robots/data_prepare.cc:86-135).
    """

    n_hosts: int = 50
    pages_per_host: int = 20
    skew_hosts: int = 2
    skew_pages: int = 200
    links_per_page: int = 8
    seed: int = 42

    @property
    def base_docs(self) -> int:
        return self.n_hosts * self.pages_per_host

    @property
    def n_docs(self) -> int:
        return self.base_docs + self.skew_pages

    # -- pure-Python twins of the column expressions (used by the simulator)
    def host_of(self, idx: int) -> int:
        if idx < self.base_docs:
            return idx % self.n_hosts
        return (idx - self.base_docs) % self.skew_hosts

    def page_of(self, idx: int) -> int:
        if idx < self.base_docs:
            return idx // self.n_hosts
        return self.pages_per_host + (idx - self.base_docs) // self.skew_hosts

    def url_of(self, idx: int) -> str:
        return f"http://host{self.host_of(idx)}.example.com/p/{self.page_of(idx)}"


def _host_col(spec: WebSpec, idx: Column) -> Column:
    base = F.lit(spec.base_docs)
    return F.when(idx < base, idx % spec.n_hosts).otherwise(
        (idx - base) % spec.skew_hosts
    )


def _page_col(spec: WebSpec, idx: Column) -> Column:
    base = F.lit(spec.base_docs)
    return F.when(idx < base, (idx / spec.n_hosts).cast("long")).otherwise(
        F.lit(spec.pages_per_host)
        + ((idx - base) / spec.skew_hosts).cast("long")
    )


def url_expr(spec: WebSpec, idx: Column) -> Column:
    return F.concat(
        F.lit("http://host"),
        _host_col(spec, idx).cast("string"),
        F.lit(".example.com/p/"),
        _page_col(spec, idx).cast("string"),
    )


def _link_target(spec: WebSpec, idx: Column, i: Column) -> Column:
    """Deterministic outlink target: hash-mix of (seed, doc idx, link slot)."""
    mix = F.xxhash64(F.lit(spec.seed), idx, i)
    return F.pmod(mix, F.lit(spec.n_docs))


def generate_documents(spark: SparkSession, spec: WebSpec) -> DataFrame:
    """Distributed deterministic interleaved-docs table.

    Span layout per page (offsets 0..2k+1): text span, then alternating
    (anchor, text) pairs, closing with one image span — the interleaving the
    reference stores as content + parsed_data arrays (resource.proto:101-126).
    Anchor spans carry the raw ``<a href>`` markup in ``text`` AND the
    resolved url in ``media_ref`` so the regex extraction path (E1,
    text_handler.cc:102-137) can be differentially tested against the
    span-native path.
    """
    k = spec.links_per_page
    df = spark.range(spec.n_docs).withColumnRenamed("id", "idx")
    idx = F.col("idx")

    def word(salt: Column | int) -> Column:
        h = F.pmod(F.xxhash64(F.lit(spec.seed + 1), idx, F.lit(0) + salt),
                   F.lit(len(_VOCAB)))
        return F.element_at(F.array(*[F.lit(w) for w in _VOCAB]),
                            (h + 1).cast("int"))

    def text_span(slot: Column) -> Column:
        body = F.concat_ws(
            " ",
            word(slot * 3 + 100),
            word(slot * 3 + 101),
            word(slot * 3 + 102),
        )
        return F.struct(
            F.lit("text").alias("kind"),
            body.alias("text"),
            F.lit("").alias("media_ref"),
            (slot * 2).cast("int").alias("offset"),
        )

    def anchor_span(slot: Column) -> Column:
        target = _link_target(spec, idx, slot)
        turl = url_expr(spec, target)
        markup = F.concat(F.lit('<a href="'), turl, F.lit('">'),
                          word(slot + 500), F.lit("</a>"))
        return F.struct(
            F.lit("anchor").alias("kind"),
            markup.alias("text"),
            turl.alias("media_ref"),
            (slot * 2 + 1).cast("int").alias("offset"),
        )

    slots = F.sequence(F.lit(0), F.lit(k - 1))
    texts = F.transform(slots, lambda s: text_span(s.cast("long")))
    anchors = F.transform(slots, lambda s: anchor_span(s.cast("long")))
    image = F.struct(
        F.lit("image").alias("kind"),
        F.lit("").alias("text"),
        F.concat(
            F.lit("http://img.example.com/i/"),
            F.pmod(F.xxhash64(F.lit(spec.seed + 2), idx), F.lit(10000)).cast("string"),
        ).alias("media_ref"),
        F.lit(2 * k).cast("int").alias("offset"),
    )
    spans = F.concat(
        F.flatten(F.zip_with(texts, anchors, lambda t, a: F.array(t, a))),
        F.array(image),
    )
    return df.select(
        url_expr(spec, idx).alias("doc_id"),
        spans.alias("spans"),
    )


# --------------------------------------------------------------------------
# Span operators
# --------------------------------------------------------------------------

def validate_spans(docs: DataFrame) -> DataFrame:
    """Quarantine rows violating the span invariant (the reference's
    ReportAbnormalData role, control/schedule/schedule.cc:61): offsets must
    be 0..n-1 in order, kinds from the closed set. Returns docs with a
    boolean ``spans_valid`` column; callers filter and route the complement
    to a quarantine sink."""
    n = F.size("spans")
    offsets_ok = F.aggregate(
        F.zip_with(
            F.col("spans"),
            F.sequence(F.lit(0), n - 1),
            lambda s, i: (s["offset"] == i.cast("int")),
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    kinds_ok = ~F.exists(
        "spans", lambda s: ~s["kind"].isin(*SPAN_KINDS)
    )
    return docs.withColumn("spans_valid", offsets_ok & kinds_ok & (n > 0))


def extract_outlink_arrays(docs: DataFrame,
                           kinds: tuple[str, ...] = ("anchor",)) -> DataFrame:
    """Per-page outlinks in PACKED form: (doc_id, outlinks array<string>),
    per-page sorted+deduped map-side (A9, text_handler.cc:133-136).

    This is the form :class:`round.CrawlRun` persists as its adjacency —
    one row per page instead of one per edge (~links_per_page× fewer rows),
    so the per-round join probes the page table and explodes only the
    matched rows AFTER the join. On the per-stage profile this was the
    round's whale: scanning the exploded 10^1.2 edge list per round cost
    more task-time than everything else combined.

    Plan shape: the kind/media_ref subfields are read via
    ``GetArrayStructFields`` (``spans.kind`` / ``spans.media_ref``) and
    re-zipped, NOT via a lambda over the struct array — Spark's nested
    schema pruning does not see through higher-order-function lambdas, so
    the lambda form scans ``struct<kind,text,media_ref,offset>`` with the
    full page markup in ``text``, while this form prunes the parquet read
    to ``struct<kind,media_ref>`` (event-log verified: the one-time
    adjacency materialization was the largest single stage of a crawl at
    bench scale, and its input bytes are dominated by the text payload a
    link extractor never needs)."""
    ks = F.col("spans").getField("kind")
    rs = F.col("spans").getField("media_ref")
    hits = F.zip_with(ks, rs, lambda k, r: F.when(k.isin(*kinds) & (r != ""), r))
    links = F.array_distinct(
        F.array_sort(F.filter(hits, lambda x: x.isNotNull()))
    )
    return docs.select(F.col("doc_id"), links.alias("outlinks"))


def extract_outlinks(docs: DataFrame, kinds: tuple[str, ...] = ("anchor",)) -> DataFrame:
    """Per-page outlink extraction, span-native path (E3,
    crawler2/general_crawler/extractor.cc:202-281).

    ``array_distinct(array_sort(...))`` reproduces the reference's per-page
    sort+unique (A9, text_handler.cc:133-136) *before* the explode so the
    dedup is map-side — no shuffle. Output: (doc_id, outlink).
    """
    return extract_outlink_arrays(docs, kinds).select(
        F.col("doc_id"), F.explode("outlinks").alias("outlink")
    )


def extract_outlinks_regex(docs: DataFrame) -> DataFrame:
    """Regex extraction over raw markup (E1, ExtractHtml
    text_handler.cc:102-137): findall ``<a href="...">`` across the page's
    concatenated text spans. JVM-side via regexp_extract_all — differential
    twin of :func:`extract_outlinks` for the generator's anchor markup."""
    page_text = F.concat_ws(
        " ", F.transform("spans", lambda s: s["text"])
    )
    links = F.array_distinct(
        F.array_sort(
            F.regexp_extract_all(page_text, F.lit(r'<a href="([^"]+)"'), F.lit(1))
        )
    )
    return docs.select(F.col("doc_id"), F.explode(links).alias("outlink"))


def span_signature(docs: DataFrame) -> DataFrame:
    """Stable per-doc signature of the full span sequence — the equality
    witness for the span-sequence invariant (kind, text, media_ref, order).

    to_json serializes the struct array with field names, quoting and
    explicit nulls — an empty-separator concat would let distinct
    sequences collide (('ab','') vs ('a','b')) and skip NULL fields,
    making the witness assert false equality.
    """
    sig = F.sha2(F.to_json(F.col("spans")), 256)
    return docs.select("doc_id", sig.alias("span_sig"))
