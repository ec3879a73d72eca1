"""Property-based differential tests (hypothesis): the Spark pandas-UDF
canonicalizer and the urllib-based simulator twin must agree on arbitrary
inputs — the rule book is the spec, the twins are independent impls."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from spider_spark.simulator import canonicalize as py_canon, rule_filter

# url-ish alphabet: hosts, paths, schemes, noise
_host_label = st.text(
    alphabet=string.ascii_letters + string.digits + "-_", min_size=1,
    max_size=8,
)
_hosts = st.lists(_host_label, min_size=1, max_size=4).map(".".join)
_paths = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-%#?&=",
    max_size=30,
)
_schemes = st.sampled_from(["http://", "https://", "HTTP://", "", "ftp://"])
_noise = st.text(max_size=20)


@st.composite
def urlish(draw):
    return (
        draw(st.sampled_from(["", " ", "%20", "  "]))
        + draw(_schemes)
        + draw(st.sampled_from(["", "user@", "user:pw@", "@", "a@b@"]))
        + draw(_hosts)
        + draw(st.sampled_from(["", ":80", ":443", ":8080", ":0", ":", "::80"]))
        + draw(st.sampled_from(["", "/"]))
        + draw(_paths)
    )


# Spark session startup is expensive — collect a batch of cases per class
# invocation instead of one UDF call per example.

def _spark_canon_batch(spark, urls: list[str]) -> list[str | None]:
    from pyspark.sql import functions as F

    from spider_spark import urlkit

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        F.col("url"), urlkit.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    by_input: dict[str, str | None] = {}
    for r in rows:
        by_input.setdefault(r["url"], r["c"])
    return [by_input[u] for u in urls]


def test_canonicalize_twins_agree_fuzz(spark):
    cases: list[str] = []

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(urlish())
    def collect(u):
        cases.append(u)

    collect()
    got = _spark_canon_batch(spark, cases)
    for u, g in zip(cases, got):
        assert g == py_canon(u), f"twin mismatch on {u!r}: spark={g!r} py={py_canon(u)!r}"


def test_canonicalize_idempotent_fuzz(spark):
    """canon(canon(x)) == canon(x) — canonical form is a fixpoint."""
    cases: list[str] = []

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(urlish())
    def collect(u):
        cases.append(u)

    collect()
    first = _spark_canon_batch(spark, cases)
    ok = [c for c in first if c is not None]
    second = _spark_canon_batch(spark, ok)
    for c, c2 in zip(ok, second):
        assert c2 == c, f"not a fixpoint: {c!r} -> {c2!r}"


def test_rule_filter_twins_agree_fuzz(spark):
    from pyspark.sql import functions as F

    from spider_spark import urlkit

    cases: list[str] = []

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(urlish())
    def collect(u):
        c = py_canon(u)
        if c is not None:
            cases.append(c)

    collect()
    if not cases:
        return
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    kept = {
        r["url"]
        for r in df.filter(urlkit.url_rule_filter(F.col("url"))).collect()
    }
    for u in set(cases):
        assert (u in kept) == rule_filter(u), f"rule twin mismatch on {u!r}"


def test_fast_path_df_canonicalizer_agrees(spark):
    """canonicalize_urls_df's JVM fast path must be a strict fixpoint
    subset: for every fuzz input, the DF path's output set equals applying
    py_canon row-wise (slow-path parity), and every fast-path survivor is
    a fixpoint."""
    from pyspark.sql import functions as F

    from spider_spark import urlkit

    cases: list[str] = []

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(urlish())
    def collect(u):
        cases.append(u)

    collect()
    # add canonical-looking urls that exercise the fast path + near misses
    cases += [
        "http://a.example.com/",
        "http://a.example.com/p/1?x=1",
        "https://b-c.example.com/deep/path",
        "http://a.example.com/p/1?",          # empty query → slow
        "HTTP://a.example.com/p",             # uppercase scheme → slow
        "http://a.example.com:8080/p",        # port → slow
        "http://user@a.example.com/p",        # userinfo → slow
        "http://a.example.com/p#frag",        # fragment → slow
        "http://a.example.com/p%2",           # stray % in path (kept)
        "http://a.example.com/CaseKept/Q",    # path case preserved
    ]
    df = spark.createDataFrame([(u,) for u in set(cases)], "url string")
    out = {
        r["url"]
        for r in urlkit.canonicalize_urls_df(df, "url")
        .filter(F.col("url").isNotNull()).collect()
    }
    want = {c for c in (py_canon(u) for u in set(cases)) if c is not None}
    assert out == want


def test_session_perf_contract(spark):
    """The engine-session confs that benchmarks and scale depend on
    (BENCH.md §0): Arrow enabled with 64k batches, AQE + skew join on,
    and Spark 4's per-call DataFrame-debugging wrapper OFF (it costs
    ~1 s/round of driver-side py4j round trips)."""
    conf = spark.conf
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "65536"
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get(
        "spark.python.sql.dataFrameDebugging.enabled", "true") == "false"
    # FAIR keeps the round's four concurrent state-write jobs saturating
    # the executor instead of queueing behind the earliest job's stages
    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"
