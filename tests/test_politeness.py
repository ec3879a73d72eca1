"""Robots gating + per-host admission + holdon state (L1/L6/J2 semantics,
load_controller.cc:149-242 at batch granularity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark import politeness as pol


@pytest.fixture(scope="module")
def robots(spark):
    r = pol.synthetic_robots(spark, 20).cache()
    r.count()
    return r


def test_robots_levels(spark, robots):
    urls = spark.createDataFrame(
        [
            ("http://host0.example.com/p/0", "host0.example.com", "/p/0"),
            ("http://host0.example.com/p/1", "host0.example.com", "/p/1"),
            ("http://host13.example.com/p/1", "host13.example.com", "/p/1"),
            ("http://host1.example.com/p/5", "host1.example.com", "/p/5"),
            ("http://nohost.example.com/p/0", "nohost.example.com", "/p/0"),
        ],
        "url string, host string, path string",
    )
    got = {
        r["url"]: r["robots_level"]
        for r in pol.robots_level(urls, robots).collect()
    }
    # host0: id%13==0 → no robots.txt → level 1 regardless of rules
    assert got["http://host0.example.com/p/0"] == 1
    assert got["http://host0.example.com/p/1"] == 1
    # host13: 13%13==0 → no robots → level 1
    assert got["http://host13.example.com/p/1"] == 1
    # host1: robots present, allow_all → level 2
    assert got["http://host1.example.com/p/5"] == 2
    # unknown host → no robots → level 1
    assert got["http://nohost.example.com/p/0"] == 1


def test_robots_disallow_prefix(spark, robots):
    urls = spark.createDataFrame(
        [
            ("http://host7.example.com/p/1", "host7.example.com", "/p/1"),
            ("http://host7.example.com/p/10", "host7.example.com", "/p/10"),
            ("http://host7.example.com/p/2", "host7.example.com", "/p/2"),
        ],
        "url string, host string, path string",
    )
    got = {
        r["url"]: r["robots_level"]
        for r in pol.robots_level(urls, robots).collect()
    }
    # host7: 7%7==0 → disallow prefix /p/1, allow_all False
    assert got["http://host7.example.com/p/1"] == 0    # disallowed
    assert got["http://host7.example.com/p/10"] == 0   # prefix match
    assert got["http://host7.example.com/p/2"] == 3    # explicit allow


def test_admit_round_budget_and_order(spark):
    spec = pol.PolitenessSpec(qps=1.0, round_seconds=2.0)  # budget 2
    rows = [
        ("http://a.com/%d" % i, "a.com", 30, float(100 - i)) for i in range(5)
    ] + [("http://b.com/0", "b.com", 30, 50.0)]
    cand = spark.createDataFrame(
        rows, "url string, host string, priority int, score double"
    )
    state = pol.init_host_state(spark)
    out = pol.admit_round(cand, state, None, spec, round_no=0)
    admitted = sorted(
        r["url"] for r in out.filter(F.col("admitted")).collect()
    )
    # a.com: top-2 by (priority, score desc) = /0, /1; b.com under budget
    assert admitted == ["http://a.com/0", "http://a.com/1", "http://b.com/0"]


def test_admit_round_respects_holdon_and_drop(spark):
    spec = pol.PolitenessSpec()
    cand = spark.createDataFrame(
        [
            ("http://h.com/1", "h.com", 30, 1.0),
            ("http://d.com/1", "d.com", 30, 1.0),
            ("http://ok.com/1", "ok.com", 30, 1.0),
        ],
        "url string, host string, priority int, score double",
    )
    state = spark.createDataFrame(
        [("h.com", 10, 5, False), ("d.com", 100, -1, True)],
        pol.HOST_STATE_SCHEMA,
    )
    out = pol.admit_round(cand, state, None, spec, round_no=3)
    admitted = {r["url"] for r in out.filter(F.col("admitted")).collect()}
    assert admitted == {"http://ok.com/1"}  # h holding on till 5, d dropped
    # after the holdon expires the host admits again
    out2 = pol.admit_round(cand, state, None, spec, round_no=6)
    admitted2 = {r["url"] for r in out2.filter(F.col("admitted")).collect()}
    assert admitted2 == {"http://ok.com/1", "http://h.com/1"}


def test_update_host_state(spark):
    spec = pol.PolitenessSpec(holdon_failures=3, holdon_rounds=2,
                              max_failed_times=6)
    state = pol.init_host_state(spark)
    results = spark.createDataFrame(
        [("f.com", False)] * 3 + [("s.com", True), ("s.com", False)],
        "host string, success boolean",
    )
    st1 = pol.update_host_state(state, results, spec, round_no=1)
    d = {r["host"]: r.asDict() for r in st1.collect()}
    assert d["f.com"]["consec_failures"] == 3
    assert d["f.com"]["holdon_until_round"] == 3  # 1 + 2
    assert not d["f.com"]["dropped"]
    # any success resets the run
    assert d["s.com"]["consec_failures"] == 0

    # keep failing → dropped at max_failed_times
    more = spark.createDataFrame([("f.com", False)] * 3,
                                 "host string, success boolean")
    st2 = pol.update_host_state(st1, more, spec, round_no=2)
    d2 = {r["host"]: r.asDict() for r in st2.collect()}
    assert d2["f.com"]["consec_failures"] == 6
    assert d2["f.com"]["dropped"]


def test_salted_admission_equals_unsalted(spark):
    """Two-level salted top-k (skew guard) must admit exactly the same
    set as the single-window path — differential over a mega-host."""
    rows = [
        ("http://mega.com/%04d" % i, "mega.com", 30 + (i % 3) * 10,
         float(1000 - i)) for i in range(500)
    ] + [("http://tiny.com/%d" % i, "tiny.com", 30, 10.0) for i in range(3)]
    cand = spark.createDataFrame(
        rows, "url string, host string, priority int, score double"
    )
    state = pol.init_host_state(spark)
    spec_salted = pol.PolitenessSpec(qps=2.0, round_seconds=5.0,
                                     salt_buckets=16)
    spec_plain = pol.PolitenessSpec(qps=2.0, round_seconds=5.0,
                                    salt_buckets=1)
    a = {r["url"] for r in pol.admit_round(cand, state, None, spec_salted, 0)
         .filter(F.col("admitted")).collect()}
    b = {r["url"] for r in pol.admit_round(cand, state, None, spec_plain, 0)
         .filter(F.col("admitted")).collect()}
    assert a == b
    assert len(a) == 10 + 3  # budget 10 for mega + all 3 tiny


def test_per_host_budget_dim(spark):
    spec = pol.PolitenessSpec(qps=1.0, round_seconds=1.0)  # default 1
    cand = spark.createDataFrame(
        [("http://big.com/%d" % i, "big.com", 30, 1.0) for i in range(10)],
        "url string, host string, priority int, score double",
    )
    budgets = spark.createDataFrame([("big.com", 5)], "host string, budget int")
    out = pol.admit_round(cand, pol.init_host_state(spark), budgets, spec, 0)
    assert out.filter(F.col("admitted")).count() == 5


def test_ip_cap_null_ips_bypass_window(spark):
    """Rows whose host has no ip mapping (or whose ip has no budget) must
    not enter the per-ip ranking window: correctness — they stay
    admitted untouched; plan — the window's input filters to non-null
    ips, so the (typically majority) unmapped rows can never serialize
    through the window's single NULL partition."""
    adm = spark.createDataFrame(
        [(f"http://h{i % 4}.com/{i}", f"h{i % 4}.com", 30, 1.0, True)
         for i in range(20)],
        "url string, host string, priority int, score double, "
        "admitted boolean",
    )
    host_ips = spark.createDataFrame(
        [("h0.com", "1.1.1.1"), ("h1.com", "1.1.1.1")],
        "host string, ip string",
    )  # h2/h3 unmapped → null ip
    ip_budgets = spark.createDataFrame(
        [("1.1.1.1", 3)], "ip string, budget int")
    out = pol.ip_cap_admitted(adm, host_ips, ip_budgets)
    rows = {r["url"]: r["admitted"] for r in out.collect()}
    assert len(rows) == 20
    mapped = [u for u in rows if u.startswith(("http://h0", "http://h1"))]
    unmapped = [u for u in rows if not u.startswith(("http://h0", "http://h1"))]
    assert sum(rows[u] for u in mapped) == 3           # capped to budget
    assert all(rows[u] for u in unmapped)              # untouched
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Window node's child subtree must carry the isnotnull(ip) filter
    assert "isnotnull(ip" in plan, plan


def test_ip_cap_multi_ip_host_does_not_duplicate_rows(spark):
    """A host with several A-records (two host_ips rows) must not
    multiply its admitted rows through the dim join — one deterministic
    ip per host (min), row count preserved."""
    adm = spark.createDataFrame(
        [(f"http://m.com/{i}", "m.com", 30, 1.0, True) for i in range(6)],
        "url string, host string, priority int, score double, "
        "admitted boolean",
    )
    host_ips = spark.createDataFrame(
        [("m.com", "2.2.2.2"), ("m.com", "1.1.1.1")],
        "host string, ip string",
    )
    ip_budgets = spark.createDataFrame(
        [("1.1.1.1", 2), ("2.2.2.2", 100)], "ip string, budget int")
    out = pol.ip_cap_admitted(adm, host_ips, ip_budgets)
    rows = out.collect()
    assert len(rows) == 6  # no duplication
    # deterministic pick = min ip → budget 2 applies
    assert sum(r["admitted"] for r in rows) == 2
