"""Selector/scheduler operators: union tagging, VIP, page-N, transforms,
dns/ip/proxy, updater, evaluation."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import selector as sel


def test_union_sources_tags(spark):
    seeds = spark.createDataFrame([("http://a/",)], "url string")
    newlinks = spark.createDataFrame(
        [("http://b/", "http://a/")], "url string, referer string"
    )
    out = sel.union_sources({"seed": seeds, "newlink": newlinks})
    got = {r["url"]: (r["from"], r["referer"]) for r in out.collect()}
    assert got["http://a/"] == ("U", None)       # missing cols null-filled
    assert got["http://b/"] == ("E", "http://a/")


def test_is_vip(spark):
    df = spark.createDataFrame(
        [
            ("U", "http://x.com/deep/page"),
            ("E", "http://x.com/"),          # homepage
            ("E", "http://x.com/deep"),
        ],
        "from string, url string",
    )
    got = [r["v"] for r in df.select(
        sel.is_vip(F.col("from"), F.col("url")).alias("v")
    ).collect()]
    assert got == [True, True, False]


def test_search_page_limits(spark):
    df = spark.createDataFrame(
        [
            ("www.google.com", "q=x&start=0"),    # page 1
            ("www.google.com", "q=x&start=50"),   # page 6
            ("www.baidu.com", "wd=x&pn=10"),      # page 2
            ("www.sogou.com", "query=x&page=9"),  # page 9
            ("other.com", "whatever=1"),          # non-search → page 1
        ],
        "host string, query string",
    )
    kept = sel.keep_first_n_search_pages(df, n=3)
    got = {(r["host"], r["query"]) for r in kept.collect()}
    assert ("www.google.com", "q=x&start=0") in got
    assert ("www.google.com", "q=x&start=50") not in got
    assert ("www.baidu.com", "wd=x&pn=10") in got
    assert ("www.sogou.com", "query=x&page=9") not in got
    assert ("other.com", "whatever=1") in got


def test_url_transforms(spark):
    df = spark.createDataFrame(
        [
            ("http://x.com/a TEL:12345",),
            ("http://x.com/page#!/sec/1",),
            ("http://www.baidu.com/link?url=http%3A%2F%2Ftarget.com%2Fp",),
            ("http://plain.com/x",),
            # NOT a redirect host: the url= param must NOT replace the url
            ("http://shop.com/item?url=42",),
            # mixed-case Tel: is NOT stripped (reference matches the four
            # exact-case literals only, mr_selector_r1_mapper.cc:374-387)
            ("http://en.example.org/wiki/Tel:_A_Novel",),
        ],
        "url string",
    )
    out = df.select(
        sel.strip_tel_qq(F.col("url")).alias("t1"),
        sel.transform_ajax_url(F.col("url")).alias("t2"),
        sel.unwrap_redirect_target(F.col("url")).alias("t3"),
    ).collect()
    assert out[0]["t1"] == "http://x.com/a "
    assert out[1]["t2"] == "http://x.com/page?_escaped_fragment_=/sec/1"
    assert out[2]["t3"] == "http://target.com/p"
    assert out[3]["t3"] == "http://plain.com/x"
    assert out[4]["t3"] == "http://shop.com/item?url=42"
    assert out[5]["t1"] == "http://en.example.org/wiki/Tel:_A_Novel"


def test_dns_and_ip_attach(spark):
    hosts = spark.createDataFrame(
        [("a.com",), ("b.com",)], "host string"
    )
    dns = sel.synthetic_dns(spark, hosts)
    rows = {r["host"]: r["ips"] for r in dns.collect()}
    assert set(rows) == {"a.com", "b.com"}
    assert all(1 <= len(v) <= 3 for v in rows.values())
    # attach is deterministic and stays within the dim's ips
    urls = spark.createDataFrame(
        [("http://a.com/1", "a.com"), ("http://a.com/2", "a.com"),
         ("http://nodns.com/", "nodns.com")],
        "url string, host string",
    )
    out = sel.attach_ip(urls, dns)
    got = {r["url"]: r["ip"] for r in out.collect()}
    assert got["http://a.com/1"] in rows["a.com"]
    assert got["http://nodns.com/"] is None
    again = {r["url"]: r["ip"] for r in sel.attach_ip(urls, dns).collect()}
    assert got == again


def test_proxy_route(spark):
    rows = [("http://big/%d" % i, "1.1.1.1", "big.com") for i in range(20)]
    rows += [("http://small/1", "2.2.2.2", "small.com")]
    rows += [("http://wl/1", "3.3.3.3", "white.com")]
    df = spark.createDataFrame(rows, "url string, ip string, domain string")
    out = sel.proxy_route(df, threshold=10, proxy_domains=["white.com"])
    got = {r["url"]: r["use_proxy"] for r in out.collect()}
    assert got["http://big/0"] == "PROXY"       # over threshold
    assert got["http://small/1"] == "DIRECT"
    assert got["http://wl/1"] == "PROXY"        # whitelist domain


def test_ip_load_estimate(spark):
    urls = spark.createDataFrame(
        [("u%d" % i, "1.1.1.1") for i in range(30)]
        + [("v1", "2.2.2.2")],
        "url string, ip string",
    )
    loads = spark.createDataFrame([("1.1.1.1", 10.0)], "ip string, qps double")
    out = {r["ip"]: r["cost"]
           for r in sel.ip_load_estimate(urls, loads).collect()}
    assert out["1.1.1.1"] == 3.0      # 30 urls / 10 qps
    assert abs(out["2.2.2.2"] - 1 / 3.0) < 1e-9  # default qps 3


def test_updater_candidates(spark):
    hdr_old = "HTTP/1.1 200 OK\r\nLast-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
    hdr_new = "HTTP/1.1 200 OK\r\nDate: Mon, 29 Jul 2024 00:00:00 GMT\r\n"
    now = 1722384000  # 2024-07-31
    lb = spark.createDataFrame(
        [
            ("http://old.com/", hdr_old, now - 100),
            ("http://new.com/", hdr_new, now - 100),
            ("http://nohdr.com/", "", now - 30 * 86400),
        ],
        "url string, http_header string, last_fetch_ts long",
    )
    out = sel.updater_candidates(lb, now_ts=now, max_age_s=7 * 86400)
    got = {r["url"]: r["from"] for r in out.collect()}
    assert "http://old.com/" in got           # last-modified Jan → stale
    assert got["http://old.com/"] == "M"
    assert "http://new.com/" not in got       # fresh Date header
    assert "http://nohdr.com/" in got         # falls back to fetch ts


def test_crawl_success_eval(spark):
    topn = spark.createDataFrame(
        [("http://u%d/" % i, i) for i in range(20)], "url string, rank int"
    )
    crawled = spark.createDataFrame(
        [("http://u%d/" % i,) for i in range(10)], "url string"
    )
    out = {r["decile"]: r["success_rate"]
           for r in sel.crawl_success_eval(topn, crawled).collect()}
    assert out[0] == 1.0
    assert out[1] == 0.0


def test_search_page_null_query_is_page_one(spark):
    """A search-host row with NULL query (the engine homepage) is page 1,
    not silently dropped by the NULL propagating through the filter."""
    df = spark.createDataFrame(
        [("http://www.google.com/", "www.google.com", None),
         ("http://www.google.com/search", "www.google.com", "start=50")],
        "url string, host string, query string",
    )
    kept = sel.keep_first_n_search_pages(df, n=3).collect()
    assert {r["url"] for r in kept} == {"http://www.google.com/"}


def test_proxy_route_null_ips_bypass_window(spark):
    """Unresolved (NULL ip) rows must not pool into one pseudo-ip group:
    they bypass the window (DIRECT unless domain-whitelisted) and the
    window's input subtree filters to non-null ips."""
    rows = [(f"u{i}", None if i < 6 else "9.9.9.9", "x.com")
            for i in range(10)]
    urls = spark.createDataFrame(
        rows, "o string, ip string, domain string")
    out = sel.proxy_route(urls, threshold=3)
    got = {(r["o"]): r["use_proxy"] for r in out.collect()}
    assert all(got[f"u{i}"] == "DIRECT" for i in range(6))   # nulls bypass
    assert all(got[f"u{i}"] == "PROXY" for i in range(6, 10))  # 4 >= 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(ip" in plan, plan


def test_extract_rule_whitelist(spark):
    """E3 whitelist (extractor.cc:202-281, url_extract_rule.h): first rule
    matching the REFERER's (host, path) globs gates outlinks by target
    FullMatch; unmatched referers emit freely; NULL referers bypass."""
    from spider_spark.selector import apply_extract_rules

    rules = [
        ("*.shop.com", "/list/*", r"http://[a-z]+\.shop\.com/item/\d+"),
        ("news.com", "*", r"http://news\.com/.*"),
    ]
    rows = [
        ("http://x.shop.com/item/42", "http://a.shop.com/list/1"),    # keep
        ("http://x.shop.com/cart", "http://a.shop.com/list/1"),       # drop
        ("http://x.shop.com/item/42z", "http://a.shop.com/list/1"),   # drop
        ("http://anything.com/x", "http://a.shop.com/other"),         # keep
        ("http://news.com/a", "http://news.com/section"),             # keep
        ("http://other.com/a", "http://news.com/section"),            # drop
        ("http://other.com/b", None),                                 # keep
    ]
    cand = spark.createDataFrame(rows, "url string, referer string")
    got = {(r["url"], r["referer"])
           for r in apply_extract_rules(cand, rules).collect()}
    assert got == {
        ("http://x.shop.com/item/42", "http://a.shop.com/list/1"),
        ("http://anything.com/x", "http://a.shop.com/other"),
        ("http://news.com/a", "http://news.com/section"),
        ("http://other.com/b", None),
    }
    # no rules → pass-through
    assert apply_extract_rules(cand, None).count() == len(rows)


def test_merge_dns_with_blacklist(spark):
    """L5 resolver merge (merge_dns.py): union per-host ip lists (primary
    order first, secondary's new ips appended), then drop blacklisted
    ips per host."""
    from spider_spark.selector import merge_dns

    a = spark.createDataFrame(
        [("h1", ["1.1.1.1", "2.2.2.2"]), ("h2", ["3.3.3.3"])],
        "host string, ips array<string>",
    )
    b = spark.createDataFrame(
        [("h1", ["2.2.2.2", "4.4.4.4"]), ("h3", ["5.5.5.5"])],
        "host string, ips array<string>",
    )
    bl = spark.createDataFrame(
        [("h1", ["1.1.1.1"])], "host string, bad_ips array<string>"
    )
    got = {r["host"]: list(r["ips"])
           for r in merge_dns(a, b, bl).collect()}
    assert got == {
        "h1": ["2.2.2.2", "4.4.4.4"],   # union minus blacklisted 1.1.1.1
        "h2": ["3.3.3.3"],
        "h3": ["5.5.5.5"],
    }


def test_extract_rules_pathless_and_case_referers(spark):
    """A pathless referer maps to path '/' and hosts compare lowercased —
    previously try_parse_url's '' path made the '/*' rule unmatched and a
    mixed-case referer host bypassed its rule (whitelist bypass)."""
    from spider_spark.selector import apply_extract_rules

    rules = [("*.shop.com", "/*", r"http://ok\.com/\d+")]
    rows = [
        ("http://ok.com/1", "http://ref.shop.com"),         # pathless ref
        ("http://evil.com/x", "http://ref.shop.com"),       # must drop
        ("http://ok.com/2", "http://REF.Shop.COM/a"),       # mixed case
        ("http://evil.com/y", "http://REF.Shop.COM/a"),     # must drop
    ]
    cand = spark.createDataFrame(rows, "url string, referer string")
    got = {(r["url"], r["referer"])
           for r in apply_extract_rules(cand, rules).collect()}
    assert got == {
        ("http://ok.com/1", "http://ref.shop.com"),
        ("http://ok.com/2", "http://REF.Shop.COM/a"),
    }
