"""robots.txt parsing (L6 parse half) + URL categorizer gate (P8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import politeness as pol


def test_parse_robots_txt(spark):
    bodies = spark.createDataFrame(
        [
            ("all.com", "User-agent: *\nDisallow:\n"),
            ("block.com", "User-agent: *\nDisallow: /private\nDisallow: /tmp\n"),
            ("other.com", "User-agent: googlebot\nDisallow: /\n"),
            ("mine.com", "User-agent: spider\nDisallow: /secret\n"),
            ("empty.com", ""),
            ("cmt.com", "# just comments\nUser-agent: * # inline\nDisallow: /x # c\n"),
        ],
        "host string, body string",
    )
    out = {r["host"]: r.asDict()
           for r in pol.parse_robots_txt(bodies, agent="spider").collect()}
    assert out["all.com"]["has_robots"] and out["all.com"]["allow_all"]
    assert out["block.com"]["disallow_prefixes"] == ["/private", "/tmp"]
    assert not out["block.com"]["allow_all"]
    # group for another agent only → no group applies to us → allow
    assert out["other.com"]["allow_all"]
    assert out["mine.com"]["disallow_prefixes"] == ["/secret"]
    assert not out["empty.com"]["has_robots"]
    assert out["cmt.com"]["disallow_prefixes"] == ["/x"]


def test_parsed_rules_feed_robots_level(spark):
    bodies = spark.createDataFrame(
        [("b.com", "User-agent: *\nDisallow: /priv\n")], "host string, body string"
    )
    rules = pol.parse_robots_txt(bodies)
    urls = spark.createDataFrame(
        [("http://b.com/priv/x", "b.com", "/priv/x"),
         ("http://b.com/pub", "b.com", "/pub")],
        "url string, host string, path string",
    )
    got = {r["url"]: r["robots_level"]
           for r in pol.robots_level(urls, rules).collect()}
    assert got["http://b.com/priv/x"] == 0
    assert got["http://b.com/pub"] == 3


def test_categorize_and_gate(spark):
    rules = spark.createDataFrame(
        [(r"/list/", 150, 1), (r"/item/", 120, 2), (r"/junk/", 10, 3)],
        "pattern string, category_id int, rule_order int",
    )
    urls = spark.createDataFrame(
        [("http://x.com/list/1",), ("http://x.com/item/2",),
         ("http://x.com/junk/3",), ("http://x.com/other",)],
        "url string",
    )
    cat = pol.categorize_url(urls, rules)
    got = {r["url"]: r["category_id"] for r in cat.collect()}
    assert got["http://x.com/list/1"] == 150
    assert got["http://x.com/junk/3"] == 10
    assert got["http://x.com/other"] == 0

    special = spark.createDataFrame([("http://x.com/junk/3",)], "url string")
    kept = pol.category_gate(cat, threshold=100, keep_special=special)
    urls_kept = {r["url"] for r in kept.collect()}
    assert urls_kept == {
        "http://x.com/list/1", "http://x.com/item/2", "http://x.com/junk/3"
    }


def test_parse_robots_multi_agent_group(spark):
    """RFC 9309 group semantics: consecutive User-agent lines form ONE
    group — a matching UA line followed by a non-matching one must not
    drop the group's rules."""
    bodies = spark.createDataFrame(
        [
            ("grp.com", "User-agent: spider\nUser-agent: googlebot\n"
                        "Disallow: /admin\n"),
            ("grp2.com", "User-agent: googlebot\nUser-agent: spider\n"
                         "Disallow: /x\n"),
            ("two.com", "User-agent: googlebot\nDisallow: /g\n\n"
                        "User-agent: spider\nDisallow: /s\n"),
        ],
        "host string, body string",
    )
    out = {r["host"]: r.asDict()
           for r in pol.parse_robots_txt(bodies, agent="spider").collect()}
    assert out["grp.com"]["disallow_prefixes"] == ["/admin"]
    assert out["grp2.com"]["disallow_prefixes"] == ["/x"]
    assert out["two.com"]["disallow_prefixes"] == ["/s"]


def test_parse_robots_specific_overrides_star(spark):
    """A group naming the agent takes precedence over the `*` group
    (most-specific match): star rules must not leak into the result."""
    bodies = spark.createDataFrame(
        [
            ("pref.com", "User-agent: *\nDisallow: /all\n\n"
                         "User-agent: spider\nDisallow: /mine\n"),
            ("permit.com", "User-agent: *\nDisallow: /all\n\n"
                           "User-agent: spider\nDisallow:\n"),
        ],
        "host string, body string",
    )
    out = {r["host"]: r.asDict()
           for r in pol.parse_robots_txt(bodies, agent="spider").collect()}
    assert out["pref.com"]["disallow_prefixes"] == ["/mine"]
    # explicit empty Disallow in the specific group = allow-all for us
    assert out["permit.com"]["allow_all"]
    assert out["permit.com"]["disallow_prefixes"] == []
