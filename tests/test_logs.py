"""Log-analytics operators (J5/J6, A5-A7, session segmentation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import logs


def test_resolve_md5_urls_latest_wins(spark):
    pv = spark.createDataFrame(
        [("m1", "r1"), ("m2", None)], "url_md5 string, ref_md5 string"
    )
    md5_map = spark.createDataFrame(
        [
            ("m1", "http://a.com/old", 1),
            ("m1", "http://a.com/new", 5),   # latest ts wins (pv_r1.cc:244)
            ("r1", "http://ref.com/", 2),
        ],
        "md5 string, url string, ts int",
    )
    out = logs.resolve_md5_urls(pv, md5_map).collect()
    row = [r for r in out if r["url_md5"] == "m1"][0]
    assert row["url_literal"] == "http://a.com/new"
    assert row["ref_literal"] == "http://ref.com/"
    row2 = [r for r in out if r["url_md5"] == "m2"][0]
    assert row2["url_literal"] is None


def test_search_click_join_drops_ads(spark):
    search = spark.createDataFrame(
        [("u1", "http://x/", "q", 3), ("u1", "http://y/", "q", 11)],
        "uid string, url string, query string, rank int",
    )
    pv = spark.createDataFrame(
        [("u1", "http://x/", 100), ("u1", "http://y/", 100)],
        "uid string, url string, ts int",
    )
    out = logs.search_click_join(search, pv).collect()
    assert len(out) == 1                       # rank 11 > 10 dropped (ads)
    assert out[0]["url"] == "http://x/"


def test_query_user_counts_exact_vs_approx(spark):
    search = spark.createDataFrame(
        [("q1", f"u{i % 7}") for i in range(50)] + [("q2", "u1")],
        "query string, uid string",
    )
    exact = {r["query"]: r["n_users"]
             for r in logs.query_user_counts(search).collect()}
    assert exact == {"q1": 7, "q2": 1}
    approx = {r["query"]: r["n_users"]
              for r in logs.query_user_counts(search, approximate=True).collect()}
    assert abs(approx["q1"] - 7) <= 1          # HLL within tolerance


def test_sessionize_gaps(spark):
    # uid u1: hits at 0s, 100s, 500s (gap 400 > 300 → new session),
    # 520s with referer (gap 20 < 1800 → same session)
    pv = spark.createDataFrame(
        [
            ("u1", 0.0, None),
            ("u1", 100.0, None),
            ("u1", 500.0, None),
            ("u1", 520.0, "http://r/"),
            ("u2", 0.0, None),
        ],
        "uid string, ts double, ref string",
    )
    out = logs.sessionize(pv, no_ref_gap=300.0, ref_gap=1800.0)
    got = {(r["uid"], r["ts"]): r["session_id"] for r in out.collect()}
    assert got[("u1", 0.0)] == 0
    assert got[("u1", 100.0)] == 0
    assert got[("u1", 500.0)] == 1
    assert got[("u1", 520.0)] == 1
    assert got[("u2", 0.0)] == 0


def test_graph_signal_enrich(spark):
    """J9 (extractor.cc:99-199): uv/click/query/anchor blobs attach by url
    sign; failed fetches keep NULL signals."""
    from spider_spark.logs import build_graph_signals, enrich_graph_signals

    uv = spark.createDataFrame(
        [("http://x.com/a", 7.5), ("http://x.com/b", 1.0)],
        "url string, uv_rank double",
    )
    clicks = spark.createDataFrame(
        [("http://x.com/a", 3.0)], "url string, click_rank double"
    )
    queries = spark.createDataFrame(
        [("http://x.com/a", "q2"), ("http://x.com/a", "q1")],
        "url string, query string",
    )
    anchors = spark.createDataFrame(
        [("http://x.com/b", "anchor text")], "url string, anchor string"
    )
    signals = build_graph_signals(uv, clicks, queries, anchors)
    resources = spark.createDataFrame(
        [("http://x.com/a", True), ("http://x.com/b", False),
         ("http://x.com/c", True)],
        "url string, success boolean",
    )
    out = {r["url"]: r for r in
           enrich_graph_signals(resources, signals).collect()}
    assert out["http://x.com/a"]["uv_rank"] == 7.5
    assert out["http://x.com/a"]["click_rank"] == 3.0
    assert out["http://x.com/a"]["queries"] == ["q1", "q2"]
    assert out["http://x.com/a"]["anchors"] is None
    # failed fetch: signals masked to NULL (response_code gate)
    assert out["http://x.com/b"]["uv_rank"] is None
    assert out["http://x.com/b"]["anchors"] is None
    # url absent from the store: NULLs
    assert out["http://x.com/c"]["uv_rank"] is None


def test_resolve_md5_round2(spark):
    """pv_r2 (pv_r2.cc:60-101): compound-key-local md5 resolution — dest
    unresolved → dropped, ref unresolved → '', set-dedup."""
    from spider_spark.logs import resolve_md5_round2

    final = spark.createDataFrame(
        [("u1", 10, "http://a.com/x", "http://a.com/r")],
        "uid string, ts int, url string, ref_url string",
    )
    pending = spark.createDataFrame(
        [("u1", 10, "m1", "m2"),    # both resolve
         ("u1", 10, "m1", "m9"),    # ref unresolved → ''
         ("u1", 10, "m9", "m1"),    # dest unresolved → dropped
         ("u2", 20, "m1", "m2")],   # m1 not mapped under (u2,20) → dropped
        "uid string, ts int, url_md5 string, ref_md5 string",
    )
    local_map = spark.createDataFrame(
        [("u1", 10, "m1", "http://a.com/p1"),
         ("u1", 10, "m2", "http://a.com/p2")],
        "uid string, ts int, md5 string, url string",
    )
    rows = {tuple(r) for r in
            resolve_md5_round2(final, pending, local_map).collect()}
    assert rows == {
        ("u1", 10, "http://a.com/x", "http://a.com/r"),
        ("u1", 10, "http://a.com/p1", "http://a.com/p2"),
        ("u1", 10, "http://a.com/p1", ""),
    }


def test_pv_combine_merges_rounds(spark):
    from spider_spark.logs import pv_combine

    a = spark.createDataFrame([("u1", 2, "x"), ("u2", 1, "y")],
                              "uid string, ts int, url string")
    b = spark.createDataFrame([("u1", 1, "z")],
                              "uid string, ts int, url string")
    out = pv_combine(a, b)
    assert out.count() == 3
    # per-uid rows are ts-ordered within their partition
    part = out.filter(F.col("uid") == "u1").collect()
    assert [r["ts"] for r in part] == sorted(r["ts"] for r in part)


def test_search_click_join_composite_key(spark):
    """J6 full composite (search_pv_clk.cc:20-56): when pv rows carry the
    query, a click is attributed ONLY to its own query — not crossed to
    every query the user issued for that url."""
    search = spark.createDataFrame(
        [(1, "http://u/", "qa", 1), (1, "http://u/", "qb", 2)],
        "uid long, url string, query string, rank int",
    )
    pv = spark.createDataFrame(
        [(1, "http://u/", "qa", 3.5)],
        "uid long, url string, query string, dwell double",
    )
    out = logs.search_click_join(search, pv).collect()
    assert len(out) == 1 and out[0]["query"] == "qa"
    # reduced pv shape (no query col) degrades to (uid, url)
    pv2 = pv.drop("query")
    assert logs.search_click_join(search, pv2).count() == 2
