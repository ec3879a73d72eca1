"""E4 site paginators vs hand-computed reference semantics.

Expected values are derived by executing the reference's string
mechanics by hand (url_util.cc:654-677, 1013-1076; extractor.cc
dispatch gates) — each case cites the line it mirrors.
"""

from __future__ import annotations

from spider_spark import paginators as P


def _built(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, page_num int")
    out = P.build_next_list_pages(df, **kw).collect()
    return {(r.list_url, r.site, r.next_url) for r in out}


def test_taobao_offset_pages(spark):
    # BuildNextNUrl: s= stripped, parts re-joined each+'&', s=K*96 appended
    url = "http://list.taobao.com/market/baby.htm?cat=50032645&sort=default"
    got = _built(spark, [(url, 3)])
    base = "http://list.taobao.com/market/baby.htm?cat=50032645&sort=default&"
    assert got == {
        (url, "taobao", base + "s=96"),
        (url, "taobao", base + "s=192"),
    }


def test_taobao_already_paginated_gate(spark):
    # extractor.cc:457: query containing '&s=' is itself a built url
    url = "http://list.taobao.com/market/baby.htm?cat=50032645&s=96"
    assert _built(spark, [(url, 5)]) == set()


def test_tmall_s0_allowed_and_item_num_60(spark):
    # extractor.cc:492-496: '&s=0' still fans out; item_num=60
    url = "http://list.tmall.com/search_product.htm?cat=50025135&s=0"
    got = _built(spark, [(url, 2)])
    assert got == {
        (url, "tmall",
         "http://list.tmall.com/search_product.htm?cat=50025135&s=60"),
    }


def test_jingdong_suffix_rewrite(spark):
    # GetJingDongNextUrl: .html -> -0-0-0-0-0-0-0-1-1-<i>.html, i in 2..page_num
    url = "http://www.360buy.com/products/670-671-672.html"
    got = _built(spark, [(url, 3)])
    stem = "http://www.360buy.com/products/670-671-672-0-0-0-0-0-0-0-1-1-"
    assert got == {
        (url, "jingdong", stem + "2.html"),
        (url, "jingdong", stem + "3.html"),
    }


def test_jingdong_appliance_tail_and_gate(spark):
    # url_util.cc:1030-1034: 737-794-* lists get the -1-72-33 tail;
    # url_util.cc:1019-1022: urls already carrying the extra are dropped
    first = "http://www.360buy.com/products/737-794-798.html"
    built = "http://www.360buy.com/products/737-794-798-0-0-0-0-0-0-0-1-1-2-1-72-33.html"
    got = _built(spark, [(first, 2), (built, 9)])
    assert got == {
        (first, "jingdong",
         "http://www.360buy.com/products/737-794-798-0-0-0-0-0-0-0-1-1-2-1-72-33.html"),
    }


def test_suning_append_and_gate(spark):
    # GetSuNingNextUrl: append &cp=<i>&il=0&si=5&st=14&iy=-1, i in 1..page_num-1
    url = "http://search.suning.com/emall/strd.do?ci=289505&cityId=9173"
    done = url + "&cp=1&il=0&si=5&st=14&iy=-1"
    got = _built(spark, [(url, 3), (done, 3)])
    assert got == {
        (url, "suning", url + "&cp=1&il=0&si=5&st=14&iy=-1"),
        (url, "suning", url + "&cp=2&il=0&si=5&st=14&iy=-1"),
    }


def test_max_build_cap_and_single_page(spark):
    url = "http://list.taobao.com/market/x.htm?cat=1"
    got = _built(spark, [(url, 100)], max_build=3)
    assert len(got) == 2  # n_cap = min(100, 3) - 1
    assert _built(spark, [(url, 1)]) == set()  # page_num <= 1: no fan-out


def test_extract_page_counts(spark):
    rows = [
        ("http://list.tmall.com/search_product.htm?cat=1",
         "<div>共" + "7" + "页</div>"),
        ("http://www.360buy.com/products/670-671-672.html",
         '<a href="670-671-672-0-0-0-0-0-0-0-1-1-9.html" >9</a>'
         '<a href="670-671-672-0-0-0-0-0-0-0-1-1-2.html" class="next" >'
         "下一页<b></b></a>"),
        ("http://search.suning.com/emall/strd.do?ci=2&cityId=9",
         '<span><i id="pageThis">1</i>/<i id="pageTotal">12</i></span>'),
        ("http://list.taobao.com/market/baby.htm?cat=5",
         '{"page_num": 4, "items": []}'),
        ("http://other.example.com/x", "plain page"),
    ]
    df = spark.createDataFrame(rows, "url string, content string")
    got = {r.url: r.page_num
           for r in P.extract_list_page_count(df).collect()}
    assert got == {
        rows[0][0]: 7, rows[1][0]: 9, rows[2][0]: 12, rows[3][0]: 4,
        rows[4][0]: None,
    }


def test_extract_then_build_compose(spark):
    df = spark.createDataFrame(
        [("http://search.suning.com/emall/strd.do?ci=2&cityId=9",
          '<span><i id="pageThis">1</i>/<i id="pageTotal">3</i></span>')],
        "url string, content string")
    out = P.build_next_list_pages(P.extract_list_page_count(df)).collect()
    assert sorted(r.next_url[-26:] for r in out) == [
        "&cp=1&il=0&si=5&st=14&iy=-1"[-26:],
        "&cp=2&il=0&si=5&st=14&iy=-1"[-26:],
    ]


def test_taobao_sort_variants(spark):
    url = "http://list.taobao.com/market/baby.htm?cat=5&sort=default"
    df = spark.createDataFrame([(url,)], "url string")
    got = {r.sorted_url for r in P.taobao_sort_variants(df).collect()}
    base = "http://list.taobao.com/market/baby.htm?cat=5&"
    assert got == {base + "sort=" + s for s in P.TAOBAO_SORTS}


def test_taobao_pc_to_mobile(spark):
    from pyspark.sql import functions as F
    rows = [
        ("http://item.taobao.com/item.htm?spm=1.2&id=16600551819",),
        ("http://detail.tmall.com/item.htm?id=123&is_b=1",),
        ("http://detail.tmall.com/venus/spu_detail.htm?spu_id=2&mallstItemId=164836",),
        ("http://item.taobao.com/other.htm?id=5",),
        ("http://www.example.com/item.htm?id=5",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r.m for r in df.select(
        P.taobao_pc_to_mobile(F.col("url")).alias("m")).collect()]
    assert got == [
        "http://a.m.taobao.com/i16600551819.htm",
        "http://a.m.tmall.com/i123.htm",
        "http://a.m.tmall.com/i164836.htm",
        None,
        None,
    ]


def test_jd_suning_uncapped_beyond_max_build(spark):
    # extractor.cc:521,546 passes page_num-1 UNCAPPED to the JD/suning
    # builders; FLAGS_build_max_n_url caps only taobao/tmall
    jd = "http://www.360buy.com/products/670-671-672.html"
    sn = "http://search.suning.com/emall/strd.do?ci=2&cityId=9"
    got = _built(spark, [(jd, 7), (sn, 7)], max_build=3)
    assert len({t for t in got if t[1] == "jingdong"}) == 6  # pages 2..7
    assert len({t for t in got if t[1] == "suning"}) == 6    # cp 1..6
    # taobao stays capped at max_build
    tb = "http://list.taobao.com/market/x.htm?cat=1"
    got_tb = _built(spark, [(tb, 7)], max_build=3)
    assert len(got_tb) == 2  # min(7, 3) - 1


def test_page_num_sanity_ceiling(spark):
    """A hostile/garbage page claiming 2^30 pages must not materialize a
    billion-element array — the fan-out is bounded by the documented
    ceiling (a deliberate deviation; real pagination is ≪ 10^5)."""
    sn = "http://search.suning.com/emall/strd.do?ci=2&cityId=9"
    df = spark.createDataFrame([(sn, 1 << 30)], "url string, page_num int")
    n = P.build_next_list_pages(df).count()
    assert n == P.PAGE_NUM_SANITY_CEILING - 1
