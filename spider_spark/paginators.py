"""E4 — concrete per-site list-page paginators.

The reference hard-codes next-list-page builders for four e-commerce
sites in the extractor loop (crawler2/general_crawler/extractor.cc:
440-551) with the URL/page-count mechanics in util/url_util.cc. Each
builder is two halves:

1. page-count extraction from the FETCHED page content
   (`GetPageNumFrom*ListPage`, url_util.cc:953-1011; taobao's list page
   is JSON and carries the count as a field, extractor.cc:442-460);
2. next-url construction from the FIRST list url + the count
   (`BuildNextNUrl` url_util.cc:654-677, `GetJingDongNextUrl`
   url_util.cc:1013-1041, `GetSuNingNextUrl` url_util.cc:1050-1076).

Spark-first re-expression: both halves are pure column expressions —
per-host `regexp_extract` / `get_json_object` for the counts (JVM-side,
whole-stage-codegen'd; no Python touches page content), and
`sequence → transform → explode` for the URL fan-out. The generic
extension point stays in `selector.paginate_list_urls`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# gate markers the reference uses to recognise an ALREADY-paginated url
_JD_EXTRA = "-0-0-0-0-0-0-0-1-1-"            # url_util.cc:1020
_SUNING_EXTRA = "&il=0&si=5&st=14&iy=-1"      # url_util.cc:1064
# 大家电 (large-appliance) lists carry a longer tail (url_util.cc:1030-1034)
_JD_APPLIANCE_RE = r"^http://www\.360buy\.com/products/737-794-.*\.html$"
_JD_LIST_RE = r"^http://www\.360buy\.com/products/.*\.html$"
_SUNING_LIST_RE = (
    r"^http://search\.suning\.com/emall/"
    r"(strd\.do\?ci=\d+&cityId=\d+|s?trd\.do\?ci=\d+|pcd\.do\?ci=\d+"
    r"|search\.do\?keyword=.*)$"
)  # url_util.cc:1053-1056

# page-count patterns (url_util.cc:960, 980, 1000)
_TMALL_COUNT_RE = r"共(\d+)页"
_JD_COUNT_RE = (
    r'<a href="[-\d]+.html" >(\d+)</a>'
    r'<a href="[-\d]+.html" class="next" >下一页<b></b></a>'
)
_SUNING_COUNT_RE = (
    r'<span><i id="pageThis">\d+</i>/<i id="pageTotal">(\d+)</i></span>'
)


def _host(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("HOST"))


def _query(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))


def extract_list_page_count(docs: DataFrame, url_col: str = "url",
                            content_col: str = "content") -> DataFrame:
    """Attach ``page_num`` (int, NULL = not a recognised list page) from
    the fetched content, per-site (extractor.cc:442-551 dispatch):

    - ``list.taobao.com`` — JSON list page, count in the payload
      (``ParseJsonFormatPage``): ``get_json_object($.page_num)``;
    - ``list.tmall.com`` — HTML "共N页" (url_util.cc:953-971);
    - ``www.360buy.com/products/*.html`` — pager anchor chain
      (url_util.cc:973-991);
    - ``search.suning.com`` — pageThis/pageTotal span (url_util.cc:993-1011).
    """
    url, content = F.col(url_col), F.col(content_col)
    host = _host(url)
    count_str = (
        F.when(host == "list.taobao.com",
               F.get_json_object(content, "$.page_num"))
        .when(host == "list.tmall.com",
              F.regexp_extract(content, _TMALL_COUNT_RE, 1))
        .when(url.rlike(_JD_LIST_RE),
              F.regexp_extract(content, _JD_COUNT_RE, 1))
        .when(host == "search.suning.com",
              F.regexp_extract(content, _SUNING_COUNT_RE, 1))
    )
    return docs.withColumn(
        "page_num",
        F.when(count_str == "", None).otherwise(count_str).cast("int"),
    )


def _strip_param_base(url: Column, param_prefix: str) -> Column:
    """Rebuild ``http://host/path?rest-of-query`` with every ``prefix…``
    query part dropped and each kept part re-appended verbatim + '&'
    (preserving the reference's literal string build, url_util.cc:
    654-677 / 680-701)."""
    parts = F.split(_query(url), "&")
    kept = F.filter(parts, lambda p: ~p.startswith(param_prefix))
    new_query = F.concat_ws("", F.transform(kept, lambda p: F.concat(p, F.lit("&"))))
    return F.concat(F.lit("http://"), _host(url),
                    F.try_parse_url(url, F.lit("PATH")), F.lit("?"), new_query)


def _offset_next_urls(url: Column, n_build: Column,
                      item_num: int) -> Column:
    """BuildNextNUrl (url_util.cc:654-677): drop any ``s=`` query part,
    then one url per page with ``s=K*item_num``."""
    base = _strip_param_base(url, "s=")
    return F.transform(
        F.sequence(F.lit(1), n_build),
        lambda i: F.concat(base, F.lit("s="),
                           (i * item_num).cast("string")),
    )


# blast-radius ceiling for the uncapped JD/suning branches: page_num is
# PARSED FROM FETCHED CONTENT, so a garbage/hostile page claiming 2^30
# pages would otherwise materialize a 10^9-element array in one row (the
# reference's uncapped loop streams URLs one at a time and has no such
# failure mode). Far above any real pagination — a deliberate, documented
# deviation, NOT FLAGS_build_max_n_url (which caps only taobao/tmall).
PAGE_NUM_SANITY_CEILING = 100_000


def build_next_list_pages(df: DataFrame, url_col: str = "url",
                          page_num_col: str = "page_num",
                          max_build: int = 10) -> DataFrame:
    """Fan a recognised first-list-page out to its next-page urls —
    ``(list_url, site, next_url)``, one row per built url.

    Gates mirror the extractor (extractor.cc:455-551): a page is only
    fanned out if it reports >1 pages and its url is NOT itself a built
    pagination url (the ``s=`` / JD-extra / suning-extra markers), so the
    fan-out cannot cascade. ``max_build`` is FLAGS_build_max_n_url and
    caps ONLY the taobao/tmall branches — the extractor passes
    ``page_num-1`` uncapped to GetJingDongNextUrl / GetSuNingNextUrl
    (extractor.cc:521,546; url_util.cc:1030,1066).
    """
    url = F.col(url_col)
    page_num = F.least(F.col(page_num_col),
                       F.lit(PAGE_NUM_SANITY_CEILING))
    host, query = _host(url), _query(url)
    n_cap = F.least(page_num, F.lit(max_build)) - 1

    taobao_ok = (
        (host == "list.taobao.com") & ~query.contains("&s=")
    )  # extractor.cc:455-459
    tmall_ok = (
        (host == "list.tmall.com")
        & (~query.contains("&s=") | query.contains("&s=0"))
    )  # extractor.cc:490-494
    jd_ok = (
        url.rlike(_JD_LIST_RE) & ~url.contains(_JD_EXTRA)
    )  # extractor.cc:504-506, url_util.cc:1019-1022
    suning_ok = (
        url.rlike(_SUNING_LIST_RE) & ~query.contains(_SUNING_EXTRA)
    )  # extractor.cc:529-531, url_util.cc:1052-1064

    # jingdong: replace the trailing .html with extra+i(.html | -1-72-33.html)
    jd_tail = F.when(url.rlike(_JD_APPLIANCE_RE), F.lit("-1-72-33.html")) \
               .otherwise(F.lit(".html"))
    jd_urls = F.transform(
        F.sequence(F.lit(2), page_num),
        lambda i: F.concat(
            F.regexp_replace(url, r"\.html$", ""),
            F.lit(_JD_EXTRA), i.cast("string"), jd_tail,
        ),
    )  # url_util.cc:1028-1039: i in [2, 2+(page_num-1)) — uncapped
    suning_urls = F.transform(
        F.sequence(F.lit(1), page_num - 1),
        lambda i: F.concat(url, F.lit("&cp="), i.cast("string"),
                           F.lit(_SUNING_EXTRA)),
    )  # url_util.cc:1069-1071: i in [1, 1+(page_num-1)) — uncapped

    built = (
        F.when(taobao_ok, _offset_next_urls(url, n_cap, 96))
        .when(tmall_ok, _offset_next_urls(url, n_cap, 60))  # extractor.cc:496
        .when(jd_ok, jd_urls)
        .when(suning_ok, suning_urls)
    )
    site = (
        F.when(taobao_ok, "taobao").when(tmall_ok, "tmall")
        .when(jd_ok, "jingdong").when(suning_ok, "suning")
    )
    return (
        df.filter(page_num > 1)
        .select(url.alias("list_url"), site.alias("site"),
                built.alias("_built"))
        .filter(F.col("site").isNotNull())
        .select("list_url", "site", F.explode("_built").alias("next_url"))
    )


TAOBAO_SORTS = ("biz30day", "coefp", "ratesum", "_oldstart", "bid")


def taobao_sort_variants(df: DataFrame, url_col: str = "url") -> DataFrame:
    """BuildTaobaoDifferentSortType (url_util.cc:680-701): taobao lists
    show at most 100 pages, so the reference re-lists under each sort
    order to reach more items — strip any ``sort=`` part, emit one url
    per sort key."""
    url = F.col(url_col)
    base = _strip_param_base(url, "sort=")
    variants = F.array(*[F.concat(base, F.lit("sort="), F.lit(s))
                         for s in TAOBAO_SORTS])
    return df.select(url.alias("list_url"),
                     F.explode(variants).alias("sorted_url"))


def taobao_pc_to_mobile(url: Column) -> Column:
    """ConvertTaobaoUrlFromPCToMobile (url_util.cc:540-596): item-detail
    urls on ``item.taobao.com``/``detail.tmall.com`` map to the mobile
    ``http://a.m.<site>.com/i<itemId>.htm`` form; NULL when the url is
    not a convertible item page. itemId comes from ``id=`` on
    ``/item.htm`` and ``mallstItemId=`` on ``/venus/spu_detail.htm``."""
    host = _host(url)
    path = F.try_parse_url(url, F.lit("PATH"))
    m_host = (
        F.when(host == "item.taobao.com", "a.m.taobao.com")
        .when(host == "detail.tmall.com", "a.m.tmall.com")
    )
    item_id = (
        F.when(path == "/item.htm",
               F.try_parse_url(url, F.lit("QUERY"), F.lit("id")))
        .when(path == "/venus/spu_detail.htm",
              F.try_parse_url(url, F.lit("QUERY"), F.lit("mallstItemId")))
    )
    ok = m_host.isNotNull() & item_id.rlike(r"^\d+$")
    return F.when(
        ok, F.concat(F.lit("http://"), m_host, F.lit("/i"), item_id,
                     F.lit(".htm"))
    )
