"""Selector / scheduler operators completing SURVEY §2 coverage:
multi-source frontier union, VIP gating, search-page limits, URL
transforms, proxy routing, DNS dim, updater recrawl, evaluation.

All cites into /root/reference:

- U2  multi-source union with ``from`` codes
  (selector/mr_selector_r1_mapper.cc:127-440; codes U,P,S,N,E,L,M,A,V,K
  crawler/proto/crawled_resource.proto:41-50)
- P9  VIP URLs always crawl (crawler_selector_util.h:21-34)
- P10 search-result page-N keep (crawler_selector_util.h:36-63)
- P11 TEL:/QQ: suffix strip (mr_selector_r1_mapper.cc:370-387)
- P12 AJAX #! → _escaped_fragment_ (crawl/crawl_util.h:6-10)
- P13 redirect-target unwrap (log_analysis/common/baidu_target_url.cc,
  google_target_url.cc)
- L3  per-ip URL-count proxy routing (control/schedule/ip_url_split.cc:64-119)
- L5  DNS host→ip dim (util/dns_resolve.h:13-50 — synthetic deterministic)
- A4  ip load / time-to-crawl (control/schedule/ip_stat.cc:37-79)
- J1  ip attach with deterministic pick (control/schedule/url_to_ip.cc:53-91)
- U5  updater: stale-page recrawl from stored headers
  (updater/mr_updater_mapper.cc:40-75)
- A10 crawl-success evaluation (evaluation/evaluation.h:7-30)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# source codes, crawled_resource.proto:41-50 / mr_selector_r1_mapper.cc:118-125
FROM_CODES = {
    "seed": "U", "pagebase": "P", "search_log": "S", "navi_boost": "N",
    "newlink": "E", "linkbase": "L", "updater": "M", "uv_rank": "A",
    "vip": "V", "click_rank": "K",
}
# dispatcher source rank: E > S > A (reducer_compress_control.cc:40-61)
FROM_RANK = {"E": 0, "S": 1, "A": 2, "U": 3, "V": 3, "K": 4, "N": 5,
             "P": 6, "L": 7, "M": 8}


def union_sources(sources: dict[str, DataFrame]) -> DataFrame:
    """U2: union per-source frontiers, each tagged with its ``from`` code.
    Every input needs a ``url`` column; extra columns are name-aligned
    (missing ones null-filled)."""
    tagged = []
    for kind, df in sorted(sources.items()):
        code = FROM_CODES.get(kind, kind)
        tagged.append(df.withColumn("from", F.lit(code)))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t, allowMissingColumns=True)
    return out


def from_rank(from_col: Column) -> Column:
    """Source-priority rank for the dispatcher comparator."""
    expr = F.lit(9)
    for code, rank in FROM_RANK.items():
        expr = F.when(from_col == code, F.lit(rank)).otherwise(expr)
    return expr


def is_vip(from_col: Column, url: Column) -> Column:
    """P9: VIP = seeds, search-click pages, site homepages — always crawl
    (bypasses the seen-drop in J4). Updater recrawl tasks ('M') share the
    bypass: with FLAGS_not_crawle_already_in_linkbase unset the selector
    re-crawls linkbase-resident urls for any non-L/V source
    (mr_selector_r1_reducer.cc:64-86) — refreshing seen pages is the
    updater's whole purpose."""
    homepage = url.rlike(r"^[a-z]+://[^/]+/$")
    return from_col.isin("U", "V", "S", "K", "M") | homepage


# host → (page param, mode, step) — IsGeneralSearchFirstNPage /
# IsVerticalSearchFirstNPage (crawler_selector_util.cc:547-682, vectors
# ported in test_selector): 'offset' params are zero-based result offsets
# (page = off/step + 1; news.baidu.com shows 20 results/page), 'first' is
# bing's ONE-based offset (page p starts at first = (p-1)*10 + 1, so the
# keep bound is first ≤ (N-1)*10 + 1), 'page' is the page number itself.
_SEARCH_PAGE_PARAMS = {
    "www.google.com": ("start", "offset", 10),
    "www.google.com.hk": ("start", "offset", 10),
    "www.baidu.com": ("pn", "offset", 10),
    "news.baidu.com": ("pn", "offset", 20),
    "zhidao.baidu.com": ("pn", "offset", 10),
    "baike.baidu.com": ("pn", "offset", 10),
    "wenku.baidu.com": ("pn", "offset", 10),
    "www.bing.com": ("first", "first", 10),
    "www.sogou.com": ("page", "page", 1),
    "www.soso.com": ("pg", "page", 1),
}


def search_page_number(host: Column, query: Column) -> Column:
    """P10: result-page number of a search URL, 1 when no page param or
    an empty param value (the reference keeps both). A NULL query (e.g.
    the engine's homepage) is page 1 — without the coalesce the NULL
    would propagate through the regexp and the caller's
    ``filter(page <= n)`` would silently DROP the row."""
    query = F.coalesce(query, F.lit(""))
    page = F.lit(1)
    for h, (param, mode, step) in _SEARCH_PAGE_PARAMS.items():
        raw = F.regexp_extract(query, rf"(?:^|&){param}=(\d+)", 1)
        n = raw.cast("int")
        if mode == "offset":
            val = (n / step + 1).cast("int")
        elif mode == "first":
            # first=1..(step+1) is page ≤ 2 territory: page boundaries sit
            # at (p-1)*step + 1, so first=22 is already past page 3's start
            val = F.when(n <= 1, F.lit(1)).otherwise(
                F.floor((n - 2) / step).cast("int") + 2)
        else:
            val = n
        page = F.when(host == h,
                      F.when(raw == "", F.lit(1)).otherwise(val)
                      ).otherwise(page)
    return page


def keep_first_n_search_pages(df: DataFrame, host_col: str = "host",
                              query_col: str = "query",
                              n: int = 3) -> DataFrame:
    return df.filter(
        search_page_number(F.col(host_col), F.col(query_col)) <= n
    )


def strip_tel_qq(url: Column) -> Column:
    """P11: cut TEL:…/QQ:… garbage from pv/search-log URLs — truncate at
    the FIRST exact-case ``TEL:``/``tel:``/``QQ:``/``qq:`` substring,
    byte-matching the reference (mr_selector_r1_mapper.cc:374-387 uses
    ``url.find`` on exactly those four literals; mixed-case ``Tel:`` is
    NOT stripped there, so a case-insensitive regex would over-strip)."""
    return F.regexp_replace(url, r"(TEL|tel|QQ|qq):.*$", "")


def transform_ajax_url(url: Column) -> Column:
    """P12: #! AJAX URLs → _escaped_fragment_ crawlable form
    (TransformAjaxUrl, crawl_util.cc — vectors in crawl_util_test.cc).
    An EMPTY fragment ('…/#!') strips to the bare URL, per both the
    reference ('http://bbs.byr.cn/#!' → 'http://bbs.byr.cn/') and the
    AJAX-crawling spec."""
    has_bang = url.contains("#!")
    frag = F.regexp_extract(url, r"#!(.*)$", 1)
    base = F.regexp_replace(url, r"#!.*$", "")
    sep = F.when(base.contains("?"), F.lit("&")).otherwise(F.lit("?"))
    return F.when(
        has_bang & (frag != ""),
        F.concat(base, sep, F.lit("_escaped_fragment_="), frag),
    ).when(has_bang, base).otherwise(url)


# kBlackHoleHosts (crawler_selector_util.cc:684): faceted-navigation
# hosts whose query-bearing pages link to endless same-host query
# permutations — a crawl trap ("black hole"). The reference skips such
# outlinks at extraction time (resource_saver.cc:239).
BLACK_HOLE_HOSTS = ("edu.360.cn",)


def is_black_hole_link(target_host: Column, target_query: Column,
                       referer: Column) -> Column:
    """IsBlackHoleLink (crawler_selector_util.cc:695-704, vectors from
    crawler_selector_test.cc IsBlackHostLink): True iff the REFERER is a
    query-bearing page on a black-hole host and the target is another
    query-bearing page on the SAME host. NULL-referer rows (seeds,
    enqueued sources) are never black holes."""
    from . import urlkit

    ref_host = urlkit.url_host(referer)
    ref_query = urlkit.url_query(referer)
    return (
        referer.isNotNull()
        & ref_host.isin(*BLACK_HOLE_HOSTS)
        & (ref_query != "")
        & (target_host == ref_host)
        & (F.coalesce(target_query, F.lit("")) != "")
    )


# kInvaluableImageDict (crawler_selector_util.cc:716): (host glob, path
# glob) pairs naming image urls not worth fetching (user avatars etc.);
# the selector drops kImage resources matching it
# (mr_selector_r1_mapper.cc:187).
INVALUABLE_IMAGE_GLOBS = (("tb.himg.baidu.com", "/sys/portrait/item/*"),)


def is_valuable_image_link(url: Column) -> Column:
    """IsValuableImageLink (crawler_selector_util.cc:719-736): False for
    image urls matching the invaluable dict. Implements the documented
    intent — the reference body short-circuits on ``gurl.is_valid()``
    where ``!is_valid`` was clearly meant (its own test vectors cannot
    tell the two apart); here an unparseable url is simply not valuable."""
    from . import urlkit
    from .rulebook import glob_to_regex

    host = urlkit.url_host(url)
    path = urlkit.url_path(url)
    parseable = host != ""
    invaluable = F.lit(False)
    for host_g, path_g in INVALUABLE_IMAGE_GLOBS:
        invaluable = invaluable | (
            host.rlike(f"^(?:{glob_to_regex(host_g)})$")
            & path.rlike(f"^(?:{glob_to_regex(path_g)})$")
        )
    return parseable & ~invaluable


# hosts whose urls are redirect wrappers worth unwrapping — the reference
# parses targets ONLY for Baidu/Google log urls (uv_data.cc:191-200 calls
# ParseBaiduTargetUrl/ParseGoogleTargetUrl per recognized engine); an
# ungated unwrap would replace 'http://shop.com/item?url=42' with '42'
REDIRECT_HOSTS = (
    "www.baidu.com", "baidu.com",
    "www.google.com", "google.com", "www.google.com.hk",
)


def unwrap_redirect_target(url: Column,
                           hosts: tuple[str, ...] = REDIRECT_HOSTS) -> Column:
    """P13: extract the real target from search-engine redirect links
    (…&url=<target>… / …&q=<target>…) on known engine hosts;
    pass-through otherwise.

    Fidelity notes vs the reference parsers (ported as table-driven
    tests, test_selector.py::test_redirect_unwrap_reference_cases):

    - google_target_url.cc matches ANY ``www.google.*`` national TLD
      (host *contains* "www.google.") — the startswith branch below; its
      ``sa=U → q`` / ``sa∈{t,X} → url`` dispatch collapses to the
      url-then-q coalesce here because google never carries both a
      scheme-ful ``q`` and an ``url`` param with different targets.
    - baidu_target_url.cc handles ``/link?url=<cipher>`` XOR-encrypted
      wrappers — NOT a parameter extraction; those pass through here
      untouched (the generic url= grab would emit cipher garbage) and
      :func:`parse_baidu_target_url_py` / :func:`parse_baidu_target_urls`
      implement the real crack.
    """
    target = F.coalesce(
        F.nullif(F.regexp_extract(url, r"[?&]url=([^&#]+)", 1), F.lit("")),
        F.nullif(F.regexp_extract(url, r"[?&]q=(https?[^&#]+)", 1), F.lit("")),
    )
    host = F.try_parse_url(url, F.lit("HOST"))
    on_engine = host.isin(list(hosts)) | host.startswith("www.google.")
    is_baidu_cipher = url.startswith("http://www.baidu.com/link?url=")
    # try_url_decode: one dirty log row with malformed percent-encoding
    # ('?url=a%2') must pass through, not fail the whole job
    return (
        F.when(is_baidu_cipher, url)
        .when(on_engine, F.coalesce(F.try_url_decode(target), target, url))
        .otherwise(url)
    )


def parse_google_target_url(url: Column) -> Column:
    """P13 faithful ParseGoogleTargetUrl (google_target_url.cc:27-93) as a
    column expression: NULL = "ret false". Host must contain
    ``www.google.``, path must be exactly ``/url``, query present; the
    ``sa`` param dispatches — ``U`` → ``q`` param, ``t``/``X`` → ``url``
    param; scheme-less targets are url-decoded; undecodable/invalid →
    NULL."""
    host = F.try_parse_url(url, F.lit("HOST"))
    path = F.try_parse_url(url, F.lit("PATH"))
    query = F.nullif(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    sa = F.regexp_extract(query, r"(?:^|&)sa=([^&]*)", 1)
    q_p = F.nullif(F.regexp_extract(query, r"(?:^|&)q=([^&]*)", 1),
                   F.lit(""))
    url_p = F.nullif(F.regexp_extract(query, r"(?:^|&)url=([^&]*)", 1),
                     F.lit(""))
    raw = (
        F.when(sa == "U", q_p)
        .when(sa.isin("t", "X"), url_p)
        .otherwise(F.lit(None).cast("string"))
    )
    has_scheme = raw.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    decoded = F.when(has_scheme, raw).otherwise(F.try_url_decode(raw))
    valid = F.try_parse_url(decoded, F.lit("HOST")).isNotNull()
    gate = host.contains("www.google.") & (path == "/url") \
        & query.isNotNull()
    return F.when(gate & valid, decoded)


def parse_baidu_target_url_py(url: str) -> str | None:
    """P13 faithful ParseBaiduTargetUrl (baidu_target_url.cc:118-160):
    non-``/link?url=`` urls pass through (the reference returns the url
    itself); cipher links are XOR-decoded against the fixed key schemes
    (data_baidu_keys), accepted only when the plaintext is an http/ftp
    url that survives validity + decodability checks. None = ret false."""
    from urllib.parse import unquote, urlsplit

    from .data_baidu_keys import BAIDU_CRACK_SCHEMES, BAIDU_LINK_PREFIX

    def _valid(u: str) -> bool:
        try:
            return bool(urlsplit(u).netloc)
        except ValueError:
            return False

    if not _valid(url):
        return None
    low = url.lower()
    if not low.startswith(BAIDU_LINK_PREFIX):
        return url
    for magic_off, magic, key_idx, key_len, key in BAIDU_CRACK_SCHEMES:
        if len(url) <= key_idx or url[magic_off:magic_off + 14] != magic:
            continue
        enc = url[key_idx:]
        if len(enc) > key_len or len(enc) % 2 == 1:
            continue
        try:
            out = []
            for i in range(0, len(enc), 2):
                num = (int(enc[i], 16) ^ int(key[i], 16)) << 4 | (
                    int(enc[i + 1], 16) ^ int(key[i + 1], 16)
                )
                if num > 127 or num <= 32:
                    out.append("%%%02x" % num)
                else:
                    out.append(chr(num))
            cracked = "".join(out)
        except ValueError:
            continue
        if not cracked.lower().startswith(("http", "ftp")):
            continue
        if not _valid(cracked):
            return None
        if any(c in cracked for c in "\t\r\n"):
            return None
        try:
            unquote(cracked, errors="strict")
        except Exception:
            return None
        return cracked
    return None


def parse_baidu_target_urls(url: Column) -> Column:
    """Arrow-batched wrapper of :func:`parse_baidu_target_url_py` — gate
    the input at DataFrame level to baidu ``/link`` rows (the cheap
    ``unwrap_redirect_target`` handles everything else JVM-side)."""
    import pandas as pd  # noqa: F401 (type-hint resolution on executors)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _crack(urls):  # type: (pd.Series) -> pd.Series
        return urls.map(
            lambda u: parse_baidu_target_url_py(u) if u is not None
            else None
        )

    return _crack(url)


# -- site paginator extension point (E4) ------------------------------------


def paginate_list_urls(df: DataFrame, url_col: str = "url",
                       n_next: int = 3, param: str = "page") -> DataFrame:
    """E4 (extractor.cc:418-551): the reference hard-codes per-site
    next-list-page builders (taobao/tmall/jd/suning); we keep ONE generic
    representative to prove the extension point — for list URLs carrying a
    ``page=K`` query param, emit the next ``n_next`` page URLs. Pure
    column math (sequence → transform → explode)."""
    url = F.col(url_col)
    cur = F.regexp_extract(url, rf"[?&]{param}=(\d+)", 1)
    has = cur != ""
    nxt = F.transform(
        F.sequence(F.lit(1), F.lit(n_next)),
        lambda i: F.regexp_replace(
            url, rf"([?&]){param}=\d+",
            F.concat(F.lit("$1"), F.lit(f"{param}="),
                     (cur.cast("int") + i).cast("string")),
        ),
    )
    return df.filter(has).select(
        url.alias("list_url"), F.explode(nxt).alias("next_url")
    )


# -- per-referer extract-pattern whitelist (E3 fidelity) ---------------------


def glob_to_regex(glob: str) -> str:
    """base::MatchPattern-style wildcard → anchored regex body: ``*`` is
    any run, ``?`` any single char, everything else literal."""
    import re as _re

    return "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in glob
    )


def apply_extract_rules(cand: DataFrame,
                        rules: list[tuple[str, str, str]] | None,
                        url_col: str = "url",
                        referer_col: str = "referer") -> DataFrame:
    """E3 whitelist (extractor.cc:202-281 + util/url_extract_rule.h:9-24):
    the FIRST rule whose (host_pattern, path_pattern) wildcard-matches the
    REFERER gates that referer's outlinks — each outlink must FullMatch
    the rule's target_url_pattern regex. Referers matching no rule emit
    freely; NULL referers (seeds / injected sources) bypass.

    ``rules`` is an ordered list of (host_glob, path_glob, target_regex)
    — a bounded config file in the reference (LoadUrlExtractRule), so it
    folds into ONE flat coalesce-of-whens column expression: first-match
    semantics with no join, no shuffle, whole-stage-codegen'd regexes.
    """
    if not rules:
        return cand
    ref = F.col(referer_col)
    # lowercase the host (GURL.host() is canonical-lowercase; a raw
    # referer may not be) and map a pathless referer to "/" — try_parse_url
    # returns '' (not NULL) for PATH on 'http://h', so nullif first. Both
    # keep this gate in lockstep with the simulator twin's urlsplit.
    ref_host = F.lower(F.try_parse_url(ref, F.lit("HOST")))
    ref_path = F.coalesce(
        F.nullif(F.try_parse_url(ref, F.lit("PATH")), F.lit("")),
        F.lit("/"),
    )
    whens = [
        F.when(
            ref_host.rlike(f"^{glob_to_regex(host_g)}$")
            & ref_path.rlike(f"^{glob_to_regex(path_g)}$"),
            F.col(url_col).rlike(f"^(?:{target_re})$"),
        )
        for host_g, path_g, target_re in rules
    ]
    keep = F.coalesce(*whens, F.lit(True))
    return cand.filter(ref.isNull() | keep)


# -- bad-page verify (D4) ----------------------------------------------------


def bad_page_filter(docs: DataFrame, bad_hashes: DataFrame,
                    sign_col: str = "simhash") -> DataFrame:
    """D4 (html_simhash.h:16-19,86-93): drop pages whose signature matches
    the known-bad dictionary — broadcast left_anti join."""
    return docs.join(
        F.broadcast(bad_hashes.select(F.col("bad_sign").alias(sign_col))),
        sign_col, "left_anti",
    )


# -- DNS / ip attach / proxy / load (L5, J1, L3, A4) ------------------------


def synthetic_dns(spark: SparkSession, hosts: DataFrame,
                  host_col: str = "host", n_ips_max: int = 3,
                  seed: int = 42) -> DataFrame:
    """L5: deterministic host→ips dim (multi-ip hosts get hash-derived
    addresses) — the resolve step's output contract without the resolver."""
    h = hosts.select(host_col).distinct()
    n_ips = (F.pmod(F.xxhash64(F.col(host_col), F.lit(seed)),
                    F.lit(n_ips_max)) + 1).cast("int")
    idx = F.sequence(F.lit(0), n_ips - 1)
    ip_of = lambda i: F.concat_ws(
        ".",
        F.lit("10"),
        F.pmod(F.xxhash64(F.col(host_col), i), F.lit(250)).cast("string"),
        F.pmod(F.xxhash64(F.col(host_col), i + 1000), F.lit(250)).cast("string"),
        F.pmod(F.xxhash64(F.col(host_col), i + 2000), F.lit(250)).cast("string"),
    )
    return h.select(
        host_col,
        F.transform(idx, ip_of).alias("ips"),
    )


def merge_dns(primary: DataFrame, secondary: DataFrame,
              blacklist: DataFrame | None = None) -> DataFrame:
    """L5 resolver merge (control/schedule/merge_dns.py): union two
    resolvers' per-host ip lists — the primary's order kept, the
    secondary's unseen ips appended — then strip per-host blacklisted
    ips. Inputs/output: (host, ips array); ``blacklist``: (host,
    bad_ips array), broadcast (a hand-curated file in the reference)."""
    a = primary.select("host", F.col("ips").alias("_a"))
    b = secondary.select("host", F.col("ips").alias("_b"))
    merged = a.join(b, "host", "full").select(
        "host",
        F.when(F.col("_a").isNull(), F.col("_b"))
        .when(F.col("_b").isNull(), F.col("_a"))
        .otherwise(
            F.concat(F.col("_a"), F.array_except(F.col("_b"), F.col("_a")))
        ).alias("ips"),
    )
    if blacklist is not None:
        merged = (
            merged.join(
                F.broadcast(blacklist.select("host", "bad_ips")),
                "host", "left",
            )
            .select(
                "host",
                F.when(F.col("bad_ips").isNull(), F.col("ips"))
                .otherwise(F.array_except("ips", "bad_ips")).alias("ips"),
            )
        )
    return merged


def attach_ip(urls: DataFrame, dns: DataFrame,
              host_col: str = "host", url_col: str = "url") -> DataFrame:
    """J1 (url_to_ip.cc:53-91): broadcast-join the dns dim and pick one ip
    per url — the reference picks randomly (:82); we pick deterministically
    by url hash (§4 determinism rule)."""
    j = urls.join(F.broadcast(dns), host_col, "left")
    pick = F.element_at(
        F.col("ips"),
        (F.pmod(F.xxhash64(F.col(url_col)), F.size("ips")) + 1).cast("int"),
    )
    return j.withColumn(
        "ip", F.when(F.col("ips").isNull(), F.lit(None)).otherwise(pick)
    ).drop("ips")


def proxy_route(urls: DataFrame, ip_col: str = "ip",
                threshold: int = 100_000,
                proxy_domains: list[str] | None = None,
                domain_col: str = "domain") -> DataFrame:
    """L3 (ip_url_split.cc:64-119): ips carrying ≥ threshold URLs (or
    whitelisted domains) route via PROXY.

    Plan shape — no per-ip window: a hot ip (≥ threshold rows) is exactly
    the row this op exists to find, and ``count().over(partitionBy(ip))``
    would materialize ALL of a mega-ip's rows in one task (10^8 rows in
    one partition at 10^10 scale). Instead: partial-agg per-ip counts
    (output ≤ one row per ip), keep the over-threshold ips — structurally
    few, < N/threshold of them — BROADCAST that list, and flag via a
    broadcast left join. NULL-ip rows never enter the count (they are
    many small distinct hosts, not one giant pseudo-ip)."""
    domain_proxy = (
        F.col(domain_col).isin(proxy_domains) if proxy_domains
        else F.lit(False)
    )
    hot = (
        urls.filter(F.col(ip_col).isNotNull())
        .groupBy(ip_col).count()
        .filter(F.col("count") >= threshold)
        .select(ip_col, F.lit(True).alias("_hot"))
    )
    return (
        urls.join(F.broadcast(hot), ip_col, "left")
        .withColumn(
            "use_proxy",
            F.when(
                F.coalesce(F.col("_hot"), F.lit(False)) | domain_proxy,
                "PROXY",
            ).otherwise("DIRECT"),
        )
        .select(*urls.columns, "use_proxy")  # join reorders; keep contract
    )


def ip_load_estimate(urls: DataFrame, ip_loads: DataFrame | None = None,
                     ip_col: str = "ip",
                     default_qps: float = 3.0) -> DataFrame:
    """A4 (ip_stat.cc:37-79): per-ip URL count / qps → estimated seconds
    to crawl (the bin-pack cost)."""
    counts = urls.groupBy(ip_col).agg(F.count("*").alias("n_urls"))
    if ip_loads is not None:
        counts = counts.join(F.broadcast(ip_loads), ip_col, "left")
        qps = F.coalesce(F.col("qps"), F.lit(default_qps))
    else:
        qps = F.lit(default_qps)
    return counts.withColumn(
        "cost", (F.col("n_urls") / qps).cast("double")
    ).select(ip_col, "n_urls", "cost")


# -- updater (U5) -----------------------------------------------------------


def updater_candidates(linkbase: DataFrame, now_ts: int,
                       max_age_s: int = 7 * 86_400,
                       header_col: str = "http_header",
                       url_col: str = "url") -> DataFrame:
    """U5 (mr_updater_mapper.cc:40-75): parse Last-Modified/Date from the
    stored header, keep the latest record per url, emit recrawl tasks
    (from='M') for pages older than ``max_age_s``. Timestamps are expected
    pre-parsed to epoch seconds in ``last_fetch_ts`` when headers absent.

    Header-field extraction is faithful to
    ExtractParameterValueFromHeader (updater_util.cc:17-50, vectors from
    updater_util_test.cc): the key is CASE-SENSITIVE with an exact
    ": " separator, the LAST occurrence wins (a redirected fetch stacks
    every followed response's header into one string — rfind), and the
    value runs to the next CR/LF or backslash (the line-escaped form
    stores literal '\\r\\n')."""
    def _last_field(key: str) -> Column:
        # greedy (?s).* pins the match to the LAST occurrence = rfind
        return F.regexp_extract(
            F.col(header_col), r"(?s)^.*" + key + r": ([^\r\n\\]*)", 1)

    lm = _last_field("Last-Modified")
    dt = _last_field("Date")
    raw = F.coalesce(F.nullif(lm, F.lit("")), F.nullif(dt, F.lit("")))
    # Spark's post-3.0 parser rejects the EEE weekday field — strip it
    header_ts = F.unix_timestamp(
        F.regexp_replace(raw, r"^[A-Za-z]+,\s*", ""),
        "dd MMM yyyy HH:mm:ss zzz",
    )
    eff_ts = F.coalesce(header_ts, F.col("last_fetch_ts"))
    w = Window.partitionBy(url_col).orderBy(F.desc("last_fetch_ts"))
    latest = (
        linkbase.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        latest.withColumn("age_s", F.lit(now_ts) - eff_ts)
        .filter(F.col("age_s") >= max_age_s)
        .select(url_col, F.lit("M").alias("from"), "age_s")
    )


# -- evaluation (A10) -------------------------------------------------------


def crawl_success_eval(topn: DataFrame, crawled: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """A10 (evaluation.h:7-30): success-rate of the top-N demand list
    against the crawled set, overall and by rank decile."""
    j = topn.join(
        crawled.select(url_col).distinct().withColumn("ok", F.lit(1)),
        url_col, "left",
    ).withColumn("ok", F.coalesce(F.col("ok"), F.lit(0)))
    decile = F.least(F.floor(F.col("rank") / 10), F.lit(9)).alias("decile")
    return j.groupBy(decile).agg(
        F.count("*").alias("n"),
        F.round(F.avg("ok"), 6).alias("success_rate"),
    )
