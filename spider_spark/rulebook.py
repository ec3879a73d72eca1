"""P7's selector rule book as DATA: the reference's URL filter config
tables and their gate, re-expressed as flat column expressions.

All cites into /root/reference/crawler/crawler/selector/
crawler_selector_util.cc (the tables are config data compiled into the
reference binary; SURVEY §2.2-P7 calls for shipping them as data):

- ``HOST_BLACKLIST``        kHostBlackList (:32-34) — exact host match
- ``HOST_RESTRICT_GLOBS``   kHostRestrictList (:37-38) — hosts restricted
  to their homepage (``MatchPattern`` wildcard on the host)
- ``PATH_SUFFIX_BLACKLIST`` kPathPostfixBlackList (:40-42) and the strict
  variant kPathPostfixBlackList2 (:43-46) — case-insensitive endswith
- ``QUERY_TOKEN_BLACKLIST`` kFilterQueryArray (:48-49) and strict
  kFilterQueryArray2 (:50-52) — case-insensitive substring
- ``FILTER_RULE_BOOK``      kFilterRuleBook (:57-145) and strict
  kFilterRuleBook2 (:147-236) — ~70 site rules, first match filters;
  each row is (host_prefix, host_postfix, path_glob, query_glob, engine)
  with exactly one of prefix/postfix set; ``query_glob=None`` means
  "matches iff the query is NON-empty" (the struct comment at :26)
- gate order                WillFilterAccordingRules (:413-512)

The gate folds into ONE boolean column expression (the bounded-config
pattern of politeness.categorize_url / selector.apply_extract_rules):
first-match semantics, no join, no shuffle, whole-stage-codegen'd. Pass
plain attribute columns for host/path/query (not expressions) so the
~70-when coalesce does not re-inline their subtrees.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .selector import glob_to_regex

MAX_LINK_SIZE = 2048   # kMaxLinkSize (v1), crawled_resource.proto:65-68
MAX_PATH_DEPTH = 10    # kMaxPathDepth, crawler_selector_util.h:6
MAX_QUERY_LEN = 1000   # kMaxQueryLength, crawler_selector_util.h:7

HOST_BLACKLIST = (
    "ptlogin2.qq.com", "ptlogin2.3366.com", "img03.taobaocdn.com",
    "cache.baidu.com", "ptlogin2.paipai.com",
    "webcache.googleusercontent.com", "snapshot.soso.com",
    "newscache.baidu.com",
)

HOST_RESTRICT_GLOBS = (
    "weibo.com", "www.kaixin001.com", "p.777wyx.com", "g.zx915.com",
    "hero.qzoneapp.com",
)

PATH_SUFFIX_BLACKLIST = (
    ".do", ".doc", ".mp3", ".avi", ".exe", ".zip", ".xls", ".ppt", ".rar",
    ".pdf", ".dwg", ".swf", ".wps", ".o", ".cc", ".cpp", ".h", ".dll",
)
PATH_SUFFIX_BLACKLIST_STRICT = (
    "search.htm", "search.php", "search.asp", "search.html", "redirects",
) + PATH_SUFFIX_BLACKLIST

QUERY_TOKEN_BLACKLIST = (
    "login", "register", "url=", "redirecturl=", "targeturl=", "action=",
    "logout", "cdnurl=", "order_id=", "trade_id=", "tradeid=",
    "attachmentid=",
)
QUERY_TOKEN_BLACKLIST_STRICT = (
    "login", "register", "keyword=", "keywords=", "kw=", "key=", "wd=",
    "word=", "query=", "q=", "search=", "url=", "redirecturl=",
    "targeturl=", "cdnurl=", "action=", "logout", "order_id=", "trade_id=",
    "tradeid=", "attachmentid=",
)

# (host_prefix, host_postfix, path_glob, query_glob, engine); exactly one
# of prefix/postfix is set; query_glob None ⇒ query must be non-empty
FILTER_RULE_BOOK = (
    (None, ".com", "/*login*", "*", "Login"),
    (None, ".cn", "/*login*", "*", "Login"),
    (None, ".taobao.com", "/account/*", "*", "Login"),
    (None, ".taobao.com", "/auction/*", "*", "Login"),
    (None, ".taobao.com", "/user/order_detail*", "*", "Login"),
    (None, ".tmall.com", "/detail/orderDetail.*", "*", "Login"),
    (None, ".alibaba.com", "/order/*", "*", "Login"),
    (None, ".alibaba.com", "/member/signin*", "*", "Login"),
    (None, ".alibaba.com", "/favorites/add_to_*", "*", "Login"),
    (None, ".alibaba.com", "/offer/post/fill_*", "*", "Login"),
    (None, ".alipay.com", "/standard/payment/*", "*", "Login"),
    (None, ".qq.com", "/cn2/findpsw/*", "*", "Login"),
    (None, ".profile.live.com", "*", "*", "Login"),
    ("p.777wyx.com", None, "*", "*", "RubishGame"),
    ("www.google.", None, "/aclk", "*", "Google"),
    ("map.baidu.com", None, "/", None, "Baidu"),
    ("www.baidu.", None, "/cpro.php", None, "Baidu"),
    ("www.baidu.", None, "/baidu.php", None, "Baidu"),
    ("www.baidu.", None, "/adrc.php", None, "Baidu"),
    ("www.baidu.", None, "/cb.php", None, "Baidu"),
    ("passport.baidu.com", None, "/", None, "Baidu"),
    ("v.sogou.", None, "/mlist/*", "*", "Sogou"),
    ("www.sogou.com", None, "/bill_search", "*", "SogouAds"),
    ("map.soso.com", None, "/", None, "Soso"),
    ("jzclick.soso.com", None, "/click", "*", "SosoAds"),
    ("s.click.taobao.com", None, "/t_3", "*", "Taobao"),
    ("trade.taobao.com", None, "/trade/*", "*", "Taobao"),
    (None, ".sina.com.cn", "/search*", None, "Sina"),
    (None, ".sina.com.cn", "/question/ask_new*", None, "Sina"),
    ("www.uqude.com", None, "/content/getSolr.action", "*", "Uqude"),
    ("www.uqude.com", None, "/search*", "*", "Uqude"),
    ("link.admin173.com", None, "/index.php", None, "Link173"),
    ("www.kaixin001.com", None, "/login/*", "*", "Kaixin"),
    ("www.168dushi.com.", None, "/czfy*", "*", "168dushi"),
    ("car.autohome.com", None, "/price/list-*", "*", "Autohome"),
    (None, ".auto.sohu.com", "/searchterm.sip", None, "Sohu"),
    ("product.it.sohu.com", None, "/search/*", "*", "Sohu"),
    (None, ".hao123.com", "/index*", "*", "Hao123"),
    (None, ".hao123.net", "/index*", "*", "Hao123"),
    ("search.51job.com", None, "/list*", None, "51job"),
    ("movie.xunlei.com", None, "/person/*", "*", "Xunlei"),
    ("bbs.ifeng.", None, "*", "action=*", "Ifeng"),
    ("huilitongxie.com", None, "/", "gallery*", "Huilitongxie"),
    (None, "enet.com.cn", "/price/plist*", "*", "Enet"),
    ("www.52dpe.com", None, "/", "gallery*", "52dpe"),
    (None, "pctowap.com", "/dir/*", "*", "Pctowap"),
    (None, "5173.com", "/search/*", "*", "5173"),
    ("chinadaily.chinadaily.", None, "*", "*", "ChinaDaily"),
    ("news.whnews.cn", None, "*", "*", "Whnews"),
    ("whnews.cn", None, "*", "*", "Whnews"),
    ("whccr.com", None, "*", "*", "Whnews"),
    ("dgvan.zjol.com.cn", None, "*", "*", "ItcpnZjol"),
    ("v.360.cn", None, "*/list.php", "cat=*", "Search360"),
    ("v.360.cn", None, "*/index.php", "cat=*", "Search360"),
    ("www.newegg.", None, "/Search.*", "*", "Newegg"),
    ("mq.qq.com", None, "*", None, "Mqqq"),
    ("so.tudou.com", None, "/nisearch*", "*", "Soutudo"),
    (None, "mail.163.com", "*", None, "163Mail"),
    ("t.qq.com", None, "/p/t/*", "*", "TengxunWeibo"),
    ("translate.google", None, "*", None, "GoogleTranslate"),
    ("e.baidu.com", None, "*", None, "BaiduTuiguang"),
    ("www.microsofttranslator.com", None, "*", None, "BingFanyi"),
    ("cc.bingj.com", None, "/cache.*", "*", "BingCache"),
    ("adredir.adcenter.bing.", None, "/redir", "*", "BingAds"),
    ("www.content4ads.com", None, "/live.php", "*", "BingAds"),
    ("www.sogou.com", None, "/websnapshot", "*", "SogouCache"),
    ("zhidao.baidu.com", None, "/browse/*", "*", "ZhidaoBrowse"),
    ("clkservice.youdao.com", None, "/clk/request.s", "*", "YoudaoAds"),
    ("www.youdao.com", None, "/cache", "*", "YoudaoCache"),
)

# kFilterRuleBook2 (:147-236) = the book above with the search engines'
# own result pages added and two rows tightened (Kaixin "/login/",
# Link173 NULL query); rendered as data the same way
FILTER_RULE_BOOK_STRICT = (
    FILTER_RULE_BOOK[:13]
    + (
        ("www.google.", None, "/search", "*", "Google"),
        ("www.google.", None, "/", "*", "Google"),
        ("www.google.", None, "/aclk", "*", "Google"),
        ("www.baidu.", None, "/cpro.php", None, "Baidu"),
        ("www.baidu.", None, "/baidu.php", None, "Baidu"),
        ("www.baidu.", None, "/adrc.php", None, "Baidu"),
        ("www.baidu.", None, "/cb.php", None, "Baidu"),
        ("passport.baidu.com", None, "/", None, "Baidu"),
        ("zhidao.baidu.", None, "/q", "*", "Baidu"),
        ("map.baidu.com", None, "/", None, "Baidu"),
        ("news.baidu.com", None, "/ns", "*", "Baidu"),
        ("v.sogou.", None, "/mlist/*", "*", "Sogou"),
        ("www.sogou.com", None, "/bill_search", "*", "SogouAds"),
        ("www.soso.com", None, "/q", "*", "Soso"),
        ("wenwen.soso.com", None, "/z/Search.e", "*", "Soso"),
        ("map.soso.com", None, "/", None, "Soso"),
        ("jzclick.soso.com", None, "/click", "*", "SosoAds"),
        ("search.yahoo.com", None, "/search;*", "*", "Yahoo"),
        ("s8.taobao.com", None, "/search", "*", "Taobao"),
        ("trade.taobao.com", None, "/trade/*", "*", "Taobao"),
        ("s.click.taobao.com", None, "/t_3", "*", "Taobao"),
        (None, ".sina.com.cn", "/search*", None, "Sina"),
        ("www.uqude.com", None, "/content/getSolr.action", "*", "Uqude"),
        ("link.admin173.com", None, "/index.php", None, "Link173"),
        ("www.kaixin001.com", None, "/login/", "*", "Kaixin"),
        ("www.168dushi.com.", None, "/czfy*", "*", "168dushi"),
        ("car.autohome.com", None, "/price/list-*", "*", "Autohome"),
        (None, ".auto.sohu.com", "/searchterm.sip", None, "Sohu"),
        ("product.it.sohu.com", None, "/search/*", "*", "Sohu"),
        ("search.360buy.com", None, "/search", None, "360buy"),
        (None, ".hao123.com", "/index*", "*", "Hao123"),
        (None, ".hao123.net", "/index*", "*", "Hao123"),
        ("search.51job.com", None, "/list*", None, "51job"),
        ("movie.xunlei.com", None, "/person/*", "*", "Xunlei"),
        ("bbs.ifeng.", None, "*", "action=*", "Ifeng"),
        ("huilitongxie.com", None, "/", "gallery*", "Huilitongxie"),
        (None, "enet.com.cn", "/price/plist*", "*", "Enet"),
        ("www.52dpe.com", None, "/", "gallery*", "52dpe"),
        (None, "pctowap.com", "/dir/*", "*", "Pctowap"),
        (None, "5173.com", "/search/*", "*", "5173"),
        ("chinadaily.chinadaily.", None, "*", "*", "ChinaDaily"),
        ("news.whnews.cn", None, "*", "*", "Whnews"),
        ("whnews.cn", None, "*", "*", "Whnews"),
        ("whccr.com", None, "*", "*", "Whnews"),
        ("dgvan.zjol.com.cn", None, "*", "*", "ItcpnZjol"),
        ("v.360.cn", None, "*/list.php", "cat=*", "Search360"),
        ("v.360.cn", None, "*/index.php", "cat=*", "Search360"),
        ("www.newegg.", None, "/Search.*", "*", "Newegg"),
        ("mq.qq.com", None, "*", None, "Mqqq"),
        ("so.tudou.com", None, "/nisearch*", "*", "Soutudo"),
        (None, "mail.163.com", "*", None, "163Mail"),
        ("t.qq.com", None, "/p/t/*", "*", "TengxunWeibo"),
        ("translate.google", None, "*", None, "GoogleTranslate"),
        ("e.baidu.com", None, "*", None, "BaiduTuiguang"),
        ("www.microsofttranslator.com", None, "*", None, "BingFanyi"),
        ("cc.bingj.com", None, "/cache.*", "*", "BingCache"),
        ("adredir.adcenter.bing.", None, "/redir", "*", "BingAds"),
        ("www.content4ads.com", None, "/live.php", "*", "BingAds"),
        ("www.sogou.com", None, "/websnapshot", "*", "SogouCache"),
        ("zhidao.baidu.com", None, "/browse/*", "*", "ZhidaoBrowse"),
        ("clkservice.youdao.com", None, "/clk/request.s", "*", "YoudaoAds"),
        ("www.youdao.com", None, "/cache", "*", "YoudaoCache"),
    )
)


import re as _re


def _suffix_regex(suffixes: tuple[str, ...]) -> str:
    return "(?i)(" + "|".join(_re.escape(s) for s in suffixes) + ")$"


def _token_regex(tokens: tuple[str, ...]) -> str:
    return "(?i)(" + "|".join(_re.escape(t) for t in tokens) + ")"


def search_engine_of(host: Column, path: Column, query: Column,
                     strict: bool = False) -> Column:
    """IsSearchResult (:354-380 / :383-410): the FIRST rule-book row
    matching (host, path, query) names its engine; NULL = no match.
    Host prefix/postfix case-insensitive (hosts are canonical-lowercase
    here, rules are lowercase data); path/query globs are FullMatch."""
    book = FILTER_RULE_BOOK_STRICT if strict else FILTER_RULE_BOOK
    whens = []
    for host_pre, host_post, path_g, query_g, engine in book:
        if host_pre is not None:
            host_ok = host.startswith(host_pre)
        else:
            host_ok = host.endswith(host_post)
        cond = host_ok & path.rlike(f"^(?:{glob_to_regex(path_g)})$")
        if query_g is None:
            cond = cond & (query != "")
        else:
            cond = cond & query.rlike(f"^(?:{glob_to_regex(query_g)})$")
        whens.append(F.when(cond, F.lit(engine)))
    return F.coalesce(*whens, F.lit(None).cast("string"))


def will_filter_according_rules(url: Column, host: Column, path: Column,
                                query: Column,
                                strict: bool = False) -> Column:
    """WillFilterAccordingRules (:413-512): True ⇒ the URL is FILTERED.

    Check order as in the reference: length > kMaxLinkSize → bad leading
    char after scheme → non-http scheme → restrict-list non-homepage →
    blacklist host → invalid path (token depth ≥ 10, blacklisted suffix)
    → invalid query (> 1000 B, blacklisted token) → rule-book match.
    ``strict=True`` swaps in the *2 lists (the selector's strict mode).

    Note the reference is an http-only 2012 crawler; the scheme check is
    kept faithful. Callers crawling https gate with
    :func:`rule_book_keep` below, which relaxes the scheme check only.
    """
    return _filter_expr(url, host, path, query, strict, allow_https=False)


def _restricted_host(host: Column) -> Column:
    """MatchPattern over the restrict list — literal entries (no */?)
    collapse to ONE isin (a hash-set probe in codegen); only wildcarded
    entries pay a regex. The shipped list is all-literal, so the common
    row costs one set probe, not five regexes."""
    literals = [g for g in HOST_RESTRICT_GLOBS
                if "*" not in g and "?" not in g]
    globs = [g for g in HOST_RESTRICT_GLOBS if g not in literals]
    out = host.isin(*literals) if literals else F.lit(False)
    for g in globs:
        out = out | host.rlike(f"^(?:{glob_to_regex(g)})$")
    return out


# memo for the crawl hot path: building the ~150-predicate expression
# costs 400+ py4j gateway round-trips (one per F.when/rlike/lit), which
# measured ~2 s/round at cpus=32 when rebuilt inside every
# _prepare_candidates call. Column expressions are immutable and resolve
# by NAME at analysis, so one instance serves every round/query in the
# process (keyed by the named columns it binds).
_FILTER_CACHE: dict = {}


def _filter_expr(url: Column, host: Column, path: Column, query: Column,
                 strict: bool, allow_https: bool) -> Column:
    """The ONE WillFilterAccordingRules expression both public gates
    share — only the scheme clause differs (http-only faithful vs
    http+https for a modern crawl). Scheme matching is case-insensitive
    like GURL's canonical spec (the python twin's urlsplit lowercases
    the scheme, and the reference checks run on gurl.spec()); host/path/
    query columns are expected canonical-lowercase, which both the
    candidate pipeline (post-canonicalize) and the twin guarantee.
    Memoized per named-column binding — see ``_FILTER_CACHE``."""
    key = (str(url), str(host), str(path), str(query), strict, allow_https)
    cached = _FILTER_CACHE.get(key)
    if cached is not None:
        return cached
    suffixes = (PATH_SUFFIX_BLACKLIST_STRICT if strict
                else PATH_SUFFIX_BLACKLIST)
    tokens = (QUERY_TOKEN_BLACKLIST_STRICT if strict
              else QUERY_TOKEN_BLACKLIST)
    scheme = "https?" if allow_https else "http"
    # Tokenize(path, "/") counts non-empty segments
    depth = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    filtered = (
        (F.length(url) > MAX_LINK_SIZE)
        | ~url.rlike(f"(?i)^{scheme}://")
        | url.rlike(f"(?i)^{scheme}://[.%+]")
        | host.isin(*HOST_BLACKLIST)
        | (depth >= MAX_PATH_DEPTH)
        | (F.length(query) > MAX_QUERY_LEN)
        | (_restricted_host(host) & ~((path == "/") & (query == "")))
        | path.rlike(_suffix_regex(suffixes))
        | query.rlike(_token_regex(tokens))
        | search_engine_of(host, path, query, strict).isNotNull()
    )
    _FILTER_CACHE[key] = filtered
    return filtered


def rule_book_keep(url: Column, host: Column, path: Column, query: Column,
                   strict: bool = False) -> Column:
    """Keep-predicate for the crawl candidate pipeline: the reference gate
    minus its http-only scheme restriction (a modern crawl admits https;
    everything else is byte-faithful to WillFilterAccordingRules).

    Cost shape on the outlink firehose: the cheap checks (length, depth,
    two set probes) lead the OR so codegen short-circuits dropped rows
    early; a KEPT row pays the two alternation regexes plus ~70
    startswith/endswith host probes whose path/query regexes only run on
    a host hit (And short-circuits). Runs on the post-dedup candidate
    set, never the raw explode. The built expression is memoized — see
    ``_FILTER_CACHE``."""
    return ~_filter_expr(url, host, path, query, strict, allow_https=True)


# -- pure-Python twin (simulator / differential tests) -----------------------


def will_filter_py(url: str, strict: bool = False,
                   allow_https: bool = False) -> bool:
    """Straight-line twin of WillFilterAccordingRules for the simulator
    and table-driven tests (independent implementation: urlsplit +
    fnmatch-style globbing via re). ``allow_https`` relaxes only the
    2012 http-only scheme check (the rule_book_keep role)."""
    from urllib.parse import urlsplit

    url = url.strip()  # GURL spec-trims; the ported cases carry padding
    # web::has_scheme detects ANY "<scheme>:" prefix (so a garbage scheme
    # like "javascript:://x" is NOT http-prepended — it must fail the
    # scheme check, crawler_selector_test.cc:28-30)
    u = url if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", url) \
        else "http://" + url
    if len(u) > MAX_LINK_SIZE:
        return True
    # GURL lowercases the scheme in the canonical spec, so the prefix
    # check is case-insensitive (matches the Column gate's (?i) regexes)
    ul = u[:9].lower()
    if ul.startswith(("http://.", "http://%", "http://+")) or (
        allow_https and ul.startswith(("https://.", "https://%", "https://+"))
    ):
        return True
    try:
        p = urlsplit(u)
    except ValueError:
        return True
    if p.scheme != "http" and not (allow_https and p.scheme == "https"):
        return True
    host = (p.hostname or "")
    path = p.path or "/"
    query = p.query

    def gmatch(glob: str, s: str) -> bool:
        pat = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in glob
        )
        return _re.fullmatch(pat, s) is not None

    if any(gmatch(g, host) for g in HOST_RESTRICT_GLOBS) and not (
        path == "/" and query == ""
    ):
        return True
    if host in HOST_BLACKLIST:
        return True
    suffixes = (PATH_SUFFIX_BLACKLIST_STRICT if strict
                else PATH_SUFFIX_BLACKLIST)
    tokens = (QUERY_TOKEN_BLACKLIST_STRICT if strict
              else QUERY_TOKEN_BLACKLIST)
    if len([t for t in path.split("/") if t]) >= MAX_PATH_DEPTH:
        return True
    if any(path.lower().endswith(s) for s in suffixes):
        return True
    if len(query) > MAX_QUERY_LEN:
        return True
    ql = query.lower()
    if any(t in ql for t in tokens):
        return True
    book = FILTER_RULE_BOOK_STRICT if strict else FILTER_RULE_BOOK
    for host_pre, host_post, path_g, query_g, _engine in book:
        host_ok = host.startswith(host_pre) if host_pre is not None \
            else host.endswith(host_post)
        if not (host_ok and gmatch(path_g, path)):
            continue
        if (query_g is None and query != "") or (
            query_g is not None and gmatch(query_g, query)
        ):
            return True
    return False
