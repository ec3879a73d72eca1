"""Pure-Python reference simulator: the correctness oracle for crawl rounds.

Encodes the same batch-granularity semantics as :mod:`spider_spark.round`
— seen-set, robots gate, per-host budget admission, failure holdon — in
straight-line Python over an in-memory adjacency list. The north-rule
contract is equality of (round → admitted-url batch) sequences and of the
final URL-seen set between this simulator and the Spark engine under the
same seed list + politeness budget.

The simulator takes the *data* (adjacency, robots rules, budgets) as plain
dicts, shares zero code with the Spark path (independent twin, mirroring
the reference's own load_controller semantics, crawler/crawler/crawl/
load_controller.cc:149-242 at batch granularity), and is intentionally
naive — correctness over speed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

BAD_PATH_SUFFIXES = (
    ".exe", ".zip", ".rar", ".mp3", ".mp4", ".avi", ".apk", ".dmg", ".iso",
    ".gz", ".tar", ".7z", ".pdf", ".doc", ".xls", ".ppt", ".swf",
)
BAD_QUERY_TOKENS = ("login", "register", "logout", "signup", "url=", "wd=")
MAX_PATH_DEPTH = 10
MAX_QUERY_LEN = 1000
MAX_URL_LEN = 4096


def canonicalize(url: str) -> str | None:
    """Independent twin of urlkit.canonicalize_url (same rule book,
    different implementation: urllib-based)."""
    u = url.strip()
    while len(u) >= 3 and u[0] == "%" and all(
        c in "0123456789abcdefABCDEF" for c in u[1:3]
    ):
        u = u[3:]
    u = u.split("#", 1)[0]
    import re

    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", u):
        u = "http://" + u
    try:
        parts = urlsplit(u)
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None  # unparseable authority (e.g. non-numeric port)
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        hostport = f"{host}:{port}"
    else:
        hostport = host
    path = parts.path or "/"
    out = f"{scheme}://{hostport}{path}"
    if parts.query:
        out += "?" + parts.query
    if len(out) > MAX_URL_LEN or not host or not scheme:
        return None
    if not re.match(r"^[a-z0-9_-]+(\.[a-z0-9_-]+)*$", host):
        return None  # GURL-validity role (api/base.cc:59)
    return out


def rule_filter(url: str) -> bool:
    parts = urlsplit(url)
    path, query = (parts.path or "/").lower(), parts.query.lower()
    if any(path.endswith(s) for s in BAD_PATH_SUFFIXES):
        return False
    if any(t in query for t in BAD_QUERY_TOKENS):
        return False
    if path.count("/") >= MAX_PATH_DEPTH:
        return False
    if len(parts.query) > MAX_QUERY_LEN:
        return False
    return True


@dataclass
class SimRobots:
    """host → (has_robots, allow_all, disallow_prefixes)."""

    rules: dict[str, tuple[bool, bool, list[str]]] = field(default_factory=dict)

    def level(self, host: str, path: str) -> int:
        rec = self.rules.get(host)
        if rec is None or not rec[0]:
            return 1
        _, allow_all, prefixes = rec
        if any(path.startswith(p) for p in prefixes):
            return 0
        return 2 if allow_all else 3


@dataclass
class SimSpec:
    default_budget: int = 15
    budgets: dict[str, int] = field(default_factory=dict)
    max_depth: int = 4
    max_rounds: int = 50
    policy_level: int = 2
    holdon_failures: int = 10
    holdon_rounds: int = 1
    max_failed_times: int = 100
    # url → uv signal (twin of CrawlRun(signals=...): score adds uv)
    signals: dict[str, float] = field(default_factory=dict)
    # per-ip cap (twin of CrawlRun(host_ips=…, ip_budgets=…)):
    # host → ip dim and ip → budget; ips without a budget are uncapped
    host_ips: dict[str, str] = field(default_factory=dict)
    ip_budgets: dict[str, int] = field(default_factory=dict)
    # twin of RoundSpec.recrawl_ttl_rounds: a url whose latest crawl is
    # exactly ttl rounds old leaves the seen set (re-admit on rediscovery)
    recrawl_ttl_rounds: int | None = None
    # twin of RoundSpec.frontier_host_cap: per-host frontier depth cut at
    # the merge, keep order (vip desc, depth asc, url asc), overflow lost
    frontier_host_cap: int | None = None
    # twin of CrawlRun(extract_rules=…): ordered (host_glob, path_glob,
    # target_regex) — first rule matching the REFERER gates its outlinks
    extract_rules: list[tuple[str, str, str]] = field(default_factory=list)
    # twin of politeness.window_budgets: (host, begin_min, end_min,
    # budget) time-of-day windows, both ends closed, non-overlapping per
    # host; hosts outside every window use default_budget
    budget_windows: list[tuple[str, int, int, int]] = field(
        default_factory=list)
    round_seconds: float = 5.0  # logical minute = r*round_seconds//60
    # twin of RoundSpec.rule_book_strict: strict selector rule tables
    rule_book_strict: bool = False


def is_vip(url: str, from_seed: bool) -> bool:
    """Twin of selector.is_vip at the two source codes the round uses:
    seeds ('U') are always VIP; extracted links ('E') are VIP iff they are
    site homepages (crawler_selector_util.h:21-34)."""
    import re

    return from_seed or bool(re.match(r"^[a-z]+://[^/]+/$", url))


def simulate(
    seeds: list[str],
    adjacency: dict[str, list[str]],
    robots: SimRobots,
    spec: SimSpec,
) -> dict:
    """Run the crawl to exhaustion. Returns
    {"rounds": [sorted admitted urls per round], "seen": sorted seen urls}.
    """

    def host_path(url: str) -> tuple[str, str]:
        p = urlsplit(url)
        return (p.hostname or "").lower(), p.path or "/"

    import re as _re

    def glob_match(glob: str, s: str) -> bool:
        # independent twin of selector.glob_to_regex (*/? wildcards)
        pat = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in glob
        )
        return _re.fullmatch(pat, s) is not None

    def extract_rule_ok(canon_url: str, ref: str | None) -> bool:
        """Twin of selector.apply_extract_rules: first rule matching the
        referer's (host, path) gates the outlink by target FullMatch."""
        if ref is None or not spec.extract_rules:
            return True
        rp = urlsplit(ref)
        rhost, rpath = (rp.hostname or "").lower(), rp.path or "/"
        for host_g, path_g, target_re in spec.extract_rules:
            if glob_match(host_g, rhost) and glob_match(path_g, rpath):
                return _re.fullmatch(f"(?:{target_re})", canon_url) is not None
        return True

    def prepare(raw: list[tuple[str, int, str | None]], from_seed: bool):
        """(url, depth, referer) → admitted-to-frontier rows + vip flag."""
        out = []
        for url, depth, ref in raw:
            c = canonicalize(url)
            if c is None or not extract_rule_ok(c, ref):
                continue
            # P7 full rule book (host black/restrict lists + site rules):
            # the straight-line twin of the engine's rule_book_keep gate,
            # the ONLY rule gate in round._prepare_candidates (the legacy
            # approximate rule_filter twin is standalone-operator-only,
            # matching the engine). Data tables are shared config; the
            # matching logic is independent.
            from .rulebook import will_filter_py

            if will_filter_py(c, strict=spec.rule_book_strict,
                              allow_https=True):
                continue
            host, path = host_path(c)
            # black-hole gate twin (selector.is_black_hole_link — the
            # host dict is shared config data, the logic is independent)
            from .selector import BLACK_HOLE_HOSTS

            if ref is not None:
                rp = urlsplit(ref)
                rhost = (rp.hostname or "").lower()
                if (rhost in BLACK_HOLE_HOSTS and rp.query
                        and host == rhost and urlsplit(c).query):
                    continue
            if robots.level(host, path) < spec.policy_level:
                continue
            if depth > spec.max_depth:
                continue
            out.append((c, host, depth, ref, is_vip(c, from_seed)))
        return out

    # frontier: url → (host, depth, vip)  (min depth wins; vip ORs)
    frontier: dict[str, tuple[str, int, bool]] = {}

    def add(rows):
        for url, host, depth, _ref, vip in rows:
            cur = frontier.get(url)
            if cur is None:
                frontier[url] = (host, depth, vip)
            else:
                frontier[url] = (host, min(depth, cur[1]), vip or cur[2])

    def cap_frontier():
        """Twin of CrawlRun._cap_frontier: per-host (vip desc, depth asc,
        url asc) head, overflow dropped."""
        if spec.frontier_host_cap is None:
            return
        by_h: dict[str, list[tuple[bool, int, str]]] = {}
        for url, (host, depth, vip) in frontier.items():
            by_h.setdefault(host, []).append((not vip, depth, url))
        for host, rows in by_h.items():
            if len(rows) > spec.frontier_host_cap:
                rows.sort()
                for _, _, url in rows[spec.frontier_host_cap:]:
                    del frontier[url]

    add(prepare([(u, 0, None) for u in seeds], from_seed=True))
    cap_frontier()  # the engine caps the bootstrap frontier too
    seen: set[str] = set()
    crawled_round: dict[str, int] = {}  # url → latest crawl round (TTL)
    consec: dict[str, int] = {}
    holdon_until: dict[str, int] = {}
    dropped: set[str] = set()
    rounds: list[list[str]] = []

    for r in range(spec.max_rounds):
        # recrawl TTL (scheduler.cc:381-393 twin): urls whose latest crawl
        # is exactly ttl rounds old leave the seen set before this round's
        # dedupe — rediscovered copies then re-admit
        if spec.recrawl_ttl_rounds is not None:
            for u, rr in crawled_round.items():
                if rr == r - spec.recrawl_ttl_rounds:
                    seen.discard(u)
        # dedupe vs seen — VIP rows bypass the seen-drop (J4 override)
        for u in [u for u in frontier if u in seen and not frontier[u][2]]:
            del frontier[u]
        # per-host admission
        by_host: dict[str, list[tuple[int, float, str]]] = {}
        for url, (host, depth, _vip) in frontier.items():
            score = 1000.0 / (depth + 1) + spec.signals.get(url, 0.0)
            pri = 0 if score >= 500 else 10 if score >= 100 else \
                30 if score >= 10 else 50
            by_host.setdefault(host, []).append((pri, -score, url))
        admitted: list[tuple[str, str, int]] = []
        for host, rows in by_host.items():
            if host in dropped or holdon_until.get(host, -1) >= r:
                continue
            rows.sort()
            b = None
            if spec.budget_windows:
                minute = int(r * spec.round_seconds // 60) % 1440
                matches = [
                    wb for h, lo, hi, wb in spec.budget_windows
                    if h == host and lo <= minute <= hi
                ]
                if matches:
                    b = min(matches)
            if b is None:
                b = spec.budgets.get(host, spec.default_budget)
            for pri, negscore, url in rows[:b]:
                admitted.append((url, host, frontier[url][1]))
        # second-stage per-ip cap (load_controller.h:18-52 twin): among
        # host-admitted rows, each budgeted ip keeps its first `budget`
        # rows in global frontier order; the rest stay in the frontier
        if spec.ip_budgets:
            by_ip: dict[str, list[tuple[int, float, str]]] = {}
            for url, host, depth in admitted:
                ip = spec.host_ips.get(host)
                if ip is not None and ip in spec.ip_budgets:
                    score = 1000.0 / (depth + 1) + spec.signals.get(url, 0.0)
                    pri = 0 if score >= 500 else 10 if score >= 100 else \
                        30 if score >= 10 else 50
                    by_ip.setdefault(ip, []).append((pri, -score, url))
            demoted: set[str] = set()
            for ip, iprows in by_ip.items():
                iprows.sort()
                for _, _, url in iprows[spec.ip_budgets[ip]:]:
                    demoted.add(url)
            admitted = [a for a in admitted if a[0] not in demoted]
        rounds.append(sorted(u for u, _, _ in admitted))

        # fetch + host state
        new_raw: list[tuple[str, int, str | None]] = []
        host_success: dict[str, bool] = {}
        host_fail: dict[str, int] = {}
        for url, host, depth in admitted:
            seen.add(url)
            crawled_round[url] = r
            del frontier[url]
            if url in adjacency:
                host_success[host] = True
                for link in adjacency[url]:
                    new_raw.append((link, depth + 1, url))
            else:
                host_fail[host] = host_fail.get(host, 0) + 1
        for host in set(list(host_success) + list(host_fail)):
            if host_success.get(host):
                consec[host] = 0
            else:
                consec[host] = consec.get(host, 0) + host_fail.get(host, 0)
                if consec[host] >= spec.holdon_failures:
                    holdon_until[host] = r + spec.holdon_rounds
                if consec[host] >= spec.max_failed_times:
                    dropped.add(host)

        # new candidates: just-admitted urls are excluded (the engine's
        # anti-join vs this round's admitted set). Seen urls stay in the
        # frontier for one round and fall to next round's seen-dedupe —
        # exactly the engine's probe timing, which matters under TTL
        # expiry (a url rediscovered the round before it expires must
        # re-admit in both twins).
        batch = {u for u, _, _ in admitted}
        add([
            x for x in prepare(new_raw, from_seed=False)
            if x[0] not in batch
        ])
        # per-host frontier depth cap (reducer_compress_control.cc:128-169
        # twin) at the merge, same rule as the bootstrap cap
        cap_frontier()
        if not frontier and not admitted:
            break

    # strip trailing empty rounds (clock ticks with no admissions)
    while rounds and not rounds[-1]:
        rounds.pop()
    # "seen" = the live dedup state (TTL expiry removes entries);
    # "crawled" = everything ever fetched (the linkbase's url set) —
    # identical unless recrawl_ttl_rounds is set
    return {"rounds": rounds, "seen": sorted(seen),
            "crawled": sorted(crawled_round)}
