"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry re-expresses one operator family from SURVEY.md §2
over the driver's parquet tables; ``oracle_sql()`` holds the DuckDB twin.
Column names/aliases match exactly on both sides; every float output is
ROUND()ed identically so the order-insensitive value-hash compares stable
digits. Entries without an oracle (hash-based / crawl-native ops) get the
driver's rows-only check and are covered by differential pytest instead.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ensure_shipped(spark: SparkSession) -> None:
    """Make spider_spark importable on executor python workers regardless
    of the driver's cwd (the programmatic --py-files role)."""
    from spider_spark.session import _ship_package

    _ship_package(spark)


# ===========================================================================
# entry — flagship smoke query (sf0.001)
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-host top-k crawl scheduling over the events table
    (SURVEY.md §7.2): synthesize host/url from the event stream, score by
    summed value, admit top-3 per host in deterministic order — the T3/J7
    dispatcher shape (reducer_compress_control.cc:40-169)."""
    _ensure_shipped(spark)
    events = _t(spark, "/root/testdata/sf0.001", "events")
    urls = events.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("host"),
        F.concat(
            F.lit("http://h"), (F.col("user_id") % 20).cast("string"),
            F.lit(".example.com/e/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("value"),
    )
    scored = urls.groupBy("host", "url").agg(F.sum("value").alias("score"))
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("host", "url", F.round("score", 4).alias("score"))
    )


# ===========================================================================
# queries
# ===========================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spider_spark import dedup, frontier, logs, similarity, textstats
    from spider_spark import simhash as sh
    from spider_spark import urlkit

    # -- aggregations (SURVEY §2.5) ----------------------------------------

    def uv_scores(spark, sf):
        """A1 (uv_data.cc:293-433): per-(user,kind) capped UV, sum per kind."""
        _ensure_shipped(spark)
        ev = _t(spark, sf, "events")
        per_user = ev.groupBy("user_id", "event_type").agg(
            F.max("value").alias("mx")
        )
        return per_user.groupBy("event_type").agg(
            F.round(F.sum("mx"), 4).alias("uv"),
            F.count("*").alias("n_users"),
        )

    def host_stat(spark, sf):
        """A3 (host_stat.cc:47-101): count per group, partial agg built-in."""
        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(F.count("*").alias("n_urls"))

    def distinct_users(spark, sf):
        """A6 (query_count.cc:14-61): per query distinct users."""
        ev = _t(spark, sf, "events")
        return logs.query_user_counts(ev, "event_type", "user_id")

    def url_ref_pairs(spark, sf):
        """A5 (url_ref_count.cc:17-56): distinct (url, ref) pairs."""
        ev = _t(spark, sf, "events")
        return logs.url_ref_pairs(ev, "user_id", "event_type")

    def hub_users(spark, sf):
        """A8 (hub_page_dig, kOutLinkMinNum=5→4): users covering ≥4 kinds."""
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("n_types"))
            .filter(F.col("n_types") >= 4)
        )

    def status_barrier(spark, sf):
        """A2 (uv_data.cc:437-541): success cancels recrawl; failures
        retry with try+1, dropped at 3. Barrier unit = (user, day): at the
        coarser per-user grain every sf0.01 user has a success, so the
        query returned 0 rows — a vacuous oracle (VERDICT r1)."""
        ev = _t(spark, sf, "events")
        agg = ev.groupBy(
            "user_id", F.col("ts").cast("date").cast("string").alias("day")
        ).agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .alias("n_err"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("ok"),
        )
        return (
            agg.filter((F.col("ok") == 0) & (F.col("n_err") < 3))
            .select("user_id", "day",
                    (F.col("n_err") + 1).cast("long").alias("try_times"))
        )

    # -- joins (SURVEY §2.4) ------------------------------------------------

    def seen_anti_join(spark, sf):
        """J3 (set_filter --filt_out_in_dict): customers with no orders."""
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return c.join(
            o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey", "left_anti",
        ).select("c_custkey", "c_name")

    def revenue_per_nation(spark, sf):
        """J1 (url_to_ip broadcast-join shape): fact ⋈ broadcast dims."""
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name", "r_name")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
        )

    def segment_priority(spark, sf):
        """J6/J7 shape: equi-join + filter + agg over composite key."""
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .filter(F.col("c_mktsegment") == "BUILDING")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            )
        )

    def latest_wins(spark, sf):
        """U3 (mr_link_merge_reducer.cc:72-77): latest record per key."""
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type",
                    F.round("value", 4).alias("value"))
        )

    # -- windows / sorts / top-k (SURVEY §2.6, §2.10) -----------------------

    def sessionize(spark, sf):
        """Session segmentation (pvlog_segmenter.h:80-94), 300s gap."""
        ev = _t(spark, sf, "events").withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )
        s = logs.sessionize(ev, "user_id", "ts_us", ref_col=None,
                            no_ref_gap=300_000_000)
        return s.groupBy("user_id").agg(
            (F.max("session_id") + 1).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )

    def session_signs(spark, sf):
        """Session identity sign (session_segment_util.h:20-24,
        pvlog_segmenter.cc:349-365): md5(uid \\t session-first-ts \\t
        1-based session ordinal), one per (uid, session); md5 exists on
        both engines so the sign itself is oracle-checked."""
        ev = _t(spark, sf, "events").withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )
        s = logs.sessionize(ev, "user_id", "ts_us", ref_col=None,
                            no_ref_gap=300_000_000, with_sign=True)
        return s.groupBy("user_id", "session_sign").agg(
            F.count("*").alias("n_hits")
        )

    def window_budgets(spark, sf):
        """L1 time-of-day windows (host_load_control.txt HH:MM-HH:MM,
        load_controller.cc:46-92): effective (host, budget) dim at the
        round's minute-of-day (round 301 × 60 s ⇒ minute 301)."""
        from spider_spark import politeness as pol

        p = _t(spark, sf, "part")
        dims = p.select(
            F.concat(F.lit("h"), (F.col("p_partkey") % 20).cast("string"))
            .alias("host"),
            ((F.col("p_partkey") % 12) * 120).cast("int").alias("begin_min"),
            ((F.col("p_partkey") % 12) * 120 + 119).cast("int")
            .alias("end_min"),
            (F.col("p_partkey") % 7 + 1).cast("int").alias("budget"),
        )
        return pol.window_budgets(
            dims, round_no=301, spec=pol.PolitenessSpec(round_seconds=60.0)
        )

    def extract_whitelist(spark, sf):
        """E3 per-referer extract whitelist (extractor.cc:202-281,
        url_extract_rule.h): first rule matching the referer's host/path
        globs gates outlinks by target FullMatch; no rule → free; NULL
        referer bypasses."""
        from spider_spark.selector import apply_extract_rules

        p = _t(spark, sf, "part")
        cand = p.select(
            "p_partkey",
            F.concat(
                F.lit("http://t"), (F.col("p_partkey") % 9).cast("string"),
                F.lit(".example.com/"),
                F.when(F.col("p_partkey") % 3 == 0, "item/")
                .otherwise("other/"),
                F.col("p_partkey").cast("string"),
            ).alias("url"),
            F.when(
                F.col("p_partkey") % 4 == 0,
                F.concat(F.lit("http://ref.shop.com/list/"),
                         (F.col("p_partkey") % 5).cast("string")),
            ).when(
                F.col("p_partkey") % 4 == 1,
                F.lit("http://free.example.com/x"),
            ).otherwise(F.lit(None).cast("string")).alias("referer"),
        )
        rules = [("*.shop.com", "/list/*",
                  r"http://t\d+\.example\.com/item/\d+")]
        return apply_extract_rules(cand, rules)

    def topk_per_group(spark, sf):
        """T3 (reducer_compress_control.cc:153-169): top-5 per group."""
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("event_type").orderBy(
            F.desc("value"), F.asc("event_id")
        )
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("event_type", "event_id",
                    F.round("value", 4).alias("value"))
        )

    def task_chunks(spark, sf):
        """T5 (schedule_to_fetcher_id.cc:96-97): fixed-size task files."""
        ev = _t(spark, sf, "events")
        chunked = frontier.chunk_tasks(ev, "event_type", ["event_id"], 500)
        return chunked.groupBy("event_type", "task_id").agg(
            F.count("*").alias("n")
        )

    def binpack(spark, sf):
        """T4 (ip_to_fetcher_id.py:9-33): greedy cumsum bin-pack."""
        ev = _t(spark, sf, "events")
        costs = ev.groupBy(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("ip")
        ).agg(F.sum("value").alias("cost"))
        packed = frontier.binpack_fetchers(costs, n_fetchers=8)
        return packed.groupBy("fetcher_id").agg(
            F.count("*").alias("n_ips"),
            F.round(F.sum("cost"), 2).alias("total_cost"),
        )

    def priority_bands(spark, sf):
        """T2 (split_by_pri.sh:23-116): frontier banding by ratio cuts."""
        o = _t(spark, sf, "orders")
        banded = frontier.batch_priority_band(
            o, score_col="o_totalprice", tiebreak="o_orderkey"
        )
        return banded.groupBy("priority").agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("band_value"),
        )

    def pricing_summary(spark, sf):
        """TPC-H Q1 shape (the classic partial-agg benchmark; uv_data's
        map-side combine is the same algorithm)."""
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("sum_disc_price"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                    ),
                    2,
                ).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    # -- URL expression library (SURVEY §2.2) -------------------------------

    def canonicalize_urls(spark, sf):
        """P1 (NormalizeUrl, api/base.cc:19-61): messy → canonical."""
        _ensure_shipped(spark)
        p = _t(spark, sf, "part")
        messy = p.select(
            "p_partkey",
            F.concat(
                F.lit("  HTTP://WWW.Example-"),
                (F.col("p_partkey") % 100).cast("string"),
                F.lit(".COM:80/item/"),
                F.col("p_partkey").cast("string"),
                F.lit("#section"),
            ).alias("raw"),
        )
        return messy.select(
            "p_partkey", urlkit.canonicalize_url(F.col("raw")).alias("url")
        )

    def url_rules(spark, sf):
        """P7 (crawler_selector_util.cc:32-305): rule-book keep/drop."""
        p = _t(spark, sf, "part")
        suffix = (
            F.when(F.col("p_partkey") % 7 == 0, ".exe")
            .when(F.col("p_partkey") % 7 == 1, ".zip")
            .otherwise(".html")
        )
        qtok = F.when(F.col("p_partkey") % 5 == 0, "login").otherwise("ok")
        urls = p.select(
            "p_partkey",
            F.concat(
                F.lit("http://files.example.com/f/"),
                F.col("p_partkey").cast("string"), suffix,
                F.lit("?q="), qtok,
            ).alias("url"),
        )
        return urls.filter(urlkit.url_rule_filter(F.col("url")))

    def reverse_hosts(spark, sf):
        """P5 (ReverseUrl, api/base.cc:93-139): host segment reversal."""
        s = _t(spark, sf, "supplier")
        host = F.when(
            F.col("s_suppkey") % 10 == 0,
            F.concat(F.lit("10.0.0."), (F.col("s_suppkey") % 250).cast("string")),
        ).otherwise(
            F.concat(F.lit("mail.s"), F.col("s_suppkey").cast("string"),
                     F.lit(".example.com"))
        )
        return s.select(
            "s_suppkey", host.alias("host"),
            urlkit.reverse_host(host).alias("rhost"),
        )

    def registered_domains(spark, sf):
        """P6 (ParseHost, api/base.cc:141-201) against the FULL tld.dat
        table (data_tld, 3,599 suffixes): longest-proper-suffix match;
        host shapes exercise 1/2/3-label suffixes, the reference data's
        co.uk quirk (its tld.dat has 'uk' but not 'co.uk'), and the
        no-match → NULL path. Runs the broadcast-join scale path
        (attach_registered_domain); pytest covers the column variant and
        the pure-python twin differentially."""
        s = _t(spark, sf, "supplier")
        k = F.col("s_suppkey")
        ks = k.cast("string")
        host = (
            F.when(k % 5 == 0, F.concat(F.lit("www.shop"), ks, F.lit(".co.uk")))
            .when(k % 5 == 1, F.concat(F.lit("lab.u"), ks, F.lit(".ac.jp")))
            .when(k % 5 == 2,
                  F.concat(F.lit("x.school"), ks, F.lit(".act.edu.au")))
            .when(k % 5 == 3,
                  F.concat(F.lit("a.b.site"), ks, F.lit(".example.com")))
            .otherwise(F.concat(F.lit("nomatch"), ks, F.lit(".localdomain")))
        )
        return urlkit.attach_registered_domain(
            s.select("s_suppkey", host.alias("host"))
        )

    def rule_book(spark, sf):
        """P7's full rule book (crawler_selector_util.cc:32-237 shipped as
        data in spider_spark.rulebook): WillFilterAccordingRules decision +
        matched search engine per url — blacklist host, restrict-to-
        homepage host, rule-book rows (Taobao trade, generic .com login),
        path-suffix and clean-keep cases."""
        from spider_spark import rulebook

        p = _t(spark, sf, "part")
        k = F.col("p_partkey")
        ks = k.cast("string")
        url = (
            F.when(k % 7 == 0, F.lit("http://ptlogin2.qq.com/x"))
            .when(k % 7 == 1, F.concat(F.lit("http://weibo.com/u/"), ks))
            .when(k % 7 == 2, F.lit("http://weibo.com/"))
            .when(k % 7 == 3,
                  F.concat(F.lit("http://trade.taobao.com/trade/item"), ks,
                           F.lit(".htm?id=1")))
            .when(k % 7 == 4,
                  F.concat(F.lit("http://www.site"), (k % 50).cast("string"),
                           F.lit(".com/a/login/page?next=1")))
            .when(k % 7 == 5,
                  F.concat(F.lit("http://files.x.com/f/"), ks, F.lit(".pdf")))
            .otherwise(
                F.concat(F.lit("http://ok.site"), (k % 50).cast("string"),
                         F.lit(".org/article/"), ks))
        )
        urls = p.select("p_partkey", url.alias("url")).withColumns({
            "host": urlkit.url_host(F.col("url")),
            "path": urlkit.url_path(F.col("url")),
            "query": urlkit.url_query(F.col("url")),
        })
        return urls.select(
            "p_partkey", "url",
            rulebook.will_filter_according_rules(
                F.col("url"), F.col("host"), F.col("path"), F.col("query")
            ).alias("filtered"),
            rulebook.search_engine_of(
                F.col("host"), F.col("path"), F.col("query")
            ).alias("engine"),
        )

    # -- dedup / text / similarity (training-data ops) ----------------------

    def dedup_stats(spark, sf):
        """Exact-dedup accounting: distinct content per source (md5)."""
        d = _t(spark, sf, "documents")
        return d.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )

    def minhash_near_dups(spark, sf):
        """MinHash+LSH near-dup pairs, exact-Jaccard verified ≥ 0.8
        (the shingle→band→bucket-join pipeline)."""
        _ensure_shipped(spark)
        d = _t(spark, sf, "documents")
        pairs = dedup.minhash_near_duplicates(
            d, "doc_id", "text", k=128, bands=32, shingle=3, threshold=0.8
        )
        return pairs.select(
            "a", "b", F.round("jaccard", 6).alias("jaccard")
        )

    def dedup_clusters(spark, sf):
        """Near-dup cluster resolution: minhash pairs → connected
        components by min-label propagation (dedup.resolve_pair_clusters)
        → every doc's canonical survivor id (singletons keep themselves).
        The DuckDB twin closes the same pairs with a recursive CTE."""
        _ensure_shipped(spark)
        d = _t(spark, sf, "documents")
        pairs = dedup.minhash_near_duplicates(
            d, "doc_id", "text", k=128, bands=32, shingle=3, threshold=0.8
        )
        clusters = dedup.resolve_pair_clusters(pairs, "a", "b")
        return (
            d.select(F.col("doc_id").alias("id"))
            .join(clusters, "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                F.coalesce("keep_id", "id").alias("keep_id"),
            )
        )

    def dedup_clusters_star(spark, sf):
        """Same cluster resolution through the large-star/small-star
        connected-components variant (Kiveris et al. — O(log n) rounds
        regardless of component diameter; the 10^10-edge scale path).
        Shares dedup_clusters' recursive-CTE oracle: both algorithms must
        produce the identical (doc_id, keep_id) table."""
        _ensure_shipped(spark)
        d = _t(spark, sf, "documents")
        pairs = dedup.minhash_near_duplicates(
            d, "doc_id", "text", k=128, bands=32, shingle=3, threshold=0.8
        )
        clusters = dedup.resolve_pair_clusters(
            pairs, "a", "b", algorithm="star")
        return (
            d.select(F.col("doc_id").alias("id"))
            .join(clusters, "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                F.coalesce("keep_id", "id").alias("keep_id"),
            )
        )

    def token_stats(spark, sf):
        """Token counting + quality rollup per language."""
        d = _t(spark, sf, "documents")
        return textstats.corpus_stats(d, "text", "lang").withColumnRenamed(
            "grp", "lang"
        )

    def lang_detect(spark, sf):
        """Language-ID heuristic vs the labeled lang column (cross-tab)."""
        d = _t(spark, sf, "documents")
        pred = d.select(
            "lang", textstats.detect_language(F.col("text")).alias("lang_pred")
        )
        return pred.groupBy("lang", "lang_pred").agg(
            F.count("*").alias("n")
        )

    def doc_fingerprints(spark, sf):
        """Document fingerprinting: stable content hash per doc."""
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id", textstats.doc_fingerprint(F.col("text")).alias("fp")
        )

    def knn_cosine(spark, sf):
        """Brute-force cosine top-10 around vec_id=0 (ANN baseline)."""
        e = _t(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
        out = similarity.knn_brute(
            e.filter(F.col("vec_id") != 0), list(qrow["embedding"]), k=10
        )
        return out.select("vec_id", F.round("cosine", 4).alias("cosine"))

    # -- crawl-native ops (no SQL oracle → rows-only + pytest differential) -

    def simhash_signs(spark, sf):
        """D1: 64-bit simhash per document (pytest covers hamming pairs)."""
        _ensure_shipped(spark)
        d = _t(spark, sf, "documents")
        return d.select("doc_id", sh.simhash64(F.col("text")).alias("simhash"))

    def url_shards(spark, sf):
        """P3/P4: fingerprint + shard assignment distribution."""
        ev = _t(spark, sf, "events")
        urls = ev.select(
            F.concat(F.lit("http://h"), (F.col("user_id") % 50).cast("string"),
                     F.lit(".example.com/e/"),
                     F.col("event_id").cast("string")).alias("url")
        )
        return urls.select(
            urlkit.shard_id(F.col("url"), 32).alias("shard")
        ).groupBy("shard").agg(F.count("*").alias("n"))

    def interleaved_outlinks(spark, sf):
        """E1-E3 over the interleaved synthetic web: outlinks per host."""
        _ensure_shipped(spark)
        from spider_spark.spans import WebSpec, extract_outlinks, generate_documents

        docs = generate_documents(
            spark, WebSpec(n_hosts=20, pages_per_host=10, skew_hosts=2,
                           skew_pages=50, links_per_page=5)
        )
        out = extract_outlinks(docs)
        return out.select(
            urlkit.url_host(F.col("outlink")).alias("host")
        ).groupBy("host").agg(F.count("*").alias("n_links"))

    def outlink_extract(spark, sf):
        """E1 regex href extraction + A9 per-page sort+unique
        (text_handler.cc:102-137,133-136) over anchor markup synthesized
        deterministically from the part table — the oracle-checked twin of
        the generator-web `interleaved_outlinks`. The first link appears
        twice in the markup so the oracle also proves the per-page dedup."""
        from spider_spark.spans import extract_outlinks_regex

        p = _t(spark, sf, "part")
        l1 = F.concat(
            F.lit("http://h"), (F.col("p_partkey") % 50).cast("string"),
            F.lit(".example.com/p/"), (F.col("p_partkey") % 7).cast("string"),
        )
        l2 = F.concat(
            F.lit("http://h"), (F.col("p_partkey") % 31).cast("string"),
            F.lit(".example.com/q"),
        )
        markup = F.concat(
            F.lit("<p>"), F.col("p_name"), F.lit('</p><a href="'), l1,
            F.lit('">x</a> <a href="'), l2, F.lit('">y</a> <a href="'), l1,
            F.lit('">again</a>'),
        )
        docs = p.select(
            F.col("p_partkey").alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("text/html").alias("kind"),
                    markup.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
        return extract_outlinks_regex(docs).select("doc_id", "outlink")

    def hub_dig(spark, sf):
        """A8 hub-page dig (hub_page_dig mapper/reducer, kOutLinkMinNum):
        per page, countDistinct(extracted outlinks) ≥ threshold → hub.
        Pages get a VARIABLE link count (2..5 via p_partkey) so the
        threshold actually cuts; duplicate hrefs prove the DISTINCT."""
        from spider_spark.spans import extract_outlinks_regex

        p = _t(spark, sf, "part")
        k = F.col("p_partkey")
        n_links = (k % 4 + 2).cast("int")  # 2..5 distinct links
        link_i = lambda i: F.concat(
            F.lit("http://h"), ((k + i) % 40).cast("string"),
            F.lit(".example.com/l/"), F.lit(str(i)),
        )
        a_tag = lambda i: F.when(
            n_links > i,
            F.concat(F.lit('<a href="'), link_i(i), F.lit('">x</a>')),
        ).otherwise(F.lit(""))
        markup = F.concat(a_tag(0), a_tag(1), a_tag(2), a_tag(3), a_tag(4),
                          a_tag(0))  # dup of link 0 → DISTINCT matters
        docs = p.select(
            F.col("p_partkey").alias("doc_id"),
            F.array(F.struct(
                F.lit("text/html").alias("kind"), markup.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )).alias("spans"),
        )
        out = extract_outlinks_regex(docs)
        return (
            out.groupBy("doc_id")
            .agg(F.countDistinct("outlink").alias("n_outlinks"))
            .filter(F.col("n_outlinks") >= 4)
        )

    def proxy_route(spark, sf):
        """L3 (ip_url_split.cc:64-119): heavy ips routed via PROXY."""
        from spider_spark import selector as sel

        o = _t(spark, sf, "orders")
        urls = o.select(
            "o_orderkey",
            F.concat(F.lit("ip-"), (F.col("o_custkey") % 20).cast("string"))
            .alias("ip"),
            F.lit("x.com").alias("domain"),
        )
        routed = sel.proxy_route(urls, threshold=800)
        return routed.groupBy("ip", "use_proxy").agg(
            F.count("*").alias("n")
        )

    def ip_load(spark, sf):
        """A4 (ip_stat.cc:37-79): per-ip crawl-cost estimate."""
        from spider_spark import selector as sel

        o = _t(spark, sf, "orders")
        urls = o.select(
            F.concat(F.lit("ip-"), (F.col("o_custkey") % 50).cast("string"))
            .alias("ip")
        )
        est = sel.ip_load_estimate(urls, None)
        return est.select("ip", "n_urls", F.round("cost", 4).alias("cost"))

    def url_transforms(spark, sf):
        """P11-P13: TEL/QQ strip, AJAX #! rewrite, redirect unwrap."""
        from spider_spark import selector as sel

        p = _t(spark, sf, "part")
        raw = p.select(
            "p_partkey",
            F.concat(F.lit("http://x.com/p/"),
                     F.col("p_partkey").cast("string"),
                     F.when(F.col("p_partkey") % 3 == 0, " TEL:12345")
                     .when(F.col("p_partkey") % 3 == 1, "#!/sec/9")
                     .otherwise("")).alias("raw"),
        )
        return raw.select(
            "p_partkey",
            sel.transform_ajax_url(
                sel.strip_tel_qq(F.col("raw"))
            ).alias("url"),
        )

    def site_paginators(spark, sf):
        """E4 (extractor.cc:440-551, url_util.cc:654-677,1050-1076):
        per-site next-list-page fan-out; urls synthesized
        deterministically from part keys (suning append-style on even
        keys, taobao offset-style on odd)."""
        from spider_spark import paginators as P

        p = _t(spark, sf, "part")
        k = F.col("p_partkey").cast("string")
        src = p.select(
            F.when(
                F.col("p_partkey") % 2 == 0,
                F.concat(F.lit("http://search.suning.com/emall/strd.do?ci="),
                         k, F.lit("&cityId=9173")),
            ).otherwise(
                F.concat(F.lit("http://list.taobao.com/market/p"), k,
                         F.lit(".htm?cat="), k)
            ).alias("url"),
            (F.lit(2) + F.col("p_partkey") % 3).cast("int").alias("page_num"),
        )
        return P.build_next_list_pages(src)

    def eval_success(spark, sf):
        """A10 (evaluation.h:7-30): top-N crawl success rate by decile."""
        from spider_spark import selector as sel

        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        # top-N via sort+limit = TakeOrderedAndProject (per-partition
        # top-100 merged on the driver — parallel at any scale); the
        # row_number window then ranks only the ≤100 surviving rows, never
        # the full customer table
        sort_cols = [F.desc("c_acctbal"), F.asc("c_custkey")]
        topn = (
            c.select("c_custkey", "c_acctbal")
            .orderBy(*sort_cols).limit(100)
            .withColumn("rank", F.row_number().over(Window.orderBy(*sort_cols)) - 1)
            .select(F.col("c_custkey").alias("url"), "rank")
        )
        crawled = o.select(F.col("o_custkey").alias("url"))
        return sel.crawl_success_eval(topn, crawled)

    def ip_attach(spark, sf):
        """J1+L5: dns dim join with deterministic ip pick (rows-only —
        xxhash-derived ips have no SQL twin)."""
        from spider_spark import selector as sel

        ev = _t(spark, sf, "events")
        urls = ev.select(
            F.concat(F.lit("http://h"), (F.col("user_id") % 40).cast("string"),
                     F.lit(".example.com/e/"),
                     F.col("event_id").cast("string")).alias("url"),
            F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"),
                     F.lit(".example.com")).alias("host"),
        )
        dns = sel.synthetic_dns(spark, urls)
        out = sel.attach_ip(urls, dns)
        return out.groupBy("host", "ip").agg(F.count("*").alias("n"))

    def md5_resolve(spark, sf):
        """J5 (pv_r1.cc:42-337): md5→url literal resolution with a GLOBAL
        dictionary, conflicting map rows latest-timestamp-wins."""
        ev = _t(spark, sf, "events")
        pv = ev.filter(F.col("event_id") % 2 == 0).select(
            F.col("event_id"),
            F.concat(F.lit("m"), (F.col("event_id") % 9).cast("string"))
            .alias("url_md5"),
            F.concat(F.lit("m"), (F.col("event_id") % 13).cast("string"))
            .alias("ref_md5"),
        )
        md5_map = ev.filter(F.col("event_id") % 2 == 1).select(
            F.concat(F.lit("m"), (F.col("event_id") % 11).cast("string"))
            .alias("md5"),
            F.concat(F.lit("http://m.example.com/"),
                     (F.col("event_id") % 40).cast("string")).alias("url"),
            (F.col("event_id") % 1000).alias("ts"),
        )
        out = logs.resolve_md5_urls(pv, md5_map)
        return out.select("event_id", "url_md5", "ref_md5",
                          "url_literal", "ref_literal")

    def search_clicks(spark, sf):
        """J6 (search_pv_clk.cc:20-56): search↔pv click join on (uid, url),
        ads (rank > 10) dropped before the join."""
        ev = _t(spark, sf, "events")
        search = ev.filter(F.col("event_id") % 3 == 0).select(
            F.col("user_id").alias("uid"),
            F.concat(F.lit("http://s.example.com/r/"),
                     (F.col("user_id") % 60).cast("string")).alias("url"),
            (F.col("event_id") % 15 + 1).cast("int").alias("rank"),
            F.concat(F.lit("q"), (F.col("event_id") % 7).cast("string"))
            .alias("query"),
        )
        pv = ev.filter(F.col("event_id") % 3 == 1).select(
            F.col("user_id").alias("uid"),
            F.concat(F.lit("http://s.example.com/r/"),
                     (F.col("user_id") % 60).cast("string")).alias("url"),
            F.round("value", 4).alias("dwell"),
        )
        out = logs.search_click_join(search, pv)
        return out.groupBy("query", "rank").agg(
            F.count("*").alias("n_clicks"),
            F.round(F.sum("dwell"), 4).alias("total_dwell"),
        )

    def search_pages(spark, sf):
        """P10 (crawler_selector_util.h:36-63): search-result page number;
        keep pages 1-3 only."""
        from spider_spark import selector as sel

        ev = _t(spark, sf, "events")
        hostpick = (
            F.when(F.col("event_id") % 3 == 0, "www.baidu.com")
            .when(F.col("event_id") % 3 == 1, "www.sogou.com")
            .otherwise("www.example.com")
        )
        q = F.concat(F.lit("wd=x&"),
                     F.when(F.col("event_id") % 3 == 0, F.lit("pn=")).otherwise(F.lit("page=")),
                     ((F.col("event_id") % 8) * 10).cast("string"))
        urls = ev.select("event_id", hostpick.alias("host"), q.alias("query"))
        kept = sel.keep_first_n_search_pages(urls, n=3)
        return kept.select("event_id", "host")

    def url_categories(spark, sf):
        """P8 (uv_data.cc:183-189): first-matching-rule category id from an
        ordered regex rule book; unmatched → 0."""
        from spider_spark import politeness as pol

        p = _t(spark, sf, "part")
        urls = p.select(
            "p_partkey",
            F.concat(
                F.lit("http://c.example.com/"),
                F.when(F.col("p_partkey") % 4 == 0, "list/")
                .when(F.col("p_partkey") % 4 == 1, "item/")
                .otherwise("page/"),
                F.col("p_partkey").cast("string"),
            ).alias("url"),
        )
        rules = spark.createDataFrame(
            [("/list/", 200, 1), ("/item/", 150, 2), ("/page/", 50, 3),
             ("example", 10, 4)],
            "pattern string, category_id int, rule_order int",
        )
        return pol.categorize_url(urls, rules).select(
            "p_partkey", "url", "category_id"
        )

    def updater_recrawl(spark, sf):
        """U5 (mr_updater_mapper.cc:40-75): latest record per url; recrawl
        tasks for pages older than max_age (headerless path — header-date
        parsing covered by pytest)."""
        from spider_spark import selector as sel

        ev = _t(spark, sf, "events")
        lb = ev.select(
            F.concat(F.lit("http://u.example.com/p/"),
                     (F.col("event_id") % 300).cast("string")).alias("url"),
            F.lit("").alias("http_header"),
            (F.col("event_id") % 500).cast("long").alias("last_fetch_ts"),
        )
        out = sel.updater_candidates(lb, now_ts=10_000, max_age_s=9_550)
        return out.select("url", "from", "age_s")

    def pv_round2(spark, sf):
        """pv_r2 (pv_r2.cc:19-101): compound-key (uid, ts) local md5
        resolution — unresolved dest dropped, unresolved ref → '', then
        set-dedup with the already-final rows."""
        ev = _t(spark, sf, "events")
        uid = F.col("user_id").cast("string").alias("uid")
        ts = (F.col("event_id") % 50).cast("int").alias("ts")
        final = ev.filter(F.col("event_id") % 3 == 0).select(
            uid, ts,
            F.concat(F.lit("http://pv.example.com/f/"),
                     (F.col("event_id") % 200).cast("string")).alias("url"),
            F.lit("").alias("ref_url"),
        )
        pending = ev.filter(F.col("event_id") % 3 == 1).select(
            uid, ts,
            F.concat(F.lit("m"), (F.col("event_id") % 7).cast("string"))
            .alias("url_md5"),
            F.concat(F.lit("m"), (F.col("event_id") % 11).cast("string"))
            .alias("ref_md5"),
        )
        local_map = ev.filter(F.col("event_id") % 3 == 2).select(
            uid, ts,
            F.concat(F.lit("m"), (F.col("event_id") % 5).cast("string"))
            .alias("md5"),
            F.concat(F.lit("http://pv.example.com/r/"),
                     (F.col("event_id") % 100).cast("string")).alias("url"),
        ).groupBy("uid", "ts", "md5").agg(F.min("url").alias("url"))
        return logs.resolve_md5_round2(final, pending, local_map)

    def graph_enrich(spark, sf):
        """J9 (extractor.cc:99-199): graph-signal blobs (uv/click/query)
        attach onto fetched resources by url sign; failed fetches keep
        NULLs. Oracle joins on the url literal — the sign is a pure
        function of it."""
        o = _t(spark, sf, "orders")
        url = F.concat(F.lit("http://g.example.com/o/"),
                       F.col("o_orderkey").cast("string"))
        res = o.select(url.alias("url"),
                       (F.col("o_orderkey") % 3 != 0).alias("success"))
        uv = o.filter(F.col("o_orderkey") % 2 == 0).select(
            url.alias("url"),
            F.round("o_totalprice", 2).alias("uv_rank"),
        )
        ck = o.filter(F.col("o_orderkey") % 5 == 0).select(
            url.alias("url"),
            (F.col("o_orderkey") % 7).cast("double").alias("click_rank"),
        )
        q = o.filter(F.col("o_orderkey") % 4 == 0).select(
            url.alias("url"),
            F.concat(F.lit("q"), (F.col("o_orderkey") % 11).cast("string"))
            .alias("query"),
        )
        signals = logs.build_graph_signals(uv, ck, q)
        out = logs.enrich_graph_signals(res, signals)
        return out.select(
            "url", "success", "uv_rank", "click_rank",
            F.coalesce(F.size("queries"), F.lit(0)).cast("int")
            .alias("n_queries"),
        )

    def simhash_assign(spark, sf):
        """D3 (mr_assign_page_simhash_mapper.cc:30-69): tf·idf-weighted
        signatures attached onto linkbase rows by url, sharded (rows-only:
        hash-based values). The idf STAYS a table joined cluster-side
        (weighted_simhash_join) — collecting the corpus vocabulary into a
        UDF closure is the bounded-whitelist path only."""
        _ensure_shipped(spark)
        d = _t(spark, sf, "documents").withColumn(
            "url", F.concat(F.lit("http://docs.example.com/d/"),
                            F.col("doc_id").cast("string"))
        )
        lb = d.select("url", (F.col("doc_id") % 97 != 0).alias("success"))
        docs = d.filter(F.col("doc_id") % 97 != 0).select(
            F.col("url").alias("doc_id"), "text"
        )
        out = sh.assign_simhash(lb, docs, idf_table=sh.corpus_idf(docs),
                                n_shards=16)
        return out.select("url", "simhash", "shard")

    def crawl_rounds_e2e(spark, sf):
        """The flagship pipeline end-to-end (rows-only; its correctness
        oracle is the pure-Python simulator in tests/test_round.py): 3
        politeness-gated rounds over a tiny deterministic web → linkbase.
        """
        import tempfile

        _ensure_shipped(spark)
        from spider_spark.politeness import PolitenessSpec, synthetic_robots
        from spider_spark.round import CrawlRun, RoundSpec
        from spider_spark.spans import WebSpec, generate_documents

        spec = WebSpec(n_hosts=10, pages_per_host=4, skew_hosts=2,
                       skew_pages=16, links_per_page=3)
        docs = generate_documents(spark, spec)
        robots = synthetic_robots(spark, spec.n_hosts)
        run = CrawlRun(
            spark, docs, robots, tempfile.mkdtemp(prefix="q_crawl_"),
            RoundSpec(n_buckets=8, max_depth=2, max_rounds=3,
                      politeness=PolitenessSpec(qps=1.0, round_seconds=3.0),
                      collect_ordering=False),
        )
        seeds = spark.createDataFrame(
            [(spec.url_of(1),), (spec.url_of(2),), (spec.url_of(7),)],
            "url string",
        )
        run.run(seeds)
        r = run.last_committed_round()
        return (
            run._linkbase(r)
            .select("url", "host", "depth", "success")
            .orderBy("url")
        )

    def ann_ivf(spark, sf):
        """IVF ANN top-10, probe-all config: with n_probe == n_centroids the
        centroid assignment + per-cluster scan + union covers every row, so
        the result is exactly the brute-force top-k and the DuckDB oracle
        checks the whole IVF machinery (assignment argmax, probe pruning,
        final top-k). Partial-probe recall is covered by the pytest
        differential (tests/test_similarity.py)."""
        e = _t(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
        out = similarity.knn_ivf(
            e.filter(F.col("vec_id") != 0), list(qrow["embedding"]),
            k=10, n_centroids=16, n_probe=16,
        )
        return out.select("vec_id", F.round("cosine", 4).alias("cosine"))

    def ann_lsh(spark, sf):
        """LSH-bucketed ANN top-10, probe-all config: hamming_probe ==
        n_planes probes every hyperplane-sign bucket, so the result is
        exactly the brute-force top-k and the DuckDB oracle checks the
        whole LSH machinery (plane signs, bucket keys, probe-set filter,
        final top-k). Partial-probe recall + pruning are the pytest
        differential (tests/test_similarity.py)."""
        e = _t(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
        out = similarity.knn_lsh(
            e.filter(F.col("vec_id") != 0), list(qrow["embedding"]),
            k=10, n_planes=6, hamming_probe=6,
        )
        return out.select("vec_id", F.round("cosine", 4).alias("cosine"))

    return {
        "uv_scores": uv_scores,
        "host_stat": host_stat,
        "distinct_users": distinct_users,
        "url_ref_pairs": url_ref_pairs,
        "hub_users": hub_users,
        "status_barrier": status_barrier,
        "seen_anti_join": seen_anti_join,
        "revenue_per_nation": revenue_per_nation,
        "segment_priority": segment_priority,
        "latest_wins": latest_wins,
        "sessionize": sessionize,
        "session_signs": session_signs,
        "window_budgets": window_budgets,
        "extract_whitelist": extract_whitelist,
        "topk_per_group": topk_per_group,
        "task_chunks": task_chunks,
        "binpack": binpack,
        "priority_bands": priority_bands,
        "pricing_summary": pricing_summary,
        "canonicalize_urls": canonicalize_urls,
        "url_rules": url_rules,
        "reverse_hosts": reverse_hosts,
        "registered_domains": registered_domains,
        "rule_book": rule_book,
        "dedup_stats": dedup_stats,
        "minhash_near_dups": minhash_near_dups,
        "dedup_clusters": dedup_clusters,
        "dedup_clusters_star": dedup_clusters_star,
        "hub_dig": hub_dig,
        "token_stats": token_stats,
        "lang_detect": lang_detect,
        "doc_fingerprints": doc_fingerprints,
        "knn_cosine": knn_cosine,
        "outlink_extract": outlink_extract,
        "ann_ivf": ann_ivf,
        "ann_lsh": ann_lsh,
        "proxy_route": proxy_route,
        "ip_load": ip_load,
        "url_transforms": url_transforms,
        "site_paginators": site_paginators,
        "eval_success": eval_success,
        "md5_resolve": md5_resolve,
        "search_clicks": search_clicks,
        "search_pages": search_pages,
        "url_categories": url_categories,
        "updater_recrawl": updater_recrawl,
        "pv_round2": pv_round2,
        "graph_enrich": graph_enrich,
        # -- rows-only block (no oracle_sql entries — hash-valued or
        # generator-native outputs; each has a pytest differential). Kept
        # LAST so a driver that records only the first N queries always
        # captures every DuckDB-oracled query above; within the block,
        # ordered by evidence value (headline sign kernel, the flagship
        # crawl E2E, the S2 interleaved scan) so a truncation drops the
        # least informative checks first.
        "simhash_signs": simhash_signs,
        "crawl_rounds_e2e": crawl_rounds_e2e,
        "interleaved_outlinks": interleaved_outlinks,
        "url_shards": url_shards,
        "ip_attach": ip_attach,
        "simhash_assign": simhash_assign,
    }


# ===========================================================================
# oracles
# ===========================================================================

_STOPWORDS_SQL = "['a','and','das','de','der','die','el','et','la','le','of','que','the','to','und','y','zu']"

# coalesce(text,''): the engine treats NULL text as empty (token_count
# contract "0 for empty/null"; detect_language → 'und')
_TOKENS = "regexp_split_to_array(trim(coalesce(text, '')), '\\s+')"
_LTOKENS = "regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+')"


def _quality_sql() -> str:
    """SQL twin of textstats.quality_score."""
    n_tok = (f"(CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0 "
             f"ELSE len({_TOKENS}) END)")
    sw = (f"len(list_filter({_LTOKENS}, "
          f"x -> list_contains({_STOPWORDS_SQL}, x)))")
    sw_ratio = f"({sw}::DOUBLE / greatest({n_tok}, 1))"
    len_factor = f"least({n_tok} / 100.0, 1.0)"
    mean_tok = f"(length(text)::DOUBLE / greatest({n_tok}, 1))"
    sanity = f"(CASE WHEN {mean_tok} >= 2 AND {mean_tok} <= 12 THEN 1.0 ELSE 0.5 END)"
    return f"ROUND({len_factor} * (0.5 + {sw_ratio}) * {sanity}, 6)"


def _lang_counts_sql() -> dict[str, str]:
    from spider_spark.textstats import LANG_STOPWORDS

    out = {}
    for lang, ws in LANG_STOPWORDS.items():
        arr = "[" + ",".join(f"'{w}'" for w in ws) + "]"
        out[lang] = (
            f"len(list_filter({_LTOKENS}, x -> list_contains({arr}, x)))"
        )
    return out


def oracle_sql() -> dict[str, str]:
    c = _lang_counts_sql()
    lang_case = (
        f"CASE WHEN greatest({c['de']},{c['en']},{c['es']},{c['fr']}) = 0 THEN 'und' "
        f"WHEN {c['de']} = greatest({c['de']},{c['en']},{c['es']},{c['fr']}) THEN 'de' "
        f"WHEN {c['en']} = greatest({c['de']},{c['en']},{c['es']},{c['fr']}) THEN 'en' "
        f"WHEN {c['es']} = greatest({c['de']},{c['en']},{c['es']},{c['fr']}) THEN 'es' "
        f"ELSE 'fr' END"
    )
    n_tok = (f"(CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0 "
             f"ELSE len({_TOKENS}) END)")
    sql = {
        "uv_scores": """
            SELECT event_type, ROUND(SUM(mx), 4) AS uv, COUNT(*) AS n_users
            FROM (SELECT user_id, event_type, MAX(value) AS mx
                  FROM events GROUP BY 1, 2)
            GROUP BY event_type
        """,
        "host_stat": """
            SELECT event_type, COUNT(*) AS n_urls FROM events GROUP BY 1
        """,
        "distinct_users": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "url_ref_pairs": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "hub_users": """
            SELECT user_id, COUNT(DISTINCT event_type) AS n_types
            FROM events GROUP BY 1 HAVING COUNT(DISTINCT event_type) >= 4
        """,
        "status_barrier": """
            SELECT user_id, day, CAST(n_err + 1 AS BIGINT) AS try_times FROM (
              SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                     SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ok
              FROM events GROUP BY 1, 2)
            WHERE ok = 0 AND n_err < 3
        """,
        "seen_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "revenue_per_nation": """
            SELECT n_name, r_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        """,
        "segment_priority": """
            SELECT o_orderpriority, COUNT(*) AS n_orders,
                   ROUND(AVG(o_totalprice), 4) AS avg_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY 1
        """,
        "latest_wins": """
            SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
            FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap
              FROM events)
            SELECT user_id,
                   CAST(SUM(CASE WHEN gap IS NULL OR gap > 300000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM g GROUP BY 1
        """,
        "session_signs": """
            WITH g AS (
              SELECT user_id, epoch_us(ts) AS ts_us,
                     CASE WHEN LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts) IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts) > 300000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (
              SELECT user_id, ts_us,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                       ROWS UNBOUNDED PRECEDING) AS sid1
              FROM g),
            f AS (
              SELECT user_id, sid1, MIN(ts_us) AS first_ts,
                     COUNT(*) AS n_hits
              FROM s GROUP BY 1, 2)
            SELECT user_id,
                   md5(user_id || CHR(9) || first_ts || CHR(9) || sid1)
                     AS session_sign,
                   n_hits
            FROM f
        """,
        "window_budgets": """
            WITH d AS (
              SELECT 'h' || (p_partkey % 20) AS host,
                     (p_partkey % 12) * 120 AS b,
                     (p_partkey % 12) * 120 + 119 AS e,
                     p_partkey % 7 + 1 AS budget
              FROM part)
            SELECT host, CAST(MIN(budget) AS INT) AS budget
            FROM d WHERE b <= 301 AND e >= 301 GROUP BY 1
        """,
        "extract_whitelist": """
            WITH c AS (
              SELECT p_partkey,
                     'http://t' || (p_partkey % 9) || '.example.com/'
                       || (CASE WHEN p_partkey % 3 = 0 THEN 'item/'
                                ELSE 'other/' END)
                       || p_partkey AS url,
                     CASE WHEN p_partkey % 4 = 0
                            THEN 'http://ref.shop.com/list/'
                                 || (p_partkey % 5)
                          WHEN p_partkey % 4 = 1
                            THEN 'http://free.example.com/x'
                     END AS referer
              FROM part)
            SELECT p_partkey, url, referer FROM c
            WHERE referer IS NULL
               OR referer NOT LIKE 'http://ref.shop.com/list/%'
               OR p_partkey % 3 = 0
        """,
        "topk_per_group": """
            SELECT event_type, event_id, ROUND(value, 4) AS value
            FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
                  FROM events)
            WHERE rn <= 5
        """,
        "task_chunks": """
            SELECT event_type, task_id, COUNT(*) AS n
            FROM (SELECT event_type,
                         CAST(FLOOR((ROW_NUMBER() OVER (
                           PARTITION BY event_type ORDER BY event_id) - 1) / 500)
                           AS INT) AS task_id
                  FROM events)
            GROUP BY 1, 2
        """,
        "binpack": """
            WITH costs AS (
              SELECT 'u' || user_id AS ip, SUM(value) AS cost
              FROM events GROUP BY 1),
            t AS (SELECT SUM(cost) AS total FROM costs),
            packed AS (
              SELECT cost,
                     LEAST(CAST(FLOOR((SUM(cost) OVER (
                         ORDER BY cost DESC, ip
                         ROWS UNBOUNDED PRECEDING) - cost / 2)
                       / (t.total / 8)) AS INT), 7) AS fetcher_id
              FROM costs, t)
            SELECT fetcher_id, COUNT(*) AS n_ips,
                   ROUND(SUM(cost), 2) AS total_cost
            FROM packed GROUP BY 1
        """,
        "priority_bands": """
            WITH ranked AS (
              SELECT o_totalprice,
                     PERCENT_RANK() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey) AS pr
              FROM orders)
            SELECT CASE WHEN pr <= 0.05 THEN 4
                        WHEN pr <= 0.85 THEN 3
                        ELSE 2 END AS priority,
                   COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS band_value
            FROM ranked GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                     AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                     AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "canonicalize_urls": """
            SELECT p_partkey,
                   'http://www.example-' || (p_partkey % 100)
                     || '.com/item/' || p_partkey AS url
            FROM part
        """,
        "url_rules": """
            SELECT p_partkey,
                   'http://files.example.com/f/' || p_partkey
                     || (CASE WHEN p_partkey % 7 = 0 THEN '.exe'
                              WHEN p_partkey % 7 = 1 THEN '.zip'
                              ELSE '.html' END)
                     || '?q=' || (CASE WHEN p_partkey % 5 = 0
                                       THEN 'login' ELSE 'ok' END) AS url
            FROM part
            WHERE p_partkey % 7 NOT IN (0, 1) AND p_partkey % 5 != 0
        """,
        "reverse_hosts": """
            WITH h AS (
              SELECT s_suppkey,
                     CASE WHEN s_suppkey % 10 = 0
                          THEN '10.0.0.' || (s_suppkey % 250)
                          ELSE 'mail.s' || s_suppkey || '.example.com'
                     END AS host
              FROM supplier)
            SELECT s_suppkey, host,
                   CASE WHEN regexp_matches(host, '^\\d{1,3}(\\.\\d{1,3}){3}$')
                        THEN host
                        ELSE array_to_string(
                               list_reverse(string_split(host, '.')), '.')
                   END AS rhost
            FROM h
        """,
        "registered_domains": """
            -- ParseHost vs the reference tld.dat DATA: 'uk' is an entry
            -- but 'co.uk' is NOT, so www.shopN.co.uk parses domain
            -- 'co.uk' (the reference's own behavior); 'ac.jp' and
            -- 'act.edu.au' are 2-/3-label entries; '.localdomain'
            -- matches nothing -> NULL (ParseHost returns false)
            WITH h AS (
              SELECT s_suppkey, s_suppkey % 5 AS m,
                     CASE s_suppkey % 5
                          WHEN 0 THEN 'www.shop' || s_suppkey || '.co.uk'
                          WHEN 1 THEN 'lab.u' || s_suppkey || '.ac.jp'
                          WHEN 2 THEN 'x.school' || s_suppkey
                                      || '.act.edu.au'
                          WHEN 3 THEN 'a.b.site' || s_suppkey
                                      || '.example.com'
                          ELSE 'nomatch' || s_suppkey || '.localdomain'
                     END AS host
              FROM supplier)
            SELECT s_suppkey, host,
                   CASE m WHEN 0 THEN 'uk' WHEN 1 THEN 'ac.jp'
                          WHEN 2 THEN 'act.edu.au' WHEN 3 THEN 'com'
                          ELSE NULL END AS tld,
                   CASE m WHEN 0 THEN 'co.uk'
                          WHEN 1 THEN 'u' || s_suppkey || '.ac.jp'
                          WHEN 2 THEN 'school' || s_suppkey
                                      || '.act.edu.au'
                          WHEN 3 THEN 'example.com'
                          ELSE NULL END AS domain,
                   CASE m WHEN 0 THEN 'www.shop' || s_suppkey
                          WHEN 1 THEN 'lab' WHEN 2 THEN 'x'
                          WHEN 3 THEN 'a.b.site' || s_suppkey
                          ELSE NULL END AS subdomain
            FROM h
        """,
        "rule_book": """
            WITH u AS (
              SELECT p_partkey, p_partkey % 7 AS m,
                     CASE p_partkey % 7
                          WHEN 0 THEN 'http://ptlogin2.qq.com/x'
                          WHEN 1 THEN 'http://weibo.com/u/' || p_partkey
                          WHEN 2 THEN 'http://weibo.com/'
                          WHEN 3 THEN 'http://trade.taobao.com/trade/item'
                                      || p_partkey || '.htm?id=1'
                          WHEN 4 THEN 'http://www.site' || (p_partkey % 50)
                                      || '.com/a/login/page?next=1'
                          WHEN 5 THEN 'http://files.x.com/f/' || p_partkey
                                      || '.pdf'
                          ELSE 'http://ok.site' || (p_partkey % 50)
                               || '.org/article/' || p_partkey
                     END AS url
              FROM part)
            SELECT p_partkey, url,
                   m IN (0, 1, 3, 4, 5) AS filtered,
                   CASE m WHEN 3 THEN 'Taobao' WHEN 4 THEN 'Login'
                          ELSE NULL END AS engine
            FROM u
        """,
        "dedup_stats": """
            SELECT source, COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5(text)) AS n_distinct
            FROM documents GROUP BY 1
        """,
        "minhash_near_dups": """
            WITH sh AS (
              -- blank docs get EMPTY gram sets (engine grams_of): an
              -- empty-vs-empty pair then yields 0/0 = NULL jaccard and is
              -- filtered, matching the engine, instead of [''] vs ['']
              -- scoring 1.0
              SELECT doc_id,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []
                     ELSE list_distinct(list_transform(
                       range(1, greatest(len(regexp_split_to_array(trim(text),
                         '\\s+')) - 2, 1) + 1),
                       i -> array_to_string(regexp_split_to_array(trim(text),
                         '\\s+')[i:i+2], ' ')
                     )) END AS grams
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b,
                     len(list_intersect(a.grams, b.grams))::DOUBLE
                       / len(list_distinct(list_concat(a.grams, b.grams)))
                       AS jaccard
              FROM sh a, sh b WHERE a.doc_id < b.doc_id)
            SELECT a, b, ROUND(jaccard, 6) AS jaccard
            FROM pairs WHERE jaccard >= 0.8
        """,
        "dedup_clusters": """
            -- connected components over the exact-jaccard pair graph via
            -- recursive closure: every doc's minimum reachable id is its
            -- component's canonical survivor (min-id rule)
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []
                     ELSE list_distinct(list_transform(
                       range(1, greatest(len(regexp_split_to_array(trim(text),
                         '\\s+')) - 2, 1) + 1),
                       i -> array_to_string(regexp_split_to_array(trim(text),
                         '\\s+')[i:i+2], ' ')
                     )) END AS grams
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM sh a, sh b
              WHERE a.doc_id < b.doc_id
                AND len(list_intersect(a.grams, b.grams))::DOUBLE
                    / len(list_distinct(list_concat(a.grams, b.grams)))
                    >= 0.8),
            edges AS (
              SELECT a AS src, b AS dst FROM pairs
              UNION
              SELECT b AS src, a AS dst FROM pairs),
            reach(id, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT reach.id, e.dst FROM reach
              JOIN edges e ON reach.r = e.src)
            SELECT id AS doc_id, MIN(r) AS keep_id
            FROM reach GROUP BY id
        """,
        "hub_dig": """
            SELECT p_partkey AS doc_id,
                   CAST(p_partkey % 4 + 2 AS BIGINT) AS n_outlinks
            FROM part WHERE p_partkey % 4 + 2 >= 4
        """,
        "token_stats": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM({n_tok}) AS BIGINT) AS total_tokens,
                   ROUND(AVG({_quality_sql()}), 6) AS avg_quality
            FROM documents GROUP BY 1
        """,
        "lang_detect": f"""
            SELECT lang, {lang_case} AS lang_pred, COUNT(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "knn_cosine": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            -- zero-norm guard: engine cosine_expr defines cosine(0,.)=0;
            -- DuckDB's list_cosine_similarity returns -1.0 there
            scored AS (
              SELECT vec_id,
                     CASE WHEN list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])) = 0 THEN 0.0
                     ELSE list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]), q.qv) END AS c
              FROM embeddings, q WHERE vec_id != 0)
            SELECT vec_id, ROUND(c, 4) AS cosine
            FROM scored ORDER BY c DESC, vec_id LIMIT 10
        """,
        "proxy_route": """
            WITH counts AS (
              SELECT 'ip-' || (o_custkey % 20) AS ip, COUNT(*) AS n
              FROM orders GROUP BY 1)
            SELECT ip,
                   CASE WHEN n >= 800 THEN 'PROXY' ELSE 'DIRECT' END
                     AS use_proxy,
                   n
            FROM counts
        """,
        "ip_load": """
            SELECT ip, COUNT(*) AS n_urls,
                   ROUND(COUNT(*) / 3.0, 4) AS cost
            FROM (SELECT 'ip-' || (o_custkey % 50) AS ip FROM orders)
            GROUP BY 1
        """,
        "url_transforms": """
            SELECT p_partkey,
                   CASE WHEN p_partkey % 3 = 0
                          THEN 'http://x.com/p/' || p_partkey || ' '
                        WHEN p_partkey % 3 = 1
                          THEN 'http://x.com/p/' || p_partkey
                               || '?_escaped_fragment_=/sec/9'
                        ELSE 'http://x.com/p/' || p_partkey
                   END AS url
            FROM part
        """,
        "site_paginators": """
            WITH src AS (
              SELECT CASE WHEN p_partkey % 2 = 0
                       THEN 'http://search.suning.com/emall/strd.do?ci='
                            || p_partkey || '&cityId=9173'
                       ELSE 'http://list.taobao.com/market/p' || p_partkey
                            || '.htm?cat=' || p_partkey END AS list_url,
                     CASE WHEN p_partkey % 2 = 0 THEN 'suning'
                          ELSE 'taobao' END AS site,
                     2 + p_partkey % 3 AS page_num
              FROM part
            ), fan AS (
              SELECT list_url, site,
                     UNNEST(generate_series(1, page_num - 1)) AS i
              FROM src
            )
            SELECT list_url, site,
                   CASE WHEN site = 'suning'
                        THEN list_url || '&cp=' || i
                             || '&il=0&si=5&st=14&iy=-1'
                        ELSE list_url || '&s=' || (96 * i) END AS next_url
            FROM fan
        """,
        "eval_success": """
            WITH topn AS (
              SELECT c_custkey AS url,
                     ROW_NUMBER() OVER (
                       ORDER BY c_acctbal DESC, c_custkey) - 1 AS rank
              FROM customer QUALIFY rank < 100),
            j AS (
              SELECT LEAST(CAST(FLOOR(rank / 10) AS BIGINT), 9) AS decile,
                     CASE WHEN url IN (SELECT o_custkey FROM orders)
                          THEN 1 ELSE 0 END AS ok
              FROM topn)
            SELECT decile, COUNT(*) AS n,
                   ROUND(AVG(ok), 6) AS success_rate
            FROM j GROUP BY 1
        """,
        "md5_resolve": """
            WITH pv AS (
              SELECT event_id,
                     'm' || (event_id % 9) AS url_md5,
                     'm' || (event_id % 13) AS ref_md5
              FROM events WHERE event_id % 2 = 0),
            m AS (
              SELECT md5, url FROM (
                SELECT 'm' || (event_id % 11) AS md5,
                       'http://m.example.com/' || (event_id % 40) AS url,
                       event_id % 1000 AS ts,
                       ROW_NUMBER() OVER (
                         PARTITION BY 'm' || (event_id % 11)
                         ORDER BY event_id % 1000 DESC,
                                  'http://m.example.com/' || (event_id % 40) DESC
                       ) AS rn
                FROM events WHERE event_id % 2 = 1)
              WHERE rn = 1)
            SELECT pv.event_id, pv.url_md5, pv.ref_md5,
                   mu.url AS url_literal, mr.url AS ref_literal
            FROM pv
            LEFT JOIN m mu ON pv.url_md5 = mu.md5
            LEFT JOIN m mr ON pv.ref_md5 = mr.md5
        """,
        "search_clicks": """
            WITH search AS (
              SELECT user_id AS uid,
                     'http://s.example.com/r/' || (user_id % 60) AS url,
                     CAST(event_id % 15 + 1 AS INT) AS rank,
                     'q' || (event_id % 7) AS query
              FROM events WHERE event_id % 3 = 0),
            pv AS (
              SELECT user_id AS uid,
                     'http://s.example.com/r/' || (user_id % 60) AS url,
                     ROUND(value, 4) AS dwell
              FROM events WHERE event_id % 3 = 1)
            SELECT query, rank, COUNT(*) AS n_clicks,
                   ROUND(SUM(dwell), 4) AS total_dwell
            FROM search JOIN pv USING (uid, url)
            WHERE rank <= 10
            GROUP BY 1, 2
        """,
        "search_pages": """
            SELECT event_id,
                   CASE WHEN event_id % 3 = 0 THEN 'www.baidu.com'
                        WHEN event_id % 3 = 1 THEN 'www.sogou.com'
                        ELSE 'www.example.com' END AS host
            FROM events
            WHERE CASE
                    WHEN event_id % 3 = 0
                      THEN ((event_id % 8) * 10) / 10 + 1 <= 3
                    WHEN event_id % 3 = 1
                      THEN (event_id % 8) * 10 <= 3
                    ELSE TRUE
                  END
        """,
        "url_categories": """
            WITH u AS (
              SELECT p_partkey,
                     'http://c.example.com/'
                       || (CASE WHEN p_partkey % 4 = 0 THEN 'list/'
                                WHEN p_partkey % 4 = 1 THEN 'item/'
                                ELSE 'page/' END)
                       || p_partkey AS url
              FROM part)
            SELECT p_partkey, url,
                   CASE WHEN url LIKE '%/list/%' THEN 200
                        WHEN url LIKE '%/item/%' THEN 150
                        WHEN url LIKE '%/page/%' THEN 50
                        WHEN url LIKE '%example%' THEN 10
                        ELSE 0 END AS category_id
            FROM u
        """,
        "updater_recrawl": """
            SELECT url, 'M' AS "from",
                   10000 - mx AS age_s
            FROM (SELECT 'http://u.example.com/p/' || (event_id % 300) AS url,
                         MAX(event_id % 500) AS mx
                  FROM events GROUP BY 1)
            WHERE 10000 - mx >= 9550
        """,
        "pv_round2": """
            WITH final AS (
              SELECT CAST(user_id AS VARCHAR) AS uid,
                     CAST(event_id % 50 AS INT) AS ts,
                     'http://pv.example.com/f/' || (event_id % 200) AS url,
                     '' AS ref_url
              FROM events WHERE event_id % 3 = 0),
            pending AS (
              SELECT CAST(user_id AS VARCHAR) AS uid,
                     CAST(event_id % 50 AS INT) AS ts,
                     'm' || (event_id % 7) AS url_md5,
                     'm' || (event_id % 11) AS ref_md5
              FROM events WHERE event_id % 3 = 1),
            local_map AS (
              SELECT CAST(user_id AS VARCHAR) AS uid,
                     CAST(event_id % 50 AS INT) AS ts,
                     'm' || (event_id % 5) AS md5,
                     MIN('http://pv.example.com/r/' || (event_id % 100)) AS url
              FROM events WHERE event_id % 3 = 2
              GROUP BY 1, 2, 3),
            resolved AS (
              SELECT p.uid, p.ts, d.url,
                     COALESCE(r.url, '') AS ref_url
              FROM pending p
              JOIN local_map d
                ON p.uid = d.uid AND p.ts = d.ts AND p.url_md5 = d.md5
              LEFT JOIN local_map r
                ON p.uid = r.uid AND p.ts = r.ts AND p.ref_md5 = r.md5)
            SELECT DISTINCT * FROM (
              SELECT * FROM final UNION ALL SELECT * FROM resolved)
        """,
        "graph_enrich": """
            WITH res AS (
              SELECT 'http://g.example.com/o/' || o_orderkey AS url,
                     o_orderkey % 3 != 0 AS success
              FROM orders),
            uv AS (
              SELECT 'http://g.example.com/o/' || o_orderkey AS url,
                     ROUND(o_totalprice, 2) AS uv_rank
              FROM orders WHERE o_orderkey % 2 = 0),
            ck AS (
              SELECT 'http://g.example.com/o/' || o_orderkey AS url,
                     CAST(o_orderkey % 7 AS DOUBLE) AS click_rank
              FROM orders WHERE o_orderkey % 5 = 0),
            q AS (
              SELECT 'http://g.example.com/o/' || o_orderkey AS url,
                     COUNT(*) AS nq
              FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1)
            SELECT res.url, res.success,
                   CASE WHEN res.success THEN uv.uv_rank END AS uv_rank,
                   CASE WHEN res.success THEN ck.click_rank END AS click_rank,
                   CAST(COALESCE(
                     CASE WHEN res.success THEN q.nq ELSE 0 END, 0) AS INT)
                     AS n_queries
            FROM res
            LEFT JOIN uv ON res.url = uv.url
            LEFT JOIN ck ON res.url = ck.url
            LEFT JOIN q ON res.url = q.url
        """,
        "outlink_extract": """
            WITH docs AS (
              SELECT p_partkey AS doc_id,
                     '<p>' || p_name || '</p><a href="' ||
                     'http://h' || CAST(p_partkey % 50 AS VARCHAR) ||
                     '.example.com/p/' || CAST(p_partkey % 7 AS VARCHAR) ||
                     '">x</a> <a href="' ||
                     'http://h' || CAST(p_partkey % 31 AS VARCHAR) ||
                     '.example.com/q' ||
                     '">y</a> <a href="' ||
                     'http://h' || CAST(p_partkey % 50 AS VARCHAR) ||
                     '.example.com/p/' || CAST(p_partkey % 7 AS VARCHAR) ||
                     '">again</a>' AS t
              FROM part)
            SELECT doc_id,
                   unnest(list_sort(list_distinct(
                     regexp_extract_all(t, '<a href="([^"]+)"', 1))))
                     AS outlink
            FROM docs
        """,
        "ann_ivf": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            -- zero-norm guard: engine cosine_expr defines cosine(0,.)=0;
            -- DuckDB's list_cosine_similarity returns -1.0 there
            scored AS (
              SELECT vec_id,
                     CASE WHEN list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])) = 0 THEN 0.0
                     ELSE list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]), q.qv) END AS c
              FROM embeddings, q WHERE vec_id != 0)
            SELECT vec_id, ROUND(c, 4) AS cosine
            FROM scored ORDER BY c DESC, vec_id LIMIT 10
        """,
        # simhash_signs, simhash_assign, url_shards, interleaved_outlinks,
        # ip_attach: hash-based / generator-native → rows-only
        # check + pytest differentials (tests/test_simhash.py,
        # test_similarity.py, test_selector.py).
    }
    # the star-CC variant must produce the identical cluster table — the
    # two Spark algorithms share one DuckDB oracle
    sql["dedup_clusters_star"] = sql["dedup_clusters"]
    # probe-all LSH ANN == probe-all IVF ANN == brute-force top-k — all
    # three scale paths share the one exact-cosine oracle
    sql["ann_lsh"] = sql["ann_ivf"]
    return sql
