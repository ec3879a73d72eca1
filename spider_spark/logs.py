"""pv/search/click log analytics feeding the frontier scorer.

Re-expresses the reference's log_analysis MR fleet (cites into
/root/reference) as single-DAG DataFrame pipelines:

- J5  md5→url literal resolution (3-round MR join, pv_r1.cc:42-337) →
  two plain joins + latest-timestamp-wins window
- J6  search↔pv click join (search_pv_clk.cc:20-56) → composite-key
  equi-join + rank filter
- A5  url→ref distinct pairs (url_ref_count.cc:17-56)
- A6  per-query distinct-user count (query_count.cc:14-61)
- A7  site pv stat (mr_stat_site_pv_mapper.cc:19-60)
- J9  graph-signal enrich (crawler2/general_crawler/extractor.cc:99-199):
  fetched resources look up uv_rank / click_rank / query / anchor blobs
  keyed by 64-bit url sign — the Redis BatchInquire rendered as a
  sign-keyed left join
- 2.10 session segmentation (pvlog_segmenter.h:80-94): split at gap
  >5 min without referer / >30 min with, per agent, logs sorted by ts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_NO_REF_S = 5 * 60     # pvlog_segmenter.h:80-94
SESSION_GAP_REF_S = 30 * 60
MAX_CLICK_RANK = 10               # ads dropped, search_pv_clk.cc


def resolve_md5_urls(pv: DataFrame, md5_map: DataFrame,
                     url_md5: str = "url_md5", ref_md5: str = "ref_md5",
                     hot_slice: DataFrame | None = None) -> DataFrame:
    """J5: attach literal urls for url_md5/ref_md5. The reference's 3-round
    MR join with a shipped hot-key cache (pv_r1.cc:26-49) becomes two joins;
    the hot cache ≙ letting AQE broadcast the (small) hot slice — callers
    may pass ``hot_slice`` to union-broadcast explicitly. Conflicting map
    rows resolve latest-timestamp-wins (pv_r1.cc:244-261)."""
    w = Window.partitionBy("md5").orderBy(F.desc("ts"), F.desc("url"))
    m = (
        md5_map.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("md5", "url")
    )
    out = (
        pv.join(m.withColumnRenamed("url", "url_literal"),
                pv[url_md5] == m["md5"], "left")
        .drop("md5")
        .join(
            m.withColumnRenamed("url", "ref_literal"),
            F.col(ref_md5) == m["md5"],
            "left",
        )
        .drop("md5")
    )
    return out


def resolve_md5_round2(final: DataFrame, pending: DataFrame,
                       local_map: DataFrame, uid_col: str = "uid",
                       ts_col: str = "ts") -> DataFrame:
    """pv second round (pv_r2.cc:19-101): unlike pv_r1's GLOBAL md5
    dictionary, round 2 resolves the leftover ``still_md5`` rows against
    md5→url map entries co-keyed by the COMPOUND key (mid, time_stamp) —
    session-local dictionaries shipped with the log slice.

    - ``pending`` rows (uid, ts, url_md5, ref_md5, …) whose url md5 has no
      map entry are DROPPED (ReportAbnormalData kInvalidURL, :85-88);
    - unresolved referers clear to '' (:90-95);
    - output = already-resolved ``final`` rows ∪ newly resolved, set-
      deduplicated per compound key (the reducer's std::set, :61-62).

    One DAG: two compound-key equi-joins + dropDuplicates — both joins
    shuffle on (uid, ts, md5), uniform keys, no skew.
    """
    dest_map = local_map.select(
        F.col(uid_col), F.col(ts_col),
        F.col("md5").alias("url_md5"), F.col("url").alias("url"),
    )
    ref_map = local_map.select(
        F.col(uid_col), F.col(ts_col),
        F.col("md5").alias("ref_md5"), F.col("url").alias("ref_url"),
    )
    resolved = (
        pending.join(dest_map, [uid_col, ts_col, "url_md5"], "inner")
        .join(ref_map, [uid_col, ts_col, "ref_md5"], "left")
        .withColumn("ref_url", F.coalesce(F.col("ref_url"), F.lit("")))
    )
    return final.unionByName(
        resolved.select(*final.columns)
    ).dropDuplicates()


def pv_combine(*parts: DataFrame, uid_col: str = "uid",
               ts_col: str = "ts") -> DataFrame:
    """pv_combine (pv_combine.cc:16-49): merge the per-round pv outputs
    back into one compound-key table — the MR job's CityHash64(mid)
    reducer routing + per-key merge is a union + repartition on uid +
    within-partition (uid, ts) sort; downstream sessionization reuses the
    same clustering, so AQE elides the next exchange."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(F.col(uid_col)).sortWithinPartitions(
        uid_col, ts_col
    )


def search_click_join(search: DataFrame, pv: DataFrame,
                      keys: tuple[str, ...] = ("uid", "url", "query", "se")
                      ) -> DataFrame:
    """J6: key (uid, url, query, se) — the reference's full composite
    (search_pv_clk.cc:20-56), which prevents a click row from being
    attributed to EVERY query/engine the user issued for that url. The
    join uses every key column present in BOTH frames: pv logs that
    carry query/se (parsed from the referer, as the reference does) get
    the full composite; a reduced pv shape degrades to (uid, url).
    Ads (rank > 10) dropped before the join."""
    s = search.filter(F.col("rank") <= MAX_CLICK_RANK)
    join_keys = [k for k in keys if k in s.columns and k in pv.columns]
    return s.join(pv, join_keys, "inner")


def url_ref_pairs(pv: DataFrame, url_col: str = "url",
                  ref_col: str = "ref") -> DataFrame:
    """A5: distinct (url, ref) pairs."""
    return pv.select(url_col, ref_col).distinct()


def query_user_counts(search: DataFrame, query_col: str = "query",
                      uid_col: str = "uid",
                      approximate: bool = False) -> DataFrame:
    """A6: per query, distinct users. ``approximate`` switches to HLL
    (approx_count_distinct) — the 100-TB path where exact distinct would
    shuffle every (query, uid) pair."""
    agg = (
        F.approx_count_distinct(uid_col)
        if approximate
        else F.countDistinct(uid_col)
    )
    return search.groupBy(query_col).agg(agg.alias("n_users"))


def site_pv(pv: DataFrame, site_col: str = "site") -> DataFrame:
    """A7: pv count per site (partial agg is automatic)."""
    return pv.groupBy(site_col).agg(F.count("*").alias("pv"))


def build_graph_signals(uv_ranks: DataFrame | None = None,
                        click_ranks: DataFrame | None = None,
                        queries: DataFrame | None = None,
                        anchors: DataFrame | None = None,
                        url_col: str = "url") -> DataFrame:
    """Assemble the sign-keyed graph-signal table the enrich join consumes
    — the Spark rendering of the Redis store's four fields (extractor.cc:
    153-196: field 1 uv_rank, 2 click_rank, 3 query list, 4 anchor list).

    Inputs are per-url tables: uv_ranks (url, uv_rank), click_ranks
    (url, click_rank), queries (url, query) — collapsed to a list —
    anchors (url, anchor) — collapsed to a list. Full outer join on url,
    then keyed by url_sign64. Each input is optional (absent Redis field).
    """
    from . import urlkit

    parts = []
    if uv_ranks is not None:
        parts.append(uv_ranks.select(url_col, "uv_rank"))
    if click_ranks is not None:
        parts.append(click_ranks.select(url_col, "click_rank"))
    if queries is not None:
        parts.append(
            queries.groupBy(url_col)
            .agg(F.sort_array(F.collect_list("query")).alias("queries"))
        )
    if anchors is not None:
        parts.append(
            anchors.groupBy(url_col)
            .agg(F.sort_array(F.collect_list("anchor")).alias("anchors"))
        )
    if not parts:
        raise ValueError("at least one signal table required")
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, url_col, "full")
    return out.withColumn("url_sign", urlkit.url_sign64(F.col(url_col))).drop(
        url_col
    )


def enrich_graph_signals(resources: DataFrame, graph_signals: DataFrame,
                         url_col: str = "url",
                         success_col: str = "success") -> DataFrame:
    """J9 (extractor.cc:99-199 AddResourceExtraInfo): attach the graph
    blobs onto fetched resources. Only rows with a successful fetch
    (the response_code == 200 gate, :118-123) are enriched — failed rows
    keep NULL signals. The join key is the 64-bit sign of the canonical
    url (CalcUrlSign role): at 10^10 rows a sign-keyed shuffle join with
    uniform 8-byte keys, no skew.
    """
    from . import urlkit

    r = resources.withColumn("url_sign", urlkit.url_sign64(F.col(url_col)))
    out = r.join(graph_signals, "url_sign", "left")
    for c in graph_signals.columns:
        if c != "url_sign":
            out = out.withColumn(
                c, F.when(F.col(success_col), F.col(c))
            )
    return out.drop("url_sign")


def sessionize(pv: DataFrame, uid_col: str = "uid", ts_col: str = "ts",
               ref_col: str | None = "ref",
               no_ref_gap: float = SESSION_GAP_NO_REF_S,
               ref_gap: float = SESSION_GAP_REF_S,
               with_sign: bool = False) -> DataFrame:
    """Session segmentation (pvlog_segmenter.h:80-94): per uid in ts order,
    start a new session when the gap from the previous hit exceeds
    ``no_ref_gap`` (default 5 min, no referer) / ``ref_gap`` (30 min, with
    referer) — gap units are whatever ``ts_col`` is in. Adds ``session_id``
    (0-based per uid) via the lag → flag → running-sum pattern.

    ``with_sign`` adds the reference's session identity sign
    (session_segment_util.h:20-24 / pvlog_segmenter.cc:349-365):
    ``md5(agentid \\t session-first-ts \\t 1-based session id)`` — every
    hit of a session carries the same sign, globally unique across uids.
    Both session windows share the uid partitioning, so the second one
    reuses the first's exchange."""
    w = Window.partitionBy(uid_col).orderBy(F.asc(ts_col))
    gap = F.col(ts_col).cast("double") - F.lag(
        F.col(ts_col).cast("double")
    ).over(w)
    if ref_col is not None:
        threshold = F.when(
            F.col(ref_col).isNotNull() & (F.col(ref_col) != ""),
            F.lit(ref_gap),
        ).otherwise(F.lit(no_ref_gap))
    else:
        threshold = F.lit(no_ref_gap)
    new_sess = F.when(gap.isNull() | (gap > threshold), 1).otherwise(0)
    running = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = pv.withColumn("session_id", (running - 1).cast("int"))
    if with_sign:
        first_ts = F.min(F.col(ts_col)).over(
            Window.partitionBy(uid_col, "session_id")
        )
        out = out.withColumn(
            "session_sign",
            F.md5(F.concat_ws(
                "\t", F.col(uid_col).cast("string"),
                first_ts.cast("string"),
                (F.col("session_id") + 1).cast("string"),
            )),
        )
    return out
