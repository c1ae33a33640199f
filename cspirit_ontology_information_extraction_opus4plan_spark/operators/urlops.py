"""URL canonicalization + domain curation — the crawl-side front door
of a training-data pipeline: before any text-level dedup runs, a web
corpus is deduplicated BY CANONICAL URL (the same page arrives under
scheme/case/port/tracking-param/fragment variants) and filtered against
a domain blocklist. The reference's URL surface is routing-only
(scheme/extension dispatch, SURVEY §2.1 URL source); these operators
add the curation semantics over the same parsed anatomy.

All pure column expressions (regexp + higher-order array filter) — one
codegen pass per row, no Python, no shuffle until the dedup groupBy.
The registered-domain extraction is the documented two-label
simplification (last two host labels); a production run swaps in a
public-suffix-list broadcast join, which changes the lookup, not the
plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["canonicalize_urls", "url_curation", "frontier_plan",
           "robots_match", "anchor_text_profile"]

ANCHOR_TOP_N = 3


def anchor_text_profile(edges: DataFrame,
                        top_n: int = ANCHOR_TOP_N) -> DataFrame:
    """Web-link anchor aggregation, the alt-label miner of web-scale
    KG construction (anchor phrases pointing at a page are candidate
    surface forms for the entity it describes — the signal behind
    Wikipedia-anchor gazetteers): per link target, the distinct-source
    in-degree and the top_n anchor phrases by link count. Emits
    (dst, in_degree, anchor, n, rank).

    Scale shape: two map-side-combinable aggregates off one edge scan
    (per-(dst, anchor) counts; distinct-src in-degree), then the
    ranking window partitions by target over its OWN anchor vocabulary
    (bounded by the target's in-links, not the corpus). A mega-hub
    target (wikipedia.org) has a long but self-contained partition;
    AQE handles the skew, and a production variant would pre-aggregate
    with a count floor before ranking."""
    indeg = edges.groupBy("dst").agg(
        F.countDistinct("src").cast("bigint").alias("in_degree"))
    cnt = edges.groupBy("dst", "anchor").agg(
        F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    return (cnt.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_n)
            .join(indeg, "dst")
            .select("dst", "in_degree", "anchor", "n", "rank"))


def robots_match(urls: DataFrame, rules: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """robots.txt-style longest-prefix matching: each distinct
    canonical URL takes the verdict of the LONGEST rule prefix that
    matches its path on its host (the REP rule-precedence semantics,
    RFC 9309 §2.2.2); URLs on hosts with no matching rule default to
    'allow'. Returns (canon_url, host, matched_prefix, verdict).

    Scale shape: the rule table is a genuinely bounded dimension (a
    crawler's compiled robots store is rules x hosts, dimension-sized
    next to the frontier) -> broadcast equi-join ON HOST, then the
    prefix test is a per-row startswith and the longest-match argmax
    is a map-side-combinable struct-max groupBy — no window, no
    cross join; prefix uniqueness per host makes the argmax
    deterministic without a tie-break column."""
    c = (canonicalize_urls(urls, url_col)
         .select("canon_url", "host").distinct()
         .withColumn("path", F.regexp_extract(
             "canon_url", r"^[^:]+://[^/?#]+([^?#]*)", 1)))
    hit = (c.join(F.broadcast(rules), "host")
           .filter(F.col("path").startswith(F.col("path_prefix")))
           .groupBy("canon_url", "host")
           .agg(F.max(F.struct(
               F.length("path_prefix").alias("plen"),
               F.col("path_prefix"), F.col("verdict"))).alias("m")))
    return (c.join(hit, ["canon_url", "host"], "left")
            .select("canon_url", "host",
                    F.coalesce(F.col("m.path_prefix"), F.lit(""))
                    .alias("matched_prefix"),
                    F.coalesce(F.col("m.verdict"), F.lit("allow"))
                    .alias("verdict")))

N_CRAWLERS = 8   # crawler shards (hash-routed by host)
HOST_RATE = 2    # fetches allowed per host per politeness slot


def frontier_plan(urls: DataFrame, url_col: str = "url",
                  n_crawlers: int = N_CRAWLERS,
                  host_rate: int = HOST_RATE) -> DataFrame:
    """Crawl-frontier politeness planner: distinct canonical URLs are
    routed to a crawler shard by host hash (every URL of a host lands
    on ONE crawler — per-host politeness needs a single rate-limiting
    owner), sequenced deterministically within the host, and assigned
    a fetch slot of host_rate URLs per politeness interval. Returns
    (canon_url, host, crawler_id, seq_in_host, fetch_slot).

    Scale shape: one canonicalize pass + a distinct on canon_url, then
    a window partitioned BY HOST — per-host state is the host's own
    URL count, which is the irreducible unit here: politeness makes a
    host's schedule inherently serial, so a mega-host's long partition
    is semantic backlog (it genuinely takes |host|/host_rate slots),
    not a shuffle artifact; the executor fans out by (crawler_id,
    fetch_slot), which is perfectly partitionable. Crawler routing is
    the md5 idiom shared with every oracle — no engine-specific hash."""
    c = (canonicalize_urls(urls, url_col)
         .select("canon_url", "host").distinct())
    crawler = (F.conv(F.substring(F.md5("host"), 1, 8), 16, 10)
               .cast("bigint") % n_crawlers).cast("int")
    w = Window.partitionBy("host").orderBy("canon_url")
    return (c.withColumn("crawler_id", crawler)
            .withColumn("seq_in_host",
                        F.row_number().over(w).cast("bigint"))
            .withColumn("fetch_slot",
                        F.floor((F.col("seq_in_host") - 1) / host_rate)
                        .cast("bigint")))

# query params that never identify content
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _strip_tracking(query: Column) -> Column:
    """'a=1&utm_source=x&b=2' -> 'a=1&b=2' (order preserved)."""
    parts = F.split(query, "&")
    kept = F.filter(parts, lambda p: ~(
        p.startswith(TRACKING_PREFIXES[0])
        | p.startswith(TRACKING_PREFIXES[1])
        | p.startswith(TRACKING_PREFIXES[2])))
    return F.array_join(kept, "&")


def canonicalize_urls(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """+ (canon_url, host, registered_domain). Canonical form:
    lowercase scheme and host, default port stripped (:443 https /
    :80 http), fragment dropped, tracking params dropped (others kept
    in original order), trailing path slash trimmed (root stays '/'),
    empty path normalized to '/'."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*):",
                                      1))
    authority = F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(authority, r":\d+$", ""))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80")))
    raw_path = F.regexp_extract(u, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.when((raw_path == "") | (raw_path == "/"), F.lit("/")) \
        .otherwise(F.regexp_replace(raw_path, r"/$", ""))
    query = _strip_tracking(F.regexp_extract(u, r"\?([^#]*)", 1))
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
            F.lit("")))
    reg_dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (urls
            .withColumn("canon_url", canon)
            .withColumn("host", host)
            .withColumn("registered_domain", reg_dom))


def url_curation(urls: DataFrame, blocklist: DataFrame,
                 url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document URL curation verdict: 'blocked' (registered domain
    on the blocklist), 'dup' (another kept doc canonicalizes to the
    same URL — min id wins, ties deterministic), else 'kept'. Returns
    (doc_id, url, canon_url, registered_domain, verdict).

    Scale shape: blocklist is a genuinely bounded dimension ->
    broadcast left-semi mark; the canonical-URL dedup is one
    map-side-combinable min-aggregate on canon_url joined back by the
    same key — no window over the corpus. Blocked docs are excluded
    BEFORE the dedup group, so a blocked doc never claims keeper-ship
    of a canonical URL shared with a clean mirror."""
    c = canonicalize_urls(urls, url_col)
    marked = c.join(F.broadcast(blocklist.select("registered_domain",
                                                 F.lit(True).alias("_b"))),
                    "registered_domain", "left")
    keepers = (marked.filter(F.col("_b").isNull())
               .groupBy("canon_url")
               .agg(F.min(id_col).alias("_keeper")))
    return (marked.join(keepers, "canon_url", "left")
            .select(id_col, url_col, "canon_url", "registered_domain",
                    F.when(F.col("_b").isNotNull(), F.lit("blocked"))
                     .when(F.col(id_col) == F.col("_keeper"), F.lit("kept"))
                     .otherwise(F.lit("dup")).alias("verdict")))
