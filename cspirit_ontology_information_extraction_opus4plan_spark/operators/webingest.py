"""Web-crawl ingestion parsers — the layer between the raw crawl and
urlops' URL curation: HTML field extraction (title/links/visible
text), sitemap XML parsing, and WARC record splitting. The reference's
ingestion surface is file/URL routing plus domain parsers (SURVEY
§2.1, ontology_manager.py:196-206 URL leg); a web-scale KG build adds
these three because its input arrives as crawl artifacts, not curated
ontology files.

All three are pure column expressions (regexp extract/replace, literal
split, higher-order array ops) — one codegen pass per row, no Python,
no shuffle. Payload rows are independent, so the operators scale
linearly with input splits: a 100-TB WARC corpus is just more
partitions. Regexes stay in the common Java-regex/RE2 dialect subset
(char classes, non-greedy, no backreferences) so the DuckDB oracle
replays them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_html", "parse_sitemaps", "parse_warc",
           "recrawl_diff", "crawl_admission", "recrawl_schedule",
           "extract_html_tables"]


def extract_html(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Field extraction over raw HTML payloads: title, link count,
    visible-text length (tags stripped, whitespace collapsed), meta
    description presence, and an ok/quarantine status (pages whose
    <title> never closes — truncated fetches — quarantine instead of
    aborting, the guards.py contract). Mirrors the reference's
    "parse, never crash" ingestion stance for a format it does not
    ship (its HTML arrives pre-extracted as text spans).

    Link counting is substring occurrence arithmetic, not regex, so
    the count is exact and dialect-free."""
    h = F.col(html_col)
    link_tok = "<a href="
    stripped = F.trim(F.regexp_replace(
        F.regexp_replace(h, r"<[^>]*>", " "), r"\s+", " "))
    title = F.regexp_extract(h, r"<title>([^<]*)</title>", 1)
    return pages.select(
        "doc_id",
        title.alias("title"),
        ((F.length(h) - F.length(F.replace(h, F.lit(link_tok))))
         / len(link_tok)).cast("bigint").alias("n_links"),
        F.length(stripped).cast("bigint").alias("n_text_chars"),
        h.contains('<meta name="description"').alias("has_meta_desc"),
        F.when(title == "", F.lit("quarantined_no_title"))
        .otherwise(F.lit("ok")).alias("status"))


def parse_sitemaps(sitemaps: DataFrame,
                   xml_col: str = "xml") -> DataFrame:
    """Sitemap-protocol XML parser: explode <url> blocks, extract
    loc/lastmod/priority per entry, and validate that each loc's host
    matches the host that served the sitemap (the cross-host
    submission rule — foreign locs are flagged, not dropped, so the
    frontier planner can decide). Emits (host, loc, lastmod,
    priority, host_ok), one row per <url> entry.

    regexp_extract_all on the non-greedy block pattern keeps the
    explode JVM-side; per-host sitemap payloads are bounded by that
    host's page count, so a mega-host inflates one row's array, which
    the explode immediately re-distributes."""
    x = F.col(xml_col)
    blocks = F.regexp_extract_all(x, F.lit(r"<url>(.*?)</url>"),
                                  F.lit(1))
    b = F.col("block")
    loc = F.regexp_extract(b, r"<loc>([^<]*)</loc>", 1)
    return (sitemaps
            .select("host", F.explode(blocks).alias("block"))
            .select(
                "host",
                loc.alias("loc"),
                F.regexp_extract(b, r"<lastmod>([^<]*)</lastmod>", 1)
                .alias("lastmod"),
                F.regexp_extract(b, r"<priority>([^<]*)</priority>", 1)
                .cast("double").alias("priority"),
                (F.regexp_extract(loc, r"^https?://([^/]+)", 1)
                 == F.col("host")).alias("host_ok")))


def parse_warc(files: DataFrame, payload_col: str = "payload",
               id_col: str = "file_id") -> DataFrame:
    """WARC file splitter: cut a concatenated multi-record payload at
    the 'WARC/1.0' record boundary, parse the header fields
    (WARC-Type, WARC-Target-URI, Content-Length), measure the actual
    body length after the blank line, and verify it against the
    declared Content-Length — truncated records get status
    'length_mismatch' instead of poisoning downstream parsers. Emits
    (file_id, target_uri, rec_type, content_length, body_chars,
    status), one row per record.

    The split is a literal boundary (regex-escaped dot), the header
    extracts are \\S+ captures, and the body measurement is string
    arithmetic — all codegen, no Python. Records per file are bounded
    by the writer's file-rotation policy, so the per-row array the
    explode consumes is small by construction."""
    recs = F.filter(
        F.split(F.col(payload_col), r"WARC/1\.0\n"),
        lambda r: r != "")
    r = F.col("rec")
    # record layout: 'headers\n\nbody\n\n' — body sits between the
    # first blank line and the trailing record terminator
    body_chars = (F.length(r) - F.instr(r, "\n\n") - 3).cast("bigint")
    declared = F.regexp_extract(r, r"Content-Length: ([0-9]+)", 1) \
        .cast("bigint")
    return (files
            .select(id_col, F.explode(recs).alias("rec"))
            .select(
                id_col,
                F.regexp_extract(r, r"WARC-Target-URI: (\S+)", 1)
                .alias("target_uri"),
                F.regexp_extract(r, r"WARC-Type: (\S+)", 1)
                .alias("rec_type"),
                declared.alias("content_length"),
                body_chars.alias("body_chars"),
                F.when(declared == body_chars, F.lit("ok"))
                .otherwise(F.lit("length_mismatch")).alias("status")))


def recrawl_diff(round1: DataFrame, round2: DataFrame,
                 key: str = "doc_id") -> DataFrame:
    """Incremental-crawl change detector: digest both crawl rounds and
    full-outer join per page — 'new' (no previous capture), 'gone'
    (dropped from the frontier or 404), 'changed' (content digest
    moved), 'unchanged' (recrawl wasted; lengthen its revisit
    interval). This page-level delta is what decides which documents
    re-enter the extraction pipeline, the crawl-side complement of
    doc_cdc_chunks' within-document delta.

    One digest projection per side + one equi full-outer join on the
    page key — shuffle-partitionable, no window, no skew beyond the
    key's own distribution."""
    d1 = round1.select(key, F.md5("text").alias("digest_prev"))
    d2 = round2.select(key, F.md5("text").alias("digest_curr"))
    p, c = F.col("digest_prev"), F.col("digest_curr")
    return (d1.join(d2, key, "full_outer")
            .select(key, "digest_prev", "digest_curr",
                    F.when(p.isNull(), F.lit("new"))
                    .when(c.isNull(), F.lit("gone"))
                    .when(p == c, F.lit("unchanged"))
                    .otherwise(F.lit("changed")).alias("status")))


def crawl_admission(entries: DataFrame, rules: DataFrame,
                    crawled: DataFrame) -> DataFrame:
    """Frontier admission control — the gate between sitemap discovery
    and the fetch queue, composing three operators this module/urlops
    already verify separately: per sitemap entry, reject cross-host
    submissions, reject robots-denied paths (RFC 9309 longest-prefix
    precedence on the loc's serving host), skip URLs the crawl already
    holds (canonical-URL identity), admit the rest. Emits (host, loc,
    status) for every entry — rejections are kept, not dropped, so
    the crawl audit can explain every missing page.

    Rules are a broadcast dimension (a robots file per host); the
    known-URL check is an equi left join on the canonical URL —
    shuffle-partitionable against a 100-TB crawl state. The
    longest-prefix window partitions by loc over that loc's own
    matching rules (bounded by the host's rule count)."""
    from pyspark.sql import Window
    l = entries.select(
        "host", "loc", "host_ok",
        F.regexp_extract("loc", r"^[^:]+://[^/?#]+([^?#]*)", 1)
        .alias("path"))
    hits = (l.join(F.broadcast(rules), "host")
            .filter(F.col("path").startswith(F.col("path_prefix"))))
    w = Window.partitionBy("loc").orderBy(
        F.length("path_prefix").desc(), F.col("verdict"))
    best = (hits.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).select("loc", "verdict"))
    known = crawled.select("canon_url").distinct() \
        .withColumn("__known", F.lit(True))
    return (l.join(best, "loc", "left")
            .join(known, l.loc == known.canon_url, "left")
            .select(
                "host", "loc",
                F.when(~F.col("host_ok"), F.lit("rejected_cross_host"))
                .when(F.coalesce(F.col("verdict"), F.lit("allow"))
                      == "deny", F.lit("rejected_robots"))
                .when(F.col("__known").isNotNull(),
                      F.lit("skipped_known"))
                .otherwise(F.lit("admitted")).alias("status")))


RECRAWL_MAX_DAYS = 30


def recrawl_schedule(diff: DataFrame, host_col,
                     max_days: int = RECRAWL_MAX_DAYS) -> DataFrame:
    """Adaptive revisit scheduling from the recrawl delta: per host,
    roll up the page-change census and set the next revisit interval
    to floor(pages_watched / pages_changed) days — hosts where every
    page changed get revisited daily, hosts that never change back off
    to `max_days` (the inverse-change-rate heuristic crawl schedulers
    converge to, in pure integer arithmetic so both engines agree
    exactly). Emits (host, n_new, n_gone, n_changed, n_unchanged,
    revisit_days).

    One map-side-combinable rollup over the diff — host cardinality
    output."""
    d = diff.withColumn("host", host_col)
    n_of = [F.sum((F.col("status") == s).cast("bigint"))
            .cast("bigint").alias(f"n_{s}")
            for s in ("new", "gone", "changed", "unchanged")]
    agg = d.groupBy("host").agg(*n_of)
    watched = F.col("n_changed") + F.col("n_unchanged")
    return agg.select(
        "host", "n_new", "n_gone", "n_changed", "n_unchanged",
        F.when(F.col("n_changed") == 0, F.lit(max_days))
        .otherwise(F.least(F.lit(max_days), F.greatest(
            F.lit(1), F.floor(watched / F.col("n_changed")))))
        .cast("bigint").alias("revisit_days"))


def extract_html_tables(pages: DataFrame,
                        html_col: str = "html") -> DataFrame:
    """HTML table-cell extraction — the web twin of the JATS/PDF table
    parsers (the reference's table extraction surface): explode <tr>
    rows positionally, then th/td cells positionally within each row,
    preserving ragged rows as-is (an extractor records what the page
    says; schema repair is a downstream decision). Emits (doc_id,
    row_idx, col_idx, is_header, cell), 1-based indices.

    Two regexp_extract_all + posexplode passes — JVM codegen, no
    Python; per-row fan-out is bounded by the page's own cell count."""
    rows = F.regexp_extract_all(F.col(html_col),
                                F.lit(r"<tr>(.*?)</tr>"), F.lit(1))
    d = pages.select("doc_id", F.posexplode(rows)
                     .alias("ri", "row_html"))
    cells = F.regexp_extract_all(F.col("row_html"),
                                 F.lit(r"<t[hd]>(.*?)</t[hd]>"),
                                 F.lit(1))
    return (d.select("doc_id", "ri",
                     F.col("row_html").startswith("<th>")
                     .alias("is_header"),
                     F.posexplode(cells).alias("ci", "cell"))
            .select("doc_id",
                    (F.col("ri") + 1).cast("int").alias("row_idx"),
                    (F.col("ci") + 1).cast("int").alias("col_idx"),
                    "is_header", "cell"))
