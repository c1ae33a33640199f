"""Semantics pins for the web-crawl ingestion parsers: HTML field
extraction, sitemap explode + cross-host check, WARC record split with
declared-vs-actual length verification."""

from __future__ import annotations

from cspirit_ontology_information_extraction_opus4plan_spark import decorations as DE
from cspirit_ontology_information_extraction_opus4plan_spark.operators.webingest import (
    extract_html, parse_sitemaps, parse_warc,
)


def _docs(spark, n=8):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(n)],
        "doc_id bigint, text string")


def test_extract_html_fields_and_quarantine(spark):
    rows = {r.doc_id: r for r in
            extract_html(DE.html_docs(_docs(spark))).collect()}
    # doc 0: %97 plant -> truncated title -> quarantined; still parsed
    assert rows[0].status == "quarantined_no_title"
    assert rows[0].title == ""
    # doc 1: odd -> one link; doc 2: even -> two links
    assert rows[1].status == "ok"
    assert rows[1].title == "Doc 1"
    assert rows[1].n_links == 1
    assert rows[2].n_links == 2
    # meta description only on doc_id%3==0
    assert rows[3].has_meta_desc and not rows[4].has_meta_desc
    # visible text contains the body words, no tags
    assert all(r.n_text_chars > 0 for r in rows.values())


def test_parse_sitemaps_roundtrip_and_foreign_flag(spark):
    # 202 docs -> doc 0 and doc 101 carry foreign-host locs
    docs = _docs(spark, 202)
    out = parse_sitemaps(DE.sitemap_entry_and_files(docs)).collect()
    assert len(out) == 202                      # one row per doc entry
    bad = [r for r in out if not r.host_ok]
    assert sorted(r.loc for r in bad) == [
        "https://www.other.example.net/page/0",
        "https://www.other.example.net/page/101"]
    ok = next(r for r in out if r.loc.endswith("/page/5"))
    assert ok.lastmod == "2024-01-06" and abs(ok.priority - 0.5) < 1e-9


def test_parse_warc_length_verification(spark):
    # 90 docs over 16-doc files; doc 0 and doc 89 declare length+1
    docs = _docs(spark, 90)
    out = parse_warc(DE.warc_files(docs)).collect()
    assert len(out) == 90
    bad = sorted(r.target_uri for r in out
                 if r.status == "length_mismatch")
    assert [u.rsplit("/", 1)[1] for u in bad] == ["0", "89"]
    good = next(r for r in out if r.target_uri.endswith("/page/7"))
    assert good.rec_type == "response"
    assert good.body_chars == good.content_length \
        == len("alpha beta gamma 7")


def test_extract_html_tables_positional_and_ragged(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.webingest import (
        extract_html_tables,
    )
    out = extract_html_tables(DE.html_table_docs(_docs(spark, 90))) \
        .collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 2x2 table -> 4 cells, header row flagged
    d1 = sorted(by_doc[1], key=lambda r: (r.row_idx, r.col_idx))
    assert [(r.row_idx, r.col_idx, r.is_header, r.cell) for r in d1] == [
        (1, 1, True, "metric"), (1, 2, True, "value"),
        (2, 1, False, "m1"), (2, 2, False, "7")]
    # doc 0 and doc 89: ragged plant -> 5 cells, extra at (2, 3)
    for did in (0, 89):
        ragged = sorted(by_doc[did], key=lambda r: (r.row_idx, r.col_idx))
        assert len(ragged) == 5
        assert ragged[-1].cell == "extra" and ragged[-1].col_idx == 3
