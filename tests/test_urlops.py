from __future__ import annotations

from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    urlops,
)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_canonicalize_rules(spark):
    rows = _urls(spark, [
        (1, "HTTPS://WWW.Site.Example.org:443/page/3/?utm_source=x&ref=1#f"),
        (2, "http://host.example.com:8080/"),
        (3, "https://a.example.net"),
        (4, "http://b.example.net:80/x?gclid=1&fbclid=2"),
    ])
    got = {r["doc_id"]: r for r in
           urlops.canonicalize_urls(rows).collect()}
    assert got[1]["canon_url"] == "https://www.site.example.org/page/3?ref=1"
    assert got[1]["registered_domain"] == "example.org"
    # non-default port survives; root path normalized to '/'
    assert got[2]["canon_url"] == "http://host.example.com:8080/"
    # empty path becomes '/'
    assert got[3]["canon_url"] == "https://a.example.net/"
    # all params tracking -> query dropped entirely
    assert got[4]["canon_url"] == "http://b.example.net/x"


def test_url_curation_verdicts(spark):
    rows = _urls(spark, [
        (1, "https://ok.example.org/a"),
        (2, "HTTPS://OK.example.org/a/"),          # same canonical as 1
        (3, "https://bad.spam.example/a"),          # blocked
        (4, "https://bad.spam.example/b"),          # blocked
        (5, "https://mirror.spam.example/a"),       # blocked, even though
                                                    # it "mirrors" nothing
    ])
    bl = spark.createDataFrame([("spam.example",)],
                               "registered_domain string")
    got = {r["doc_id"]: r["verdict"]
           for r in urlops.url_curation(rows, bl).collect()}
    assert got == {1: "kept", 2: "dup", 3: "blocked", 4: "blocked",
                   5: "blocked"}


def test_blocked_doc_never_claims_keepership(spark):
    # a blocked doc with the LOWEST id sharing a canonical URL with a
    # clean doc must not steal keeper-ship
    rows = _urls(spark, [
        (1, "https://x.spam.example/a"),
        (2, "https://x.clean.example/a"),
    ])
    # plant a collision: same canonical URL requires same host — so use
    # the domain-level behavior instead: blocked docs are excluded from
    # the keeper group entirely
    bl = spark.createDataFrame([("spam.example",)],
                               "registered_domain string")
    got = {r["doc_id"]: r["verdict"]
           for r in urlops.url_curation(rows, bl).collect()}
    assert got == {1: "blocked", 2: "kept"}
