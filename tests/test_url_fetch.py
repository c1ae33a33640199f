"""fetch_url_sources: the offline-default URL download stage
(reference ontology_manager.py:200-208) — file:// transport, mocked
http transport, offline refusal, and the full fetch -> route -> parse
chain over a real on-disk ontology file."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    serde as SR,
)

_NT = ('<urn:ont:CHEBI:1> <urn:pred:is_a> <urn:ont:CHEBI:2> .\n'
       '<urn:ont:CHEBI:3> <urn:pred:label> "glucose" .\n')


def test_file_url_fetch_route_parse(spark, tmp_path):
    f = tmp_path / "mini.nt"
    f.write_text(_NT)
    url = f"file://{f}"
    files = SR.fetch_url_sources(spark, [url])
    routed = SR.route_url_sources(files)
    (r,) = routed.collect()
    assert (r["scheme"], r["fmt"]) == ("file", "ntriples")
    parsed = SR.parse_url_sources(files).collect()
    got = {(t["subject"], t["predicate"], t["object"], t["object_type"])
           for t in parsed}
    # the NT parser inverts the engine's own serialization convention:
    # <urn:ont:X> -> X, <urn:pred:p> -> p (serde.NT_* regexes)
    assert got == {("CHEBI:1", "is_a", "CHEBI:2", "uri"),
                   ("CHEBI:3", "label", "glucose", "literal")}


def test_http_refused_offline_by_default(spark):
    with pytest.raises(RuntimeError, match="offline is the default"):
        SR.fetch_url_sources(spark, ["http://example.org/onto.owl"])


def test_http_with_injected_transport(spark):
    calls = []

    def fake_transport(url):
        calls.append(url)
        return "@prefix ont: <urn:graft#> .\nont:A_1 pred:is_a ont:B_2 ."

    files = SR.fetch_url_sources(
        spark, ["https://purl.example.org/onto.ttl"],
        transport=fake_transport)
    assert calls == ["https://purl.example.org/onto.ttl"]
    (r,) = SR.route_url_sources(files).collect()
    assert (r["scheme"], r["fmt"]) == ("https", "turtle")


def test_extension_beats_sniff_and_query_string_ignored(spark):
    files = SR.fetch_url_sources(
        spark, ["https://host/x.nt?version=3#frag"],
        transport=lambda u: "@prefix looks: <urn:ttl#> .")
    (r,) = SR.route_url_sources(files).collect()
    # extension routing strips ?query/#fragment and wins over the
    # turtle-looking payload (auto_detect_parser :9144 before :9211)
    assert r["fmt"] == "ntriples"
