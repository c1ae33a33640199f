"""In-process parity vs the ACTUAL reference CSVParser and JSONLDParser
(round-5 priority 2).

These queries were previously verified only against the builder-authored
DuckDB twin; here the genuine reference code runs on the same fixture
payloads and the outputs are diffed field-for-field:

  * CSVParser.detect_format (:5182) / detect_dialect (:5212 — the full
    sniffer -> manual -> fallback chain with its confidence thresholds)
    / detect_headers (:5604, exception -> True) vs detect_csv_dialects
    on the seven-document dialect battery (quoted/escaped fields,
    TSV/semicolon/pipe, single quotes, headerless, single-line).
  * CSVParser.infer_column_types (:5668 + _infer_single_column_type
    :5717) vs csv_infer on the typed CSV document.
  * JSONLDParser.get_namespaces (:7274 — http(s)-string and @id-dict
    @context entries plus default rdf/rdfs/owl/xsd injection) vs
    jsonld_context_namespaces on documents whose @context exercises
    every branch (aliases, numerics, non-http @id, overridden owl,
    dropped-but-defaulted rdf).
  * JSONLDParser.expand/compact/flatten (:7527/:7708/:7777 — in this
    container pyld is absent, so the reference's LIVE behavior is its
    fallback algorithms: strip @context / reattach context / collect
    @graph nodes) and get_nodes (:8175) vs jsonld_flatten's node rows.

The reference parsers run untouched (watchdog stubbed at package init,
same as the round-4 harness).
"""

from __future__ import annotations

import json
import os
import sys
import types

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")


@pytest.fixture(scope="module")
def refp():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("watchdog", "watchdog.observers", "watchdog.events"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["watchdog.observers"].Observer = object
    sys.modules["watchdog.events"].FileSystemEventHandler = type(
        "FileSystemEventHandler", (), {})
    from aim2_project.aim2_ontology.parsers import CSVParser, JSONLDParser
    return types.SimpleNamespace(CSVParser=CSVParser,
                                 JSONLDParser=JSONLDParser)


# --- CSV dialect chain -----------------------------------------------------

def test_csv_dialect_parity(refp, spark):
    """Every column of detect_csv_dialects — fmt, delimiter, quotechar,
    method, confidence, has_header — must equal the ACTUAL
    CSVParser's answers per battery document, including the
    single-line doc that exercises the sniffer-exception -> fallback
    (whose heuristics the default delimiter option overrides to
    (',', 0.7)) and the headerless numeric doc."""
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        gazetteer as GZ,
        serde as SR,
    )
    files = DE.csv_dialect_files(GZ.terms_df(spark))
    payloads = {r["path"]: r["payload"] for r in files.collect()}
    got = {r["path"]: r
           for r in SR.detect_csv_dialects(files).collect()}
    assert set(got) == set(payloads) and len(got) == 7

    methods = set()
    for path, content in payloads.items():
        p = refp.CSVParser()
        want_fmt = p.detect_format(content)
        want = p.detect_dialect(content)
        want_hdr = p.detect_headers(content)
        g = got[path]
        assert g["fmt"] == want_fmt, path
        assert g["method"] == want["method"], path
        assert abs(g["confidence"] - want["confidence"]) < 1e-9, (
            path, g["confidence"], want["confidence"])
        d = want["dialect"]
        assert g["delimiter"] == d.delimiter, path
        assert g["quotechar"] == d.quotechar, path
        assert g["has_header"] == want_hdr, path
        methods.add(g["method"])
    # the battery exercises both the sniffer and the fallback paths
    assert {"sniffer", "fallback"} <= methods
    assert got["tab.tsv"]["fmt"] == "tsv"
    assert got["single_quote.csv"]["quotechar"] == "'"
    assert got["no_header.csv"]["has_header"] is False
    assert got["one_line.csv"]["has_header"] is True


def test_csv_infer_parity(refp, spark, sf_dir):
    """csv_infer vs the ACTUAL infer_column_types on the same typed CSV
    payload: identical (column -> type) map across all seven inference
    branches (ontology_id / string / list / category / integer / float
    / boolean)."""
    import __spark_entry__ as E
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        gazetteer as GZ,
    )
    payload = DE.csv_typed_files(GZ.terms_df(spark)) \
        .collect()[0]["payload"]
    want = refp.CSVParser().infer_column_types(payload)
    got = {r["col_name"]: r["inferred_type"]
           for r in E.queries()["csv_infer"](spark, sf_dir).collect()}
    assert got == want
    assert set(want.values()) == {"ontology_id", "string", "list",
                                  "category", "integer", "float",
                                  "boolean"}


# --- JSON-LD ---------------------------------------------------------------

def test_jsonld_context_namespaces_parity(refp, spark, sf_dir):
    """jsonld_context_namespaces vs the ACTUAL get_namespaces on every
    battery document — the (prefix -> uri) maps must be identical,
    including CHEBI's owl override suppressing the default owl and
    GO's dropped non-URI rdf still receiving the default rdf."""
    import __spark_entry__ as E
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        gazetteer as GZ,
    )
    docs = DE.jsonld_context_docs(GZ.terms_df(spark)).collect()
    assert len(docs) == 4
    rows = E.queries()["jsonld_context_namespaces"](
        spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["prefix"]] = r["uri"]
    jp = refp.JSONLDParser()
    for r in docs:
        want = jp.get_namespaces(json.loads(r["payload"]))
        assert got[r["doc_id"]] == want, r["doc_id"]
    # the traps fired
    assert got["CHEBI"]["owl"] == "http://example.org/owl-override#"
    assert got["GO"]["owl"] == "http://www.w3.org/2002/07/owl#"
    assert got["GO"]["rdf"] == \
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    by_src = {(r["doc_id"], r["prefix"]): r["source"] for r in rows}
    assert by_src[("CHEBI", "owl")] == "context"
    assert by_src[("GO", "owl")] == "default"


def test_jsonld_transform_parity(refp, spark, sf_dir):
    """jsonld_flatten's node rows vs the ACTUAL expand / compact /
    flatten / get_nodes on per-ontology @graph documents built from the
    same dimension. pyld is absent in this container, so the
    reference's LIVE transforms are its fallback algorithms; the
    invariant both stacks must share is the node multiset: expand
    strips @context and keeps every node, flatten collects exactly the
    @graph nodes, compact reattaches the context without touching
    them — and our flatten query emits exactly that node set per
    ontology."""
    import __spark_entry__ as E
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        gazetteer as GZ,
        serde as SR,
    )
    mine = {}
    for r in E.queries()["jsonld_flatten"](spark, sf_dir).collect():
        mine.setdefault(r["ontology_id"], set()).add(
            (r["node_id"], r["name"]))

    terms = GZ.terms_df(spark).select("ontology_id", "id", "name") \
        .collect()
    docs = {}
    for r in terms:
        docs.setdefault(r["ontology_id"], []).append(
            {"@id": r["id"], "name": r["name"]})
    jp = refp.JSONLDParser()
    ctx = {"obo": SR.OBO_BASE}
    for ont, nodes in docs.items():
        doc = {"@context": ctx, "@graph": nodes}
        want = {(n["@id"], n["name"]) for n in nodes}

        expanded = jp.expand(doc)
        assert isinstance(expanded, list) and len(expanded) == 1
        assert "@context" not in expanded[0]
        assert {(n["@id"], n["name"])
                for n in expanded[0]["@graph"]} == want

        flat = jp.flatten(doc, ctx)
        assert flat["@context"] == ctx
        assert {(n["@id"], n["name"]) for n in flat["@graph"]} == want

        compacted = jp.compact(expanded[0], ctx)
        assert compacted["@context"] == ctx
        assert {(n["@id"], n["name"])
                for n in compacted["@graph"]} == want

        assert {(n["@id"], n["name"])
                for n in jp.get_nodes(doc)} == want

        # and this engine's flatten query carries the same node set
        assert mine[ont] == want, ont

    # structure validation agrees on a positive and a negative case
    assert jp.validate_jsonld(
        json.dumps({"@graph": docs["GO"][:2]}))["valid_structure"]
    assert not jp.validate_jsonld(
        json.dumps({"plain": "json", "no": "keywords"}))["valid_structure"]
