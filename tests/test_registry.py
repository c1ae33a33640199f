"""Parser registry, format autodetect, conversion filters, named
custom filters (reference: auto_detect_parser parsers/__init__.py:9361
— extension :9144 then content sniff :9211 — registry :9291;
conversion-filter options :2636-2641; custom filter
ontology_trimmer.py:418)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    ontology_algebra as OA,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    serde as SR,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (
    relationships_df,
    terms_df,
)


def test_extension_detect_and_sniff_fallback(spark):
    rows = [
        ("dump.nt", "x"), ("dump.TTL", "x"), ("a/b/c.owl", "x"),
        ("noext", "<?xml version"), ("noext2", "@prefix ex: <u> ."),
        ("noext3", "<urn:s> <urn:p> <urn:o> ."), ("noext4", "plain text"),
        ("weird.xyz", "plain text"),
    ]
    got = {r["path"]: r["fmt"]
           for r in SR.route_formats(
               spark.createDataFrame(rows, "path string, payload string")
           ).collect()}
    assert got == {
        "dump.nt": "ntriples", "dump.TTL": "turtle", "a/b/c.owl": "rdfxml",
        "noext": "rdfxml", "noext2": "turtle", "noext3": "ntriples",
        "noext4": None, "weird.xyz": None,
    }


def test_conversion_filter_kind_gating(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.decorations import (
        planted_individuals,
    )
    t = terms_df(spark)
    conv = SR.conversion_triples(t, relationships_df(spark),
                                 planted_individuals(t))
    kinds = {r["entity_kind"] for r in
             SR.conversion_filter(conv, include_properties=False)
             .select("entity_kind").distinct().collect()}
    assert kinds == {"class", "individual"}
    only_props = SR.conversion_filter(
        conv, include_classes=False, include_individuals=False,
        property_filter="^is_a$")
    assert [r["subject"] for r in only_props.collect()] == ["is_a"]


def test_named_filter_unknown_name_raises(spark):
    with pytest.raises(KeyError):
        OA.apply_named_filter(terms_df(spark), "no_such_filter")
    got = OA.apply_named_filter(terms_df(spark), "active_long_chemical")
    assert got.filter(F.col("namespace") != "chemical").count() == 0


def test_rdfxml_malformed_payload_quarantines(spark):
    """One malformed XML document in a routed mixed-format table must
    become a countable empty-subject row (the parse_stats failure
    marker), not abort the job — the guards.py rule; matches
    xmlsource.parse_jats."""
    docs = spark.createDataFrame(
        [('<?xml version="1.0"?><rdf:RDF '
          'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
          'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
          '<rdf:Description rdf:about="urn:x#A">'
          '<rdfs:label>alpha</rdfs:label></rdf:Description></rdf:RDF>',),
         ('<?xml version="1.0"?><rdf:RDF <<< not xml',)],
        "xml string")
    rows = SR.parse_rdfxml(docs).collect()
    subs = sorted(r["subject"] for r in rows)
    assert subs == ["", "A"]
    bad = [r for r in rows if r["subject"] == ""][0]
    assert bad["predicate"] == "parse_error"


def test_csv_infer_hits_every_type_branch(spark):
    """infer_csv_types over a hand-built payload: one column per
    reference inference rule, including the no-non-empty-values ->
    string fallback."""
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.serde import (
        infer_csv_types,
    )
    payload = "\n".join([
        "term_id,synonyms,category,n,score,flag,word,empty",
        "CHEBI:1,a;b,chem,1,1.5,true,x,",
        "GO:2,c,bio,2,2.5,no,2026,",
        "GO:3,,bio,3,3.5,f,zz,",
    ])
    files = spark.createDataFrame([("t.csv", payload)],
                                  "path string, payload string")
    got = {r["col_name"]: r["inferred_type"]
           for r in infer_csv_types(files).collect()}
    assert got == {
        "term_id": "ontology_id", "synonyms": "list",
        "category": "category", "n": "integer", "score": "float",
        "flag": "boolean", "word": "string", "empty": "string",
    }
