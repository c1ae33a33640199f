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
