"""XML (PMC/JATS) source, URL source routing, content guards —
behavioral checks against hand-built ground truth plus the plan-shape
gates (one Arrow stage for the XML parse; guards and routing stay
entirely JVM-side)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark import (
    decorations as DE,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.guards import (
    content_guards,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.xmlsource import (
    detect_xml_schema,
    parse_jats,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- content guards: real bytes vs hand-computed truth ----------------------


def test_content_guards_byte_truth(spark):
    rows = [
        (1, b"plain ascii"),
        (2, b"\xef\xbb\xbf" + "bom text".encode()),
        (3, b"\xff\xfe" + "wide".encode("utf-16-le")),
        (4, b"\xfe\xff" + "wide".encode("utf-16-be")),
        (5, b"ab\xff"),          # invalid UTF-8 tail
        (6, b"x" * 100),         # oversized at max_bytes=50
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r["doc_id"]: (r["n_bytes"], r["encoding"], r["status"])
           for r in content_guards(df, max_bytes=50).collect()}
    assert got[1] == (11, "utf-8", "ok")
    assert got[2] == (11, "utf-8-bom", "ok")
    assert got[3] == (10, "utf-16le", "ok")
    assert got[4] == (10, "utf-16be", "ok")
    assert got[5] == (3, "invalid", "rejected")
    assert got[6] == (100, "utf-8", "oversized")


def test_content_guards_size_outranks_encoding(spark):
    # oversized AND undecodable -> 'oversized' (reference rule order:
    # content_size before content_encoding, parsers/__init__.py:543-544)
    df = spark.createDataFrame([(1, b"\xff" * 60)],
                               "doc_id bigint, content binary")
    row = content_guards(df, max_bytes=50).collect()[0]
    assert row["status"] == "oversized"


def test_content_guards_plan_pure_jvm(spark, sf_dir):
    plan = _plan(api.q_content_guards(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan  # narrow per-row projection only


# --- XML (PMC/JATS) source ---------------------------------------------------


def test_jats_schema_sniff_agrees_with_parser(spark, sf_dir):
    """The column-level schema sniff must agree with the structural
    parser on every well-formed document."""
    docs = DE.jats_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")).filter(F.col("doc_id") % 23 != 7)
    sniffed = docs.select("doc_id",
                          detect_xml_schema(F.col("xml")).alias("s"))
    parsed = parse_jats(docs).select("doc_id", "xml_schema").distinct()
    diff = (sniffed.join(parsed, "doc_id")
            .filter(F.col("s") != F.col("xml_schema")).count())
    assert diff == 0


def test_jats_malformed_quarantines_not_raises(spark):
    df = spark.createDataFrame(
        [(1, "<article><front></article>"),     # mismatched close
         (2, "<unexpected-root/>"),             # unknown schema
         (3, "<article><body><sec sec-type=\"intro\"><p>ok</p></sec>"
             "</body></article>")],
        "doc_id bigint, xml string")
    out = parse_jats(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["elem"] for r in by_doc[1]] == ["parse_error"]
    assert by_doc[1][0]["xml_schema"] == "unknown"
    assert [r["elem"] for r in by_doc[2]] == ["parse_error"]
    assert [(r["elem"], r["sec_type"], r["content"], r["pos"])
            for r in by_doc[3]] == [("section", "intro", "ok", 0)]


def test_jats_parse_one_arrow_stage_column_pruned(spark, sf_dir):
    plan = _plan(api.q_jats_parse(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "doc_id" in schema and "text" in schema
    assert "lang" not in schema and "source" not in schema


# --- URL source routing ------------------------------------------------------


def test_url_route_strips_query_and_fragment(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.serde import (
        route_url_sources,
    )
    files = spark.createDataFrame(
        [("https://a.org/d.nt?v=2", "<a> <b> <c> ."),
         ("file:///x/d.ttl#frag", "ont:a pred:b ont:c ."),
         ("s3://bucket/no_ext", "<?xml version=\"1.0\"?><rdf:RDF/>"),
         ("relative/path.unknownext", "???")],
        "url string, payload string")
    got = {r["url"]: (r["scheme"], r["fmt"])
           for r in route_url_sources(files).collect()}
    assert got["https://a.org/d.nt?v=2"] == ("https", "ntriples")
    assert got["file:///x/d.ttl#frag"] == ("file", "turtle")
    assert got["s3://bucket/no_ext"] == ("s3", "rdfxml")   # content sniff
    assert got["relative/path.unknownext"] == ("", None)


def test_url_route_single_aggregation_exchange(spark, sf_dir):
    plan = _plan(api.q_url_route(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "MapInPandas" not in plan  # routing never parses
    assert "BatchEvalPython" not in plan


def test_url_parse_one_arrow_stage_no_cartesian(spark, sf_dir):
    plan = _plan(api.q_url_parse(spark, sf_dir))
    assert plan.count("MapInPandas") == 1  # only the rdfxml branch
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
