"""Grammar-coverage unit tests for the full Turtle / RDF/XML parsers
(operators/rdf_full.py) — the constructs the per-line regular parsers
in serde.py cannot represent, plus the quarantine lane."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.rdf_full import (  # noqa: E501
    RDF_NS,
    XSD_NS,
    parse_rdfxml_text,
    parse_turtle_full,
    parse_turtle_text,
)


def _t(rows):
    """(s, p, o, st, ot, dt, lang) sans src_id."""
    return {r[1:] for r in rows}


def test_escapes_and_long_literals():
    rows = parse_turtle_text("d", r'''
@prefix o: <urn:o#> .
o:a o:p "tab\tnl\nquote\" ué U\U0001F600" .
o:a o:q """line1
line2 'single' "double" end""" .
o:a o:r '''"'''"'''mixed "quotes" here'''"'''"''' .
''')
    objs = {r[3] for r in rows}
    assert 'tab\tnl\nquote" ué U\U0001F600' in objs
    assert 'line1\nline2 \'single\' "double" end' in objs
    assert 'mixed "quotes" here' in objs


def test_sparql_style_directives_and_base():
    rows = parse_turtle_text("d", '''
PREFIX o: <urn:o#>
BASE <urn:doc#>
o:a o:p <rel> .
''')
    assert _t(rows) == {
        ("urn:o#a", "urn:o#p", "urn:doc#rel", "uri", "uri", None, None)}


def test_nested_bnode_property_lists():
    rows = parse_turtle_text("d", '''
@prefix o: <urn:o#> .
o:a o:p [ o:q [ o:r "deep" ] ; o:s "mid" ] .
''')
    s = _t(rows)
    assert ("urn:o#a", "urn:o#p", "_:d.g0", "uri", "bnode", None,
            None) in s
    assert ("_:d.g0", "urn:o#q", "_:d.g1", "bnode", "bnode", None,
            None) in s
    assert ("_:d.g1", "urn:o#r", "deep", "bnode", "literal", None,
            None) in s
    assert ("_:d.g0", "urn:o#s", "mid", "bnode", "literal", None,
            None) in s


def test_bnode_subject_and_anonymous_subject():
    rows = parse_turtle_text("d", '''
@prefix o: <urn:o#> .
[] o:p "anon subject" .
[ o:q "inline" ] o:p "with props" .
_:named o:p "labeled" .
''')
    s = _t(rows)
    assert ("_:d.g0", "urn:o#p", "anon subject", "bnode", "literal",
            None, None) in s
    assert ("_:d.g1", "urn:o#q", "inline", "bnode", "literal",
            None, None) in s
    assert ("_:d.g1", "urn:o#p", "with props", "bnode", "literal",
            None, None) in s
    assert ("_:d.named", "urn:o#p", "labeled", "bnode", "literal",
            None, None) in s


def test_nested_collections():
    rows = parse_turtle_text("d", '''
@prefix o: <urn:o#> .
o:a o:p ( "x" ( "y" ) ) .
''')
    s = _t(rows)
    # outer cell 0 -> "x"; outer cell 1's first is the inner list head
    assert ("_:d.g0", RDF_NS + "first", "x", "bnode", "literal", None,
            None) in s
    inner_heads = [r for r in s if r[0] == "_:d.g1"
                   and r[1] == RDF_NS + "first"]
    assert len(inner_heads) == 1 and inner_heads[0][4] == "bnode"
    assert (inner_heads[0][2], RDF_NS + "first", "y", "bnode",
            "literal", None, None) in s


def test_numeric_boolean_and_datatype_literals():
    rows = parse_turtle_text("d", '''
@prefix o: <urn:o#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
o:a o:p 42 ; o:p -7 ; o:q 3.14 ; o:r 6.02e23 ; o:s true ;
    o:t "x"^^o:custom ; o:u "y"^^<urn:dt> .
''')
    dts = {(r[3], r[6]) for r in rows}
    assert ("42", XSD_NS + "integer") in dts
    assert ("-7", XSD_NS + "integer") in dts
    assert ("3.14", XSD_NS + "decimal") in dts
    assert ("6.02e23", XSD_NS + "double") in dts
    assert ("true", XSD_NS + "boolean") in dts
    assert ("x", "urn:o#custom") in dts
    assert ("y", "urn:dt") in dts


def test_lang_tags_with_subtags():
    rows = parse_turtle_text(
        "d", '@prefix o: <urn:o#> .\no:a o:p "hi"@en-US .')
    assert rows[0][7] == "en-us"


def test_pname_trailing_dot_not_swallowed():
    rows = parse_turtle_text(
        "d", "@prefix o: <urn:o#> .\no:a o:p o:x.\no:a o:p o:y .")
    objs = {r[3] for r in rows}
    assert objs == {"urn:o#x", "urn:o#y"}


def test_undefined_prefix_raises():
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle_text("d", "o:a o:p o:c .")


def test_rdfxml_li_and_nodeid_and_collection():
    rows = parse_rdfxml_text("d", f'''<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:o="urn:o#" xml:base="urn:b">
  <rdf:Description rdf:ID="frag">
    <o:bag><rdf:Bag><rdf:li>a</rdf:li><rdf:li>b</rdf:li>
      <rdf:li>c</rdf:li></rdf:Bag></o:bag>
    <o:empty rdf:parseType="Collection"></o:empty>
  </rdf:Description>
</rdf:RDF>''')
    s = _t(rows)
    assert ("urn:b#frag", "urn:o#empty", RDF_NS + "nil", "uri", "uri",
            None, None) in s
    bag = [r for r in s if r[1] == RDF_NS + "type"
           and r[2] == RDF_NS + "Bag"][0][0]
    assert (bag, RDF_NS + "_3", "c", "bnode", "literal", None, None) in s


def test_rdfxml_parsetype_literal():
    rows = parse_rdfxml_text("d", f'''<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:o="urn:o#">
  <rdf:Description rdf:about="urn:x">
    <o:markup rdf:parseType="Literal">pre<em>emph</em>post</o:markup>
  </rdf:Description>
</rdf:RDF>''')
    r = rows[0]
    assert r[6] == RDF_NS + "XMLLiteral"
    assert "pre" in r[3] and "<em>emph</em>" in r[3]


def test_quarantine_lane(spark):
    docs = spark.createDataFrame(
        [("ok", "@prefix o: <urn:o#> .\no:a o:p o:b ."),
         ("bad", "o:a o:p o:b"),  # undefined prefix + missing dot
         ("worse", '@prefix o: <urn:o#> .\no:a o:p "unterminated .')],
        "src_id string, payload string")
    out = parse_turtle_full(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_id"], []).append(r)
    assert by_src["ok"][0]["predicate"] == "urn:o#p"
    for bad in ("bad", "worse"):
        (q,) = by_src[bad]
        assert q["predicate"] == "parse_error"
        assert q["subject"] == "" and q["subject_type"] == "error"
