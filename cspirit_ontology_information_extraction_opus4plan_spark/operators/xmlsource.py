"""XML (PMC/JATS) document source — schema detection + structural
parse into title/abstract/sections/figures (SURVEY §2.1's XML row).

Reference semantics: `XMLParser.parse` (xml_parser.py:496) prepares
content (:549), detects the schema — PMC vs JATS vs unknown
(`_detect_xml_schema` :698) — parses with etree/lxml (:1033/:1081) and
extracts sections, figure captions and metadata; malformed XML is a
caught parse failure, not a crash (`parse_safe` parsers/__init__.py:927).

Spark mapping: schema detection is a pure column sniff over the
document prefix (pushdown-eligible, no Python); the structural parse
is ONE mapInPandas etree stage — each Arrow batch amortizes the parser
over many documents, the same shape as serde.parse_rdfxml. A malformed
document yields a single `parse_error` row carrying its doc_id, so the
failure set is a filter on the output instead of a driver-side
exception (at 10^12 documents a bad input must quarantine, not abort).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JATS_ELEM_SCHEMA = ("doc_id bigint, xml_schema string, elem string, "
                    "sec_type string, content string, pos int")


def detect_xml_schema(payload: Column) -> Column:
    """Column-level schema sniff (`_detect_xml_schema` xml_parser.py:698):
    a <pmc-articleset> wrapper -> 'pmc', a bare <article> root -> 'jats',
    anything else -> 'unknown'. Prefix matches only — this classifies,
    it does not validate (well-formedness is the parse stage's job)."""
    body = F.regexp_replace(payload, r"^<\?xml[^>]*\?>", "")
    return (F.when(body.startswith("<pmc-articleset"), "pmc")
            .when(body.startswith("<article"), "jats")
            .otherwise("unknown"))


def _jats_batches(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
    import xml.etree.ElementTree as ET
    for pdf in batches:
        ids: list[int] = []
        schemas: list[str] = []
        elems: list[str] = []
        sec_types: list[str | None] = []
        contents: list[str | None] = []
        poss: list[int] = []

        def emit(d, sch, elem, st, content, pos):
            ids.append(d)
            schemas.append(sch)
            elems.append(elem)
            sec_types.append(st)
            contents.append(content)
            poss.append(pos)

        for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
            try:
                root = ET.fromstring(xml)
            except ET.ParseError:
                emit(doc_id, "unknown", "parse_error", None, None, -1)
                continue
            if root.tag == "article":
                schema, art = "jats", root
            elif root.tag == "pmc-articleset":
                schema, art = "pmc", root.find("article")
            else:
                schema, art = "unknown", None
            if art is None:
                emit(doc_id, schema, "parse_error", None, None, -1)
                continue
            pos = 0
            title = art.findtext(
                "front/article-meta/title-group/article-title")
            if title is not None:
                emit(doc_id, schema, "title", None, title, pos)
                pos += 1
            abstract = art.findtext("front/article-meta/abstract/p")
            if abstract is not None:
                emit(doc_id, schema, "abstract", None, abstract, pos)
                pos += 1
            body = art.find("body")
            if body is not None:
                # document order across sec/fig children, as the
                # reference walks the tree (xml_parser.py:1033)
                for child in body:
                    if child.tag == "sec":
                        emit(doc_id, schema, "section",
                             child.get("sec-type"), child.findtext("p"),
                             pos)
                        pos += 1
                    elif child.tag == "fig":
                        emit(doc_id, schema, "figure", None,
                             child.findtext("caption/p"), pos)
                        pos += 1
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "xml_schema": schemas, "elem": elems,
                            "sec_type": sec_types, "content": contents,
                            "pos": pd.Series(poss, dtype="int32")})


def parse_jats(docs: DataFrame) -> DataFrame:
    """(doc_id, xml) -> one row per extracted element, document order
    preserved in `pos`; malformed documents become `parse_error` rows.
    One Arrow crossing, column-pruned to exactly (doc_id, xml)."""
    return docs.select("doc_id", "xml").mapInPandas(
        _jats_batches, schema=JATS_ELEM_SCHEMA)
