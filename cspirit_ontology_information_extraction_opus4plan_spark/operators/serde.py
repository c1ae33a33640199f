"""Serialization round-trips — CSV and JSON ontology formats parsed
back in-plan.

Reference analogs (SURVEY §2.1): the CSV parser's column-mapping
semantics (parsers/__init__.py:5823-5910 — id/name/definition/synonyms
';'-split) and the JSON-LD namespace-expansion path
(parsers/__init__.py:7274 get_namespaces, :7527 expand). Instead of a
driver-side rdflib/csv module pass, serialization and parsing are both
single codegen'd projections: `to_csv`/`from_csv` and
`to_json`/`from_json` exercise Spark's actual CSV/JSON codecs (quoting,
escaping, null handling), so the round-trip query equals the source
table iff the codec round-trips faithfully — which is exactly what the
oracle (reading the source table directly) asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CSV_LINE_SCHEMA = ("id string, name string, definition string, "
                   "synonyms string, namespace string, is_obsolete boolean")

JSON_DOC_SCHEMA = "id string, name string, namespace string"

# prefix -> IRI expansion, the OBO-style context (JSON-LD @context analog)
OBO_BASE = "http://purl.obolibrary.org/obo/"


def csv_roundtrip(terms: DataFrame) -> DataFrame:
    """terms -> reference-format CSV line -> from_csv parse -> columns.
    synonyms travel ';'-joined inside one CSV field (the reference's
    encoding, ontology_manager.py:1229); n_synonyms proves the parse
    splits them back."""
    line = F.to_csv(F.struct(
        F.col("id"), F.col("name"), F.col("definition"),
        F.concat_ws(";", "synonyms").alias("synonyms"),
        F.col("namespace"), F.col("is_obsolete")))
    p = F.from_csv(line, CSV_LINE_SCHEMA)
    # Spark's CSV codec reads an empty field back as NULL — restore the
    # reference encoding's "no synonyms = empty string"
    syn = F.coalesce(p["synonyms"], F.lit(""))
    return terms.select(p["id"].alias("id"),
                        p["name"].alias("name"),
                        p["definition"].alias("definition"),
                        syn.alias("synonyms"),
                        F.when(syn == "", 0)
                        .otherwise(F.size(F.split(syn, ";")))
                        .alias("n_synonyms"),
                        p["namespace"].alias("namespace"),
                        p["is_obsolete"].alias("is_obsolete"))


NT_SUBJ_URI = r"^<urn:ont:([^>]+)>"
NT_PRED = r"<urn:pred:([^>]+)>"
NT_OBJ_URI = r" <urn:ont:([^>]+)> \.$"
NT_OBJ_LIT = r' "((?:[^"\\]|\\.)*)"(?:@[a-z-]+|\^\^<[^>]+>)? \.$'
NT_SUBJ_BNODE = r"^_:(\S+)"


def parse_ntriples(lines: DataFrame) -> DataFrame:
    """N-Triples source: parse serialized lines back into
    (subject, predicate, object, object_type) — the bulk-RDF read path
    of SURVEY §2.1 (OWL/RDF source via spark.read.text + parse; here
    the parse is pure regexp_extract, no rdflib). Handles uri / bnode /
    literal objects; the corpus emits only uri-uri triples, so the
    literal branch mirrors the reference's grammar without firing."""
    ln = F.col("line")
    subj_uri = F.regexp_extract(ln, NT_SUBJ_URI, 1)
    subj_bn = F.regexp_extract(ln, NT_SUBJ_BNODE, 1)
    obj_uri = F.regexp_extract(ln, NT_OBJ_URI, 1)
    obj_lit = F.regexp_extract(ln, NT_OBJ_LIT, 1)
    return lines.select(
        F.when(subj_uri != "", subj_uri).otherwise(subj_bn)
        .alias("subject"),
        F.regexp_extract(ln, NT_PRED, 1).alias("predicate"),
        F.when(obj_uri != "", obj_uri).otherwise(obj_lit).alias("object"),
        F.when(obj_uri != "", "uri").otherwise("literal")
        .alias("object_type"))


def jsonld_expand(terms: DataFrame) -> DataFrame:
    """terms -> JSON doc -> from_json parse -> CURIE-to-IRI expansion
    (CHEBI:10001 -> <obo>/CHEBI_10001), the JSON-LD expand step with a
    constant context."""
    doc = F.to_json(F.struct(F.col("id"), F.col("name"),
                             F.col("namespace")))
    p = F.from_json(doc, JSON_DOC_SCHEMA)
    return terms.select(
        p["id"].alias("id"), p["name"].alias("name"),
        F.concat(F.lit(OBO_BASE), F.translate(p["id"], ":", "_"))
        .alias("uri"))
