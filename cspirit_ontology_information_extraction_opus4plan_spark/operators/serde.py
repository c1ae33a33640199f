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
                        F.when(F.coalesce(syn, F.lit("")) == "", 0)
                        .otherwise(F.size(F.split(syn, ";")))
                        .alias("n_synonyms"),
                        p["namespace"].alias("namespace"),
                        p["is_obsolete"].alias("is_obsolete"))


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
