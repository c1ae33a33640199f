"""OBO flat-file format — source + sink (beyond the reference, which
reads ontologies only through rdflib/owlready2; OBO is the format OBO
Foundry ontologies — GO, ChEBI, PO — actually ship in, so an engine a
reference user switches to needs it).

Spark-first shape: OBO is a LINE protocol ([Term] stanzas of
`tag: value` lines), so the parse is pure column operations — explode
lines, extract (tag, value), and propagate the stanza's `id:` to its
member lines with a `last(..., ignoreNulls)` window ordered by line
position. Zero Python anywhere: a 100 TB OBO corpus parses inside
whole-stage codegen, and the per-document window partitions by
(document) — bounded by the largest single ontology file, which is
exactly the unit a file-per-ontology layout gives each task anyway.

Sink: one OBO document per ontology id, stanzas sorted by term id
(sort_array over collect_list — deterministic without a global sort),
synonyms as `synonym: "s" EXACT` lines, `is_a`/`alt_id`/`xref`/
`is_obsolete` per the OBO 1.2 spec subset the terms dimension uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OBO_FORMAT_VERSION = "1.2"

# single-pass-equivalent escape/unescape chains (OBO 1.2 §escape
# characters: backslash, double quote, newline). The \x00 sentinel
# makes the regexp_replace chain order-independent — without it,
# unescaping '\\n' would first turn it into '\n' and then a literal
# newline.


def _obo_escape(col):
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, r"\n", r"\\n")
    return F.regexp_replace(out, '"', r'\\"')


def _obo_unescape(col):
    out = F.regexp_replace(col, r"\\\\", "\x00")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r'\\"', '"')
    return F.regexp_replace(out, "\x00", "\\\\")


def to_obo(terms: DataFrame) -> DataFrame:
    """terms -> (src_id=ontology_id, payload): one OBO document per
    ontology with a header and one [Term] stanza per term. Free-text
    values (name, definition, synonyms) are OBO-escaped so hostile
    content — embedded quotes, backslashes, newlines — cannot break
    the line protocol or the quoted-string framing
    (tests/test_sinks.py round-trips a hostile battery)."""
    syn_lines = F.array_join(
        F.transform("synonyms",
                    lambda s: F.concat(F.lit('\nsynonym: "'),
                                       _obo_escape(s),
                                       F.lit('" EXACT []'))), "")
    parent = F.try_element_at("parents", F.lit(1))
    alt1 = F.try_element_at("alt_ids", F.lit(1))
    xref1 = F.try_element_at("xrefs", F.lit(1))
    stanza = F.concat(
        F.lit("[Term]\nid: "), F.col("id"),
        F.lit("\nname: "), _obo_escape(F.col("name")),
        F.lit('\nnamespace: '), F.col("namespace"),
        F.lit('\ndef: "'), _obo_escape(F.col("definition")),
        F.lit('" []'),
        syn_lines,
        F.when(alt1.isNotNull(),
               F.concat(F.lit("\nalt_id: "), alt1)).otherwise(""),
        F.when(xref1.isNotNull(),
               F.concat(F.lit("\nxref: "), xref1)).otherwise(""),
        F.when(parent.isNotNull(),
               F.concat(F.lit("\nis_a: "), parent)).otherwise(""),
        F.when(F.col("is_obsolete"), F.lit("\nis_obsolete: true"))
        .otherwise(""))
    return (terms
            .groupBy("ontology_id")
            .agg(F.concat(
                F.lit(f"format-version: {OBO_FORMAT_VERSION}\n"
                      "ontology: "), F.col("ontology_id"), F.lit("\n\n"),
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(
                            F.struct(F.col("id"), stanza.alias("s")))),
                        lambda x: x["s"]), "\n\n"))
                 .alias("payload"))
            .select(F.col("ontology_id").alias("src_id"), "payload"))


def parse_obo(docs: DataFrame) -> DataFrame:
    """(src_id, payload) -> exploded (src_id, term_id, tag, value)
    rows, one per stanza line — the relational form every downstream
    consumer (gazetteer build, hierarchy ops, merges) joins from.
    Pure column ops: posexplode(split(lines)) + regexp tag split + a
    last(ignoreNulls) window carrying the stanza id to its lines.
    Header lines (before the first [Term]) carry no stanza id and drop
    out; the `id:` line itself is kept as tag 'id' so consumers can
    count stanzas."""
    lines = docs.select(
        "src_id",
        F.posexplode(F.split("payload", "\n")).alias("pos", "line"))
    tag = F.regexp_extract("line", r"^([A-Za-z_-]+): ", 1)
    value = F.regexp_replace("line", r"^[A-Za-z_-]+: ", "")
    w = (Window.partitionBy("src_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    tagged = (lines
              .withColumn("tag", tag)
              .withColumn("value", value)
              .withColumn(
                  "term_id",
                  F.last(F.when((F.col("tag") == "id"), F.col("value")),
                         ignorenulls=True).over(w)))
    return (tagged
            .filter((F.col("tag") != "") & F.col("term_id").isNotNull())
            .select("src_id", "term_id", "tag", "value"))


def obo_terms(parsed: DataFrame) -> DataFrame:
    """Pivot the exploded rows back into one row per term (id, name,
    namespace, definition, n_synonyms, alt_id, xref, parent,
    is_obsolete) — the reconstruction a round-trip identity checks
    against the source dimension. One groupBy(term_id); synonym lines
    aggregate map-side."""
    v = F.col("value")
    first_of = lambda t: F.max(F.when(F.col("tag") == t, v))
    return (parsed.groupBy("src_id", "term_id")
            .agg(_obo_unescape(first_of("name")).alias("name"),
                 first_of("namespace").alias("namespace"),
                 _obo_unescape(
                     F.max(F.when(F.col("tag") == "def",
                                  F.regexp_extract(v, r'^"(.*)" \[\]$',
                                                   1))))
                 .alias("definition"),
                 F.sum((F.col("tag") == "synonym").cast("int"))
                 .cast("int").alias("n_synonyms"),
                 first_of("alt_id").alias("alt_id"),
                 first_of("xref").alias("xref"),
                 first_of("is_a").alias("parent"),
                 F.coalesce(F.max(F.when(F.col("tag") == "is_obsolete",
                                         v == "true")), F.lit(False))
                 .alias("is_obsolete")))
