"""Serialization sinks — N-Triples / Turtle lines, CSV / JSON exports
(SURVEY §2.1).

Reference semantics: RDFTriple.to_ntriples (models.py:4185 and :4604 —
later definition wins) escapes backslash, quote, newline, CR, tab and
suffixes literals with ^^<datatype> / @lang; to_turtle (models.py:4547)
uses prefixed names. CSV export writes terms + relationships sections
with ';'-joined synonyms (ontology_manager.py:1213-1233); JSON export
is to_dict per model (ontology_manager.py:1196).

All sinks are pure column expressions (concat/regexp_replace) feeding
`df.write.text/csv/json` — serialization costs one codegen'd projection,
no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(c: Column) -> Column:
    """N-Triples literal escaping (models.py:4204-4212): backslash first,
    then quote, LF, CR, TAB."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _uri(kind: str, ident: Column) -> Column:
    return F.concat(F.lit(f"<urn:{kind}:"), ident, F.lit(">"))


def _term(ident: Column, node_type: Column, datatype: Column,
          lang: Column, kind: str) -> Column:
    """Serialize one node: uri | bnode (models.py:3840-3880 node types) |
    literal with optional ^^<dt> / @lang (mutually exclusive,
    models.py:4219-4224: language wins if both set)."""
    literal = F.concat(
        F.lit('"'), _escape_literal(ident), F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
         .when(datatype.isNotNull(),
               F.concat(F.lit("^^<"), datatype, F.lit(">")))
         .otherwise(F.lit("")))
    return (F.when(node_type == "uri", _uri(kind, ident))
            .when(node_type == "bnode", F.concat(F.lit("_:"), ident))
            .otherwise(literal))


def to_ntriples(triples: DataFrame) -> DataFrame:
    """One N-Triples line per row: `<s> <p> o .`"""
    line = F.concat(
        _term(F.col("subject"), F.col("subject_type"),
              F.lit(None).cast("string"), F.lit(None).cast("string"), "ont"),
        F.lit(" "),
        _uri("pred", F.col("predicate")),
        F.lit(" "),
        _term(F.col("object"), F.col("object_type"),
              F.col("object_datatype"), F.col("object_language"), "ont"),
        F.lit(" ."))
    return triples.select(line.alias("line"))


def to_turtle(triples: DataFrame) -> DataFrame:
    """Prefixed-name Turtle lines (models.py:4547); ':' in local names is
    mapped to '_' to stay within PN_LOCAL."""
    def pn(prefix: str, c: Column) -> Column:
        return F.concat(F.lit(prefix + ":"),
                        F.regexp_replace(c, ":", "_"))
    line = F.concat(
        F.when(F.col("subject_type") == "uri", pn("ont", F.col("subject")))
         .otherwise(F.concat(F.lit("_:"), F.col("subject"))),
        F.lit(" "),
        pn("pred", F.col("predicate")),
        F.lit(" "),
        F.when(F.col("object_type") == "uri", pn("ont", F.col("object")))
         .when(F.col("object_type") == "bnode",
               F.concat(F.lit("_:"), F.col("object")))
         .otherwise(F.concat(
             F.lit('"'), _escape_literal(F.col("object")), F.lit('"'),
             # same @lang / ^^<dt> suffix rule as to_ntriples
             # (models.py:4219-4224: language wins if both set) — a
             # Turtle export without them is lossy for typed literals
             F.when(F.col("object_language").isNotNull(),
                    F.concat(F.lit("@"), F.col("object_language")))
              .when(F.col("object_datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("object_datatype"),
                             F.lit(">")))
              .otherwise(F.lit("")))),
        F.lit(" ."))
    return triples.select(line.alias("line"))


def terms_csv_rows(terms: DataFrame) -> DataFrame:
    """The reference CSV export's terms section
    (ontology_manager.py:1229-1233): id,name,definition,synonyms
    (';'-joined),namespace,is_obsolete."""
    return terms.select(
        "id", "name", "definition",
        F.concat_ws(";", "synonyms").alias("synonyms"),
        "namespace", "is_obsolete")


def write_ontology_csv(terms: DataFrame, rels: DataFrame,
                       out_dir: str) -> None:
    """Two-table CSV export (the reference's two-section file becomes two
    distributed CSV datasets — a single-file section sandwich does not
    parallelize)."""
    terms_csv_rows(terms).write.mode("overwrite") \
        .option("header", "true").csv(f"{out_dir}/terms")
    rels.select("id", "subject", "predicate", "object", "confidence") \
        .write.mode("overwrite") \
        .option("header", "true").csv(f"{out_dir}/relationships")


def terms_json(terms: DataFrame) -> DataFrame:
    """One JSON document per term (export_ontology_json analog,
    ontology_manager.py:1196) — to_json(struct(*)) keeps field order."""
    return terms.select(
        F.to_json(F.struct(*[F.col(c) for c in terms.columns]))
        .alias("doc"))


OWL_PREAMBLE = (
    '<?xml version="1.0"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
    '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
    '         xmlns:owl="http://www.w3.org/2002/07/owl#">')


def to_owl_rdfxml(terms: DataFrame, rels: DataFrame, ontology_id: str,
                  ontology_name: str) -> DataFrame:
    """OWL/RDF-XML sink (`_export_ontology_owl` ontology_manager.py:
    1270-1335): preamble + one owl:Ontology metadata block + one
    owl:Class block per term (rdfs:label, rdfs:comment when a
    definition exists, rdfs:isDefinedBy for the namespace) + one
    owl:ObjectProperty block per relationship (rdfs:domain/range).

    Distributed form: (sect, part_key, block) rows — block-per-row so
    every worker serializes its partition independently; a writer
    orders by (sect, part_key) and joins blocks with blank lines to
    recover the reference's exact document. The three constant rows
    (preamble, ontology metadata, footer) are a bounded driver-side
    frame; class/property blocks are pure column concat, no Python."""
    spark = terms.sparkSession
    head = spark.createDataFrame(
        [(0, "", OWL_PREAMBLE),
         (1, ontology_id,
          f'  <owl:Ontology rdf:about="#{ontology_id}">\n'
          f'    <rdfs:label>{ontology_name}</rdfs:label>\n'
          f'  </owl:Ontology>'),
         (4, "", "</rdf:RDF>")],
        "sect int, part_key string, block string")
    present = lambda c: F.col(c).isNotNull() & (F.col(c) != "")  # noqa: E731
    cls = terms.select(
        F.lit(2).alias("sect"), F.col("id").alias("part_key"),
        F.concat(
            F.lit('  <owl:Class rdf:about="#'), F.col("id"),
            F.lit('">\n    <rdfs:label>'), F.col("name"),
            F.lit('</rdfs:label>'),
            F.when(present("definition"),
                   F.concat(F.lit('\n    <rdfs:comment>'),
                            F.col("definition"),
                            F.lit('</rdfs:comment>'))).otherwise(F.lit("")),
            F.when(present("namespace"),
                   F.concat(F.lit('\n    <rdfs:isDefinedBy>'),
                            F.col("namespace"),
                            F.lit('</rdfs:isDefinedBy>')))
            .otherwise(F.lit("")),
            F.lit('\n  </owl:Class>')).alias("block"))
    props = rels.select(
        F.lit(3).alias("sect"), F.col("id").alias("part_key"),
        F.concat(
            F.lit('  <owl:ObjectProperty rdf:about="#'),
            F.col("predicate"),
            F.lit('">\n    <rdfs:domain rdf:resource="#'),
            F.col("subject"),
            F.lit('"/>\n    <rdfs:range rdf:resource="#'),
            F.col("object"),
            F.lit('"/>\n  </owl:ObjectProperty>')).alias("block"))
    return head.unionByName(cls).unionByName(props)


def export_ontology(terms: DataFrame, rels: DataFrame, triples: DataFrame,
                    out_dir: str,
                    formats: tuple[str, ...] = ("csv", "json", "ntriples",
                                                "turtle", "rdfxml", "owl")
                    ) -> dict[str, str]:
    """Combined multi-format export — the reference's one-call
    `export_ontology(format=...)` dispatch (ontology_manager.py:1196
    json, :1213 csv, :1270 owl/rdf-xml) fanned out over the registered
    sinks. Each format is an independent distributed write under
    out_dir/<format>; returns {format: path}. Unknown format names
    raise (a silent skip would report an export that never happened)."""
    from .serde import rdfxml_docs
    paths: dict[str, str] = {}
    for fmt in formats:
        path = f"{out_dir}/{fmt}"
        if fmt == "csv":
            write_ontology_csv(terms, rels, path)
        elif fmt == "json":
            terms_json(terms).write.mode("overwrite").text(path)
        elif fmt == "ntriples":
            to_ntriples(triples).write.mode("overwrite").text(path)
        elif fmt == "turtle":
            to_turtle(triples).write.mode("overwrite").text(path)
        elif fmt == "rdfxml":
            rdfxml_docs(terms).write.mode("overwrite").text(path)
        elif fmt == "owl":
            (to_owl_rdfxml(terms, rels, "EXPORT", "exported ontology")
             .sortWithinPartitions("sect", "part_key")
             .select("block").write.mode("overwrite").text(path))
        else:
            raise ValueError(f"unknown export format: {fmt}")
        paths[fmt] = path
    return paths


def to_graphml_lines(edges: DataFrame) -> DataFrame:
    """GraphML element lines for the undirected entity graph — the
    export a graph-tools consumer (Gephi/NetworkX/igraph) loads
    directly; completes the sink family next to N-Triples/Turtle/OWL.
    One row per element: a <node> line per distinct endpoint and an
    <edge> line per edge, each tagged (kind, sort_key) so the caller's
    writer can order nodes-then-edges deterministically without a
    global sort here. XML-escapes &, <, > in ids (the ontology CURIEs
    are clean, but the sink must not rely on that).

    Scale shape: node extraction is one distinct over edge endpoints
    (the only shuffle); line rendering is pure per-row string codegen.
    Header/footer are constant wrapper lines the writer adds — keeping
    them out of the DataFrame keeps the sink trivially partitionable."""
    def esc(c):
        return F.replace(F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")),
                                   F.lit("<"), F.lit("&lt;")),
                         F.lit(">"), F.lit("&gt;"))

    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct()
             .select(F.lit("node").alias("kind"),
                     F.col("id").alias("sort_key"),
                     F.concat(F.lit('    <node id="'), esc(F.col("id")),
                              F.lit('"/>')).alias("line")))
    edge_lines = edges.select(
        F.lit("edge").alias("kind"),
        F.concat("src", F.lit("|"), "dst").alias("sort_key"),
        F.concat(F.lit('    <edge source="'), esc(F.col("src")),
                 F.lit('" target="'), esc(F.col("dst")),
                 F.lit('"/>')).alias("line"))
    return nodes.unionByName(edge_lines)
