"""Full-grammar RDF text parsing — Turtle and RDF/XML beyond the
regular per-line subsets in serde.py.

Reference semantics: OWLParser.parse routes Turtle/RDF-XML/N3/OWL
content through rdflib (`_parse_with_rdflib`
parsers/__init__.py:2990) and owlready2 (:3037); triples carry the
7-tuple identity (subject, predicate, object, subject_type,
object_type, object_datatype, object_language) — RDFTriple.__hash__
models.py:4408. This module re-expresses that read path Spark-first:
whole documents arrive as rows of a DataFrame and each is parsed by a
pure-Python W3C-grammar parser inside ONE `mapInPandas` Arrow stage
(the sanctioned-Arrow-stage pattern of xmlsource.parse_jats) — the
parse is data-parallel over documents, grammar-complete within a
document, and costs one Arrow crossing however large the corpus.

Grammar coverage (vs serde.parse_turtle's admitted
prefixed-triple-per-line subset):
  * @prefix / @base and SPARQL-style PREFIX / BASE directives
  * multi-line statements; ';' predicate lists and ',' object lists
  * 'a' -> rdf:type
  * IRIREF, prefixed names, labeled bnodes, anonymous bnode property
    lists [ ... ], collections ( ... ) -> rdf:first/rdf:rest/rdf:nil
  * literals: short/long (triple-quoted) in both quote characters,
    \\-escapes incl. \\uXXXX/\\UXXXXXXXX, @lang tags, ^^datatype,
    numeric shorthand (xsd:integer/decimal/double), booleans
  * comments and arbitrary whitespace
RDF/XML coverage (vs serde._rdfxml_batches' Description/label/
subClassOf walker): typed node elements, rdf:about/rdf:ID/rdf:nodeID,
property attributes, rdf:resource/rdf:nodeID object attributes,
nested node elements, rdf:parseType="Resource"/"Collection"/"Literal",
rdf:li -> rdf:_n, xml:lang inheritance, rdf:datatype, xml:base.

Blank-node labels are skolemized per document as
"_:<src_id>.<label>" (anonymous nodes: "_:<src_id>.g<n>" in order of
appearance) — deterministic, collision-free across documents, and
reconstructable by the DuckDB oracle; rdflib's per-parse random bnode
ids are the one behavior deliberately not reproduced (they would make
any cross-engine comparison vacuous).

Failure lane: a document that fails the grammar yields one quarantine
row (subject='', predicate='parse_error', object=<reason>) instead of
aborting the job — the guards.py rule, matching the reference's
SKIP/CONTINUE recovery (parsers/__init__.py:1059, :1135).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

TRIPLE7_SCHEMA = (
    "src_id string, subject string, predicate string, object string, "
    "subject_type string, object_type string, "
    "object_datatype string, object_language string")


# --------------------------------------------------------------------------
# Turtle tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+)
  | (?P<COMMENT>\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<LONG_STR>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
               |'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<PREFIX_DIR>@prefix\b|@base\b)
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.?\d+)[eE][+-]?\d+)
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<DTYPE>\^\^)
  | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<PNAME>[A-Za-z][A-Za-z0-9_.-]*:
                  [A-Za-z0-9_](?:[A-Za-z0-9_.:-]*[A-Za-z0-9_:-])?
            | [A-Za-z][A-Za-z0-9_-]*:
            | :[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<KEYWORD>\b(?:a|true|false|PREFIX|BASE|prefix|base|GRAPH)\b)
  | (?P<PUNCT>[.;,(){}\[\]])
""", re.VERBOSE)

_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            e = s[i + 1]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 2
            elif e == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
            elif e == "U":
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
            else:
                raise ValueError(f"bad escape \\{e}")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(text: str) -> List[Tuple[str, str]]:
    toks, pos, n = [], 0, len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"lex error at offset {pos}: "
                             f"{text[pos:pos + 20]!r}")
        kind = m.lastgroup
        if kind not in ("WS", "COMMENT"):
            toks.append((kind, m.group()))
        pos = m.end()
    return toks


# --------------------------------------------------------------------------
# Turtle recursive-descent parser (W3C Turtle grammar, doc-at-a-time)
# --------------------------------------------------------------------------

class _TurtleDoc:
    """One document's parse state: prefixes, base, bnode generator,
    emitted triple rows."""

    def __init__(self, src_id: str):
        self.src = src_id
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.n_anon = 0
        self.graph: Optional[str] = None   # current TriG graph label
        self.rows: List[tuple] = []

    def anon(self) -> str:
        b = f"_:{self.src}.g{self.n_anon}"
        self.n_anon += 1
        return b

    def label_bnode(self, label: str) -> str:
        return f"_:{self.src}.{label[2:]}"

    def resolve(self, iri: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        return self.base + iri

    def expand(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"undefined prefix '{pfx}:'")
        return self.prefixes[pfx] + local

    def emit(self, s, p, o, st, ot, dt=None, lang=None):
        self.rows.append((self.src, s, p, o, st, ot, dt, lang,
                          self.graph))


class _TurtleParser:
    def __init__(self, doc: _TurtleDoc, toks: List[Tuple[str, str]],
                 trig: bool = False):
        self.d = doc
        self.toks = toks
        self.i = 0
        self.trig = trig

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of input")
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        k, v = self.next()
        if k != "PUNCT" or v != ch:
            raise ValueError(f"expected '{ch}', got {v!r}")

    def parse(self) -> None:
        while self.peek() is not None:
            k, v = self.peek()
            if k == "PREFIX_DIR" or (k == "KEYWORD"
                                     and v in ("PREFIX", "BASE",
                                               "prefix", "base")):
                self.directive()
            elif self.trig and k == "KEYWORD" and v in ("GRAPH",):
                self.next()
                label, _ = self.subject()   # iri or bnode graph label
                self.graph_block(label)
            elif self.trig and k == "PUNCT" and v == "{":
                self.graph_block(None)      # wrapped default graph
            elif self.trig and k not in ("PUNCT",):
                # triplesOrGraph: a label followed by '{' opens a
                # graph block, else it is an ordinary subject
                subj, st = self.subject()
                nk = self.peek()
                if nk and nk[0] == "PUNCT" and nk[1] == "{":
                    self.graph_block(subj)
                else:
                    self.predicate_object_list(subj, st)
                    self.expect_punct(".")
            else:
                self.triples()
                self.expect_punct(".")

    def graph_block(self, label: Optional[str]) -> None:
        """TriG wrappedGraph: '{' (triples '.'?)* '}' under the given
        graph label (None = default graph)."""
        prev = self.d.graph
        self.d.graph = label
        self.expect_punct("{")
        while True:
            nk = self.peek()
            if nk is None:
                raise ValueError("unterminated graph block")
            if nk[0] == "PUNCT" and nk[1] == "}":
                self.next()
                break
            self.triples()
            nk = self.peek()
            if nk and nk[0] == "PUNCT" and nk[1] == ".":
                self.next()
        self.d.graph = prev

    def directive(self) -> None:
        k, v = self.next()
        at_form = (k == "PREFIX_DIR")
        if v.lstrip("@").lower() == "prefix":
            pk, pv = self.next()
            if pk != "PNAME" or not pv.endswith(":"):
                raise ValueError(f"expected prefix name, got {pv!r}")
            ik, iv = self.next()
            if ik != "IRIREF":
                raise ValueError(f"expected IRI, got {iv!r}")
            self.d.prefixes[pv[:-1]] = self.d.resolve(iv[1:-1])
        else:
            ik, iv = self.next()
            if ik != "IRIREF":
                raise ValueError(f"expected IRI, got {iv!r}")
            self.d.base = self.d.resolve(iv[1:-1])
        if at_form:
            self.expect_punct(".")

    def triples(self) -> None:
        k, v = self.peek()
        if k == "PUNCT" and v == "[":
            subj = self.bnode_property_list()
            st = "bnode"
            nk = self.peek()
            if nk is not None and not (nk[0] == "PUNCT" and nk[1] == "."):
                self.predicate_object_list(subj, st)
        elif k == "PUNCT" and v == "(":
            subj = self.collection()[0]
            st = "bnode" if subj.startswith("_:") else "uri"
            self.predicate_object_list(subj, st)
        else:
            subj, st = self.subject()
            self.predicate_object_list(subj, st)

    def subject(self) -> Tuple[str, str]:
        k, v = self.next()
        if k == "IRIREF":
            return self.d.resolve(v[1:-1]), "uri"
        if k == "PNAME":
            return self.d.expand(v), "uri"
        if k == "BNODE":
            return self.d.label_bnode(v), "bnode"
        raise ValueError(f"bad subject token {v!r}")

    def predicate(self) -> str:
        k, v = self.next()
        if k == "KEYWORD" and v == "a":
            return RDF_NS + "type"
        if k == "IRIREF":
            return self.d.resolve(v[1:-1])
        if k == "PNAME":
            return self.d.expand(v)
        raise ValueError(f"bad predicate token {v!r}")

    def predicate_object_list(self, subj: str, st: str) -> None:
        while True:
            pred = self.predicate()
            while True:
                self.object_(subj, st, pred)
                nk = self.peek()
                if nk and nk[0] == "PUNCT" and nk[1] == ",":
                    self.next()
                    continue
                break
            nk = self.peek()
            if nk and nk[0] == "PUNCT" and nk[1] == ";":
                self.next()
                nk = self.peek()
                # trailing ';' before '.' or ']' is legal Turtle
                if nk and nk[0] == "PUNCT" and nk[1] in (".", "]"):
                    break
                continue
            break

    def object_(self, subj: str, st: str, pred: str) -> None:
        k, v = self.peek()
        if k == "PUNCT" and v == "[":
            b = self.bnode_property_list()
            self.d.emit(subj, pred, b, st, "bnode")
            return
        if k == "PUNCT" and v == "(":
            head, ht = self.collection()
            self.d.emit(subj, pred, head, st, ht)
            return
        self.next()
        if k == "IRIREF":
            self.d.emit(subj, pred, self.d.resolve(v[1:-1]), st, "uri")
        elif k == "PNAME":
            self.d.emit(subj, pred, self.d.expand(v), st, "uri")
        elif k == "BNODE":
            self.d.emit(subj, pred, self.d.label_bnode(v), st, "bnode")
        elif k in ("STRING", "LONG_STR"):
            raw = v[3:-3] if k == "LONG_STR" else v[1:-1]
            lex = _unescape(raw)
            nk = self.peek()
            if nk and nk[0] == "LANGTAG":
                self.next()
                self.d.emit(subj, pred, lex, st, "literal",
                            lang=nk[1][1:].lower())
            elif nk and nk[0] == "DTYPE":
                self.next()
                dk, dv = self.next()
                if dk == "IRIREF":
                    dt = self.d.resolve(dv[1:-1])
                elif dk == "PNAME":
                    dt = self.d.expand(dv)
                else:
                    raise ValueError(f"bad datatype token {dv!r}")
                self.d.emit(subj, pred, lex, st, "literal", dt=dt)
            else:
                self.d.emit(subj, pred, lex, st, "literal")
        elif k == "INTEGER":
            self.d.emit(subj, pred, v, st, "literal", dt=XSD_NS + "integer")
        elif k == "DECIMAL":
            self.d.emit(subj, pred, v, st, "literal", dt=XSD_NS + "decimal")
        elif k == "DOUBLE":
            self.d.emit(subj, pred, v, st, "literal", dt=XSD_NS + "double")
        elif k == "KEYWORD" and v in ("true", "false"):
            self.d.emit(subj, pred, v, st, "literal", dt=XSD_NS + "boolean")
        else:
            raise ValueError(f"bad object token {v!r}")

    def bnode_property_list(self) -> str:
        self.expect_punct("[")
        b = self.d.anon()
        nk = self.peek()
        if not (nk and nk[0] == "PUNCT" and nk[1] == "]"):
            self.predicate_object_list(b, "bnode")
        self.expect_punct("]")
        return b

    def collection(self) -> Tuple[str, str]:
        """Returns (head, head_type): the first cons cell's bnode, or
        rdf:nil (uri) for the empty collection."""
        self.expect_punct("(")
        cells: List[str] = []
        while True:
            nk = self.peek()
            if nk is None:
                raise ValueError("unterminated collection")
            if nk[0] == "PUNCT" and nk[1] == ")":
                self.next()
                break
            cell = self.d.anon()
            cells.append(cell)
            self.object_(cell, "bnode", RDF_NS + "first")
        if not cells:
            return RDF_NS + "nil", "uri"
        for i, cell in enumerate(cells):
            if i + 1 < len(cells):
                self.d.emit(cell, RDF_NS + "rest", cells[i + 1],
                            "bnode", "bnode")
            else:
                self.d.emit(cell, RDF_NS + "rest", RDF_NS + "nil",
                            "bnode", "uri")
        return cells[0], "bnode"


def parse_turtle_text(src_id: str, text: str) -> List[tuple]:
    """Parse one Turtle document into 7-tuple rows (driver-callable for
    tests; the Spark surface is parse_turtle_full)."""
    doc = _TurtleDoc(src_id)
    _TurtleParser(doc, _tokenize(text)).parse()
    return [r[:8] for r in doc.rows]


def parse_trig_text(src_id: str, text: str) -> List[tuple]:
    """Parse one TriG document (Turtle + named-graph blocks) into
    8-tuple+graph rows; graph is None for default-graph statements."""
    doc = _TurtleDoc(src_id)
    _TurtleParser(doc, _tokenize(text), trig=True).parse()
    return doc.rows


def parse_nquads_text(src_id: str, text: str) -> List[tuple]:
    """Parse one N-Quads document: subject predicate object [graph] '.'
    per statement; the optional graph term lands in the 9th column
    (None = default graph). Reuses the Turtle term machinery, so
    literals with escapes/lang/datatype and bnode labels behave
    identically."""
    doc = _TurtleDoc(src_id)
    p = _TurtleParser(doc, _tokenize(text))
    while p.peek() is not None:
        subj, st = p.subject()
        pred = p.predicate()
        before = len(doc.rows)
        p.object_(subj, st, pred)
        nk = p.peek()
        g = None
        if nk and nk[0] in ("IRIREF", "PNAME", "BNODE"):
            k, v = p.next()
            if k == "IRIREF":
                g = doc.resolve(v[1:-1])
            elif k == "PNAME":
                g = doc.expand(v)
            else:
                g = doc.label_bnode(v)
        p.expect_punct(".")
        if g is not None:
            doc.rows[before] = doc.rows[before][:8] + (g,)
    return doc.rows


# --------------------------------------------------------------------------
# RDF/XML walker (general grammar, doc-at-a-time)
# --------------------------------------------------------------------------

_RDF_SYNTAX_ATTRS = {"about", "ID", "nodeID", "resource", "parseType",
                     "datatype", "RDF", "Description", "li"}


class _RdfXmlDoc:
    def __init__(self, src_id: str, base: str):
        self.src = src_id
        self.base = base
        self.n_anon = 0
        self.rows: List[tuple] = []

    def anon(self) -> str:
        b = f"_:{self.src}.g{self.n_anon}"
        self.n_anon += 1
        return b

    def nodeid(self, label: str) -> str:
        return f"_:{self.src}.{label}"

    def emit(self, s, p, o, st, ot, dt=None, lang=None):
        self.rows.append((self.src, s, p, o, st, ot, dt, lang))


def _split_qname(tag: str) -> str:
    """etree tags arrive as '{ns}local' -> full concatenated IRI."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    return tag


_XML_NS = "http://www.w3.org/XML/1998/namespace"


def _walk_node(doc: _RdfXmlDoc, el, lang: Optional[str]) -> Tuple[str, str]:
    """Process a node element (rdf:Description or typed node); returns
    (subject, subject_type)."""
    rdf = "{%s}" % RDF_NS
    # BCP 47 tags are case-insensitive; lowercase here so the 7-tuple
    # identity of a triple is FORMAT-INDEPENDENT (the Turtle parser
    # already canonicalizes — the round-5 grammar fuzz caught the
    # divergence: "x"@en-GB parsed from RDF/XML did not dedup against
    # the same statement parsed from Turtle)
    _l = el.attrib.get("{%s}lang" % _XML_NS)
    lang = _l.lower() if _l is not None else lang
    about = el.attrib.get(rdf + "about")
    rid = el.attrib.get(rdf + "ID")
    nid = el.attrib.get(rdf + "nodeID")
    if about is not None:
        subj, st = _resolve_xml(doc, about), "uri"
    elif rid is not None:
        subj, st = doc.base + "#" + rid, "uri"
    elif nid is not None:
        subj, st = doc.nodeid(nid), "bnode"
    else:
        subj, st = doc.anon(), "bnode"
    tag = _split_qname(el.tag)
    if tag != RDF_NS + "Description":
        doc.emit(subj, RDF_NS + "type", tag, st, "uri")
    # property attributes (non-syntax, non-xml attrs are literal props)
    for k, v in el.attrib.items():
        iri = _split_qname(k)
        if iri.startswith(RDF_NS) and iri[len(RDF_NS):] in _RDF_SYNTAX_ATTRS:
            continue
        if k.startswith("{%s}" % _XML_NS) or not k.startswith("{"):
            continue
        doc.emit(subj, iri, v, st, "literal", lang=lang)
    li_count = 0
    for prop in el:
        li_count = _walk_property(doc, subj, st, prop, lang, li_count)
    return subj, st


def _resolve_xml(doc: _RdfXmlDoc, ref: str) -> str:
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref):
        return ref
    return doc.base + ref


def _walk_property(doc: _RdfXmlDoc, subj: str, st: str, prop, lang,
                   li_count: int) -> int:
    rdf = "{%s}" % RDF_NS
    pred = _split_qname(prop.tag)
    if pred == RDF_NS + "li":
        li_count += 1
        pred = f"{RDF_NS}_{li_count}"
    _pl = prop.attrib.get("{%s}lang" % _XML_NS)
    lang = _pl.lower() if _pl is not None else lang
    parse_type = prop.attrib.get(rdf + "parseType")
    resource = prop.attrib.get(rdf + "resource")
    nodeid = prop.attrib.get(rdf + "nodeID")
    datatype = prop.attrib.get(rdf + "datatype")
    children = list(prop)
    if parse_type == "Resource":
        b = doc.anon()
        doc.emit(subj, pred, b, st, "bnode")
        inner_li = 0
        for child in children:
            inner_li = _walk_property(doc, b, "bnode", child, lang,
                                      inner_li)
    elif parse_type == "Collection":
        cells = [doc.anon() for _ in children]
        if cells:
            doc.emit(subj, pred, cells[0], st, "bnode")
            for i, child in enumerate(children):
                o, ot = _walk_node(doc, child, lang)
                doc.emit(cells[i], RDF_NS + "first", o, "bnode", ot)
                if i + 1 < len(cells):
                    doc.emit(cells[i], RDF_NS + "rest", cells[i + 1],
                             "bnode", "bnode")
                else:
                    doc.emit(cells[i], RDF_NS + "rest", RDF_NS + "nil",
                             "bnode", "uri")
        else:
            doc.emit(subj, pred, RDF_NS + "nil", st, "uri")
    elif parse_type == "Literal":
        import xml.etree.ElementTree as ET
        xml_lit = (prop.text or "") + "".join(
            ET.tostring(c, encoding="unicode") for c in children)
        doc.emit(subj, pred, xml_lit, st, "literal",
                 dt=RDF_NS + "XMLLiteral")
    elif resource is not None:
        doc.emit(subj, pred, _resolve_xml(doc, resource), st, "uri")
    elif nodeid is not None:
        doc.emit(subj, pred, doc.nodeid(nodeid), st, "bnode")
    elif children:
        o, ot = _walk_node(doc, children[0], lang)
        doc.emit(subj, pred, o, st, ot)
    else:
        doc.emit(subj, pred, prop.text or "", st, "literal",
                 dt=datatype, lang=None if datatype else lang)
    return li_count


def parse_rdfxml_text(src_id: str, text: str,
                      base: str = "urn:graft") -> List[tuple]:
    """Parse one RDF/XML document into 7-tuple rows (driver-callable
    for tests; the Spark surface is parse_rdfxml_full)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(text)
    doc = _RdfXmlDoc(src_id, base)
    xml_base = root.attrib.get("{%s}base" % _XML_NS)
    if xml_base:
        doc.base = xml_base
    if _split_qname(root.tag) == RDF_NS + "RDF":
        for el in root:
            _walk_node(doc, el, None)
    else:
        _walk_node(doc, root, None)
    return doc.rows


# --------------------------------------------------------------------------
# Spark surfaces: one mapInPandas Arrow stage each
# --------------------------------------------------------------------------

_T7_COLS = ["src_id", "subject", "predicate", "object",
            "subject_type", "object_type",
            "object_datatype", "object_language"]


def _make_batcher(parse_fn, cols: Optional[List[str]] = None):
    cols = cols or _T7_COLS

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for src_id, payload in zip(pdf["src_id"], pdf["payload"]):
                try:
                    rows.extend(parse_fn(src_id, payload))
                except Exception as e:  # quarantine, don't abort
                    q = (src_id, "", "parse_error",
                         f"{type(e).__name__}: {e}", "error", "error",
                         None, None)
                    rows.append(q + (None,) * (len(cols) - len(q)))
            yield pd.DataFrame(rows, columns=cols)
    return _batches


def parse_turtle_full(docs: DataFrame) -> DataFrame:
    """(src_id, payload) -> 7-tuple triples via the full Turtle
    grammar. One Arrow stage; each batch amortizes the tokenizer over
    many documents. Reference: OWLParser.parse Turtle leg
    (parsers/__init__.py:2990 _parse_with_rdflib)."""
    return docs.select("src_id", "payload").mapInPandas(
        _make_batcher(parse_turtle_text), schema=TRIPLE7_SCHEMA)


def parse_rdfxml_full(docs: DataFrame) -> DataFrame:
    """(src_id, payload) -> 7-tuple triples via the general RDF/XML
    grammar (typed nodes, parseType, rdf:li, nested nodes, xml:lang).
    Reference: OWLParser.parse RDF/XML leg (parsers/__init__.py:2990)."""
    return docs.select("src_id", "payload").mapInPandas(
        _make_batcher(parse_rdfxml_text), schema=TRIPLE7_SCHEMA)


QUAD_SCHEMA = TRIPLE7_SCHEMA + ", graph string"
_Q_COLS = _T7_COLS + ["graph"]


def parse_trig_full(docs: DataFrame) -> DataFrame:
    """(src_id, payload) -> quads via TriG (the full Turtle grammar
    plus named-graph blocks: `<g> { ... }`, `GRAPH <g> { ... }`,
    wrapped and bare default-graph statements). graph is NULL for
    default-graph statements — the provenance column a quad store
    partitions on."""
    return docs.select("src_id", "payload").mapInPandas(
        _make_batcher(parse_trig_text, _Q_COLS), schema=QUAD_SCHEMA)


def parse_nquads(docs: DataFrame) -> DataFrame:
    """(src_id, payload) -> quads via N-Quads lines (the bulk
    interchange format of quad stores)."""
    return docs.select("src_id", "payload").mapInPandas(
        _make_batcher(parse_nquads_text, _Q_COLS), schema=QUAD_SCHEMA)


def to_nquads(quads: DataFrame) -> DataFrame:
    """Quads -> (src_id, line): canonical N-Quads statements (full
    IRIs, escaped literals, doc-scoped bnode labels, graph term only
    for named graphs). Pure column expressions; pairs with
    reassemble_docs + parse_nquads for the lossless round-trip."""
    def term(c, t):
        return (F.when(t == "uri", F.concat(F.lit("<"), c, F.lit(">")))
                .otherwise(_ttl_bnode(c)))
    lit_sfx = (F.when(F.col("object_language").isNotNull(),
                      F.concat(F.lit("@"), F.col("object_language")))
               .when(F.col("object_datatype").isNotNull(),
                     F.concat(F.lit("^^<"), F.col("object_datatype"),
                              F.lit(">")))
               .otherwise(F.lit("")))
    obj = (F.when(F.col("object_type") == "literal",
                  F.concat(F.lit('"'), _ttl_escape(F.col("object")),
                           F.lit('"'), lit_sfx))
           .otherwise(term(F.col("object"), F.col("object_type"))))
    gterm = (F.when(F.col("graph").isNull(), F.lit(""))
             .when(F.col("graph").startswith("_:"),
                   F.concat(F.lit(" "), _ttl_bnode(F.col("graph"))))
             .otherwise(F.concat(F.lit(" <"), F.col("graph"),
                                 F.lit(">"))))
    line = F.concat(
        term(F.col("subject"), F.col("subject_type")), F.lit(" <"),
        F.col("predicate"), F.lit("> "), obj, gterm, F.lit(" ."))
    return (quads.filter(F.col("predicate") != "parse_error")
            .select("src_id", line.alias("line")))


def reassemble_docs(lines: DataFrame) -> DataFrame:
    """(src_id, line) -> (src_id, payload) with no preamble (N-Quads
    needs none); statement order is irrelevant (labeled bnodes only,
    as in reassemble_turtle_docs)."""
    return (lines.groupBy("src_id")
            .agg(F.concat_ws("\n", F.collect_list("line"))
                 .alias("payload")))


# --------------------------------------------------------------------------
# Corpus synthesis: terms dimension -> full-grammar documents
# --------------------------------------------------------------------------

_TTL_PREFIXES = (
    "@prefix ont: <urn:graft#> .\n"
    f"@prefix rdf: <{RDF_NS}> .\n"
    f"@prefix rdfs: <{RDFS_NS}> .\n"
    f"@prefix owl: <{OWL_NS}> .\n"
    "@prefix obo: <urn:obo#> .\n"
    f"@prefix xsd: <{XSD_NS}> .\n\n")


def _frag(col: str) -> F.Column:
    return F.regexp_replace(col, ":", "_")


def turtle_full_docs(terms: DataFrame) -> DataFrame:
    """Serialize each term as one full-grammar Turtle document
    (src_id, payload): prefix directives, 'a', ';'/',' lists, @lang,
    triple-quoted multi-line literal, numeric + boolean shorthand,
    escaped quotes, bnode property list, two collections (one possibly
    empty), and a labeled-bnode statement — the input synthesis for
    parse_turtle_full (the corpus carries no raw ontology payloads;
    serde.rdfxml_docs is the same pattern). Every construct is
    deterministic from the term row, so the DuckDB oracle reconstructs
    the expected triples relationally."""
    parent = F.try_element_at("parents", F.lit(1))
    xref1 = F.try_element_at("xrefs", F.lit(1))
    alt1 = F.try_element_at("alt_ids", F.lit(1))
    def2 = F.regexp_replace(
        "definition", r"^synthetic ([a-z]+) term ", "synthetic $1\nterm ")
    syn_list = F.array_join(
        F.transform("synonyms",
                    lambda s: F.concat(F.lit('"'), s, F.lit('"'))),
        " , ")
    payload = F.concat(
        F.lit(_TTL_PREFIXES),
        F.lit("# term "), F.col("id"), F.lit("\n"),
        F.lit("ont:"), _frag("id"), F.lit(" a owl:Class ;\n"),
        F.lit('    rdfs:label "'), F.col("name"), F.lit('"@en ;\n'),
        F.lit('    obo:definition """'), def2, F.lit('""" ;\n'),
        F.lit("    obo:idnum "), F.regexp_extract("id", r"(\d+)$", 1),
        F.lit(" ;\n"),
        F.lit("    obo:obsolete "),
        F.when(F.col("is_obsolete"), "true").otherwise("false"),
        F.lit(" ;\n"),
        F.lit('    obo:note "quote \\" ok" ;\n'),
        F.when(F.size("synonyms") > 0,
               F.concat(F.lit("    obo:synonym "), syn_list,
                        F.lit(" ;\n"))).otherwise(""),
        F.when(parent.isNotNull(),
               F.concat(F.lit("    rdfs:subClassOf ont:"),
                        _frag(parent), F.lit(" ;\n"))).otherwise(""),
        F.when(xref1.isNotNull(),
               F.concat(F.lit('    obo:xref [ obo:src "'), xref1,
                        F.lit('" ] ;\n'))).otherwise(""),
        F.lit('    obo:keys ( "'), F.col("id"), F.lit('" "'),
        F.col("namespace"), F.lit('" ) ;\n'),
        F.lit("    obo:alts ( "),
        F.when(alt1.isNotNull(),
               F.concat(F.lit('"'), alt1, F.lit('" '))).otherwise(""),
        F.lit(") .\n"),
        F.lit("_:meta obo:for ont:"), _frag("id"), F.lit(" .\n"))
    return terms.select(F.col("id").alias("src_id"),
                        payload.alias("payload"))


def trig_docs(terms: DataFrame) -> DataFrame:
    """Serialize each term as one TriG document (src_id, payload):
    a labeled graph block, a bare default-graph statement, and a
    GRAPH-keyword block with a BNODE graph label — the three
    named-graph forms the TriG grammar adds over Turtle."""
    payload = F.concat(
        F.lit(_TTL_PREFIXES),
        F.lit("ont:g_"), F.col("ontology_id"), F.lit(" {\n"),
        F.lit("    ont:"), _frag("id"), F.lit(" a owl:Class ;\n"),
        F.lit('        rdfs:label "'), F.col("name"),
        F.lit('"@en .\n}\n'),
        F.lit("ont:"), _frag("id"), F.lit(' obo:src "'), F.col("name"),
        F.lit('" .\n'),
        F.lit("GRAPH _:meta {\n    ont:"), _frag("id"),
        F.lit(' obo:note "peer of '), F.col("id"), F.lit('" .\n}\n'))
    return terms.select(F.col("id").alias("src_id"),
                        payload.alias("payload"))


def rdfxml_full_docs(terms: DataFrame) -> DataFrame:
    """Serialize each term as one general-grammar RDF/XML document
    (src_id, payload): typed node element with a property attribute,
    xml:lang, rdf:datatype, rdf:resource, parseType Resource +
    Collection, a nested rdf:Seq with rdf:li, and an rdf:nodeID pair —
    the input synthesis for parse_rdfxml_full. Term names are
    [a-z0-9 -] by construction (ontology_data), so no XML escaping is
    required — the same cheap assertion rdfxml_docs makes."""
    parent = F.try_element_at("parents", F.lit(1))
    xref1 = F.try_element_at("xrefs", F.lit(1))
    payload = F.concat(
        F.lit('<?xml version="1.0"?>\n'
              f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:rdfs="{RDFS_NS}" '
              f'xmlns:owl="{OWL_NS}" xmlns:obo="urn:obo#" '
              'xml:base="urn:graft">\n'
              '<owl:Class rdf:about="#'), _frag("id"),
        F.lit('" obo:ns="'), F.col("namespace"), F.lit('">\n'),
        F.lit('<rdfs:label xml:lang="en">'), F.col("name"),
        F.lit("</rdfs:label>\n"),
        F.lit(f'<obo:idnum rdf:datatype="{XSD_NS}integer">'),
        F.regexp_extract("id", r"(\d+)$", 1), F.lit("</obo:idnum>\n"),
        F.when(parent.isNotNull(),
               F.concat(F.lit('<rdfs:subClassOf rdf:resource="#'),
                        _frag(parent), F.lit('"/>\n'))).otherwise(""),
        F.when(xref1.isNotNull(),
               F.concat(F.lit('<obo:xref rdf:parseType="Resource">'
                              "<obo:src>"), xref1,
                        F.lit("</obo:src></obo:xref>\n"))).otherwise(""),
        F.lit('<obo:keys rdf:parseType="Collection">'
              '<rdf:Description rdf:about="#k_'), _frag("id"),
        F.lit('"/></obo:keys>\n'),
        F.lit("<obo:rels><rdf:Seq><rdf:li>"), F.col("id"),
        F.lit("</rdf:li><rdf:li>"), F.col("namespace"),
        F.lit("</rdf:li></rdf:Seq></obo:rels>\n"),
        F.lit('<obo:peer rdf:nodeID="meta"/>\n'
              "</owl:Class>\n"
              '<rdf:Description rdf:nodeID="meta"><obo:note>peer of '),
        F.col("id"),
        F.lit("</obo:note></rdf:Description>\n</rdf:RDF>\n"))
    return terms.select(F.col("id").alias("src_id"),
                        payload.alias("payload"))


# --------------------------------------------------------------------------
# full-Turtle sink: 7-tuples -> prefix-compacted statements
# --------------------------------------------------------------------------

# namespace -> prefix table the sink compacts against (the serializer
# side of _TTL_PREFIXES)
TTL_PREFIX_TABLE = (
    (RDF_NS, "rdf"), (RDFS_NS, "rdfs"), (OWL_NS, "owl"),
    (XSD_NS, "xsd"), ("urn:graft#", "ont"), ("urn:obo#", "obo"),
)

_PN_SAFE = r"^[A-Za-z][A-Za-z0-9_-]*$"


def _ttl_escape(col: F.Column) -> F.Column:
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _ttl_iri(col: F.Column) -> F.Column:
    """Compact an IRI to a prefixed name when its namespace is in the
    table AND the local part is PN-safe; full <IRI> otherwise."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for ns, pfx in TTL_PREFIX_TABLE:
        local = F.substring(col, len(ns) + 1, 10_000)
        out = F.when(col.startswith(ns) & local.rlike(_PN_SAFE),
                     F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    return out


def _ttl_bnode(col: F.Column) -> F.Column:
    """Strip the per-document skolem prefix ('_:<src>.g0' -> '_:g0'):
    the doc-scoped label round-trips back to the same skolemized form
    when the document is reparsed under the same src_id."""
    return F.concat(F.lit("_:"), F.substring_index(col, ".", -1))


def to_turtle_full(triples: DataFrame) -> DataFrame:
    """7-tuple triples -> (src_id, line): one full-Turtle statement per
    triple with prefix compaction, literal escaping, @lang / ^^dt
    suffixes and doc-scoped bnode labels — the write side of
    parse_turtle_full (reference sink analog: RDFTriple.to_turtle
    models.py:4547). Pure column expressions (codegen'd concat/when
    chains), no Python; pairs with `reassemble_turtle_docs` for a
    parse -> serialize -> reparse identity round-trip."""
    term = lambda c, t: (F.when(t == "uri", _ttl_iri(c))
                         .otherwise(_ttl_bnode(c)))
    lit_sfx = (F.when(F.col("object_language").isNotNull(),
                      F.concat(F.lit("@"), F.col("object_language")))
               .when(F.col("object_datatype").isNotNull(),
                     F.concat(F.lit("^^"),
                              _ttl_iri(F.col("object_datatype"))))
               .otherwise(F.lit("")))
    obj = (F.when(F.col("object_type") == "literal",
                  F.concat(F.lit('"'), _ttl_escape(F.col("object")),
                           F.lit('"'), lit_sfx))
           .otherwise(term(F.col("object"), F.col("object_type"))))
    line = F.concat(
        term(F.col("subject"), F.col("subject_type")), F.lit(" "),
        _ttl_iri(F.col("predicate")), F.lit(" "), obj, F.lit(" ."))
    return (triples.filter(F.col("predicate") != "parse_error")
            .select("src_id", line.alias("line")))


def reassemble_turtle_docs(lines: DataFrame) -> DataFrame:
    """(src_id, line) -> (src_id, payload): group a document's
    statements back under one prefix preamble. Statement order within
    a document is semantically irrelevant (every bnode is LABELED in
    the serialization — the parser allocates anonymous ids only for
    [] / collections, which the sink never emits), so the collect_list
    order needs no sort."""
    preamble = "".join(f"@prefix {p}: <{ns}> .\n"
                       for ns, p in TTL_PREFIX_TABLE)
    return (lines.groupBy("src_id")
            .agg(F.concat(F.lit(preamble),
                          F.concat_ws("\n", F.collect_list("line")))
                 .alias("payload")))


# --------------------------------------------------------------------------
# validate_owl analog: per-document validation report
# --------------------------------------------------------------------------

def owl_validation_report(parsed: DataFrame) -> DataFrame:
    """Per-document validation report — the reference's `validate_owl`
    surface (parsers/__init__.py:3403: is_valid + errors + statistics
    {triple_count, namespace_count} + completeness warnings). Where
    the reference returns placeholder True for its consistency/
    namespace checks (:3525-3545), this computes the REAL structural
    facts the parse exposes: parse success (quarantine-row absence),
    triple and distinct-namespace counts, and completeness warnings
    (no rdf:type / no rdfs:label — the warnings the reference's
    validators flag). DL satisfiability is out of scope by the same
    contract as the reference's own placeholder; the deeper structural
    checks (disjointness, cycles, SHACL shapes, entailment) live as
    first-class queries in ontology_algebra/graphops.

    One explode + one groupBy(src_id): the aggregate is doc-bounded
    and map-side combinable except the distinct-namespace count."""
    err = (F.col("predicate") == "parse_error").cast("int")

    def ns(col: str) -> F.Column:
        return F.regexp_extract(col, r"^(.*[#/])", 1)

    nss = F.array(
        F.when(F.col("subject_type") == "uri", ns("subject")),
        F.when(F.col("predicate") != "parse_error", ns("predicate")),
        F.when(F.col("object_type") == "uri", ns("object")))
    rows = parsed.select(
        "src_id", err.alias("err"),
        F.col("predicate").alias("p"),
        F.explode_outer(F.array_distinct(F.filter(
            nss, lambda x: x.isNotNull() & (x != "")))).alias("ns"))
    agg = (rows.groupBy("src_id")
           .agg(F.countDistinct(F.when(F.col("err") == 0, F.col("ns")))
                .alias("n_namespaces"),
                F.max((F.col("p") == RDF_NS + "type").cast("int"))
                .alias("_ht"),
                F.max((F.col("p") == RDFS_NS + "label").cast("int"))
                .alias("_hl")))
    # triple/error counts need row (not exploded) granularity
    counts = (parsed.groupBy("src_id")
              .agg(F.sum(F.lit(1) - err).cast("bigint").alias("n_triples"),
                   F.sum(err).cast("bigint").alias("n_errors")))
    return (counts.join(agg, "src_id")
            .select(
                "src_id", F.lit("turtle").alias("format"),
                ((F.col("n_errors") == 0) & (F.col("n_triples") > 0))
                .alias("is_valid"),
                "n_triples", "n_errors",
                F.col("n_namespaces").cast("int").alias("n_namespaces"),
                (F.col("_ht") == 1).alias("has_type"),
                (F.col("_hl") == 1).alias("has_label"),
                ((F.lit(1) - F.col("_ht")) + (F.lit(1) - F.col("_hl")))
                .cast("int").alias("n_warnings")))


# --------------------------------------------------------------------------
# Model conversion: raw 7-tuples -> the reference's Relationship view
# --------------------------------------------------------------------------

def to_model_relationships(triples: DataFrame) -> DataFrame:
    """rdfs:subClassOf triples -> (subject, 'is_a', object) with URIs
    stripped to their #fragment — the reference's model conversion
    (extract_relationships parsers/__init__.py:3686-3746: fragment
    split on '#', predicate rewritten to 'is_a', confidence 1.0).
    Pure column ops, no Python."""
    frag = (lambda c: F.when(F.col(c).contains("#"),
                             F.substring_index(F.col(c), "#", -1))
            .otherwise(F.col(c)))
    return (triples
            .filter(F.col("predicate") == RDFS_NS + "subClassOf")
            .select(frag("subject").alias("subject"),
                    F.lit("is_a").alias("predicate"),
                    frag("object").alias("object"),
                    F.lit(1.0).alias("confidence")))
