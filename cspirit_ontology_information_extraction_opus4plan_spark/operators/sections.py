"""Section identification + citation-format detection (SURVEY §2.7).

Reference semantics:
  * the 8 case-insensitive section-header patterns
    (_get_default_section_patterns, parsers/__init__.py:1801-1843):
    a header is a line containing ONLY the section word (+ optional
    colon), matched multiline;
  * section content = text from the header to the next header
    (identify_sections, pdf_parser.py:796-853); confidence =
    0.7 - 0.3 if wc<10 elif +0.1 if wc>100, + 0.05 per section-keyword
    hit, clamped to [0,1] (_calculate_section_confidence,
    pdf_parser.py:859-889);
  * citation-format detection APA/MLA/IEEE with per-format confidence
    and best-format selection (ReferenceParser._parse_with_all_formats,
    parsers/reference_parser.py:480; format handlers
    parsers/citation_formats/{apa,mla,ieee}_handler.py; CitationDetector
    scoring parsers/reference_patterns.py:85-782).

Operators here are PURE over their inputs ((doc_id, full_text) /
(doc_id, citation)); the corpus carries no section headers or
multi-format citations, so api.py's demo queries feed them
decorations.sectioned_docs / decorations.citation_samples (rebuilt
identically by SQL fragments there — single-spec rule, see corpus.py).
Every detection step is pure column expressions: regex line tests,
window lead for the next-header boundary, group aggregates. All
patterns are RE2-compatible so DuckDB runs them verbatim.

Scale notes: line explode + per-doc window + boundary join all key on
doc_id — embarrassingly parallel per document, shuffle bounded by the
line count, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_col

# --- shared constants (mirrored verbatim into the oracle SQL) ---------------

# the reference's 8 patterns, parsers/__init__.py:1801-1843 (alternatives
# verbatim; the line-anchored shell ^\s*(?:...)\s*:?\s*$ is applied with
# (?i) inline so Spark's Java regex and DuckDB's RE2 agree)
SECTION_ALTS = {
    "abstract": r"abstract|summary|overview",
    "introduction": r"introduction|background|overview",
    "methods": r"methods?|methodology|approach|experimental",
    "results": r"results?|findings|outcomes",
    "discussion": r"discussion|analysis|interpretation",
    "conclusion": r"conclusions?|summary|final\s+remarks?",
    "references": r"references?|bibliography|works?\s+cited",
    "acknowledgments": r"acknowledgments?|acknowledgements?|thanks",
}

SECTION_ORDER = list(SECTION_ALTS)

# section keywords for the confidence bonus (pdf_parser.py:872-879)
SECTION_KEYWORDS = {
    "abstract": ["abstract", "summary", "background", "objective"],
    "introduction": ["introduction", "background", "motivation"],
    "methods": ["method", "approach", "technique", "procedure"],
    "results": ["result", "finding", "outcome", "data"],
    "discussion": ["discussion", "analysis", "interpretation"],
    "conclusion": ["conclusion", "summary", "future work"],
}


def section_line_pattern(section: str) -> str:
    return r"(?i)^\s*(?:" + SECTION_ALTS[section] + r")\s*:?\s*$"


# --- the section-identification operator -------------------------------------


def identify_sections(sectioned: DataFrame) -> DataFrame:
    """(doc_id, full_text) -> (doc_id, section, start_line, end_line,
    word_count, confidence). start_line = first content line after the
    header (the reference's match.end()), end_line = next header line
    (exclusive) or the line count; confidence per
    _calculate_section_confidence."""
    # localCheckpoint: three downstream branches (headers, line counts,
    # content join) would each re-derive the synthesis + split + the
    # 8-regex header test otherwise (same rationale as minhash_lsh_pairs)
    lines = sectioned.select(
        F.col("doc_id"),
        F.posexplode(F.split("full_text", "\n")).alias("line_idx", "line")
    ).localCheckpoint(eager=True)

    # every pattern is tested independently — a line matching two
    # patterns yields two header rows, exactly like the reference's
    # per-pattern finditer loop
    matched = F.filter(
        F.array(*[F.when(F.col("line").rlike(section_line_pattern(s)),
                         F.lit(s))
                  for s in SECTION_ORDER]),
        lambda x: x.isNotNull())
    headers = lines.select(
        "doc_id", "line_idx", F.explode(matched).alias("section"))

    # boundary = next DISTINCT header line (any section), else line count
    hdr_lines = headers.select("doc_id", "line_idx").distinct()
    w = Window.partitionBy("doc_id").orderBy("line_idx")
    bounds = hdr_lines.withColumn("next_idx",
                                  F.lead("line_idx").over(w))
    n_lines = lines.groupBy("doc_id").agg(
        (F.max("line_idx") + 1).alias("n_lines"))
    spans = (headers.join(bounds, ["doc_id", "line_idx"])
             .join(n_lines, "doc_id")
             .select("doc_id", "section",
                     (F.col("line_idx") + 1).alias("start_line"),
                     F.coalesce("next_idx", "n_lines").alias("end_line")))

    content = (lines.join(
        spans.select("doc_id", "section", "start_line", "end_line"),
        ["doc_id"])
        .filter((F.col("line_idx") >= F.col("start_line"))
                & (F.col("line_idx") < F.col("end_line")))
        .groupBy("doc_id", "section", "start_line", "end_line")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("line_idx", "line"))),
                lambda s: s["line"]), " ").alias("content")))

    out = spans.join(content,
                     ["doc_id", "section", "start_line", "end_line"],
                     "left")
    wc = F.size(F.filter(F.split(F.coalesce("content", F.lit("")), r"\s+"),
                         lambda t: t != ""))
    hits = _keyword_hits(F.lower(F.coalesce("content", F.lit(""))))
    conf = (F.lit(0.7)
            + F.when(wc < 10, -0.3).when(wc > 100, 0.1).otherwise(0.0)
            + 0.05 * hits)
    return out.select(
        "doc_id", "section", "start_line", "end_line",
        wc.alias("word_count"),
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), conf)), 6)
        .alias("confidence"))


def _keyword_hits(content_lower: Column) -> Column:
    expr = F.lit(0)
    for sec in SECTION_ORDER:
        kws = SECTION_KEYWORDS.get(sec)
        if not kws:
            continue
        sec_hits = sum(
            (F.when(content_lower.contains(kw), 1).otherwise(0)
             for kw in kws[1:]),
            F.when(content_lower.contains(kws[0]), 1).otherwise(0))
        expr = F.when(F.col("section") == sec, sec_hits).otherwise(expr)
    return expr


def sections_oracle_tail() -> str:
    """SQL re-derivation of identify_sections over the synth CTE."""
    hdr_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, line_idx, '{s}' AS section FROM lines "
        f"WHERE regexp_matches(line, '{section_line_pattern(s)}')"
        for s in SECTION_ORDER)
    kw_cases = []
    for sec in SECTION_ORDER:
        kws = SECTION_KEYWORDS.get(sec)
        if not kws:
            continue
        hit = " + ".join(
            f"(CASE WHEN contains(lower(coalesce(content, '')), '{kw}') "
            f"THEN 1 ELSE 0 END)" for kw in kws)
        kw_cases.append(f"WHEN s.section = '{sec}' THEN {hit}")
    hits = "(CASE " + " ".join(kw_cases) + " ELSE 0 END)"
    wc = ("len(list_filter(regexp_split_to_array("
          "coalesce(content, ''), '\\s+'), t -> t <> ''))")
    conf = (f"0.7 + (CASE WHEN {wc} < 10 THEN -0.3 "
            f"WHEN {wc} > 100 THEN 0.1 ELSE 0.0 END) + 0.05 * {hits}")
    return f"""
idx AS (SELECT CAST(t.i AS INT) AS i FROM generate_series(1, 64) t(i)),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS line_idx, parts[i] AS line
  FROM (SELECT doc_id, string_split(full_text, chr(10)) AS parts
        FROM synth) p
  JOIN idx ON i <= len(parts)),
headers AS (
{hdr_selects}),
hdr_lines AS (SELECT DISTINCT doc_id, line_idx FROM headers),
bounds AS (
  SELECT doc_id, line_idx,
         lead(line_idx) OVER (PARTITION BY doc_id ORDER BY line_idx)
           AS next_idx
  FROM hdr_lines),
nl AS (SELECT doc_id, max(line_idx) + 1 AS n_lines FROM lines
       GROUP BY doc_id),
spans AS (
  SELECT h.doc_id, h.section,
         CAST(h.line_idx + 1 AS INT) AS start_line,
         CAST(coalesce(b.next_idx, nl.n_lines) AS INT) AS end_line
  FROM headers h
  JOIN bounds b ON b.doc_id = h.doc_id AND b.line_idx = h.line_idx
  JOIN nl ON nl.doc_id = h.doc_id),
content_agg AS (
  SELECT s.doc_id, s.section, s.start_line, s.end_line,
         string_agg(l.line, ' ' ORDER BY l.line_idx) AS content
  FROM spans s JOIN lines l
    ON l.doc_id = s.doc_id
   AND l.line_idx >= s.start_line AND l.line_idx < s.end_line
  GROUP BY 1, 2, 3, 4)
SELECT s.doc_id, s.section AS section, s.start_line, s.end_line,
       CAST({wc} AS INT) AS word_count,
       round(least(1.0, greatest(0.0, {conf})), 6) AS confidence
FROM spans s LEFT JOIN content_agg c
  ON c.doc_id = s.doc_id AND c.section = s.section
 AND c.start_line = s.start_line AND c.end_line = s.end_line""".strip()


# --- citation-format detection (APA / MLA / IEEE) ----------------------------

# per-format feature regexes (RE2-safe, shared with the oracle);
# confidence = hits / n_features, best format = argmax with alphabetical
# tie-break — the reference's best-format selection
# (reference_parser.py:480 over the citation_formats handlers)
FORMAT_FEATURES = {
    "apa": [
        r"^[a-z ,]+ \(\d{4}\)\.",      # authors (year).
        r"\d+\(\d+\),",                # volume(issue),
        r" \d+-\d+\.$",                # pages.
    ],
    "ieee": [
        r"^\[\d+\]",                   # [n] marker
        r'"[^"]+,"',                   # "title,"
        r"pp\. \d+-\d+",               # pp. pages
        r"\d{4}\.$",                   # trailing year.
    ],
    "mla": [
        r"^[a-z]+, [a-z]+",            # surname, given
        r'"[^"]+\."',                  # "title."
        r"vol\. \d+, no\. \d+",        # vol./no.
        r"pp\. \d+-\d+",               # pp. pages
    ],
}
FORMATS = sorted(FORMAT_FEATURES)


def score_citation_formats(cits: DataFrame) -> DataFrame:
    """(doc_id, citation) -> citation + per-format confidences + argmax
    best format (alphabetical tie-break). Pure rlike feature counting —
    the CitationDetector scoring re-expressed columnar."""
    c = F.col("citation")
    confs = {}
    for fmt in FORMATS:
        feats = FORMAT_FEATURES[fmt]
        hits = sum(
            (F.when(c.rlike(p), 1).otherwise(0) for p in feats[1:]),
            F.when(c.rlike(feats[0]), 1).otherwise(0))
        confs[fmt] = F.round(hits / F.lit(float(len(feats))), 6)
    d = cits.select("doc_id", "citation",
                    *[confs[f].alias(f"conf_{f}") for f in FORMATS])
    best = F.greatest(*[F.col(f"conf_{f}") for f in FORMATS])
    pick = F.when(F.lit(False), "x")
    for f in FORMATS:  # alphabetical order = tie-break
        pick = pick.when(F.col(f"conf_{f}") == best, f)
    return d.select("doc_id", "citation",
                    *[F.col(f"conf_{f}") for f in FORMATS],
                    pick.alias("best_format"),
                    best.alias("best_conf"))


def detect_citation_format(cits: DataFrame) -> DataFrame:
    return score_citation_formats(cits).drop("citation")


# --- per-format fielded extraction (APA / MLA / IEEE handlers) ---------------

# per-format field regexes (RE2-safe, shared with the oracle) — the
# format handlers' parse_citation field extraction
# (citation_formats/{apa,mla,ieee}_handler.py parse_citation; routed by
# best detected format like _parse_with_auto_detection
# reference_parser.py:414)
FIELD_PATTERNS = {
    "apa": {
        # authors (year). title. journal, vol(issue), p0-p1.
        "authors": r"^([a-z ,]+) \(\d{4}\)",
        "year": r"\((\d{4})\)\.",
        "title": r"\(\d{4}\)\. ([^.]+)\.",
        "journal": r"\. ([a-z ]+), \d+\(",
        "volume": r", (\d+)\(",
        "issue": r"\((\d+)\),",
        "page_start": r" (\d+)-\d+\.$",
        "page_end": r" \d+-(\d+)\.$",
    },
    "ieee": {
        # [n] authors, "title," journal, vol. v, no. i, pp. p0-p1, year.
        "authors": r'^\[\d+\] ([^"]+), "',
        "year": r", (\d{4})\.$",
        "title": r'"([^"]+),"',
        "journal": r'," ([a-z ]+), vol\. ',
        "volume": r"vol\. (\d+)",
        "issue": r"no\. (\d+)",
        "page_start": r"pp\. (\d+)-\d+",
        "page_end": r"pp\. \d+-(\d+)",
    },
    "mla": {
        # authors. "title." journal, vol. v, no. i, year, pp. p0-p1.
        "authors": r'^([a-z, ]+)\. "',
        "year": r", (\d{4}), pp\.",
        "title": r'"([^"]+)\."',
        "journal": r'\." ([a-z ]+), vol\.',
        "volume": r"vol\. (\d+)",
        "issue": r"no\. (\d+)",
        "page_start": r"pp\. (\d+)-\d+\.$",
        "page_end": r"pp\. \d+-(\d+)\.$",
    },
}
CITATION_FIELDS = ["authors", "year", "title", "journal",
                   "volume", "issue", "page_start", "page_end"]
INT_FIELDS = {"year", "volume", "issue", "page_start", "page_end"}
CONF_FIELDS = ["authors", "year", "title", "journal"]


def parse_citation_fields(cits: DataFrame) -> DataFrame:
    """Fielded per-format citation parsing: detect the best format
    (score_citation_formats), then extract authors/year/title/journal/
    volume/issue/pages with THAT format's regexes, plus a per-field
    confidence = best-format confidence when the field matched, 0.0
    otherwise (CitationMetadata.set_confidence per extracted field,
    base_handler.py; field patterns per handler). All codegen regex —
    one branch per format per field, no Python."""
    s = score_citation_formats(cits)
    c = F.col("citation")
    fields = {}
    for fld in CITATION_FIELDS:
        expr = F.when(F.lit(False), "x")
        for fmt in FORMATS:
            expr = expr.when(
                F.col("best_format") == fmt,
                F.regexp_extract(c, FIELD_PATTERNS[fmt][fld], 1))
        fields[fld] = expr.otherwise(F.lit(""))
    d = s.select(
        "doc_id", "best_format", "best_conf",
        *[(F.when(fields[f] != "", fields[f]).cast("int")
           if f in INT_FIELDS else fields[f]).alias(f)
          for f in CITATION_FIELDS])
    matched = {"authors": F.col("authors") != "",
               "year": F.col("year").isNotNull(),
               "title": F.col("title") != "",
               "journal": F.col("journal") != ""}
    return d.select(
        "doc_id", "best_format", *CITATION_FIELDS,
        *[F.round(F.when(matched[f], F.col("best_conf"))
                  .otherwise(F.lit(0.0)), 6).alias(f"conf_{f}")
          for f in CONF_FIELDS])


def citation_fields_oracle_tail() -> str:
    """DuckDB twin of parse_citation_fields, generated from the same
    FORMAT_FEATURES/FIELD_PATTERNS constants (expects a `cits` CTE)."""
    conf_exprs = []
    for fmt in FORMATS:
        feats = FORMAT_FEATURES[fmt]
        hits = " + ".join(
            "(CASE WHEN regexp_matches(citation, '{}') THEN 1 ELSE 0 END)"
            .format(p.replace("'", "''")) for p in feats)
        conf_exprs.append(
            f"round(({hits}) / {float(len(feats))}, 6) AS conf_{fmt}")
    best = "greatest(" + ", ".join(f"conf_{f}" for f in FORMATS) + ")"
    pick = " ".join(
        f"WHEN conf_{f} = {best} THEN '{f}'" for f in FORMATS)
    field_exprs = []
    for fld in CITATION_FIELDS:
        cases = " ".join(
            "WHEN best_format = '{}' THEN regexp_extract(citation, '{}', 1)"
            .format(fmt, FIELD_PATTERNS[fmt][fld].replace("'", "''"))
            for fmt in FORMATS)
        e = f"CASE {cases} ELSE '' END"
        if fld in INT_FIELDS:
            e = f"CAST(nullif({e}, '') AS INT)"
        field_exprs.append(f"{e} AS {fld}")
    matched = {"authors": "authors <> ''", "year": "year IS NOT NULL",
               "title": "title <> ''", "journal": "journal <> ''"}
    conf_out = ", ".join(
        f"round(CASE WHEN {matched[f]} THEN best_conf ELSE 0.0 END, 6)"
        f" AS conf_{f}" for f in CONF_FIELDS)
    return f"""
scored AS (
  SELECT doc_id, citation,
         {', '.join(conf_exprs)}
  FROM cits),
picked AS (
  SELECT doc_id, citation,
         CASE {pick} END AS best_format,
         {best} AS best_conf
  FROM scored),
flds AS (
  SELECT doc_id, best_format, best_conf,
         {', '.join(field_exprs)}
  FROM picked)
SELECT doc_id, best_format, {', '.join(CITATION_FIELDS)}, {conf_out}
FROM flds""".strip()


def citation_oracle_tail() -> str:
    conf_exprs = []
    for fmt in FORMATS:
        feats = FORMAT_FEATURES[fmt]
        hits = " + ".join(
            "(CASE WHEN regexp_matches(citation, '{}') THEN 1 ELSE 0 END)"
            .format(p.replace("'", "''")) for p in feats)
        conf_exprs.append(
            f"round(({hits}) / {float(len(feats))}, 6) AS conf_{fmt}")
    best = "greatest(" + ", ".join(f"conf_{f}" for f in FORMATS) + ")"
    pick = " ".join(
        f"WHEN conf_{f} = {best} THEN '{f}'" for f in FORMATS)
    return f"""
scored AS (
  SELECT doc_id, citation,
         {', '.join(conf_exprs)}
  FROM cits)
SELECT doc_id, {', '.join(f'conf_{f}' for f in FORMATS)},
       CASE {pick} END AS best_format,
       {best} AS best_conf
FROM scored""".strip()
