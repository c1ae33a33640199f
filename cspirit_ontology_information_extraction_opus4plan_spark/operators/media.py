"""Figure/table candidate dedup-and-merge, caption cleanup with roman
numerals, and scientific-notation extraction (SURVEY §2.5 / §2.7).

Reference semantics:
  * _merge_and_deduplicate_figures (pdf_parser.py:1632) groups
    candidates by number; _merge_figure_data (:1661) keeps the
    best-by-confidence row, takes the LONGEST caption, and AVERAGES the
    confidences (tables: :2209/:2238 — same shape);
  * _calculate_figure_confidence (pdf_parser.py:1602): base 0.7,
    +0.1 if len(caption)>50 elif -0.2 if len<10, +0.1 if the number is
    all digits elif +0.05 if digits+letter, +0.05 once if any quality
    indicator appears, clamped to [0.1, 1.0];
  * _clean_caption (pdf_parser.py:1569): collapse whitespace, strip
    leading/trailing [:\\-.s]+ runs;
  * _roman_to_int (pdf_parser.py:1586): right-to-left accumulation with
    subtractive prefixes — implemented here as a general column
    expression (zip the char-value array with its own shift), not a
    bounded lookup table;
  * scientific-notation / numeric extraction (content_utils.py:59/79).

Every operator here is pure over its inputs; the demo corpora that
exercise them (planted conflicting candidates, roman-numeral labels,
measurement clauses) live in decorations.py and are composed only by
api.py's oracle-gated queries. Everything is column expressions —
groupBy max_by/avg for the merge, no windows over the corpus, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# quality indicators, pdf_parser.py:1616-1620 (bonus applied ONCE)
QUALITY_INDICATORS = [
    "shows", "illustrates", "depicts", "represents", "displays",
    "comparison", "distribution", "relationship", "analysis",
]

NUMBER_PATTERN = r"^(?:figure|table) (\d+[a-z]?)"

ROMAN_VALUES = [("i", 1), ("v", 5), ("x", 10), ("l", 50),
                ("c", 100), ("d", 500), ("m", 1000)]


def clean_caption(c: Column) -> Column:
    """_clean_caption pdf_parser.py:1569: whitespace collapse + strip
    leading/trailing punctuation runs."""
    c = F.regexp_replace(F.trim(c), r"\s+", " ")
    c = F.regexp_replace(c, r"^[:\-.\s]+", "")
    c = F.regexp_replace(c, r"[:\-.\s]+$", "")
    return F.trim(c)


def figure_confidence(caption: Column, number: Column) -> Column:
    """_calculate_figure_confidence pdf_parser.py:1602 as one column
    expression (same branch order: length elif, number elif, single
    indicator bonus)."""
    ln = F.length(caption)
    conf = (F.lit(0.7)
            + F.when(ln > 50, 0.1).when(ln < 10, -0.2).otherwise(0.0)
            + F.when(number.rlike(r"^\d+$"), 0.1)
            .when(number.rlike(r"^\d+[a-z]$"), 0.05).otherwise(0.0))
    any_ind = None
    low = F.lower(caption)
    for ind in QUALITY_INDICATORS:
        hit = low.contains(ind)
        any_ind = hit if any_ind is None else (any_ind | hit)
    conf = conf + F.when(any_ind, 0.05).otherwise(0.0)
    return F.least(F.lit(1.0), F.greatest(F.lit(0.1), conf))


def extract_media_candidates(spans: DataFrame) -> DataFrame:
    """Figure/table spans -> extraction candidates (doc_id, kind,
    number, caption, method). Pure; the demo query plants a second
    conflicting candidate per figure via
    decorations.plant_media_candidates — the dual pattern+library
    extraction whose conflicts _merge_and_deduplicate resolves
    (pdf_parser.py:1327-1683)."""
    return (spans.filter(F.col("kind").isin("figure", "table"))
            .select("doc_id", "kind",
                    F.regexp_extract("text", NUMBER_PATTERN, 1)
                    .alias("number"),
                    clean_caption(F.col("text")).alias("caption"),
                    F.lit("library").alias("method"))
            .filter(F.col("number") != ""))


def media_dedup_merge(candidates: DataFrame) -> DataFrame:
    """Group candidates (doc_id, kind, number, caption, method) by
    (doc_id, kind, number); keep the longest caption (ties ->
    lexicographically greatest, a deterministic refinement of the
    reference's max(key=len)), average the confidences, count
    candidates. One map-side-combinable groupBy — the dedup shape that
    survives 10^12 docs (the reference's per-document dict grouping
    becomes the aggregation key)."""
    cand = candidates.withColumn(
        "confidence", figure_confidence(F.col("caption"), F.col("number")))
    return (cand.groupBy("doc_id", "kind", "number")
            .agg(F.max_by("caption",
                          F.struct(F.length("caption"), F.col("caption")))
                 .alias("caption"),
                 F.round(F.avg("confidence"), 6).alias("confidence"),
                 F.count("*").alias("n_candidates")))


# --- caption cleanup + roman numerals ----------------------------------------


def roman_to_int_col(roman: Column) -> Column:
    """General roman-numeral conversion (_roman_to_int pdf_parser.py:1586)
    as a column expression: map chars to values, then subtract a value
    when the NEXT value is larger (zip the value array with its own
    1-shift) — no bounded lookup table, same algorithm as the reference's
    reversed-scan accumulation."""
    n = F.length(roman)
    vals = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: _roman_char_value(roman.substr(i, F.lit(1))))
    nxt = F.concat(F.slice(vals, 2, 0x7FFFFFF0), F.array(F.lit(0)))
    signed = F.zip_with(vals, nxt,
                        lambda a, b: F.when(a < b, -a).otherwise(a))
    return F.when(n > 0, F.aggregate(signed, F.lit(0), lambda acc, x:
                                     acc + x)).otherwise(F.lit(None))


def _roman_char_value(c: Column) -> Column:
    expr = F.lit(0)
    for ch, v in ROMAN_VALUES:
        expr = F.when(F.lower(c) == ch, v).otherwise(expr)
    return expr


LABEL_PATTERN = r"^(?:figure|table) (\d+|[ivxlcdm]+)\b"


def caption_cleanup(media: DataFrame) -> DataFrame:
    """(doc_id, kind, media_ref, text) -> (doc_id, kind, media_ref,
    number_int, clean_caption): extract the digit-or-roman label,
    convert romans with the general algorithm, clean the caption text
    (_clean_caption + _roman_to_int). Pure; the roman-labeled demo
    corpus comes from decorations.roman_decorated_media."""
    label = F.regexp_extract("text", LABEL_PATTERN, 1)
    num = F.when(label.rlike(r"^\d+$"), label.cast("int")) \
        .otherwise(roman_to_int_col(label))
    return media.select(
        "doc_id", "kind", "media_ref",
        num.cast("int").alias("number_int"),
        clean_caption(F.col("text")).alias("clean_caption"))


# --- scientific-notation / numeric extraction --------------------------------

SCI_PATTERN = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def scientific_notation(texts: DataFrame) -> DataFrame:
    """Numeric + scientific-notation extraction (content_utils.py:59/79):
    regexp_extract_all over (doc_id, pos, text) rows, one output row per
    extracted number with its double value. Pure; the measurement-clause
    demo corpus comes from decorations.sci_decorated_texts."""
    nums = F.regexp_extract_all(F.col("text"), F.lit(SCI_PATTERN), 0)
    return (texts
            .select("doc_id", "pos", F.explode(nums).alias("raw"))
            .select("doc_id", "pos", "raw",
                    F.round(F.col("raw").cast("double"), 6).alias("value")))


def media_context(spans: DataFrame) -> DataFrame:
    """Exploded interleaved spans -> (doc_id, media_ref, kind, caption,
    context_text, context_gap): each figure/table span aligned to the
    nearest PRECEDING text span in document order — the
    caption-to-context link that multimodal training pairs (caption +
    local context -> media blob) are built from, and the interleaved
    counterpart of the reference's figure/caption association
    (parsers/xml_parser.py figure extraction keeps captions with their
    document position).

    One carry-forward window per document (partition = doc_id, order =
    array position): partitions are document-sized, never corpus-wide,
    so the shape survives 10^12 docs. A media span with no preceding
    text (cover art) gets NULL context, honestly."""
    from pyspark.sql import Window

    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    txt = F.when(F.col("kind") == "text",
                 F.struct("text", "offset"))
    return (spans
            .withColumn("_ctx", F.last(txt, ignorenulls=True).over(w))
            .filter(F.col("kind").isin("figure", "table"))
            .select("doc_id", "media_ref", "kind",
                    F.col("text").alias("caption"),
                    F.col("_ctx.text").alias("context_text"),
                    (F.col("offset") - F.col("_ctx.offset"))
                    .alias("context_gap")))


# --- reference-pattern media type classification -----------------------------

# the reference's EXACT pattern tables in their dict-iteration order —
# order matters: "line graph" hits CHART's second pattern (\bgraph\b)
# BEFORE the GRAPH bucket's own patterns (ContentExtractor
# metadata_framework.py:328-344; classify_figure_type :346 /
# classify_table_type :357 are first-match-wins over this order)
FIGURE_TYPE_PATTERNS = [
    ("chart", [r"\b(chart|bar\s+chart|pie\s+chart|histogram)\b",
               r"\bgraph\b"]),
    ("diagram", [r"\b(diagram|schematic|flowchart|flow\s+chart)\b"]),
    ("photo", [r"\b(photo|photograph|image|picture)\b"]),
    ("graph", [r"\b(plot|scatter\s+plot|line\s+graph|xy\s+plot)\b"]),
    ("map", [r"\b(map|geographic|spatial)\b"]),
    ("illustration", [r"\b(illustration|drawing|sketch)\b"]),
]
TABLE_TYPE_PATTERNS = [
    ("statistical",
     [r"\b(mean|median|std|p-value|confidence|statistical)\b"]),
    ("demographic",
     [r"\b(age|gender|demographics|population|baseline)\b"]),
    ("experimental",
     [r"\b(trial|experiment|treatment|control|intervention)\b"]),
    ("comparison",
     [r"\b(comparison|compare|versus|vs\.?|before|after)\b"]),
    ("results", [r"\b(results|outcomes|findings|measurements)\b"]),
]


def classify_media_types_ref(media: DataFrame) -> DataFrame:
    """(doc_id, kind, media_ref, caption) -> + media_type using the
    reference's OWN regex tables and first-match-wins order — the
    rules-exact sibling of textmeta.classify_captions (which uses this
    corpus's keyword vocabulary). Pure rlike CASE chains; the parity
    test runs the genuine ContentExtractor on the same captions."""
    cap = F.lower("caption")

    def chain(table):
        expr = None
        for label, patterns in table:
            hit = None
            for p in patterns:
                h = cap.rlike(p)
                hit = h if hit is None else (hit | h)
            clause = (expr.when(hit, label) if expr is not None
                      else F.when(hit, label))
            expr = clause
        return expr.otherwise("unknown")

    media_type = (F.when(F.col("kind") == "figure",
                         chain(FIGURE_TYPE_PATTERNS))
                  .otherwise(chain(TABLE_TYPE_PATTERNS)))
    return media.select("doc_id", "kind", "media_ref", "caption",
                        media_type.alias("media_type"))
