"""Document-metadata text operators over the interleaved-span corpus:
citation-field extraction, figure/table caption classification,
stopword-filtered keyword extraction, domain identification, and
content-format sniffing.

Reference analogs (SURVEY §2.7 / §2.1):
  - citation id/field patterns — parsers/__init__.py:1844
    (_get_default_citation_patterns) and reference_patterns.py:85-782
  - figure/table type classification keyword chains —
    metadata_framework.py:346/:357, pdf_parser.py:1704/:2295
  - keyword extraction (stopword-filtered tokens) —
    metadata_framework.py:370
  - domain keyword identification (>=2 hits) — content_utils.py:67
  - content-format sniffing — parsers/__init__.py:9211,
    OWLParser.detect_format :2655

Every function is pure column expressions (regexp_extract / CASE
chains / array ops) — JVM-side, codegen-friendly — except unicode NFC
normalization, which has no Spark builtin and is the one sanctioned
vectorized pandas UDF here (SURVEY §2.7 maps _normalize_unicode to
exactly that). Patterns are written in the RE2-compatible subset so
the DuckDB oracle runs the same regexes verbatim.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .textops import STOPWORDS_EN

# citation field patterns (shared with the oracle builder)
CIT_PATTERNS = {
    "authors": r"^([a-z ,]+) \(",
    "doi": r"doi:(10\.\d{4}/[a-z]+\.\d+)",
    "year": r"\((\d{4})\)",
    "volume": r", (\d+)\(",
    "issue": r"\((\d)\),",
    "page_start": r" (\d+)-\d+\.",
    "page_end": r" \d+-(\d+)\.",
}

# caption-type keyword chain, first match wins (classify_figure_type /
# classify_table_type keyword chains; most keywords simply never fire on
# the synthetic corpus, mirroring the reference's long chains)
CAPTION_TYPES = [
    ("microscopy", "microscopy"),
    ("western blot", "blot"),
    ("bar chart", "bar_chart"),
    ("flow chart", "flow_chart"),
    ("quantification", "quantification"),
    ("comparison", "comparison"),
    ("distribution", "distribution"),
]

MIN_DOMAIN_HITS = 2  # identify_domain's >=2-keyword rule


def _clean_tokens(text_col) -> F.Column:
    """Lowercase whitespace tokens with sentence punctuation stripped —
    the keyword-extraction tokenization (shared with the oracle)."""
    cleaned = F.regexp_replace(F.lower(F.trim(text_col)), r"[.,()]", "")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != "")


def citation_fields(spans: DataFrame) -> DataFrame:
    """Structured fields from reference-span citation strings."""
    ref = spans.filter(F.col("kind") == "reference")
    return ref.select(
        "doc_id",
        F.regexp_extract("text", CIT_PATTERNS["authors"], 1).alias("authors"),
        F.regexp_extract("text", CIT_PATTERNS["doi"], 1).alias("doi"),
        F.regexp_extract("text", CIT_PATTERNS["year"], 1).cast("int")
        .alias("year"),
        F.regexp_extract("text", CIT_PATTERNS["volume"], 1).cast("int")
        .alias("volume"),
        F.regexp_extract("text", CIT_PATTERNS["issue"], 1).cast("int")
        .alias("issue"),
        F.regexp_extract("text", CIT_PATTERNS["page_start"], 1).cast("int")
        .alias("page_start"),
        F.regexp_extract("text", CIT_PATTERNS["page_end"], 1).cast("int")
        .alias("page_end"))


def classify_captions(spans: DataFrame) -> DataFrame:
    """Figure/table media type by caption keyword, first-match-wins."""
    cap = F.lower("text")
    expr = None
    for kw, label in CAPTION_TYPES:
        clause = F.when(cap.contains(kw), label)
        expr = clause if expr is None else expr.when(cap.contains(kw), label)
    expr = expr.otherwise("other")
    return (spans.filter(F.col("kind").isin("figure", "table"))
            .select("doc_id", "kind", "media_ref",
                    expr.alias("media_type")))


def doc_keywords(spans: DataFrame) -> DataFrame:
    """Global keyword document-frequency: per doc, distinct cleaned
    tokens minus stopwords; then count docs per keyword. One explode +
    one map-side-combinable groupBy."""
    toks = F.array_except(F.array_distinct(_clean_tokens(F.col("text"))),
                          F.array([F.lit(s) for s in STOPWORDS_EN]))
    per_doc = (spans.select("doc_id", F.explode(toks).alias("keyword"))
               .distinct())
    return per_doc.groupBy("keyword").agg(
        F.count("*").alias("n_docs"))


def doc_domains(spans: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Domains with >= MIN_DOMAIN_HITS distinct keyword hits per doc.
    Keyword table = single-word gazetteer surfaces with their namespace,
    broadcast against the exploded token stream."""
    vocab = (gazetteer.filter(~F.col("surface").contains(" "))
             .select(F.col("surface").alias("keyword"), "namespace")
             .distinct())
    toks = (spans.select(
        "doc_id",
        F.explode(F.array_distinct(_clean_tokens(F.col("text"))))
        .alias("keyword")).distinct())
    hits = (toks.join(F.broadcast(vocab), "keyword")
            .groupBy("doc_id", "namespace")
            .agg(F.countDistinct("keyword").alias("n_hits")))
    return hits.filter(F.col("n_hits") >= MIN_DOMAIN_HITS).select(
        "doc_id", F.col("namespace").alias("domain"), "n_hits")


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: unicodedata.normalize("NFC", x)
                 if x is not None else None)


def normalize_texts(docs: DataFrame) -> DataFrame:
    """The reference's text-normalizer chain (SURVEY §2.7:
    _normalize_whitespace :1885, _remove_hyphenation :1907,
    _normalize_unicode :1925, _clean_special_characters :1942) as an
    ordered list of column transforms + one Arrow NFC pass. Pure over
    (doc_id, text); the normalizer-exercising demo suffix is applied by
    decorations.norm_decorated_docs before this operator."""
    x = F.col("text")
    x = F.regexp_replace(x, r"-\n\s*", "")      # de-hyphenate
    x = F.regexp_replace(x, r"[~^|]", "")       # special-char clean
    x = F.regexp_replace(x, r"\s+", " ")        # whitespace collapse
    x = _nfc_udf(F.trim(x))                     # unicode NFC
    return docs.select("doc_id", x.alias("text_norm"),
                       F.length(x).alias("n_chars_norm"))


def cross_references(spans: DataFrame, texts: DataFrame) -> DataFrame:
    """Figure/table cross-references (_find_cross_references
    pdf_parser.py:1260, xml_parser.py:2657): for each media span's label
    ("figure 1" / "table 1" from its caption), count label-variant
    mentions in `texts` (doc_id, text) rows of the same document. The
    label-variant dimension is tiny -> broadcast join against the
    text stream. Pure over its inputs; the demo query passes
    decorations.crossref_decorated_texts since the synthetic text spans
    never reference media."""
    labels = (spans.filter(F.col("kind").isin("figure", "table"))
              .select("doc_id", "kind", "media_ref",
                      F.regexp_extract("text", r"^((figure|table) \d+)", 1)
                      .alias("label"))
              # a caption whose label regex misses yields '' and
              # contains('') is true for EVERY text span — drop it
              .filter(F.col("label") != ""))
    # variants: "figure 1" and "fig. 1" (the reference's label-variant
    # table); contains() over lowered text
    hit = (F.lower("text").contains(F.col("label"))
           | F.lower("text").contains(
               F.regexp_replace("label", "^figure", "fig.")))
    joined = texts.select("doc_id", "text").join(F.broadcast(labels),
                                                 "doc_id")
    return (joined.groupBy("doc_id", "kind", "media_ref", "label")
            .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("n_mentions"))
            .filter(F.col("n_mentions") > 0))


def detect_formats(contents: DataFrame) -> DataFrame:
    """Content-sniffing chain over (doc_id, content): '{' + '@context'
    -> json-ld; XML decl -> owl if owl: present else rdf-xml;
    '@prefix' -> turtle; N-Triples line shape -> ntriples; else
    unknown. Pure; the demo query feeds decorations.format_samples."""
    content = F.col("content")
    fmt = (F.when(content.startswith("{") & content.contains("@context"),
                  "json-ld")
           .when(content.startswith("<?xml") & content.contains("owl:"),
                 "owl")
           .when(content.startswith("<?xml"), "rdf-xml")
           .when(content.startswith("@prefix"), "turtle")
           .when(content.rlike(r"^<[^>]+> <[^>]+> "), "ntriples")
           .otherwise("unknown"))
    return contents.select("doc_id", fmt.alias("fmt"))


# --- abbreviation-definition extraction (Schwartz-Hearst) --------------------

# "long form (SHORT)" definition site; long candidate = up to 6
# preceding lowercase words (the S-H window)
ABBREV_PAT = r"(?:[a-z]+ ){1,6}\([A-Z]{2,8}\)"


def abbreviation_pairs(docs: DataFrame) -> DataFrame:
    """Schwartz-Hearst-style abbreviation-definition extraction — the
    biomedical-text primitive (Schwartz & Hearst 2003) the reference's
    domain lives on: find 'long form (SHORT)' definition sites, take
    the |SHORT| words preceding the parenthesis as the long-form
    candidate, and accept the pair iff the candidate's word-initial
    acronym equals SHORT (the deterministic first-letters variant of
    the S-H in-order character match). Emits the corpus abbreviation
    dictionary: (abbr, long_form, n_docs) — the input a gazetteer
    EXPANSION pass consumes (each accepted pair is a new synonym
    surface for linking).

    Scale shape: one regexp_extract_all + explode per doc (match count
    bounded by text length), per-match validation is pure array/string
    codegen (split, slice, transform, upper — no Python), and the
    dictionary rollup is a map-side-combinable groupBy on the
    (abbr, long_form) key. No joins, no windows."""
    m = (docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(ABBREV_PAT),
                                       F.lit(0))).alias("site")))
    abbr = F.regexp_extract("site", r"\(([A-Z]+)\)", 1)
    words = F.split(F.trim(F.split("site", r" \(").getItem(0)), " ")
    k = F.length(abbr)
    lastk = F.slice(words, F.size(words) - k + 1, k)
    acro = F.upper(F.concat_ws(
        "", F.transform(lastk, lambda w: F.substring(w, 1, 1))))
    return (m.select("doc_id", abbr.alias("abbr"),
                     F.array_join(lastk, " ").alias("long_form"),
                     acro.alias("acro"), k.alias("k"),
                     F.size(words).alias("nw"))
            .filter((F.col("nw") >= F.col("k"))
                    & (F.col("acro") == F.col("abbr")))
            .groupBy("abbr", "long_form")
            .agg(F.countDistinct("doc_id").cast("bigint")
                 .alias("n_docs")))


KWIC_WIDTH = 30


def mention_kwic(spans: DataFrame, mentions: DataFrame,
                 width: int = KWIC_WIDTH) -> DataFrame:
    """Keyword-in-context concordance — the curation view an ontology
    annotator reads before accepting a new surface form: for each
    (doc, surface) pair, the first occurrence (earliest span, earliest
    offset) with `width` characters of left and right context from the
    lowercased span text. Emits (doc_id, surface, left_ctx, right_ctx,
    span_pos, char_pos).

    First-occurrence selection is a min-groupBy (no window); the
    context cut is 1-based substring arithmetic identical in both
    engines; the span join is equi on (doc_id, pos)."""
    firsts = (mentions.select("doc_id", "pos", "surface").distinct()
              .groupBy("doc_id", "surface")
              .agg(F.min("pos").alias("pos")))
    j = firsts.join(spans.select("doc_id", "pos", "text"),
                    ["doc_id", "pos"])
    low = F.lower(F.col("text"))
    p = F.instr(low, F.col("surface"))
    left_start = F.greatest(F.lit(1), p - width)
    right_start = p + F.length("surface")
    return (j.filter(p > 0)
            .select("doc_id", "surface",
                    F.substring(low, left_start,
                                (p - left_start).cast("int"))
                    .alias("left_ctx"),
                    F.substring(low, right_start.cast("int"), width)
                    .alias("right_ctx"),
                    F.col("pos").cast("bigint").alias("span_pos"),
                    p.cast("bigint").alias("char_pos")))


# --- reference text-complexity metrics ---------------------------------------

# TextAnalyzer.scientific_patterns (content_utils.py:41-49), verbatim —
# the parity test runs the genuine analyzer on the same strings
SCIENTIFIC_PATTERNS = [
    r"\bp\s*[<>=]\s*\d+\.?\d*\b",                       # p_values
    r"\b\d+\.?\d*%?\s*CI\b",                            # confidence_intervals
    r"\b\d+\.?\d*\s*[µμ]?[gmkMGT]?[lLgGmMsShHzZ]?\b",   # measurements
    r"\b\d+\.?\d*\s*%\b",                               # percentages
    r"\b\d+\.?\d*\s*[-–—]\s*\d+\.?\d*\b",               # ranges
    r"\b\d+\.?\d*\s*[×x]\s*10\s*[\^]?\s*[-]?\d+\b",     # scientific_notation
    r"\b\d+\.?\d*\s*[µμnpfakMGT]?[gmlsAVWJKNPa]/?[0-9]*\b",  # units
]

# deterministic scientific tail the demo query appends so every pattern
# family fires on the plain-prose corpus (the NORM_DECORATION pattern)
SCI_DECORATION = (" p < 0.05 with 95% CI at 12.5 mg, range 3-7, "
                  "about 2.5 x 10^3 units.")


def text_complexity(docs: DataFrame) -> DataFrame:
    """The reference's text-complexity metrics with its EXACT
    definitions (TextAnalyzer.analyze_text_complexity
    content_utils.py:94-117): words = whitespace split, sentences =
    re.split('[.!?]+'), average_sentence_length divides by the split
    count INCLUDING the empty tail piece (the reference's own
    denominator — reproduced, not 'fixed'), lexical diversity over
    lowercased words, scientific term count/density over the 7 pattern
    families (case-insensitive, non-overlapping). All columnar:
    split/filter/aggregate + regexp_extract_all counts — one map-only
    projection, no shuffle."""
    words = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    sent_pieces = F.split("text", r"[.!?]+")
    n_sent = F.size(F.filter(sent_pieces,
                             lambda s: F.trim(s) != ""))
    n_words = F.size(words)
    sci = None
    for p in SCIENTIFIC_PATTERNS:
        c = F.size(F.regexp_extract_all("text", F.lit("(?i)" + p), 0))
        sci = c if sci is None else sci + c
    uniq = F.size(F.array_distinct(F.transform(words, F.lower)))
    return docs.select(
        "doc_id",
        n_words.alias("word_count"),
        n_sent.alias("sentence_count"),
        F.round(F.coalesce(F.try_divide(
            F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)),
            n_words), F.lit(0.0)), 6).alias("avg_word_length"),
        F.round(F.coalesce(F.try_divide(n_words, F.size(sent_pieces)),
                           F.lit(0.0)), 6).alias("avg_sentence_length"),
        uniq.alias("unique_words"),
        F.round(F.coalesce(F.try_divide(uniq, n_words), F.lit(0.0)), 6)
        .alias("lexical_diversity"),
        sci.alias("scientific_terms"),
        F.round(F.coalesce(F.try_divide(sci, n_words), F.lit(0.0)), 6)
        .alias("scientific_density"))
