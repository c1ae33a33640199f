"""Corpus-curation guards a training-data pipeline runs before text
reaches a model: PII redaction and benchmark decontamination.

No reference counterpart (the reference processes published scientific
text and has no privacy/eval-hygiene stage); these are first-class
members of the LLM-data-pipeline operator family (SURVEY §2 ledger)
alongside the dedup/quality/packing ops in textops.py.

Scale shapes:
* redact_pii — pure per-row JVM column expressions (regexp_replace /
  regexp_count inside whole-stage codegen); zero shuffles, trivially
  100-TB-safe.
* contaminated_docs — the benchmark side (an eval suite: thousands of
  snippets, not TBs) collapses to a DISTINCT shingle set and
  broadcasts; the corpus side is scan -> explode -> broadcast-hash
  semi-join -> partial-agg count per doc. The only shuffle is the
  map-side-combinable groupBy(doc_id); the corpus is never shuffled on
  the shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import _shingles, tokens_col

# patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically: no lookaround, no backrefs; \b is ASCII word boundary
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}(?:\.\d{1,3}){3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}
PII_TOKENS = {"email": "[EMAIL]", "ipv4": "[IP]", "phone": "[PHONE]"}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_email, n_ipv4, n_phone): every PII match
    replaced by its class token, plus per-class match counts (the audit
    trail curation jobs keep). Counts are taken BEFORE replacement so
    overlapping classes can't mask each other."""
    counts = [F.regexp_count(text_col, F.lit(p)).cast("bigint")
              .alias(f"n_{k}") for k, p in PII_PATTERNS.items()]
    clean = F.col(text_col)
    for k, p in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, p, PII_TOKENS[k])
    return docs.select("doc_id", clean.alias("clean_text"), *counts)


DECON_W = 8  # benchmark-overlap shingle width (word 8-grams)


def contaminated_docs(corpus: DataFrame, benchmark: DataFrame,
                      w: int = DECON_W) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word w-gram
    with the benchmark set, with the count of distinct shared w-grams.
    Both sides shingle with the corpus tokenization rule; the benchmark
    shingle set is deduped then broadcast."""
    bench = (benchmark
             .select(F.explode(F.array_distinct(
                 _shingles(tokens_col(), w))).alias("s"))
             .distinct())
    corp = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(tokens_col(), w))).alias("s"))
    return (corp.join(F.broadcast(bench), "s")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_hits")))
