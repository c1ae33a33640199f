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



BLOOM_BITS = 1 << 20    # filter size m (bits); sized to an eval suite
BLOOM_K = 4             # hash functions
BLOOM_FP_SLACK = 0.05   # verdict bound: FP docs <= slack * clean docs


def _bloom_coords(s):
    """The BLOOM_K (word_index, bit_mask) coordinate pairs for a
    shingle: position_i = xxhash64(s, i) mod m, packed 64 bits/word.
    Pure codegen expressions; seeds are the literal second hash input."""
    out = []
    for i in range(BLOOM_K):
        pos = F.pmod(F.xxhash64(s, F.lit(i)), F.lit(BLOOM_BITS))
        out.append((F.shiftright(pos, 6).alias("w"),
                    F.expr(f"shiftleft(1L, cast("
                           f"pmod(xxhash64(s, {i}), {BLOOM_BITS})"
                           f" & 63 as int))").alias("mask")))
    return out


def bloom_decontaminate(corpus: DataFrame, benchmark: DataFrame,
                        w: int = DECON_W) -> DataFrame:
    """Bloom-filtered decontamination with a proven error envelope —
    the fourth honest-sketch contract (HLL distinct, GK quantiles,
    MinHash Jaccard, now Bloom membership), built DISTRIBUTEDLY in
    pure JVM expressions since Spark exposes no user-facing
    bloom_filter_agg: benchmark shingles explode to BLOOM_K bit
    positions, bit_or packs them into a (word_index, word) table of at
    most m/64 = 16384 rows — ~128 KB broadcast however large the
    benchmark grows, vs broadcasting the full shingle set — and the
    corpus probes it with a broadcast equi-join on word_index plus a
    bitwise AND, all map-side.

    Bloom has NO false negatives, so every truly contaminated doc must
    be flagged; false positives are bounded by the filter geometry
    (m = 2^20 bits, k = 4: per-shingle fpp ~ (kn/m)^k, doc-level
    ~ shingles_per_doc x fpp). One summary row proves both against
    the exact broadcast semi-join anchor: (n_docs,
    n_exact_contaminated, n_missed, caught_all, fp_within_bound) —
    n_missed MUST be 0 (the oracle asserts it) and FP docs must stay
    under BLOOM_FP_SLACK of the clean docs. Deterministic: xxhash64
    is seed-fixed."""
    bench_sh = (benchmark
                .select(F.explode(F.array_distinct(
                    _shingles(tokens_col(), w))).alias("s"))
                .distinct())
    coords = _bloom_coords(F.col("s"))
    words = None
    for wcol, mcol in coords:
        part = bench_sh.select(wcol, mcol)
        words = part if words is None else words.unionByName(part)
    words = (words.groupBy("w")
             .agg(F.bit_or("mask").alias("word"))
             .localCheckpoint(eager=True))
    corp = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(tokens_col(), w)))
        .alias("s")).localCheckpoint(eager=True)
    probe = None
    for wcol, mcol in coords:
        part = corp.select("doc_id", "s", wcol, mcol)
        probe = part if probe is None else probe.unionByName(part)
    s_hits = (probe.join(F.broadcast(words), "w", "left")
              .select("doc_id", "s",
                      ((F.coalesce("word", F.lit(0))
                        .bitwiseAND(F.col("mask")))
                       != 0).cast("int").alias("bit_set"))
              .groupBy("doc_id", "s")
              .agg(F.min("bit_set").alias("s_hit")))
    probed = (s_hits.groupBy("doc_id")
              .agg(F.max("s_hit").alias("bloom_hit")))
    exact = (corp.join(F.broadcast(bench_sh), "s", "left_semi")
             .select("doc_id").distinct()
             .withColumn("exact_hit", F.lit(1)))
    both = (probed.join(exact, "doc_id", "left")
            .select("doc_id", "bloom_hit",
                    F.coalesce("exact_hit", F.lit(0)).alias("exact_hit")))
    n_clean = F.sum((F.col("exact_hit") == 0).cast("bigint"))
    fp = F.sum(((F.col("bloom_hit") == 1)
                & (F.col("exact_hit") == 0)).cast("bigint"))
    missed = F.sum(((F.col("bloom_hit") == 0)
                    & (F.col("exact_hit") == 1)).cast("bigint"))
    return both.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("exact_hit").cast("bigint").alias("n_exact_contaminated"),
        missed.cast("bigint").alias("n_missed"),
        (missed == 0).alias("caught_all"),
        (fp <= F.greatest(
            F.ceil(n_clean * F.lit(BLOOM_FP_SLACK)),
            F.lit(1)).cast("bigint")).alias("fp_within_bound"))
