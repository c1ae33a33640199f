"""Training-data text operators over the `documents` corpus — dedup,
language-ID, quality scoring, token stats, fingerprinting.

These extend the reference's text-analysis surface
(analyze_text_complexity content_utils.py:94, identify_domain :67,
keyword extraction metadata_framework.py:370) with the operations a
large-scale training-data pipeline needs (exact + near dedup, lang-id,
quality filtering). Everything is JVM column expressions — zero Python
on these paths; the shared tokenization/shingling/hashing rules are
mirrored 1:1 by the DuckDB oracles (md5 + lexicographic-min MinHash, so
both engines agree byte-for-byte).

Scale notes: every op is embarrassingly parallel per document except the
LSH bucket join (shuffle on band value — bounded by band cardinality,
hot buckets split by AQE skew join) and the dedup groupBys (map-side
combinable). No window over the full corpus, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- shared vocabulary (mirrored in oracle_sqls) ---------------------------

STOPWORDS_EN = ["the", "a", "of", "and", "in", "to", "is", "on", "for",
                "with"]

LANG_WORDLISTS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von",
           "zu"],
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["el", "los", "de", "y", "que", "en", "un", "para", "con", "una"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans", "pour",
           "sur"],
}

MINHASH_K = 12          # signature length
MINHASH_BANDS = 4       # bands of r = K/BANDS rows (LSH)
SHINGLE_W = 3           # word shingle width for near-dup jaccard
FP_SHINGLE_W = 5        # fingerprint shingle width
NEAR_DUP_THRESHOLD = 0.5


def tokens_col(text: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped — the tokenization
    rule shared with every oracle."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"),
                    lambda t: t != "")


def _shingles(tokens: Column, w: int) -> Column:
    """Word w-grams joined by single spaces; whole text if shorter."""
    n = F.size(tokens)
    return F.when(
        n >= w,
        F.transform(F.sequence(F.lit(1), n - w + 1),
                    lambda i: F.array_join(F.slice(tokens, i, w), " "))
    ).otherwise(F.array(F.array_join(tokens, " ")))


def augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + planted duplicates, the dedup-op test corpus:
    exact copy for doc_id%17==0 (id+1000000), near copy (3 appended
    words) for doc_id%10==5 (id+2000000). Deterministic; rebuilt
    identically by the oracle SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    exact = (d.filter(F.col("doc_id") % 17 == 0)
             .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    near = (d.filter(F.col("doc_id") % 10 == 5)
            .select((F.col("doc_id") + 2000000).alias("doc_id"),
                    F.concat("text", F.lit(" near duplicate copy"))
                    .alias("text")))
    return d.unionByName(exact).unionByName(near)


# --- exact dedup -----------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: md5(text) groups with >1 doc; keeper =
    min doc_id (deterministic). Map-side combinable aggregate — the
    canonical web-scale exact-dedup shape."""
    return (docs
            .groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


# --- MinHash + LSH near-dup ------------------------------------------------


def minhash_signature(tokens: Column) -> list[Column]:
    """K min-hashes over word shingles. Hash family: md5(i ':' shingle),
    minimum taken lexicographically over hex strings — total order
    identical in the JVM and every oracle engine (no integer overflow
    semantics to reconcile)."""
    sh = _shingles(tokens, SHINGLE_W)

    # NB: closure factory, never `lambda s, i=i:` — a second (default)
    # parameter makes Spark's HOFs pass the array *index* column into it,
    # silently clobbering the default.
    def mh(i: int):
        return F.array_min(F.transform(
            sh, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")

    return [mh(i) for i in range(MINHASH_K)]


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs verified by true shingle Jaccard.

    signature -> band keys (md5 of r concatenated rows) -> explode ->
    self-join per (band_idx, band_key) -> distinct pairs -> verify with
    exact |A∩B|/|A∪B| >= threshold. The verify join re-derives shingle
    sets instead of carrying them through the shuffle (cheaper: band join
    moves 2 longs + 32B hash, not document bodies)."""
    r = MINHASH_K // MINHASH_BANDS
    sig = docs.select("doc_id", *minhash_signature(tokens_col()))
    # persist: the band table feeds a self-join and the shingle table two
    # probe joins — without it Catalyst re-derives the full md5 x K x
    # shingles pipeline once per join branch (measured 3x slower). These
    # are narrow projections (ids + hashes), cheap to hold.
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.concat(*[F.col(f"mh{b * r + j}") for j in range(r)]))
            for b in range(MINHASH_BANDS)
        ])).alias("band_idx", "band_key")).persist()
    a = bands.toDF("a", "band_idx", "band_key")
    b = bands.toDF("b", "band_idx", "band_key")
    cand = (a.join(b, ["band_idx", "band_key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())

    sets_ = docs.select(
        "doc_id",
        F.array_distinct(_shingles(tokens_col(), SHINGLE_W)).alias("sh")
    ).persist()
    out = (cand
           .join(sets_.toDF("a", "sh_a"), "a")
           .join(sets_.toDF("b", "sh_b"), "b")
           .withColumn(
               "jaccard",
               F.round(F.size(F.array_intersect("sh_a", "sh_b"))
                       / F.size(F.array_union("sh_a", "sh_b")), 6))
           .filter(F.col("jaccard") >= NEAR_DUP_THRESHOLD)
           .select("a", "b", "jaccard"))
    return out


# --- SimHash ---------------------------------------------------------------


def simhash_col(tokens: Column) -> Column:
    """16-bit SimHash: per distinct token, hex digit k of md5(token)
    contributes +1/-1 to bit k by its high bit (>= '8'); simhash = sum of
    2^k over positive bits. Pure string/arith ops — identical in SQL."""
    toks = F.array_distinct(tokens)

    def contrib(k: int) -> Column:
        return F.aggregate(
            toks, F.lit(0),
            lambda acc, t: acc + F.when(
                F.substring(F.md5(t), k + 1, 1) >= "8", 1).otherwise(-1))

    bits = [F.when(contrib(k) > 0, F.lit(1 << k)).otherwise(0)
            for k in range(16)]
    total = bits[0]
    for c in bits[1:]:
        total = total + c
    return total


def simhash_clusters(docs: DataFrame) -> DataFrame:
    """Documents sharing a SimHash value (exact-duplicate recall demo;
    hamming-banded pair generation is the minhash path's job)."""
    return (docs
            .select("doc_id", simhash_col(tokens_col()).alias("simhash"))
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc"))
            .filter(F.col("n_docs") > 1))


# --- text analysis ---------------------------------------------------------


def token_stats(docs: DataFrame) -> DataFrame:
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
            / F.size(toks), 6).alias("avg_token_len"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Quality heuristics (reference analog: text-complexity metrics
    content_utils.py:94): length, punctuation density, stopword ratio,
    combined score."""
    toks = tokens_col()
    n_tok = F.size(toks)
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    stop_hits = F.size(F.filter(
        toks, lambda t: t.isin(*STOPWORDS_EN)))
    punct_ratio = F.round(punct / F.length("text"), 6)
    stop_ratio = F.round(stop_hits / n_tok, 6)
    score = F.round(
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1 - punct / F.length("text"))
        + 0.3 * (stop_hits / n_tok), 6)
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Wordlist-hit language ID: >= 2 hits required (the reference's
    domain-keyword rule, identify_domain content_utils.py:67), argmax
    hits, alphabetical tie-break, else 'und'."""
    toks = tokens_col()

    def hits(words: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    hit_cols = {lang: hits(words)
                for lang, words in sorted(LANG_WORDLISTS.items())}
    d = docs.select("doc_id", *[c.alias(f"h_{la}") for la, c in
                                hit_cols.items()])
    langs = sorted(LANG_WORDLISTS)
    best = F.greatest(*[F.col(f"h_{la}") for la in langs])
    pred = F.when(best < 2, "und")
    for la in langs:
        pred = pred.when(F.col(f"h_{la}") == best, la)
    return d.select("doc_id", pred.alias("lang_pred"),
                    *[F.col(f"h_{la}") for la in langs])


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over word 5-gram
    shingles (winnowing-style content signature; whole-text fallback for
    short docs)."""
    sh = _shingles(tokens_col(), FP_SHINGLE_W)
    return docs.select(
        "doc_id",
        F.array_min(F.transform(sh, F.md5)).alias("fingerprint"))
