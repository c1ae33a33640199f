"""Fuzzy entity-linking similarity scoring — sanctioned Arrow stage #3.

North-star mandate (BASELINE.json): "entity linking that scores candidate
ontology IDs via broadcast-join + TF-IDF/fuzzy-similarity pandas UDFs".
The reference itself only does exact/synonym/substring lookup
(find_terms models.py:2812-2918); the scoring stage generalizes it to
approximate surfaces.

Two scorers, combined:
  * Levenshtein similarity — pure JVM (`F.levenshtein`, codegen'd);
    1 - dist / max(len).
  * Character-trigram Jaccard — vectorized scalar pandas UDF over Arrow
    batches (set intersection has no builtin columnar form; one Arrow
    crossing for the whole candidate table, never per-row Python UDF).

Candidate generation is a *blocked* broadcast join: equi-key on the first
character with a +/-2 length band filter — at 10^12-doc scale the
alternative (full cross join mentions x gazetteer) is quadratic; blocking
bounds candidates per mention to a dimension-sized bucket while the
gazetteer stays broadcast (no fact shuffle).

Disambiguation = deterministic top-k window (score DESC, term_id ASC,
candidate ASC) — the reference's best-of pattern
(_parse_with_all_formats reference_parser.py:480).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Driver-side idf vocabularies are closure-shipped to executors; past
# this many distinct candidates the frame is no longer "dimension-sized"
# and tfidf_candidates refuses to collect it (override per session with
# spark.cspirit.tfidf.maxCandidates).
MAX_IDF_CANDIDATES = 2_000_000


def _trigrams(s: str) -> set:
    return {s[i:i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else {s}


def trigram_jaccard_py(a: str, b: str) -> float:
    ta, tb = _trigrams(a), _trigrams(b)
    inter = len(ta & tb)
    union = len(ta) + len(tb) - inter
    return inter / union if union else 0.0


# DataType instance, not a DDL string: workers re-import this module to
# unpickle the UDF, and DDL-string parsing needs an active SparkContext
# that doesn't exist there.
@pandas_udf(DoubleType())
def trigram_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([trigram_jaccard_py(x, y) for x, y in zip(a, b)])


def tfidf_candidates(mention_surfaces: DataFrame, candidates: DataFrame,
                     top_k: int = 3, length_band: int = 4) -> DataFrame:
    """TF-IDF similarity leg of the north-star scoring stage:
    score = sum(idf over shared tokens) / sum(idf over union tokens)
    (IDF-weighted Jaccard over word tokens).

    idf = ln(N / df) over the candidate vocabulary — computed
    driver-side from the dimension-sized candidate set (the same
    broadcast-scale assumption as the gazetteer itself) and shipped to
    executors inside the Arrow UDF closure; tokens unseen in the
    vocabulary get df=1. Python sums run over SORTED tokens so the
    float addition order is reproducible; the oracle's SQL SUM may
    reorder, which is why scores round to 6 dp. Candidate generation is
    the same first-char block + length band as fuzzy_candidates (wider
    band: token overlap tolerates length drift better than
    levenshtein)."""
    import math
    from collections import Counter

    # The driver-side collect below is safe ONLY while `candidates` is
    # the gazetteer dimension (the same broadcast-scale assumption the
    # entity-linking join makes). Guard it explicitly: a corpus-sized
    # frame wired in by mistake should fail loudly with the remedy,
    # not OOM the driver.
    n_cand_bound = int((candidates.sparkSession.conf.get(
        "spark.cspirit.tfidf.maxCandidates", str(MAX_IDF_CANDIDATES))))
    n_cand = candidates.select("candidate").distinct().count()
    if n_cand > n_cand_bound:
        raise ValueError(
            f"tfidf_candidates: {n_cand} distinct candidates exceeds the "
            f"driver-side idf bound ({n_cand_bound}). The candidate set "
            "must be a gazetteer-sized dimension; for corpus-scale "
            "inputs compute idf distributively (groupBy token) instead, "
            "or raise spark.cspirit.tfidf.maxCandidates.")
    cand_rows = [r["candidate"] for r in
                 candidates.select("candidate").distinct().collect()]
    df_counts = Counter(
        tok for c in cand_rows for tok in set(c.split()))
    idf = {t: math.log(n_cand / d) for t, d in df_counts.items()}
    default_idf = math.log(n_cand)

    @pandas_udf(DoubleType())
    def tfidf_sim(a: pd.Series, b: pd.Series) -> pd.Series:
        def score(x: str, y: str) -> float:
            tx, ty = set(x.split()), set(y.split())
            union = sorted(tx | ty)
            shared = tx & ty
            den = 0.0
            num = 0.0
            for t in union:
                w = idf.get(t, default_idf)
                den = den + w
                if t in shared:
                    num = num + w
            return num / den if den else 0.0
        return pd.Series([score(x, y) for x, y in zip(a, b)])

    m = mention_surfaces.select(
        "surface", F.substring("surface", 1, 1).alias("blk"),
        F.length("surface").alias("mlen"))
    c = candidates.select(
        "candidate", "term_id", F.substring("candidate", 1, 1).alias("blk"),
        F.length("candidate").alias("clen"))
    pairs = (m.join(F.broadcast(c), "blk")
             .filter(F.abs(F.col("mlen") - F.col("clen")) <= length_band))
    scored = pairs.withColumn(
        "score", F.round(tfidf_sim("surface", "candidate"), 6))
    w = Window.partitionBy("surface").orderBy(
        F.desc("score"), F.asc("term_id"), F.asc("candidate"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter((F.col("rank") <= top_k) & (F.col("score") > 0))
            .select("surface", "candidate", "term_id", "score", "rank"))


def fuzzy_candidates(mention_surfaces: DataFrame, candidates: DataFrame,
                     top_k: int = 3, length_band: int = 2) -> DataFrame:
    """mention_surfaces(surface) x candidates(candidate, term_id) ->
    (surface, candidate, term_id, score, rank<=top_k).

    score = (levenshtein_sim + trigram_jaccard) / 2, rounded to 6 dp
    (exact rational arithmetic -> bit-identical across engines)."""
    m = mention_surfaces.select(
        "surface", F.substring("surface", 1, 1).alias("blk"),
        F.length("surface").alias("mlen"))
    c = candidates.select(
        "candidate", "term_id", F.substring("candidate", 1, 1).alias("blk"),
        F.length("candidate").alias("clen"))
    pairs = (m.join(F.broadcast(c), "blk")
             .filter(F.abs(F.col("mlen") - F.col("clen")) <= length_band))

    lev_sim = F.lit(1.0) - (F.levenshtein("surface", "candidate")
                            / F.greatest("mlen", "clen"))
    scored = pairs.withColumn(
        "score",
        F.round((lev_sim + trigram_jaccard("surface", "candidate")) / 2, 6))

    w = Window.partitionBy("surface").orderBy(
        F.desc("score"), F.asc("term_id"), F.asc("candidate"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("surface", "candidate", "term_id", "score", "rank"))


ALIGN_NS_A, ALIGN_NS_B = "GO", "PO"
ALIGN_THRESHOLD = 0.35
ALIGN_LENGTH_BAND = 4


def ontology_alignment(terms: DataFrame, ns_a: str = ALIGN_NS_A,
                       ns_b: str = ALIGN_NS_B,
                       threshold: float = ALIGN_THRESHOLD,
                       length_band: int = ALIGN_LENGTH_BAND) -> DataFrame:
    """OAEI-style cross-ontology term matching: candidate mappings
    between two namespaces scored over name+synonym surface pairs
    ((levenshtein_sim + trigram_jaccard) / 2, the fuzzy_candidates
    formula — exact rational arithmetic, bit-identical across
    engines), best-per-term with the MUTUAL-BEST stability flag
    (term_a's best is term_b AND term_b's best is term_a) — the
    alignment-selection criterion OAEI matchers (LogMap, AML) apply
    before semantic verification. Emits (term_a, term_b, name_a,
    name_b, score, mutual_best) with score >= threshold.

    Scale: same blocking as fuzzy_candidates — first-letter block +
    length band keeps pairs near-linear; per-term surface fan-out is
    the synonym count (bounded); both ranking windows partition by a
    term id. The smaller ontology side is broadcastable; here both
    are dimension-sized, so the block join broadcasts whichever
    Catalyst prefers."""
    def side(ns: str, tag: str) -> DataFrame:
        return (terms.filter(F.col("id").startswith(ns + ":"))
                .select(F.col("id").alias(f"id_{tag}"),
                        F.col("name").alias(f"name_{tag}"),
                        F.explode(F.array_union(
                            F.array(F.col("name")), F.col("synonyms")))
                        .alias("s"))
                .select(f"id_{tag}", f"name_{tag}",
                        F.lower(F.col("s")).alias(f"surf_{tag}"),
                        F.substring(F.lower(F.col("s")), 1, 1)
                        .alias("blk")))
    a, b = side(ns_a, "a"), side(ns_b, "b")
    pairs = (a.join(b, "blk")
             .filter(F.abs(F.length("surf_a") - F.length("surf_b"))
                     <= length_band))
    lev_sim = (F.lit(1.0)
               - F.levenshtein("surf_a", "surf_b")
               / F.greatest(F.length("surf_a"), F.length("surf_b")))
    scored = pairs.withColumn(
        "score",
        F.round((lev_sim + trigram_jaccard("surf_a", "surf_b")) / 2, 6))
    gm = (scored.groupBy("id_a", "id_b", "name_a", "name_b")
          .agg(F.max("score").alias("score")))
    ra = Window.partitionBy("id_a").orderBy(F.desc("score"),
                                            F.asc("id_b"))
    rb = Window.partitionBy("id_b").orderBy(F.desc("score"),
                                            F.asc("id_a"))
    return (gm.withColumn("ra", F.row_number().over(ra))
            .withColumn("rb", F.row_number().over(rb))
            .filter((F.col("ra") == 1) & (F.col("score") >= threshold))
            .select(F.col("id_a").alias("term_a"),
                    F.col("id_b").alias("term_b"),
                    "name_a", "name_b", "score",
                    (F.col("rb") == 1).cast("int").alias("mutual_best")))
