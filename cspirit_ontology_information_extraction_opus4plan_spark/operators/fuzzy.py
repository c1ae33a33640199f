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
