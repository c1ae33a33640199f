"""Entity linking — broadcast candidate join + deterministic argmax.

Reference semantics: lookup order exact-name, then synonym (models.py:
2812-2918); candidate scoring is specified by BASELINE.json's north_star
(broadcast-join to candidate set + similarity scoring). Disambiguation
rule shared by the Spark plan, the pandas oracle, and the DuckDB oracle:

    best candidate per mention = argmax(match_kind rank), tie -> min term_id

realized as a window `row_number()==1` over (rank desc, term_id asc) —
the reference's best-of pattern (_parse_with_all_formats
reference_parser.py:480; figure dedup pdf_parser.py:1632).

Scale: gazetteer is dimension-sized (|ontology| << |corpus|) -> broadcast
hash join, no shuffle of the mention fact table for the join itself; the
argmax window partitions by mention key which is already well-distributed
(doc_id dominates the key), so no skew salting is needed *here* — hub
skew bites in connected components (canonicalize.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """mentions(doc_id,pos,kind,m_off,surface) x gaz(surface,term_id,
    match_kind,rank,...) -> linked mentions with the winning candidate."""
    cand = mentions.join(F.broadcast(gaz), "surface", "inner")
    w = (Window.partitionBy("doc_id", "pos", "m_off")
         .orderBy(F.desc("rank"), F.asc("term_id")))
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def candidates_scored(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """All (mention, candidate) pairs with scores — the pre-argmax view
    (north_star's candidate scoring stage), kept JVM-side: the score is a
    column expression, not a UDF, because match-kind priority + fuzzy
    string equality on exact keys needs no Python. A TF-IDF / edit-distance
    scorer for *approximate* surfaces would slot in here as the sanctioned
    Arrow stage #3 (see fuzzy.py)."""
    return (mentions.join(F.broadcast(gaz), "surface", "inner")
            .withColumn("score", F.col("rank").cast("double")))
