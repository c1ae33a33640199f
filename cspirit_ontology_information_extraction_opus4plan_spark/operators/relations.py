"""Relation / triple extraction — predicate-pattern stage.

Reference semantics: relationships carry (subject, predicate, object,
confidence, evidence/sentence) (Relationship fields models.py:902-920);
the predicate vocabulary is the closed 23-set (models.py:1002-1026);
self-loops are rejected (validate_circular_relationship models.py:1083);
triple node types default to uri/uri for term-term edges (RDFTriple
__post_init__ models.py:3840-3880).

Extraction rule (pure JVM — regexp + conditional min/max aggregate; no
Python despite being "stage 2", because the phrase grammar is regular):

  for each text span containing exactly one predicate phrase:
    subject = the linked mention ending closest before the phrase
    object  = the linked mention starting closest after the phrase
    confidence = 1.0 if both matched by canonical name else 0.9
  drop subject.term_id == object.term_id (models.py:1083)

Deterministic ids: content-addressed `TRP:<md5>` over the semantic key —
never monotonically_increasing_id (nondeterministic across retries; breaks
resume + P/R equality, SURVEY §2.5). The reference's iteration-order
`REL:%06d` counter (parsers/__init__.py:3723) is replaced by a key that is
stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ontology_data import PREDICATE_PHRASES, alternation

PHRASE_PATTERN = r"\b(" + alternation([p for p, _ in PREDICATE_PHRASES]) + r")\b"


def _phrase_to_pred():
    m = []
    for ph, pred in PREDICATE_PHRASES:
        m.extend([F.lit(ph), F.lit(pred)])
    return F.create_map(*m)


def extract_triples(spans: DataFrame, linked_mentions: DataFrame) -> DataFrame:
    """spans (exploded) + linked mentions -> one triple row per
    (text span, phrase) with resolved subject/object.

    Plan shape: filter+regexp on the span side (pushed ahead of the join),
    an equi-join on (doc_id, pos) with the mention table, then a single
    hash aggregate using conditional struct-min/max (max_by/min_by on
    m_off) — one shuffle on (doc_id, pos), no window, no Python."""
    # all matching happens on lower(text): the NER stage lowercases
    # before scanning, so mention m_off and phrase p0 must share the
    # lowercased coordinate system (and the phrase vocabulary is
    # lowercase — raw-text matching would miss 'Regulates'). p0 comes
    # from regexp_instr of the SAME word-bounded pattern that selected
    # the phrase — locate(phrase, text) would anchor to an earlier
    # in-word occurrence ('is a' inside 'axis aligns'). The docstring's
    # exactly-one-phrase rule is enforced with regexp_count, not
    # silently first-match.
    lc = F.lower("text")
    ts = (spans
          .filter(F.col("kind") == "text")
          .withColumn("lc", lc)
          .withColumn("phrase", F.regexp_extract("lc", PHRASE_PATTERN, 1))
          .filter(F.col("phrase") != "")
          .filter(F.regexp_count("lc", F.lit(PHRASE_PATTERN)) == 1)
          .withColumn("p0", F.regexp_instr("lc", F.lit(PHRASE_PATTERN)) - 1)
          .select("doc_id", "pos", "text", "phrase", "p0",
                  F.length("phrase").alias("plen")))

    m = linked_mentions.select("doc_id", "pos", "m_off", "surface",
                               "term_id", "match_kind")
    j = ts.join(m, ["doc_id", "pos"], "inner")

    subj_cond = (F.col("m_off") + F.length("surface")) <= F.col("p0")
    obj_cond = F.col("m_off") >= (F.col("p0") + F.col("plen") + 1)
    picked = (j.groupBy("doc_id", "pos", "text", "phrase")
              .agg(
        F.max(F.when(subj_cond, F.struct(
            F.col("m_off"), F.col("term_id"), F.col("match_kind")))).alias("s"),
        F.min(F.when(obj_cond, F.struct(
            F.col("m_off"), F.col("term_id"), F.col("match_kind")))).alias("o"),
    ).filter(F.col("s").isNotNull() & F.col("o").isNotNull()))

    out = (picked
           .withColumn("predicate", _phrase_to_pred()[F.col("phrase")])
           .select(
               "doc_id", "pos",
               F.col("s.term_id").alias("subject"),
               "predicate",
               F.col("o.term_id").alias("object"),
               F.lit("uri").alias("subject_type"),
               F.lit("uri").alias("object_type"),
               F.lit(None).cast("string").alias("object_datatype"),
               F.lit(None).cast("string").alias("object_language"),
               F.when((F.col("s.match_kind") == "name")
                      & (F.col("o.match_kind") == "name"), F.lit(1.0))
                .otherwise(F.lit(0.9)).alias("confidence"),
               F.col("text").alias("evidence"))
           .filter(F.col("subject") != F.col("object")))

    return out.withColumn(
        "triple_id",
        F.concat(F.lit("TRP:"), F.md5(F.concat_ws(
            "|", "doc_id", "pos", "subject", "predicate", "object"))))


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Canonical triple store rows: dedup on the reference's 7-tuple triple
    identity (RDFTriple.__hash__ models.py:4408-4418) keeping max confidence
    and a support count — groupBy, not dropDuplicates, so the aggregate is
    map-side combinable at scale."""
    key = ["subject", "predicate", "object", "subject_type", "object_type",
           "object_datatype", "object_language"]
    return (triples.groupBy(*key)
            .agg(F.max("confidence").alias("confidence"),
                 F.count("*").alias("support")))
