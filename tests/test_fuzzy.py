"""Fuzzy-similarity scoring invariants (Arrow stage #3, operators/fuzzy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.operators.fuzzy import (
    fuzzy_candidates,
    trigram_jaccard_py,
)


def test_trigram_jaccard_semantics():
    assert trigram_jaccard_py("glucose", "glucose") == 1.0
    assert trigram_jaccard_py("abc", "xyz") == 0.0
    # short-string guard: <3 chars falls back to whole-string identity
    assert trigram_jaccard_py("ab", "ab") == 1.0
    assert 0.0 < trigram_jaccard_py("glucose", "glucos") < 1.0


def test_exact_surface_wins_rank_one(spark):
    surfaces = spark.createDataFrame([("glucose",)], "surface string")
    cands = spark.createDataFrame(
        [("glucose", "CHEBI:10001"), ("glucos", "CHEBI:10002"),
         ("gibberellin", "CHEBI:10036"), ("grape sugar", "CHEBI:10001")],
        "candidate string, term_id string")
    got = fuzzy_candidates(surfaces, cands).orderBy("rank").collect()
    assert got[0]["candidate"] == "glucose" and got[0]["score"] == 1.0
    # length band excludes the distant-length candidates
    assert all(abs(len(r["candidate"]) - 7) <= 2 for r in got)
    # ranks are 1..k dense
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_no_python_udf_outside_arrow(spark):
    """Plan check: the only Python node is the vectorized ArrowEvalPython
    (pandas UDF) — no row-at-a-time BatchEvalPython anywhere."""
    surfaces = spark.createDataFrame([("glucose",)], "surface string")
    cands = spark.createDataFrame(
        [("glucose", "CHEBI:10001")], "candidate string, term_id string")
    plan = fuzzy_candidates(surfaces, cands)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_ontology_alignment_mutual_best(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    rows = {r["term_a"]: r for r in
            api.q_ontology_alignment(spark, None).collect()}
    # flowering <-> flower: the canonical lexical alignment, mutual
    f = rows["GO:20006"]
    assert f["term_b"] == "PO:30004" and f["mutual_best"] == 1
    assert f["score"] > 0.6
    # at most one mapping per GO term; mutual flags are 0/1
    assert all(r["mutual_best"] in (0, 1) for r in rows.values())
    # preflowering loses protoflower to postflowering -> not mutual
    if "GO:20066" in rows:
        assert rows["GO:20066"]["mutual_best"] == 0
