"""Recovery-taxonomy lane tests (operators/recovery.py) — every lane of
the reference's SKIP/DEFAULT/RETRY/REPLACE/ABORT/CONTINUE progression
fires, with the reference's context defaults, and the REPLACE lane
actually cures curable Turtle through the real parser."""

from __future__ import annotations

import __spark_entry__ as E

from .conftest import SF_DIR


def test_every_lane_fires_with_reference_defaults(spark):
    rows = E.queries()["parse_recovery"](spark, SF_DIR).collect()
    assert len(rows) == 420
    by_strategy = {}
    for r in rows:
        by_strategy.setdefault(r["strategy"], []).append(r)
    assert set(by_strategy) == {"skip", "default", "retry", "abort",
                                "continue"}
    # severity mapping
    assert all(r["severity"] == "fatal" for r in by_strategy["abort"])
    assert all(r["severity"] == "warning"
               for r in by_strategy["continue"])
    assert all(r["severity"] == "recoverable"
               for r in by_strategy["skip"] + by_strategy["default"]
               + by_strategy["retry"])
    # context defaults (_recover_default parsers/__init__.py:1280-1293)
    for r in by_strategy["default"]:
        if "term" in r["location"]:
            assert (r["default_id"], r["default_name"],
                    r["default_extra"]) == (
                "unknown", "Unknown Term", "Definition not available")
        elif "relationship" in r["location"]:
            assert (r["default_id"], r["default_name"],
                    r["default_extra"]) == (
                "unknown", "related_to", "unknown")
        elif "namespace" in r["location"]:
            assert (r["default_id"], r["default_name"]) == (
                "http://example.org/default#", "default")
            assert r["default_extra"] is None
    # non-default lanes carry no substitutes
    for s in ("skip", "retry", "abort", "continue"):
        assert all(r["default_id"] is None for r in by_strategy[s])


def test_replace_lane_cures_curable_turtle(spark):
    rows = E.queries()["parse_recovery_reparse"](spark, SF_DIR).collect()
    cured = [r for r in rows if r["predicate"] == "urn:obo#src"]
    dead = [r for r in rows if r["predicate"] == "parse_error"]
    assert cured and dead
    # cured rows are genuine triples with the term's name as object
    for r in cured[:10]:
        assert r["subject"].startswith("urn:graft#")
        assert r["object_type"] == "literal"
    # incurable rows re-quarantine with the lex error
    assert all("lex error" in r["object"] for r in dead)
    # k%4 in {0,1} cure, k%4 == 3 dies, k%4 == 2 parsed clean (absent)
    ids = {r["src_id"] for r in rows}
    assert all(int(i.split(":")[1]) % 4 != 2 for i in ids)


def test_classifier_matches_reference_rule_order(spark):
    """A message hitting a FATAL indicator must stay 'recoverable' when
    the TYPE table already classified it (type tables run first) —
    the reference's exact rule order."""
    from pyspark.sql import functions as F
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        recovery as RC,
    )
    df = spark.createDataFrame(
        [("ValueError", "fatal corruption detected"),
         ("RuntimeError", "fatal corruption detected"),
         ("RuntimeError", "weird unclassifiable message")],
        "error_type string, error_message string")
    got = [r["sev"] for r in df.select(
        RC.classify_severity(F.col("error_type"),
                             F.col("error_message")).alias("sev"))
        .collect()]
    assert got == ["recoverable", "fatal", "recoverable"]
