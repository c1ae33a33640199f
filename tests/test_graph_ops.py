"""General cycle detection: exact chains for planted variable-length
cycles; canonical-rotation uniqueness."""

from __future__ import annotations

from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    ontology_algebra as OA,
)


def test_cycle_chains_finds_planted_cycles_once(spark):
    edges = spark.createDataFrame(OA.PLANTED_CYCLE + OA.PLANTED_CHAINS,
                                  "src string, dst string")
    rows = OA.cycle_chains(edges).collect()
    chains = sorted((r["chain"], r["cycle_len"]) for r in rows)
    assert chains == [
        ("CYC:1->CYC:2->CYC:3", 3),
        ("CYD:1->CYD:2", 2),
        ("CYE:1->CYE:2->CYE:3->CYE:4", 4),
        ("CYF:1->CYF:2->CYF:3->CYF:4->CYF:5", 5),
    ]


def test_cycle_chains_ignores_acyclic_edges(spark):
    edges = spark.createDataFrame(
        [("A:1", "A:2"), ("A:2", "A:3"), ("A:1", "A:3")],
        "src string, dst string")
    assert OA.cycle_chains(edges).count() == 0
