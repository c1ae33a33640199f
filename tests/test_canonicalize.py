"""Connected-components canonicalization invariants (north_star: CC with
salted keys; reference analogs cited in operators/canonicalize.py)."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.canonicalize import (
    canonical_mapping,
    connected_components,
    equivalence_edges,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (
    terms_df,
)


@pytest.fixture(scope="module")
def mapping(spark):
    return {r["id"]: r["canonical_id"]
            for r in canonical_mapping(terms_df(spark)).collect()}


def test_mapping_total_and_idempotent(spark, mapping):
    """Every term maps; canonical ids are fixpoints (comp(comp(x))==comp(x));
    canonical id is the min of its own component (deterministic)."""
    n_terms = terms_df(spark).count()
    assert len(mapping) == n_terms
    for tid, comp in mapping.items():
        assert mapping[comp] == comp
        assert comp <= tid


def test_shared_synonym_merges(mapping):
    """glucose (CHEBI:10001) and fructose share synonym 'hexose sugar'
    (ontology_data._SYNONYMS) -> same component (1:N synonym index,
    reference models.py:2886)."""
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        ontology_data as OD,
    )
    by_name = {t["name"]: t["id"] for t in OD.terms()}
    assert mapping[by_name["glucose"]] == mapping[by_name["fructose"]]


def test_replaced_by_merges(mapping):
    """Obsolete terms join their replacement's component
    (Term.replaced_by, models.py:246)."""
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        ontology_data as OD,
    )
    obs = [t for t in OD.terms() if t["is_obsolete"]]
    assert obs, "fixture must contain obsolete terms"
    for t in obs:
        assert mapping[t["id"]] == mapping[t["replaced_by"]]


def test_cc_on_path_graph(spark):
    """Label propagation reaches the far end of a path (diameter 5) and a
    disjoint singleton keeps its own id; salt buckets don't affect the
    result (semantic invariance of the two-phase min)."""
    nodes = spark.createDataFrame([(f"N:{i}",) for i in range(7)], "id string")
    edges = spark.createDataFrame(
        [(f"N:{i}", f"N:{i+1}") for i in range(5)], "src string, dst string")
    for salt in (1, 4):
        got = {r["id"]: r["canonical_id"]
               for r in connected_components(
                   nodes, edges, salt_buckets=salt).collect()}
        assert got == {**{f"N:{i}": "N:0" for i in range(6)}, "N:6": "N:6"}


def test_edges_are_ordered_unique(spark):
    df = equivalence_edges(terms_df(spark))
    rows = df.collect()
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    assert all(r["src"] < r["dst"] for r in rows)


def test_incremental_components_merges_and_passthrough(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.canonicalize import (  # noqa: E501
        incremental_components,
    )

    # old state: components {B,C} (label B), {D,E} (label D), {Z}
    old = spark.createDataFrame(
        [("B", "B"), ("C", "B"), ("D", "D"), ("E", "D"), ("Z", "Z")],
        "id string, canonical_id string")
    # delta: new nodes A (bridges into B-comp) and Q (isolated);
    # plus an old-old edge B-E merging the two old components
    new_ids = spark.createDataFrame([("A",), ("Q",)], "id string")
    new_edges = spark.createDataFrame(
        [("A", "C"), ("B", "E")], "src string, dst string")
    got = {r["id"]: r["canonical_id"]
           for r in incremental_components(old, new_ids,
                                           new_edges).collect()}
    assert got == {"A": "A", "B": "A", "C": "A", "D": "A", "E": "A",
                   "Z": "Z", "Q": "Q"}


def test_decremental_components_resolves_splits(spark):
    """Removing the bridging term must SPLIT its component (deletion is
    not a relabel); untouched components pass through identically."""
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.canonicalize import (  # noqa: E501
        decremental_components,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (  # noqa: E501
        TERMS_SCHEMA,
    )

    def term(tid, name, syns):
        return (tid, name, "", syns, "ns", False, "", [], [], [], "O1")

    terms = spark.createDataFrame(
        [  # chain: T1 -s1- T2 -s2- T3 (T2 is the bridge)
         term("T1", "alpha", ["s1"]),
         term("T2", "beta", ["s1", "s2"]),
         term("T3", "gamma", ["s2"]),
         # untouched pair
         term("T8", "delta", ["s9"]),
         term("T9", "epsilon", ["s9"])],
        TERMS_SCHEMA)
    old = canonical_mapping(terms)
    assert {r["canonical_id"] for r in old.collect()} == {"T1", "T8"}

    removed = spark.createDataFrame([("T2",)], "id string")
    got = {r["id"]: r["canonical_id"]
           for r in decremental_components(old, terms, removed).collect()}
    # T2 gone; the chain split: T1 and T3 now own separate components
    assert set(got) == {"T1", "T3", "T8", "T9"}
    assert got["T1"] == "T1" and got["T3"] == "T3"
    assert got["T8"] == "T8" and got["T9"] == "T8"
    # parity with the full recompute over surviving terms
    want = {r["id"]: r["canonical_id"]
            for r in canonical_mapping(
                terms.filter(terms["id"] != "T2")).collect()}
    assert got == want
