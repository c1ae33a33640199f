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
