"""Invariants of the deterministic mini-ontology (the properties that make
Spark / pandas-oracle / DuckDB matching semantics provably identical)."""

import re

from cspirit_ontology_information_extraction_opus4plan_spark import (
    ontology_data as OD,
)

ID_RE = re.compile(r"^[A-Za-z]+:\d+$")  # reference models.py:298/:977


def test_term_ids_valid_and_unique():
    ts = OD.terms()
    ids = [t["id"] for t in ts]
    assert len(ids) == len(set(ids))
    assert all(ID_RE.match(i) for i in ids)
    assert len(ts) >= 400


def test_relationship_invariants():
    ts = {t["id"] for t in OD.terms()}
    rels = OD.relationships()
    assert all(ID_RE.match(r["id"]) for r in rels)
    assert all(0.0 <= r["confidence"] <= 1.0 for r in rels)
    # no self-loops (models.py:1083)
    assert all(r["subject"] != r["object"] for r in rels)
    assert all(r["predicate"] in OD.PREDICATES for r in rels)
    # deliberate dangling refs exist (validators target)
    dangling = [r for r in rels if r["object"] not in ts]
    assert len(dangling) >= 2
    # deliberate exact duplicate exists
    spo = [(r["subject"], r["predicate"], r["object"]) for r in rels]
    assert len(spo) != len(set(spo))


def test_inverse_map_is_involution():
    for k, v in OD.INVERSE_PREDICATES.items():
        assert OD.INVERSE_PREDICATES[v] == k
        assert k in OD.PREDICATES and v in OD.PREDICATES
    assert "is_a" not in OD.INVERSE_PREDICATES


def test_surfaces_regex_safe():
    for s in OD.surfaces():
        assert re.fullmatch(r"[a-z0-9 ]+", s), s
        assert s == s.strip()


def test_surfaces_token_substring_free():
    """No surface's token sequence is a contiguous subsequence of another's.
    This makes leftmost-longest matching == word-boundary containment, so
    the Arrow NER stage, Python re, and DuckDB RE2 agree exactly."""
    toks = {s: tuple(s.split()) for s in OD.surfaces()}
    surfs = list(toks)
    for a in surfs:
        ta = toks[a]
        for b in surfs:
            if a == b:
                continue
            tb = toks[b]
            if len(ta) > len(tb):
                continue
            for i in range(len(tb) - len(ta) + 1):
                assert tb[i:i + len(ta)] != ta, (
                    f"surface {a!r} is a token-substring of {b!r}")


def test_shared_synonym_is_ambiguous():
    gaz = OD.gazetteer()
    owners = {g["term_id"] for g in gaz if g["surface"] == "hexose sugar"}
    assert len(owners) == 2  # exercises the 1:N synonym join


def test_gazetteer_excludes_obsolete():
    obsolete = {t["id"] for t in OD.terms() if t["is_obsolete"]}
    assert obsolete  # some exist
    assert not obsolete & {g["term_id"] for g in OD.gazetteer()}
