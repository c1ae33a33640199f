"""The BASELINE.json correctness gates, against the single-process oracle:

  * per-row span-sequence equality on (kind, text, media_ref, order)
  * NER mention equality (exact, including offsets)
  * triple P/R >= 0.95 on the 7-tuple identity (here: exact equality)
"""

from __future__ import annotations

import pandas as pd
import pytest

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.corpus import (
    documents_interleaved,
    spans_exploded,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (
    gazetteer_df,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.ner import (
    detect_mentions,
)

from . import oracle


@pytest.fixture(scope="module")
def flat(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def expected_span_rows(flat):
    return oracle.expected_spans(flat)


def test_span_sequence_invariant(spark, sf_dir, expected_span_rows):
    """Exact per-row (kind, text, media_ref, order) equality, driven from
    the nested table (the shape the engine actually consumes)."""
    nested = documents_interleaved(spark, sf_dir).collect()
    got = {}
    for row in nested:
        got[row.doc_id] = [
            (i, s.kind, s.text, s.media_ref) for i, s in enumerate(row.spans)]
    want = {}
    for r in expected_span_rows:
        want.setdefault(r["doc_id"], []).append(
            (r["pos"], r["kind"], r["text"], r["media_ref"]))
    assert got.keys() == want.keys()
    for doc in want:
        assert got[doc] == want[doc], f"span sequence mismatch in {doc}"


def test_offsets_strictly_increasing(spark, sf_dir):
    bad = (spans_exploded(spark, sf_dir)
           .groupBy("doc_id")
           .agg({"offset": "collect_list"}))
    from pyspark.sql import functions as F
    sp = spans_exploded(spark, sf_dir)
    w = sp.selectExpr("doc_id", "pos", "offset")
    j = (w.alias("a").join(w.alias("b"),
                           (F.col("a.doc_id") == F.col("b.doc_id"))
                           & (F.col("b.pos") == F.col("a.pos") + 1))
         .filter(F.col("b.offset") <= F.col("a.offset")))
    assert j.count() == 0
    _ = bad  # silence lint


def test_ner_mentions_exact(spark, sf_dir, expected_span_rows):
    got = detect_mentions(spans_exploded(spark, sf_dir)).collect()
    got_set = {(r.doc_id, r.pos, r.kind, r.m_off, r.surface) for r in got}
    want = {(m["doc_id"], m["pos"], m["kind"], m["m_off"], m["surface"])
            for m in oracle.expected_mentions(expected_span_rows)}
    assert got_set == want


def test_linking_deterministic_argmax(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.linking import (
        link_mentions,
    )
    linked = link_mentions(
        detect_mentions(spans_exploded(spark, sf_dir)), gazetteer_df(spark))
    best = oracle._best_candidate()
    rows = linked.select("surface", "term_id", "match_kind").distinct().collect()
    for r in rows:
        assert best[r.surface] == (r.term_id, r.match_kind)


def test_triple_precision_recall(spark, sf_dir, expected_span_rows):
    got_rows = [r.asDict() for r in api.triples_df(spark, sf_dir).collect()]
    want_rows = oracle.expected_triples(expected_span_rows)
    got = oracle.triple_keys(got_rows)
    want = oracle.triple_keys(want_rows)
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # and in fact the engine should be exact on this corpus
    assert got == want
    # per-doc multiplicity equality too (not just the distinct key set)
    got_full = sorted((r["doc_id"], r["subject"], r["predicate"], r["object"])
                      for r in got_rows)
    want_full = sorted((r["doc_id"], r["subject"], r["predicate"], r["object"])
                       for r in want_rows)
    assert got_full == want_full


def test_no_self_loops_and_closed_vocabulary(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        ontology_data as OD,
    )
    rows = api.triples_df(spark, sf_dir).collect()
    assert all(r.subject != r.object for r in rows)
    assert all(r.predicate in OD.PREDICATES for r in rows)
    assert all(r.triple_id.startswith("TRP:") for r in rows)
