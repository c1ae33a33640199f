"""Semantics pins for the round-3 fourth tranche: DSIR selection,
interpolated bigram log-loss, Benford first-digit audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
    benford_digits,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
    bigram_logloss, dsir_select,
)


def test_bigram_logloss_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id bigint, text string")
    rows = {r.doc_id: r for r in bigram_logloss(docs).collect()}
    # bigrams: (a,b) x2, (a,c) x1; unigrams a:3 b:2 c:1 solo:1, N=7
    assert 4 not in rows  # <2 tokens -> no bigram events
    p_ab = 0.5 * 2 / 3 + 0.5 * 2 / 7
    p_ac = 0.5 * 1 / 3 + 0.5 * 1 / 7
    assert rows[1].n_bigrams == 1
    assert abs(rows[1].cross_entropy - (-math.log(p_ab))) < 1e-6
    assert abs(rows[3].cross_entropy - (-math.log(p_ac))) < 1e-6
    assert rows[1].cross_entropy == rows[2].cross_entropy


def test_dsir_prefers_target_distribution(spark):
    # target sources are those with numeric suffix % 5 == 0 (src0):
    # docs stuffed with the target-only token must outrank docs made
    # of the raw-only token, and ranks are a dense 1..n permutation
    rows = [(i, "src0", "quail quail quail") for i in range(4)]
    rows += [(10 + i, "src1", "zebra zebra zebra") for i in range(4)]
    rows += [(20, "src1", "quail quail quail")]  # target-LIKE text
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string")
    out = dsir_select(docs, top_k=5).collect()
    by_id = {r.doc_id: r for r in out}
    assert sorted(r.rank for r in out) == list(range(1, len(rows) + 1))
    # every quail doc (target-distribution text) outranks every zebra doc
    quail = [r for r in out if by_id[r.doc_id].doc_id in
             (0, 1, 2, 3, 20)]
    zebra = [r for r in out if r.doc_id in (10, 11, 12, 13)]
    assert max(q.rank for q in quail) < min(z.rank for z in zebra)
    assert all(q.selected for q in quail)
    assert not any(z.selected for z in zebra)


def test_benford_grid_and_chi_square(spark):
    import datetime
    ts = datetime.datetime(2024, 1, 1)
    vals = [1.0, 1.2, 19.0, 2.5, 0.31, 0.0, -4.0]  # digits 1,1,1,2,3,-,4
    events = spark.createDataFrame(
        [(i, ts, 1, "t", v, "{}") for i, v in enumerate(vals)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    out = {r.digit: r for r in benford_digits(events).collect()}
    assert sorted(out) == list(range(1, 10))  # full 1..9 grid
    n_obs = {d: out[d].n_obs for d in out}
    assert n_obs[1] == 3 and n_obs[2] == 1 and n_obs[3] == 1 \
        and n_obs[4] == 1 and n_obs[5] == 0
    n = 6.0
    chi = sum((n_obs[d] - n * math.log10(1 + 1 / d)) ** 2
              / (n * math.log10(1 + 1 / d)) for d in range(1, 10))
    assert abs(out[1].chi_square - chi) < 1e-5
    assert abs(sum(r.obs_frac for r in out.values()) - 1.0) < 1e-4


def test_shortest_path_counts_diamond(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.ontology_algebra import (
        shortest_path_counts,
    )
    terms = spark.createDataFrame(
        [("A", "a", "GO"), ("B", "b", "GO"), ("C", "c", "GO"),
         ("D", "d", "GO"), ("E", "e", "GO")],
        "id string, name string, ontology_id string")
    # diamond A->{B,C}->D plus a LONGER alternative A->B->E->D that
    # must NOT count (depth(D)=2 via B/C; the E chain arrives at 3,
    # so the E->D edge is not a level edge)
    rels = spark.createDataFrame(
        [("B", "is_a", "A"), ("C", "is_a", "A"),
         ("D", "is_a", "B"), ("D", "is_a", "C"),
         ("E", "is_a", "B"), ("D", "is_a", "E")],
        "subject string, predicate string, object string")
    out = {r.id: r for r in shortest_path_counts(terms, rels).collect()}
    assert out["A"].depth == 0 and out["A"].n_paths == 1
    assert out["B"].n_paths == 1 and out["C"].n_paths == 1
    assert out["D"].depth == 2 and out["D"].n_paths == 2
    assert out["E"].depth == 2 and out["E"].n_paths == 1


def test_ann_recall_eval_bounds(spark):
    import random
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.similarity import (
        DIM, ann_recall_eval,
    )
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)], 0)
            for i in range(80)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    out = ann_recall_eval(emb, k=3, n_queries=5).collect()
    assert len(out) == 5
    for r in out:
        assert r.n_exact == 3
        assert 0 <= r.n_hit <= min(r.n_exact, r.n_approx)
        assert abs(r.recall - r.n_hit / r.n_exact) < 1e-6


def test_zorder_prune_beats_linear_on_v_predicate(spark):
    # every user bucket inside the box's u-range, values mostly OUTSIDE
    # its v-range: the u-side prunes nothing for either layout, so only
    # the Z layout (which bounds v per file) can skip anything
    import datetime
    import itertools
    ts = datetime.datetime(2024, 1, 1)
    rows = [(i, ts, 10 + (u % 16), "t", float(v), "{}")
            for i, (u, v) in enumerate(itertools.product(
                range(64), [5.0, 100.0, 200.0, 300.0, 450.0]))]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        zorder_prune_stats,
    )
    out = {r.layout: r for r in zorder_prune_stats(events).collect()}
    assert set(out) == {"zorder", "linear"}
    # the linear layout sorts on u only: every file spans all v values,
    # so the v-side of the box prunes nothing and every u-matching
    # file is scanned; z-order must scan a strictly smaller fraction
    assert out["zorder"].frac_files_scanned \
        < out["linear"].frac_files_scanned
    for r in out.values():
        assert 0 < r.n_files_scanned <= r.n_files
        assert r.n_rows_scanned > 0


def test_salt_audit_spreads_a_hub_key(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        salt_balance_audit,
    )
    rows = [("hub", f"r{i}") for i in range(900)]
    rows += [(f"k{i}", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "k string, rid string")
    out = {r.layout: r for r in
           salt_balance_audit(df, "k", "rid").collect()}
    assert out["unsalted"].total_rows == out["salted"].total_rows == 1000
    # the hub key owns >= 90% of one partition unsalted; salting must
    # cut the heaviest partition's share by a large factor
    assert out["unsalted"].max_share >= 0.9
    assert out["salted"].max_share < 0.5 * out["unsalted"].max_share
    assert out["salted"].n_parts_used > out["unsalted"].n_parts_used / 2
