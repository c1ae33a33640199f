"""Semantics pins for the composed crawl-side operators: frontier
admission control and anchor-text gazetteer candidate mining."""

from __future__ import annotations

from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (
    mine_anchor_candidates,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.webingest import (
    crawl_admission,
)


def test_crawl_admission_statuses(spark):
    entries = spark.createDataFrame(
        [("h1", "https://h1/ok", True),
         ("h1", "https://h1/blocked/page", True),
         ("h1", "https://h1/blocked/except", True),
         ("h1", "https://evil/x", False),
         ("h1", "https://h1/seen", True)],
        "host string, loc string, host_ok boolean")
    rules = spark.createDataFrame(
        [("h1", "/", "allow"), ("h1", "/blocked", "deny"),
         ("h1", "/blocked/except", "allow")],
        "host string, path_prefix string, verdict string")
    crawled = spark.createDataFrame(
        [("https://h1/seen",)], "canon_url string")
    out = {r.loc: r.status for r in
           crawl_admission(entries, rules, crawled).collect()}
    assert out == {
        "https://h1/ok": "admitted",
        "https://h1/blocked/page": "rejected_robots",
        "https://h1/blocked/except": "admitted",  # longest prefix wins
        "https://evil/x": "rejected_cross_host",
        "https://h1/seen": "skipped_known"}


def test_anchor_mining_dominance_and_known_filter(spark):
    # target doc 7 mentions T1 via two surfaces, T2 via one -> T1 wins
    mentions = spark.createDataFrame(
        [("DOC:000007", "T1", "alpha"), ("DOC:000007", "T1", "beta"),
         ("DOC:000007", "T2", "gamma")],
        "doc_id string, term_id string, surface string")
    edges = spark.createDataFrame(
        [(1, 7, "new label"), (2, 7, "new label"), (3, 7, "known one")],
        "src bigint, dst bigint, anchor string")
    gaz = spark.createDataFrame(
        [("known one", "T1"), ("new label", "T2")],
        "surface string, term_id string")
    out = mine_anchor_candidates(edges, mentions, gaz).collect()
    # 'known one' is a known T1 surface -> dropped; 'new label' is
    # known only for T2, target's dominant entity is T1 -> kept
    assert len(out) == 1
    r = out[0]
    assert (r.term_id, r.candidate_label) == ("T1", "new label")
    assert r.n_links == 2 and r.n_sources == 2


def test_recrawl_schedule_inverse_rate(spark):
    from pyspark.sql import functions as F
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.webingest import (
        recrawl_schedule,
    )
    rows = [("h1", "changed")] * 5 + [("h1", "unchanged")] * 5 \
        + [("h2", "unchanged")] * 8 + [("h2", "new")] \
        + [("h3", "changed")] * 2
    diff = spark.createDataFrame(rows, "h string, status string")
    out = {r.host: r for r in
           recrawl_schedule(diff, F.col("h")).collect()}
    # h1: 10 watched / 5 changed -> 2 days
    assert out["h1"].revisit_days == 2 and out["h1"].n_changed == 5
    # h2: nothing changed -> back off to the 30-day cap
    assert out["h2"].revisit_days == 30 and out["h2"].n_new == 1
    # h3: everything changed -> daily
    assert out["h3"].revisit_days == 1


def test_partition_edgecut_path_graph(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.graphops import (
        partition_edgecut,
    )
    edges = spark.createDataFrame(
        [(f"N{i}", f"N{i+1}") for i in range(40)],
        "src string, dst string")
    out = {r.k: r for r in partition_edgecut(edges, ks=(4, 8)).collect()}
    for k, r in out.items():
        assert r.n_edges == 40 and 0 < r.n_cut <= 40
        assert abs(r.cut_frac - r.n_cut / 40) < 1e-6
        assert 0 < r.max_vertex_share <= 1.0
        assert r.n_parts_used <= k
    # more partitions cut at least as many edges in expectation;
    # assert the weaker monotone bound that holds for md5 placement
    assert out[8].n_cut >= out[4].n_cut * 0.6


def test_linking_review_queue_flags_rank_decided_ties(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.linking import (
        linking_review_queue,
    )
    # doc D: anchor surface 'anchor' -> A (unambiguous); ambiguous
    # surface 'amb' with candidates X (edge to A) and Y (no edges) ->
    # clear edge_coh winner X; ambiguous 'tied' with candidates P, Q
    # both edge-adjacent to A -> decided by rank tie -> review
    mentions = spark.createDataFrame(
        [("D", "anchor"), ("D", "amb"), ("D", "tied")],
        "doc_id string, surface string")
    gaz = spark.createDataFrame(
        [("anchor", "NS:A", 3), ("amb", "NS:X", 3), ("amb", "NS:Y", 3),
         ("tied", "NS:P", 3), ("tied", "NS:Q", 3)],
        "surface string, term_id string, rank int")
    rels = spark.createDataFrame(
        [("r1", "NS:X", "part_of", "NS:A"),
         ("r2", "NS:P", "part_of", "NS:A"),
         ("r3", "NS:Q", "part_of", "NS:A")],
        "id string, subject string, predicate string, object string")
    out = {r.surface: r for r in
           linking_review_queue(mentions, gaz, rels).collect()}
    assert set(out) == {"amb", "tied"}   # anchors never enqueue
    amb = out["amb"]
    assert (amb.winner, amb.runner_up) == ("NS:X", "NS:Y")
    assert amb.edge_gap == 1 and not amb.needs_review
    tied = out["tied"]
    assert tied.needs_review
    assert tied.edge_gap == 0 and tied.type_gap == 0
    assert (tied.winner, tied.runner_up) == ("NS:P", "NS:Q")  # id tie


def test_distant_supervision_labels_and_negatives(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (
        distant_supervision_labels,
    )
    mentions = spark.createDataFrame(
        [("D1", "A"), ("D1", "A"), ("D1", "B"), ("D1", "C"),
         ("D2", "A"), ("D2", "B")],
        "doc_id string, term_id string")
    triples = spark.createDataFrame(
        [("A", "part_of", "B"), ("A", "regulates", "B")],
        "subject string, predicate string, object string")
    out = distant_supervision_labels(mentions, triples).collect()
    by = {}
    for r in out:
        by.setdefault((r.doc_id, r.subject_term, r.object_term),
                      []).append(r)
    # multi-label pair (A,B) in both docs
    for d in ("D1", "D2"):
        labels = sorted(r.label for r in by[(d, "A", "B")])
        assert labels == ["part_of", "regulates"]
        assert all(r.in_kb for r in by[(d, "A", "B")])
    # reverse direction is a negative
    assert [r.label for r in by[("D1", "B", "A")]] == ["NO_RELATION"]
    assert not by[("D1", "B", "A")][0].in_kb
    # D1 has 3 entities -> 6 ordered pairs, one doubled by multi-label
    assert sum(len(v) for k, v in by.items() if k[0] == "D1") == 7


def test_relation_pattern_mining_recovers_phrase(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (
        relation_pattern_mining,
    )
    spans = spark.createDataFrame(
        [("D1", 0, "alpha binds tightly to beta today"),
         ("D2", 0, "alpha binds tightly to gamma now")],
        "doc_id string, pos int, text string")
    links = spark.createDataFrame(
        [("D1", "alpha", "A"), ("D1", "beta", "B"),
         ("D2", "alpha", "A"), ("D2", "gamma", "C")],
        "doc_id string, surface string, term_id string")
    kb = spark.createDataFrame(
        [("A", "binds", "B")],
        "subject string, predicate string, object string")
    out = {(r.between_phrase, r.label): r for r in
           relation_pattern_mining(spans, links, kb).collect()}
    # same phrase supports a KB label once and a negative once
    assert out[("binds tightly to", "binds")].n_pairs == 1
    assert out[("binds tightly to", "NO_RELATION")].n_pairs == 1
    # reverse-direction pair never matches (beta after alpha only)
