"""Semantic guarantees of the late-round-3 operators — properties the
oracle hash-compare can't articulate (it proves equality, not meaning):

  * SemDeDup resolves every planted twin pair and keeps the
    farther-from-centroid member (the paper's rule, not an id tie),
  * the pHash banded join has PERFECT recall on pairs within the
    pigeonhole radius (every planted twin pair is found),
  * ranking-eval metrics are well-formed (MRR in (0, 1],
    hits1 <= hits3 <= hits10, true tail always present -> rank >= 1),
  * duplicated-span mass is bounded by the document (dup_tokens <=
    n_tokens) and the containment plants actually light up,
  * relink statuses partition the v1-linked surface set and 'relinked'
    rows always point at a DIFFERENT surviving term,
  * modularity rows decompose Q consistently (internal edges and
    degree mass both bounded by the graph totals).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api


def test_semdedup_resolves_planted_twins_keep_farthest(spark, sf_dir):
    rows = api.q_doc_semdedup(spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in rows}
    planted = [v for v in by_id if v >= 1000000]
    assert planted, "decoration must plant twins"
    for twin in planted:
        src = twin - 1000000
        pair = {by_id[twin]["is_dup"], by_id[src]["is_dup"]}
        # exactly one member of each co-clustered pair is dropped; a
        # pair split across clusters (SemDeDup's documented blind spot)
        # keeps both
        if by_id[twin]["c_id"] == by_id[src]["c_id"]:
            assert pair == {0, 1}, (src, twin)
            kept = twin if by_id[twin]["is_dup"] == 0 else src
            drop = src if kept == twin else twin
            assert (by_id[kept]["cent_sq_dist"]
                    >= by_id[drop]["cent_sq_dist"]), (src, twin)


def test_phash_recall_on_planted_twins(spark, sf_dir):
    """Every canonical-group brightness twin MUST be found (the
    mean-relative aHash is provably invariant to the constant shift,
    so twins are hamming 0 and the banded join cannot miss them), and
    the hash must come from the REAL decoded pixels (cross-checked
    against a driver-side render + point-sample)."""
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.multimodal import (
        FIG_GROUP, PHASH_HAMMING_MAX, TAB_GROUP, _render_rows,
        media_phash, media_spans, synthesize_png,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.api import (
        spans_exploded,
    )
    pairs = api.q_media_phash_neardup(spark, sf_dir).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert all(r["hamming"] <= PHASH_HAMMING_MAX for r in pairs)

    hashed = media_phash(synthesize_png(media_spans(
        spans_exploded(spark, sf_dir)))).collect()
    h = {r["media_ref"]: r["phash"] for r in hashed}

    def group_key(ref):
        doc = int(ref.split("DOC", 1)[1].split("/", 1)[0])
        g = FIG_GROUP if ref.endswith("fig1.png") else TAB_GROUP
        return (ref.rsplit("/", 1)[1], doc // g)

    groups = {}
    for ref in h:
        groups.setdefault(group_key(ref), []).append(ref)
    n_twin_pairs = 0
    for refs in groups.values():
        for i, a in enumerate(sorted(refs)):
            for b in sorted(refs)[i + 1:]:
                assert h[a] == h[b], (a, b)   # brightness invariance
                assert (a, b) in found, (a, b)
                n_twin_pairs += 1
    assert n_twin_pairs > 0
    # the hash really is the decoded-pixel aHash
    some = sorted(h)[0]
    rows = _render_rows(some)
    w, ht = len(rows[0]), len(rows)
    samples = [rows[j * ht // 8][i * w // 8]
               for j in range(8) for i in range(8)]
    s = sum(samples)
    want = 0
    for k, g in enumerate(samples):
        if 64 * g > s:
            want |= 1 << k
    if want >= 1 << 63:
        want -= 1 << 64
    assert h[some] == want


def test_ranking_eval_metrics_well_formed(spark, sf_dir):
    rows = api.q_kg_ranking_eval(spark, sf_dir).collect()
    assert rows, "held-out split must be non-empty"
    for r in rows:
        assert 0 < r["mrr"] <= 1.0
        assert 0 <= r["hits1"] <= r["hits3"] <= r["hits10"] <= 1.0
        assert r["n_eval"] >= 1


def test_dup_spans_bounded_and_plants_fire(spark, sf_dir):
    rows = api.q_doc_dup_spans(spark, sf_dir).collect()
    assert all(0 <= r["dup_tokens"] <= r["n_tokens"] for r in rows)
    assert all((r["n_dup_spans"] == 0) == (r["dup_tokens"] == 0)
               for r in rows)
    assert any(r["dup_tokens"] > 0 for r in rows), \
        "containment plants must produce duplicated spans"


def test_relink_statuses_partition_and_point_elsewhere(spark, sf_dir):
    rows = api.q_relink_delta(spark, sf_dir).collect()
    assert {r["status"] for r in rows} <= {"dropped", "relinked",
                                           "stable"}
    for r in rows:
        if r["status"] == "dropped":
            assert r["term_v2"] is None
        elif r["status"] == "relinked":
            assert r["term_v2"] is not None
            assert r["term_v2"] != r["term_v1"]
        else:
            assert r["term_v2"] == r["term_v1"]
    assert {r["status"] for r in rows} == {"dropped", "relinked",
                                           "stable"}


def test_modularity_decomposition_bounded(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.api import (
        q_triples_dedup,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.graphops import (
        undirected_entity_edges,
    )
    rows = api.q_kg_modularity(spark, sf_dir).collect()
    m = undirected_entity_edges(q_triples_dedup(spark, sf_dir)).count()
    assert sum(r["internal_edges"] for r in rows) <= m
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    q = sum(r["contribution"] for r in rows)
    assert -0.5 <= q <= 1.0
