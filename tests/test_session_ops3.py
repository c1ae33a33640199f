"""Semantic guarantees of the third round-3-continuation tranche:

  * the bitemporal snapshot's four status counts tile the store
    (valid + expired + future == total, open-ended never expired),
  * CDC chunk boundaries are position-shift-invariant by construction
    (exact copies share ALL chunks; chunk counts re-derive from the
    boundary rule),
  * key-candidate flags agree with a brute-force fan-out check,
  * PSI fires on exactly the planted dimension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api


def test_snapshot_statuses_tile_the_store(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.api import (
        dedup_triples, triples_df,
    )
    rows = api.q_kg_snapshot_asof(spark, sf_dir).collect()
    assert rows
    total = (dedup_triples(triples_df(spark, sf_dir))
             .select("subject", "predicate", "object").distinct()
             .groupBy("predicate").count().collect())
    by_pred = {r["predicate"]: r["count"] for r in total}
    for r in rows:
        assert (r["n_valid"] + r["n_expired"] + r["n_future"]
                == by_pred[r["predicate"]]), r
        # an open-ended triple can never be expired
        assert r["n_open"] <= by_pred[r["predicate"]] - r["n_expired"]


def test_cdc_exact_copies_share_all_chunks(spark, sf_dir):
    rows = {r["doc_id"]: r
            for r in api.q_doc_cdc_chunks(spark, sf_dir).collect()}
    copies = [d for d in rows if 1000000 <= d < 2000000]
    assert copies
    for c in copies:
        src = rows[c - 1000000]
        cp = rows[c]
        # identical text -> identical boundaries -> identical chunks
        assert cp["n_chunks"] == src["n_chunks"], c
        assert cp["shared_frac"] == 1.0, c
        assert src["shared_frac"] == 1.0, c


def test_key_candidates_match_bruteforce(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.api import (
        dedup_triples, triples_df,
    )
    rows = {r["predicate"]: r
            for r in api.q_kg_key_candidates(spark, sf_dir).collect()}
    edges = (dedup_triples(triples_df(spark, sf_dir))
             .select("subject", "predicate", "object").distinct()
             .collect())
    from collections import defaultdict
    so = defaultdict(set)
    os_ = defaultdict(set)
    subj = defaultdict(set)
    obj = defaultdict(set)
    for s, p, o in edges:
        so[(p, s)].add(o)
        os_[(p, o)].add(s)
        subj[p].add(s)
        obj[p].add(o)
    for p, r in rows.items():
        assert r["n_subjects"] == len(subj[p])
        assert r["n_objects"] == len(obj[p])
        func = all(len(so[(p, s)]) == 1 for s in subj[p])
        invf = all(len(os_[(p, o)]) == 1 for o in obj[p])
        assert r["functional"] == func, p
        assert r["inverse_functional"] == invf, p


def test_seasonality_chi2_rederives(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        CHI2_CRIT_6DOF, load_events,
    )
    rows = {r["event_type"]: r
            for r in api.q_event_seasonality(spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir).select(
        "event_type", F.dayofweek("ts").alias("dow")).collect()
    from collections import Counter
    per = Counter((e["event_type"], e["dow"]) for e in ev)
    types = {e["event_type"] for e in ev}
    assert set(rows) == types
    for t in types:
        counts = [per[(t, d)] for d in range(1, 8) if per[(t, d)]]
        n = sum(counts)
        e = n / 7.0
        chi2 = sum((c - e) ** 2 / e for c in counts)
        assert rows[t]["n_total"] == n
        assert abs(rows[t]["chi2"] - chi2) < 1e-4, t
        assert rows[t]["is_uniform"] == (
            rows[t]["chi2"] < CHI2_CRIT_6DOF), t


def test_ks_rejects_only_planted_source(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        KS_SHIFT_SRC,
    )
    rows = {r["source"]: r
            for r in api.q_doc_source_ks(spark, sf_dir).collect()}
    assert rows[KS_SHIFT_SRC]["reject"], rows[KS_SHIFT_SRC]
    for s, r in rows.items():
        assert 0.0 <= r["ks"] <= 1.0, r
        if s != KS_SHIFT_SRC:
            assert r["ks"] < rows[KS_SHIFT_SRC]["ks"], r


def test_psi_fires_only_on_planted_dim(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.similarity import (
        PSI_DIMS,
    )
    rows = {r["dim"]: r
            for r in api.q_embedding_drift_psi(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(PSI_DIMS))
    assert rows[0]["drift"], rows[0]
    for d in range(1, PSI_DIMS):
        assert not rows[d]["drift"], rows[d]
        assert rows[d]["psi"] < rows[0]["psi"]
