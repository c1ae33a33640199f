"""Semantic guarantees of the ER / experimentation / Gopher tranche —
properties the oracle hash-compare can't articulate:

  * Fellegi-Sunter: every true pair that survives blocking scores as a
    match or possible; nation-corrupted keys (custkey%11==0) are the
    ONLY true pairs missing (blocking miss, not scoring miss); the
    all-agree score equals the sum of the three agreement weights,
  * blocking quality: adding a blocking attribute monotonically raises
    the reduction ratio and can only lower pairs completeness; the
    nation scheme's truth misses are exactly the %11 corruptions,
  * CUPED: theta equals the numpy pre/post covariance ratio and the
    variance-reduction estimate is rho^2 in [0, 1],
  * CUSUM changepoint: for a planted step series, the flagged day is
    the step boundary and the cusum magnitude matches the closed form,
  * Gopher rules: crafted documents fail exactly the rule they violate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    entity_resolution as ER,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
    gopher_rules,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
    cusum_changepoints,
)


def test_fs_true_pairs_score_and_blocking_misses(spark, sf_dir):
    rows = api.q_er_fellegi_sunter(spark, sf_dir).collect()
    assert rows
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    all_keys = {r["c_custkey"] for r in cust.select("c_custkey").collect()}
    true_found = {r["key_a"] for r in rows if r["is_true"]}
    missing = all_keys - true_found
    # every missing true pair is a nation corruption (blocking miss)
    assert missing == {k for k in all_keys if k % 11 == 0}
    # all-agree pairs score the exact sum of agreement weights
    wa = sum(w[0] for w in ER.FS_W.values())
    for r in rows:
        if r["agree_name"] and r["agree_bal"] and r["agree_seg"]:
            assert abs(r["score"] - round(wa, 6)) < 1e-9
        assert r["score"] >= ER.FS_POSSIBLE_T
        assert r["decision"] in ("match", "possible")
        if r["decision"] == "match":
            assert r["score"] >= ER.FS_MATCH_T


def test_blocking_quality_tradeoff(spark, sf_dir):
    rows = {r["scheme"]: r
            for r in api.q_er_blocking_quality(spark, sf_dir).collect()}
    nat, ns = rows["nation"], rows["nation_segment"]
    assert ns.reduction_ratio > nat.reduction_ratio
    assert ns.pairs_completeness <= nat.pairs_completeness
    assert ns.n_candidates < nat.n_candidates
    # nation misses exactly the %11 corruptions (actual keys, which
    # need not be contiguous from 1)
    keys = [r["c_custkey"] for r in
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey").collect()]
    n_miss = sum(1 for k in keys if k % 11 == 0)
    assert nat.truth_found == nat.n_truth - n_miss


def test_cuped_matches_numpy_and_bounds(spark, sf_dir):
    out = {r["arm"]: r for r in api.q_event_cuped(spark, sf_dir).collect()}
    assert set(out) == {"A", "B"}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    pre = ev["ts"] < np.datetime64("2024-01-16")
    ev["x"] = np.where(pre, ev["cents"], 0)
    ev["y"] = np.where(pre, 0, ev["cents"])
    pu = ev.groupby("user_id")[["x", "y"]].sum()
    x, y = pu["x"].to_numpy(float), pu["y"].to_numpy(float)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    got = out["A"]
    assert abs(got.theta - theta) < 1e-4
    assert abs(got.var_reduction - rho2) < 1e-4
    assert 0.0 <= got.var_reduction <= 1.0
    assert got.theta == out["B"].theta


def test_cusum_finds_planted_step(spark):
    # 10 days at 5 events/day then 10 days at 15 -> cp at the last
    # low day (cusum is most negative at the boundary)
    rows = []
    eid = 0
    for d in range(20):
        n = 5 if d < 10 else 15
        for i in range(n):
            rows.append((eid, f"2024-02-{d + 1:02d} 0{i % 10}:00:00",
                         1, "step", 1.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = cusum_changepoints(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_day"] == "2024-02-10"
    # closed form: prefix(10) = 50, k=10, mean = 200/20 = 10 -> -50
    assert abs(r["cusum"] - (-50.0)) < 1e-9
    assert r["mean_daily"] == 10.0 and r["n_days"] == 20


def test_gopher_rules_fail_specific_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog ran to the park today"),
            (2, "a b c d e f g h i j k l m n o p"),        # short words
            (3, "#### #### " + "the and of to is on for a in with " * 3),
            (4, "zz " * 5),                                  # too few words
            (5, "- one\n- two\n- three\n- four\nthe and of to is on for"
                " a in with plain line here"),
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_word_len"] and not out[2]["ok_stopwords"]
    assert not out[3]["ok_symbols"]
    assert not out[4]["ok_words"]
    assert out[5]["ok_bullets"]  # 4 of 5 lines bulleted, under the 0.9 cap


def test_em_learns_separating_parameters(spark, sf_dir):
    """Unsupervised EM must recover m >> u on every field (agreement
    is far likelier among matches) and a lambda near the true match
    rate of the blocked candidate space."""
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    rows = {r["field"]: r
            for r in api.q_er_em_weights(spark, sf_dir).collect()}
    assert set(rows) == {"name", "bal", "seg"}
    lam = next(iter(rows.values()))["lam"]
    assert 0.0 < lam < 0.5
    for f, r in rows.items():
        assert r["m"] > r["u"], f
        assert r["w_agree"] > 0.0 > r["w_disagree"], f
        assert r["lam"] == lam            # shared across fields
        assert r["n_pairs"] > 0
