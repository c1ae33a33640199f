"""Semantic guarantees of the closeout statistics tranche:

  * the histogram re-totals to the row count and bins are in range,
  * the DP release's noise is Laplace-shaped (sign-symmetric formula)
    and released = true + noise exactly,
  * BPE merge application never increases symbols and the merge list
    has exactly k ranked entries,
  * SPRT decisions are consistent with the reported llr and the Wald
    bounds, and llr telescopes (each day's increment matches its
    (n, s) row),
  * the SES backtest's MAE/RMSE obey RMSE >= MAE > 0 and skill =
    mae / mae_naive.
"""

from __future__ import annotations

import math

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (  # noqa: E501
    SPRT_ALPHA,
    SPRT_BETA,
    SPRT_P0,
    SPRT_P1,
)


def test_histogram_retotals_and_bins_in_range(spark, sf_dir):
    rows = api.q_event_histogram(spark, sf_dir).collect()
    assert rows
    total = sum(r["n"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
    for r in rows:
        assert 0 <= r["bin"] <= 11


def test_dp_release_is_true_plus_noise(spark, sf_dir):
    rows = api.q_event_dp_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["released_n"] - (r["true_n"] + r["noise"])) < 2e-6
        assert abs(r["noise"]) < 20.0   # Lap(1) tail at 5 types


def test_bpe_apply_compresses(spark, sf_dir):
    row = api.q_doc_bpe_apply(spark, sf_dir).collect()[0]
    assert row["syms_after"] <= row["syms_before"]
    assert row["compression"] >= 1.0
    merges = row["merges"].split(",")
    assert len(merges) == 8
    assert [m.split(":")[0] for m in merges] == [
        f"{i:02d}" for i in range(1, 9)]


def test_sprt_decisions_match_bounds(spark, sf_dir):
    hi = math.log((1.0 - SPRT_BETA) / SPRT_ALPHA)
    lo = math.log(SPRT_BETA / (1.0 - SPRT_ALPHA))
    l_s = math.log(SPRT_P1 / SPRT_P0)
    l_f = math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
    rows = api.q_event_sprt(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for hist in by_type.values():
        hist.sort(key=lambda r: r["day"])
        prev = 0.0
        for r in hist:
            inc = r["s"] * l_s + (r["n"] - r["s"]) * l_f
            assert abs(r["llr"] - round(prev + inc, 6)) < 1e-4
            prev = prev + inc
            want = ("accept_h1" if r["llr"] >= hi
                    else "accept_h0" if r["llr"] <= lo else "continue")
            assert r["decision"] == want, r


def test_backtest_error_identities(spark, sf_dir):
    rows = api.q_event_ses_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rmse"] >= r["mae"] > 0
        assert abs(r["skill"] - round(r["mae"] / r["mae_naive"], 2)) < 0.05
