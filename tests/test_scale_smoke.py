"""sf0.1 smoke for the queries with DRIVER-SIDE data-dependent math.

The oracle gate proves correctness at sf0.001/sf0.01, but a
data-dependent driver computation can still blow up only at larger
scale — round 3's er_em_weights aborted ONLY at sf0.1, when EM drove a
u probability below the 6-dp grid and log2(m/0) threw. Every query
whose driver-side collect feeds scalar math gets a bench-scale .count()
here so that failure class lands in pytest, not in the bench run.
"""

from __future__ import annotations

import os

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark import api

SF01 = "/root/testdata/sf0.1"

# queries whose collected dimension feeds driver-side arithmetic
DRIVER_MATH = [
    "er_em_weights",     # EM recurrence + log-odds on pattern counts
    "tfidf_linking",     # idf = log(n/df) over the collected vocab
    "ann_ivf_topk",      # centroid collect + probed-list assignment
    "bt_ratings",        # Hunter MM on collected match counts
    "event_bandit",      # log over totals
]


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 absent")
@pytest.mark.parametrize("name", DRIVER_MATH)
def test_driver_math_queries_survive_sf01(spark, name):
    df = api.queries()[name](spark, SF01)
    assert df.count() > 0


# Round-5 extension (round-4 VERDICT item 3): every stats / forecast /
# sketch operator added since round 3 runs against its DuckDB oracle AT
# sf0.1, not just .count() — this family's failures are data-dependent
# (round 3's er_em_weights EM underflow, round 4's mad_outliers and SES
# zero-denominator/overflow findings all broke ONLY at scale), so the
# oracle diff itself must run at bench scale.
STATS_FORECAST_SKETCH = [
    "event_holt_forecast",
    "event_ses_forecast",
    "event_ses_backtest",
    "event_changepoint",      # CUSUM
    "doc_source_ks",          # Kolmogorov-Smirnov
    "embedding_drift_psi",    # population stability index
    "entity_drift",
    "event_cuped",
    "event_ab_srm",           # sample-ratio mismatch
    "event_anomaly_days",
    "event_approx_distinct",
    "event_approx_quantiles",
    "event_histogram",
    "event_outliers_mad",
    "event_power_analysis",
    "doc_cms_probe",          # count-min sketch
]


def _normalized(df):
    """The driver gate's compare shape (tools/verify_queries.py):
    sorted columns, 6-dp floats, stringified objects, row-sorted."""
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 absent")
@pytest.mark.parametrize("name", STATS_FORECAST_SKETCH)
def test_stats_oracle_parity_at_sf01(spark, name):
    import duckdb

    sdf = api.queries()[name](spark, SF01).toPandas()
    assert len(sdf) > 0
    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    for t in ("events", "documents", "embeddings", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF01}/{t}.parquet'")
    try:
        from cspirit_ontology_information_extraction_opus4plan_spark import (
            oracle_sqls,
        )
        ddf = con.execute(oracle_sqls.oracle_sql()[name]).df()
    finally:
        con.close()
    a, b = _normalized(sdf), _normalized(ddf)
    assert len(a) == len(b), (name, len(a), len(b))
    assert list(a.columns) == list(b.columns), name
    import pandas.testing as pdt
    pdt.assert_frame_equal(a, b, check_dtype=False,
                           check_exact=False, atol=1e-6, rtol=1e-6)
