"""Degenerate-distribution parity rows for the stats operators whose
denominators can hit zero (ADVICE r03, medium): MAD = 0 (mad_outliers),
hi == lo (value_histogram), mean == 0 (power_analysis) — plus a >62-day
series proving the SES fold has no BIGINT-shift magnitude limit. Each
case runs the Spark operator AND the committed DuckDB oracle SQL on the
same synthesized events table, so the guard is pinned on BOTH engines
(Spark's non-ANSI '/' returns NULL where DuckDB's IEEE '/' returns
inf/nan and aborts on the int cast — the exact divergence class the
gate would otherwise only discover on unlucky data)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from cspirit_ontology_information_extraction_opus4plan_spark import (
    oracle_sqls,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    content_stats as CS,
)

_ORACLES = oracle_sqls.oracle_sql()


def _events_pdf() -> pd.DataFrame:
    rows = []
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def add(event_type, values, day_step=0):
        for i, v in enumerate(values):
            rows.append({
                "event_id": len(rows),
                "ts": t0 + dt.timedelta(days=i * day_step, minutes=i),
                "user_id": i % 3,
                "event_type": event_type,
                "value": float(v),
                "props": "{}",
            })

    # all-identical values: MAD = 0 AND hi == lo
    add("const", [7.5] * 6)
    # >half the values equal the median but min != max: MAD = 0,
    # histogram path non-degenerate
    add("madzero", [5.0, 5.0, 5.0, 5.0, 1.0, 9.0])
    # exactly-zero mean (exact binary fractions): delta^2 = 0
    add("zeromean", [-1.0, 1.0, -2.0, 2.0])
    # ordinary varying series: the guards must not perturb it
    add("normal", [1.0, 2.0, 3.0, 4.0, 100.0])
    # 80 distinct days, one event per day: the old closed-form SES
    # oracle's BIGINT shift overflows at day 63 — the fold must not
    add("long", [(i % 7) + 1 for i in range(80)], day_step=1)
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def deg(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("deg") / "events.parquet"
    pdf = _events_pdf()
    # Spark's parquet reader rejects TIMESTAMP(NANOS)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path)
    ev = spark.read.parquet(str(path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    yield ev, con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _parity(spark_df, con, oracle_name):
    got = _norm(spark_df.toPandas())
    want = _norm(con.execute(_ORACLES[oracle_name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_mad_outliers_mad_zero(deg):
    ev, con = deg
    got = _parity(CS.mad_outliers(ev), con, "event_outliers_mad")
    by_type = got.set_index("event_type")
    assert by_type.loc["const", "mad"] == 0.0
    assert by_type.loc["madzero", "mad"] == 0.0
    assert by_type.loc["const", "n_outliers"] == 0
    assert by_type.loc["madzero", "n_outliers"] == 0
    assert pd.isna(by_type.loc["const", "max_modified_z"])
    assert by_type.loc["normal", "n_outliers"] == 1  # the 100.0


def test_histogram_constant_type(deg):
    ev, con = deg
    got = _parity(CS.value_histogram(ev), con, "event_histogram")
    const = got[got["event_type"] == "const"]
    assert list(const["bin"]) == [0]
    assert list(const["n"]) == [6]
    assert list(const["bin_lo"]) == [7.5]


def test_power_analysis_zero_mean(deg):
    ev, con = deg
    got = _parity(CS.power_analysis(ev), con, "event_power_analysis")
    by_type = got.set_index("event_type")
    assert pd.isna(by_type.loc["zeromean", "n_per_arm"])
    assert pd.isna(by_type.loc["zeromean", "days_to_power"])
    assert by_type.loc["normal", "n_per_arm"] > 0


def test_ses_fold_past_62_days(deg):
    ev, con = deg
    got = _parity(CS.ses_forecast(ev), con, "event_ses_forecast")
    long = got[got["event_type"] == "long"].sort_values("day")
    assert len(long) == 80
    # the smoother stays inside the data range — an overflow would
    # produce wild magnitudes (the old closed form wrapped negative)
    assert long["smoothed"].between(1.0, 7.0).all()
    _parity(CS.ses_backtest(ev), con, "event_ses_backtest")


def test_holt_fold_length_matches_series(deg):
    ev, con = deg
    got = _parity(CS.holt_forecast(ev), con, "event_holt_forecast")
    assert int(got.set_index("event_type").loc["long", "n_days"]) == 80
