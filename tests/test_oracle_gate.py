"""Universal Spark-vs-DuckDB parity gate: every queries() entry runs
against its oracle_sql() twin at sf0.001 — the same comparison the
driver's CORRECTNESS gate performs at sf0.01 (sorted columns, rounded
floats, full-frame equality). Parametrized so a regression names the
exact query."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

from .conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
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


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_every_query_has_an_oracle():
    missing = sorted(set(_QUERIES) - set(_ORACLES))
    assert not missing, f"queries without oracle_sql: {missing}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    got = _normalize(_QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(_ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bench_roster_queries_all_exist():
    """Every bench.py HEADLINE entry must resolve to a queries()
    entry (a stale roster name would silently drop a headline metric
    from BENCH_r{N}.json rather than fail)."""
    import bench
    missing = [q for q in bench.HEADLINE if q not in _QUERIES]
    assert not missing, missing
