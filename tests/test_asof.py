"""as-of join: tie semantics (<=, greatest-seq wins), null when no
prior right row, multi-key grouping, and the no-join plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.asof import (
    asof_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d"), (3, 1, "e")],
        "key int, ts int, name string")
    right = spark.createDataFrame(
        # key 1: rows at ts 4, 10 (two rows: seq 1 and 2), 15
        # key 2: row after the left row only; key 3 absent entirely
        [(1, 4, 1, 40.0), (1, 10, 1, 100.0), (1, 10, 2, 101.0),
         (1, 15, 1, 150.0), (2, 9, 1, 90.0)],
        "key int, ts int, seq int, price double")
    return left, right


def test_asof_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="key", payload=["price"],
                    right_seq="seq").toPandas()
    got = {r["name"]: r["asof_price"] for _, r in out.iterrows()}
    assert got["a"] == 40.0          # latest at-or-before ts=5 is ts=4
    assert got["b"] == 101.0         # tie at ts=10 matches; seq=2 wins
    assert got["c"] == 150.0         # skips ahead to ts=15
    assert pd.isna(got["d"])         # right row exists but only AFTER
    assert pd.isna(got["e"])         # key absent from right
    assert len(out) == 5             # left rows preserved exactly
    assert set(out.columns) == {"key", "ts", "name", "asof_price"}


def test_asof_multi_payload_and_defaults(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], payload=["price", "seq"],
                    right_seq="seq", prefix="last_").toPandas()
    row_b = out[out["name"] == "b"].iloc[0]
    assert row_b["last_price"] == 101.0 and row_b["last_seq"] == 2


def test_asof_requires_payload(frames):
    left, right = frames
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, on="key")


def test_asof_plan_has_no_join(frames):
    """The whole point: an as-of is ONE shuffle + window, not a join
    node that can blow up per-key."""
    left, right = frames
    plan = (asof_join(left, right, on="key", payload=["price"])
            ._jdf.queryExecution().executedPlan().toString())
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    assert plan.count("Exchange hashpartitioning") <= 2  # one per union leg
    assert "RunningWindowFunction" in plan or "Window" in plan
