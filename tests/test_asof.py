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


def test_asof_null_payload_field_same_row(spark):
    """A right row with NULL in one payload column must still supply ALL
    payload values (row-level semantics): the matched seq=2 row carries
    price=NULL, not seq from row 2 and price from row 1 (the per-column
    carry bug the struct carry-forward fixes)."""
    left = spark.createDataFrame([(1, 10, "x")],
                                 "key int, ts int, name string")
    right = spark.createDataFrame(
        [(1, 4, 1, 40.0), (1, 8, 2, None)],
        "key int, ts int, seq int, price double")
    out = asof_join(left, right, on="key", payload=["price", "seq"],
                    right_seq="seq").toPandas()
    row = out.iloc[0]
    assert row["asof_seq"] == 2
    assert pd.isna(row["asof_price"])


def test_asof_hub_key_split_identical(spark):
    """Range-splitting a hub key (one key holding nearly every row,
    including buckets with no right rows, forcing the boundary
    hand-off) returns exactly the unsplit output."""
    left = spark.createDataFrame(
        [(1, t, f"L{t:03d}") for t in range(0, 100, 3)] + [(2, 50, "o")],
        "key int, ts int, name string")
    right = spark.createDataFrame(
        [(1, t, t, float(t)) for t in range(0, 100, 25)]
        + [(2, 49, 1, 9.0)],
        "key int, ts int, seq int, price double")
    cols = ["key", "ts", "name", "asof_price"]

    def run(**kw):
        return (asof_join(left, right, on="key", payload=["price"],
                          right_seq="seq", **kw)
                .toPandas()[cols]
                .sort_values(cols[:3]).reset_index(drop=True))

    pd.testing.assert_frame_equal(run(), run(split_bucket_s=10))


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
