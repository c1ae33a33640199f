"""Bucketed serving layout: the subject shuffle is paid at write time,
and subject-keyed joins between same-bucketed tables run with NO
shuffle exchange (plans/bucketing.py)."""

from __future__ import annotations

from contextlib import contextmanager

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.plans import (
    bucketing,
)


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_self_join_has_no_shuffle_and_matches(spark, sf_dir):
    t = api.dedup_triples(api.triples_df(spark, sf_dir))
    bucketing.write_bucketed(t, "bkt_triples_l", n_buckets=4)
    bucketing.write_bucketed(t.selectExpr("subject", "predicate",
                                          "object"),
                             "bkt_triples_r", n_buckets=4)
    try:
        # force the SortMergeJoin path (a broadcast would trivially have
        # no shuffle) and freeze AQE so the asserted plan is the static
        # one the bucketing layout produces
        with _conf(spark,
                   **{"spark.sql.autoBroadcastJoinThreshold": "-1",
                      "spark.sql.adaptive.enabled": "false"}):
            joined = bucketing.bucket_local_join(
                spark, "bkt_triples_l", "bkt_triples_r")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucket-local: no shuffle
            n_bucketed = joined.count()
        # ground truth: the same join over plain (unbucketed) frames
        r = t.selectExpr("subject", "predicate as r_predicate",
                         "object as r_object")
        n_plain = t.join(r, "subject").count()
        assert n_bucketed == n_plain and n_bucketed > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_triples_l")
        spark.sql("DROP TABLE IF EXISTS bkt_triples_r")


def test_mismatched_bucket_counts_still_correct(spark, sf_dir):
    # both sides must share N for exchange-free joins; a mismatch keeps
    # results correct (Spark re-shuffles one side) — the layout is an
    # optimization, never a correctness dependency
    t = api.dedup_triples(api.triples_df(spark, sf_dir))
    bucketing.write_bucketed(t, "bkt_a", n_buckets=4)
    bucketing.write_bucketed(t.selectExpr("subject", "object"),
                             "bkt_b", n_buckets=2)
    try:
        joined = bucketing.bucket_local_join(spark, "bkt_a", "bkt_b")
        expect = t.join(t.selectExpr("subject", "object as r_object"),
                        "subject").count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
