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


def test_minhash_store_band_join_is_exchange_free(spark, sf_dir):
    """Round-5 priority 4: the delta near-dup's corpus-side band join
    reads the PUBLISHED bucketed signature store with no shuffle — the
    store scan's ancestors up to its SortMergeJoin contain no Exchange
    (only the small delta side shuffles), and the store-backed result
    equals the recompute path exactly."""
    from pyspark.sql import functions as F

    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        textops as T,
    )
    docs = DE.augmented_docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 10 >= 3)
    delta = docs.filter(F.col("doc_id") % 10 < 3)
    T.publish_minhash_store(old, prefix="bkt_mh_test")
    try:
        with _conf(spark,
                   **{"spark.sql.autoBroadcastJoinThreshold": "-1",
                      "spark.sql.adaptive.enabled": "false"}):
            out = T.minhash_delta_pairs_from_store(
                spark, delta, prefix="bkt_mh_test")
            plan = out._jdf.queryExecution().executedPlan().toString()
            lines = plan.split("\n")

            def indent(line):
                for marker in ("+- ", ":- "):
                    if marker in line:
                        return line.index(marker)
                return -1

            scan_i = next(i for i, ln in enumerate(lines)
                          if "bkt_mh_test_bands" in ln
                          and "FileScan" in ln)
            assert "Bucketed: true" in lines[scan_i]
            cur = indent(lines[scan_i])
            ancestors = []
            for i in range(scan_i - 1, -1, -1):
                ind = indent(lines[i])
                if ind == -1 or ind >= cur:
                    continue
                cur = ind
                ancestors.append(lines[i])
                if "SortMergeJoin" in lines[i]:
                    break
            assert ancestors and "SortMergeJoin" in ancestors[-1]
            assert not any("Exchange" in a for a in ancestors), ancestors
            got = {(r["a"], r["b"], r["jaccard"])
                   for r in out.collect()}
        want = {(r["a"], r["b"], r["jaccard"])
                for r in T.minhash_delta_pairs(
                    docs, delta.select("doc_id")).collect()}
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_mh_test_bands")
        spark.sql("DROP TABLE IF EXISTS bkt_mh_test_sets")
