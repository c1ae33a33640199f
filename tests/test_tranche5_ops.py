"""Semantics pins for the round-3 fifth tranche: grouped distributed
ntile, CCNet per-language perplexity tiers, watermark-lateness audit,
TransE-energy triple plausibility."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
    grouped_ntile, watermark_audit,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (
    triple_plausibility,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
    ccnet_ppl_buckets,
)


def test_grouped_ntile_matches_native_window(spark):
    # skewed groups: 97 rows in 'a', 5 in 'b', 1 in 'c'
    rows = [("a", i) for i in range(97)] + \
           [("b", i) for i in range(5)] + [("c", 0)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = grouped_ntile(df, "g", [F.col("v")], 4, out_col="b4",
                        num_partitions=8)
    want = df.withColumn(
        "w", F.ntile(4).over(Window.partitionBy("g").orderBy("v")))
    j = got.join(want, ["g", "v"])
    assert j.filter(F.col("b4") != F.col("w")).count() == 0
    assert j.count() == 103


def test_ccnet_buckets_tiers_are_ordered_and_balanced(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr",
          "common common common" if i < 6 else f"rare{i} word{i} x{i}")
         for i in range(12)],
        "doc_id bigint, lang string, text string")
    out = ccnet_ppl_buckets(docs).collect()
    assert len(out) == 12
    for lang in ("en", "fr"):
        rows = sorted([r for r in out if r.lang == lang],
                      key=lambda r: (r.cross_entropy, r.doc_id))
        assert [r.bucket for r in rows] == ["head"] * 2 + \
            ["middle"] * 2 + ["tail"] * 2
        # head tier = lowest cross-entropy (the common-token docs)
        assert rows[0].cross_entropy <= rows[-1].cross_entropy


def test_watermark_audit_hand_planted_lateness(spark):
    t0 = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    # arrival order: e0(t+0), e2(t+2000), e3(t+9000), e1(t+10) late
    rows = [(0, t0, "a", 0), (1, t0 + 10 * sec, "a", 3),
            (2, t0 + 2000 * sec, "a", 1), (3, t0 + 9000 * sec, "a", 2)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, "
              "arrival_seq bigint")
    r = watermark_audit(ev).collect()[0]
    # e1 arrives last: hwm = t+9000, lateness = 8990 s -> late, dropped
    # at 30 min and 2 h thresholds both
    assert r.n_events == 4 and r.n_late == 1
    assert r.n_dropped_1800s == 1 and r.n_dropped_7200s == 1
    assert r.max_lateness_s == 8990


def test_triple_plausibility_invariants(spark):
    rows = [(f"E{i}", "is_a", f"F{i % 7}") for i in range(40)] + \
           [(f"E{i}", "rare_p", "X") for i in range(3)]  # < min_n
    t = spark.createDataFrame(
        rows, "subject string, predicate string, object string")
    out = triple_plausibility(t).collect()
    # rare_p (3 triples) filtered by the min-n guard
    assert {r.predicate for r in out} == {"is_a"}
    assert len(out) == 40
    for r in out:
        assert 0.0 <= r.energy < 2.0 * 8  # L1 of 8 dims in [-1,1)
        assert r.implausible == (abs(r.z) > 2.0)
    # sample z-scores center near zero
    zs = [r.z for r in out]
    assert abs(sum(zs) / len(zs)) < 0.3
