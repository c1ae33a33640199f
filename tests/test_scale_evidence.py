"""Scale-evidence gates: prove the two runtime behaviors the 100-TB
design leans on actually engage on this Spark build — AQE splits a
skewed join partition (the hub-key answer cited across the operator
docstrings), and narrow queries prune the document scan to the columns
they read."""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api


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


def test_aqe_splits_planted_hub_join_key(spark):
    # 3/4 of the left lands on one key -> one reducer partition holds
    # ~150k rows while the median holds ~800. With the skew thresholds
    # scaled down to this sandbox's data size (they exist because 100-TB
    # defaults are in the 100 MB range), AQE must mark the hub
    # partition and split it (skew=true on the SortMergeJoin).
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 4 != 0, F.lit(0))
         .otherwise(F.col("id") % 64).alias("k"),
        F.col("id").alias("v"))
    right = spark.range(0, 64).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    with _conf(spark,
               **{"spark.sql.autoBroadcastJoinThreshold": "-1",
                  "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                  "spark.sql.adaptive.skewJoin."
                  "skewedPartitionThresholdInBytes": "32k",
                  "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k"}):
        joined = left.join(right, "k")
        # execute THIS DataFrame's QueryExecution (count() would build
        # its own), then read the final adaptive plan off it
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]


def test_narrow_doc_query_prunes_scan_columns(spark, sf_dir):
    # documents.parquet carries (doc_id, text, lang, source, n_chars);
    # a text-only query's parquet scan must read only what it uses —
    # at 100 TB reading two dead columns is a double-digit-percent tax
    df = api.q_doc_lang_id(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    doc_scans = [s for s in schemas if "text" in s or "doc_id" in s]
    assert doc_scans, plan[:2000]
    for s in doc_scans:
        assert "source" not in s and "n_chars" not in s, s
