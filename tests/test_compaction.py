"""Compaction planner: metadata-only grouping invariants + a real
listing over a materialized checkpointed triple table."""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.plans import (
    compaction,
)


def _meta(spark, rows):
    return spark.createDataFrame(
        rows, "file_path string, partition string, bytes long")


def test_plan_invariants(spark):
    rows = ([(f"p0/f{i:03d}.parquet", "p0", 40) for i in range(10)]
            + [("p1/big.parquet", "p1", 500),
               ("p1/tiny.parquet", "p1", 1)])
    plan = compaction.compaction_plan(_meta(spark, rows),
                                      target_bytes=100).toPandas()
    # every file exactly once
    assert sorted(plan.file_path) == sorted(r[0] for r in rows)
    # deterministic: replanning the same listing is byte-identical
    again = compaction.compaction_plan(_meta(spark, rows),
                                       target_bytes=100).toPandas()
    assert plan.sort_values("file_path").reset_index(drop=True).equals(
        again.sort_values("file_path").reset_index(drop=True))
    # p0: 10 x 40 bytes at target 100 -> boundaries at cumsum 0,40,80|
    # 120,160|... => groups of 3,2,3,2 (next-fit on preceding cumsum)
    g = plan[plan.partition == "p0"].groupby("group_id").size()
    assert g.sum() == 10 and g.max() <= 3
    # oversized file sits alone; group bytes < target + max_file
    summ = compaction.plan_summary(
        compaction.compaction_plan(_meta(spark, rows), target_bytes=100),
        target_bytes=100).toPandas()
    big = summ[(summ.partition == "p1")]
    assert (big.group_bytes < 100 + 500).all()
    mx = plan[plan.bytes == 500]
    assert len(plan[(plan.partition == "p1")
                    & (plan.group_id == mx.group_id.iloc[0])]) <= 2


def test_plan_over_real_materialized_table(spark, tmp_path):
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    from cspirit_ontology_information_extraction_opus4plan_spark.plans.checkpointing import (
        materialize_triples,
    )

    t = api.q_triples(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "triples")
    materialize_triples(spark, t, out, n_parts=2,
                        sf_dir="/root/testdata/sf0.001")
    files = compaction.list_data_files(spark, out)
    n = files.count()
    assert n >= 2
    # marker/metadata paths (leading underscore) are not data files
    assert files.filter(
        F.col("file_path").contains("_checkpoints")).count() == 0
    plan = compaction.compaction_plan(files)
    assert plan.count() == n
    # everything is tiny at sf0.001: one group per partition, flagged
    summ = compaction.plan_summary(plan).toPandas()
    assert (summ.group_id == 0).all()
    assert (summ.needs_rewrite == 1).all()
