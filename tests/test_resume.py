"""Kill/resume invariant (north_rule): a run interrupted after k
partitions, then resumed, produces a final table identical to a
single-shot run — and completed partitions are not recomputed."""

from __future__ import annotations

import json
import os

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.plans import (
    checkpointing as CK,
)

N_PARTS = 8


def _rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def test_kill_and_resume_identical(spark, sf_dir, tmp_path):
    triples = api.triples_df(spark, sf_dir)

    # single-shot reference run
    full = str(tmp_path / "full")
    s1 = CK.materialize_triples(spark, triples, full,
                                sf_dir=sf_dir, n_parts=N_PARTS)
    assert sorted(s1["written"]) == list(range(N_PARTS))

    # interrupted run: only half the partitions complete ("kill")
    part = str(tmp_path / "part")
    s2 = CK.materialize_triples(spark, triples, part, sf_dir=sf_dir,
                                n_parts=N_PARTS,
                                only_parts=list(range(N_PARTS // 2)))
    assert sorted(s2["written"]) == list(range(N_PARTS // 2))
    assert CK.pending_partitions(spark, part, N_PARTS) == \
        list(range(N_PARTS // 2, N_PARTS))

    # resume: remaining partitions only; completed ones skipped
    s3 = CK.materialize_triples(spark, triples, part,
                                sf_dir=sf_dir, n_parts=N_PARTS)
    assert sorted(s3["written"]) == list(range(N_PARTS // 2, N_PARTS))
    assert sorted(s3["skipped"]) == list(range(N_PARTS // 2))

    # identical final content
    assert _rows(spark, part) == _rows(spark, full)

    # checkpoint markers carry lineage + metrics
    with open(os.path.join(part, CK.CKPT_DIR, "part_00000.json")) as f:
        marker = json.load(f)
    assert marker["status"] == "complete"
    assert marker["lineage"]["input_sf_dir"] == sf_dir
    assert marker["metrics"]["n_rows"] >= 0

    # fully-resumed table: another run is a no-op
    s4 = CK.materialize_triples(spark, triples, part,
                                sf_dir=sf_dir, n_parts=N_PARTS)
    assert s4["written"] == []


def test_graph_serving_layout(spark, sf_dir, tmp_path):
    """publish_graph_layout: predicate-pruned, subject-sorted, bounded
    file count — the Iceberg partition-spec/sort-order analog."""
    from pyspark.sql import functions as F

    triples = api.q_triples_dedup(spark, sf_dir)
    out = str(tmp_path / "graph")
    stats = CK.publish_graph_layout(triples, out, files_per_predicate=3)
    assert stats["rows"] == triples.count()

    back = spark.read.parquet(out)
    preds = [r["predicate"] for r in
             triples.select("predicate").distinct().collect()]
    assert stats["n_predicates"] == len(preds)
    # bounded files per predicate directory
    assert stats["n_files"] <= 3 * len(preds)

    # partition pruning: the per-predicate filter reaches the scan as a
    # partition filter, not a data filter
    one = back.filter(F.col("predicate") == preds[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(predicate" in plan
    assert one.count() == \
        triples.filter(F.col("predicate") == preds[0]).count()

    # subject-sorted within every file (parquet min/max stats usable)
    import glob as _glob

    import pyarrow.parquet as pq
    for f in _glob.glob(f"{out}/predicate=*/*.parquet"):
        subj = pq.read_table(f, columns=["subject"])["subject"] \
            .to_pylist()
        assert subj == sorted(subj)
