"""Semantics pins for the table-maintenance planners and the
incremental-crawl delta."""

from __future__ import annotations

from cspirit_ontology_information_extraction_opus4plan_spark.operators.maintenance import (
    file_compaction_plan, snapshot_expiry_orphans,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.webingest import (
    recrawl_diff,
)


def test_compaction_first_fit_groups(spark):
    # partition p: sizes 200+200+200 -> cum-before 0/200/400 all in
    # group 0; next 200 has cum 600 -> group 1; 900 passes through
    rows = [("p", i, 200) for i in range(4)] + [("p", 9, 900),
                                                ("q", 1, 10)]
    files = spark.createDataFrame(
        rows, "part string, file_id bigint, size_bytes bigint")
    out = {(r.part, r.file_id): r for r in
           file_compaction_plan(files, target_bytes=512).collect()}
    assert [out[("p", i)].group_id for i in range(4)] == [0, 0, 0, 1]
    assert all(out[("p", i)].action == "compact" for i in range(4))
    assert out[("p", 9)].action == "keep"
    assert out[("p", 9)].group_id is None
    assert out[("q", 1)].group_id == 0   # groups restart per partition


def test_snapshot_expiry_orphan_detection(spark):
    # snapshots 0..9, retain 7/8/9: file A removed at 5 -> orphan
    # (last ref 4); B live (NULL) -> retained; C removed at 9 ->
    # retained (referenced by 7 and 8, last ref 8)
    rows = [(1, "p", 10, 2, 5), (2, "p", 10, 0, None), (3, "p", 10, 3, 9)]
    m = spark.createDataFrame(
        rows, "file_id bigint, part string, size_bytes bigint, "
              "added_snap bigint, removed_snap bigint")
    out = {r.file_id: r for r in snapshot_expiry_orphans(m).collect()}
    assert out[1].status == "orphan" and out[1].last_snap == 4
    assert out[2].status == "retained" and out[2].last_snap == 9
    assert out[3].status == "retained" and out[3].last_snap == 8


def test_recrawl_diff_statuses(spark):
    r1 = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "dropped")],
        "doc_id bigint, text string")
    r2 = spark.createDataFrame(
        [(1, "same"), (2, "new content"), (4, "fresh")],
        "doc_id bigint, text string")
    out = {r.doc_id: r.status for r in recrawl_diff(r1, r2).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "gone", 4: "new"}


def test_partition_evolution_amplification(spark, sf_dir):
    """Spec-0 (day-only) files must show strictly higher read
    amplification than spec-1 ((day, type)) files for the type
    filter, and spec-1 must prune files spec-0 cannot."""
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    rows = {r["spec"]: r
            for r in api.q_partition_evolution(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    s0, s1 = rows[0], rows[1]
    assert s0["read_amplification"] > s1["read_amplification"]
    # spec 1 reads only the purchase partition of each in-range day
    assert s1["n_files_read"] < s1["n_files"]
    assert s1["rows_scanned"] == s1["rows_matched"]
    # spec 0 must scan whole day files
    assert s0["rows_scanned"] > s0["rows_matched"] > 0
