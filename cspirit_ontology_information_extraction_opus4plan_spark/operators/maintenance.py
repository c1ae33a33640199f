"""Table-maintenance planners — the housekeeping side of a 100-TB
lakehouse the query operators assume has already happened: small-file
compaction planning and snapshot-expiry orphan detection (the
Iceberg/Delta OPTIMIZE and EXPIRE SNAPSHOTS decisions, planned here as
deterministic DataFrame jobs so they can run as scheduled Spark
maintenance). No reference counterpart (the reference is a
single-process library); these pair with olap.zorder_prune_stats —
that one measures layout quality, these plan the writes that keep it.

Both are per-partition window/join plans: compaction is inherently
sequential WITHIN a partition (bin-packing is a running sum) and
embarrassingly parallel across partitions; expiry is an explode +
anti-join whose snapshot dimension is bounded by the table's snapshot
count, never by data.

Relationship to plans/compaction.py: that module is the ENGINE path —
it lists real parquet files through Hadoop's FileSystem API and drives
a resumable group-by-group rewrite of the triple store. This module is
the oracle-gated planning SEMANTICS over a manifest TABLE (any
(part, file_id, size) frame), adding the OPTIMIZE-style at-target
'keep' exclusion the rewrite path doesn't need; the grouping rule
(next-fit on preceding cumulative size) is deliberately the same so
both paths produce the same groups for the same sub-target listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["file_compaction_plan", "snapshot_expiry_orphans"]

COMPACT_TARGET_BYTES = 512
SNAPSHOT_MAX = 10       # snapshots 0..9 exist
SNAPSHOT_RETAIN = 3     # keep the newest 3 (7, 8, 9)


def file_compaction_plan(files: DataFrame,
                         target_bytes: int = COMPACT_TARGET_BYTES
                         ) -> DataFrame:
    """Small-file compaction planner: within each table partition,
    stream the sub-target files in file order and close a compaction
    group every time the cumulative size crosses the target — the
    standard first-fit bin-pack every OPTIMIZE implementation runs.
    Files already at/over target pass through as 'keep' with no
    group. Emits (part, file_id, size_bytes, action, group_id).

    group_id = floor(preceding-cumulative-size / target) is the
    closed-form of the sequential packing, so the whole plan is ONE
    running-sum window per partition — no iterative driver loop. A
    partition's plan is serial by nature (groups depend on prefix
    sums); partitions plan in parallel."""
    small = files.filter(F.col("size_bytes") < target_bytes)
    big = files.filter(F.col("size_bytes") >= target_bytes)
    w = (Window.partitionBy("part").orderBy("file_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("size_bytes").over(w), F.lit(0))
    planned = small.select(
        "part", "file_id", "size_bytes",
        F.lit("compact").alias("action"),
        F.floor(cum_before / target_bytes).cast("bigint")
        .alias("group_id"))
    passthru = big.select(
        "part", "file_id", "size_bytes",
        F.lit("keep").alias("action"),
        F.lit(None).cast("bigint").alias("group_id"))
    return planned.unionByName(passthru)


def snapshot_expiry_orphans(manifest: DataFrame,
                            snapshot_max: int = SNAPSHOT_MAX,
                            retain: int = SNAPSHOT_RETAIN) -> DataFrame:
    """EXPIRE SNAPSHOTS orphan audit: given a file manifest with each
    file's added/removed snapshot ids, explode the (snapshot, file)
    reference table, keep the references of the `retain` newest
    snapshots, and anti-join the manifest against them — files no
    retained snapshot references are safe to physically delete. Emits
    every file with status 'retained' or 'orphan' plus its last
    referencing snapshot, so the reclaim job and the audit trail come
    from one pass.

    The explode fans each file out to at most `snapshot_max` rows (a
    table constant, not data-dependent), and the anti-join is an equi
    semi-join on file_id — fully shuffle-partitionable; the retained
    snapshot-id set is a literal predicate, not a join."""
    cutoff = snapshot_max - retain
    live_until = F.coalesce(F.col("removed_snap") - 1,
                            F.lit(snapshot_max - 1))
    refs = manifest.select(
        "file_id",
        F.explode(F.sequence(F.col("added_snap"),
                             live_until)).alias("snap"))
    retained_files = (refs.filter(F.col("snap") >= cutoff)
                      .select("file_id").distinct())
    last_ref = refs.groupBy("file_id").agg(
        F.max("snap").cast("bigint").alias("last_snap"))
    status = (manifest.join(retained_files.withColumn(
        "__r", F.lit(True)), "file_id", "left")
        .withColumn("status", F.when(F.col("__r").isNotNull(),
                                     F.lit("retained"))
                    .otherwise(F.lit("orphan")))
        .drop("__r"))
    return (status.join(last_ref, "file_id")
            .select("file_id", "part", "size_bytes", "added_snap",
                    "removed_snap", "last_snap", "status"))


ERASE_MOD = 97   # deterministic deletion-request predicate


def erasure_cascade_audit(spark, sf_dir: str,
                          erase_mod: int = ERASE_MOD) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given the deletion-request
    set (customers with custkey % erase_mod == 0 — a deterministic
    stand-in for the GDPR request table), count the blast radius per
    relation BEFORE running the deletes: customer rows directly,
    orders via o_custkey, lineitem via the TWO-HOP cascade through its
    order, events via user_id. Emits (relation, n_total, n_erased,
    erased_pct).

    Each probe is one semi-join count — the parent side is the
    request set (dimension-sized: 1/erase_mod of one key column), so
    every join broadcasts; the lineitem hop reuses the affected-order
    keys rather than re-deriving customers transitively. This is the
    audit a lakehouse runs to size a DELETE + VACUUM job; the deletes
    themselves are the same anti-joins, write-side."""
    from .relational import load_rel
    requests = (load_rel(spark, sf_dir, "customer")
                .filter(F.col("c_custkey") % erase_mod == 0)
                .select(F.col("c_custkey").alias("k")))
    customer = load_rel(spark, sf_dir, "customer")
    orders = load_rel(spark, sf_dir, "orders")
    lineitem = load_rel(spark, sf_dir, "lineitem")
    events = load_rel(spark, sf_dir, "events")
    hit_orders = (orders.join(
        F.broadcast(requests), orders["o_custkey"] == F.col("k"))
        .select("o_orderkey"))
    probes = [
        ("customer", customer,
         customer.join(F.broadcast(requests),
                       customer["c_custkey"] == F.col("k"), "left_semi")),
        ("orders", orders,
         orders.join(F.broadcast(requests),
                     orders["o_custkey"] == F.col("k"), "left_semi")),
        ("lineitem", lineitem,
         lineitem.join(F.broadcast(hit_orders),
                       lineitem["l_orderkey"] == F.col("o_orderkey"),
                       "left_semi")),
        ("events", events,
         events.join(F.broadcast(requests),
                     events["user_id"] == F.col("k"), "left_semi")),
    ]
    out = None
    for name, full, hit in probes:
        row = (spark.createDataFrame(
            [(name, full.count(), hit.count())],
            "relation string, n_total bigint, n_erased bigint")
            .select("*", F.round(F.col("n_erased").cast("double")
                                 / F.col("n_total"), 6)
                    .alias("erased_pct")))
        out = row if out is None else out.unionByName(row)
    return out


PE_CUTOVER = "2024-01-16"   # partition-spec change date
PE_FROM, PE_TO = "2024-01-08", "2024-01-24"
PE_TYPE = "purchase"


def partition_evolution_plan(events: DataFrame,
                             cutover: str = PE_CUTOVER,
                             d_from: str = PE_FROM, d_to: str = PE_TO,
                             etype: str = PE_TYPE) -> DataFrame:
    """Iceberg partition-spec-evolution read planning: files written
    BEFORE the cutover are partitioned by day alone (spec 0), files
    after by (day, event_type) (spec 1) — spec evolution never
    rewrites old files, so a reader filtering on (day range AND
    event_type) can prune spec-1 files on both keys but spec-0 files
    on day only, and must scan every matching-day spec-0 file
    whole. Emits one row per spec: file counts, files read, rows
    scanned vs rows actually matching, and the read amplification the
    un-rewritten layout costs — the number that prices an OPTIMIZE
    rewrite of the old spec (file_compaction_plan's sibling decision).

    The manifest derives deterministically from events (one file per
    partition tuple); everything is two map-side-combinable groupBys
    + a global per-spec aggregate."""
    day = F.to_date("ts")
    spec = F.when(day >= F.lit(cutover), 1).otherwise(0)
    part_type = F.when(day >= F.lit(cutover), F.col("event_type"))
    files = (events
             .groupBy(spec.alias("spec"), day.alias("day"),
                      part_type.alias("part_type"))
             .agg(F.count("*").alias("n_rows"),
                  F.sum(F.when(F.col("event_type") == etype, 1)
                        .otherwise(0)).alias("n_match")))
    in_range = (F.col("day") >= F.lit(d_from)) \
        & (F.col("day") < F.lit(d_to))
    is_read = in_range & ((F.col("spec") == 0)
                          | (F.col("part_type") == etype))
    return (files
            .groupBy("spec")
            .agg(F.count("*").cast("bigint").alias("n_files"),
                 F.sum(is_read.cast("int")).cast("bigint")
                 .alias("n_files_read"),
                 F.sum(F.when(is_read, F.col("n_rows")).otherwise(0))
                 .cast("bigint").alias("rows_scanned"),
                 F.sum(F.when(in_range, F.col("n_match")).otherwise(0))
                 .cast("bigint").alias("rows_matched"))
            .select("*", F.round(F.col("rows_scanned")
                                 / F.greatest(F.col("rows_matched"),
                                              F.lit(1)), 6)
                    .alias("read_amplification")))
