"""OLAP-style analytics operators over the events table: bucketed
range (interval-containment) join, rollup with hierarchical totals,
and pivot. No reference counterpart (the reference has no temporal or
multi-level aggregation surface); these complete the analytics-engine
operator families alongside asof.py.

Scale shapes:
* interval_join — Spark plans a raw `l.ts BETWEEN r.start AND r.end`
  predicate as BroadcastNestedLoopJoin (O(|L|*|R|) compares) unless the
  right side is broadcast-small. The bucketed form is the scale path:
  intervals explode to the W-wide buckets they cover (an interval of
  length <= W covers <= 2), points map to exactly one bucket, and the
  join is EQUI on the bucket — shuffle-partitionable, AQE-skew-
  splittable, never a nested loop. Bucket width trades explode fan-out
  (len/W rows per interval) against per-bucket selectivity; pass W of
  the same order as the typical interval length.
* rollup / pivot — single wide aggregations; rollup's grouping sets
  are computed in one pass (no union of re-scans), pivot's value set
  is declared explicitly so Spark skips the distinct-values job and
  the column set is stable for the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_row_number(df: DataFrame, order: Sequence[Column],
                      out_col: str = "rank",
                      num_partitions: int | None = None) -> DataFrame:
    """Exact global row_number over an UNBOUNDED frame without the
    single-partition window (`Window.orderBy` with no partition key
    moves every row to one task — the classic global-sort bottleneck).

    Two-phase distributed rank: (1) `repartitionByRange` on the order
    key spreads the sorted domain over N range partitions; (2) rank
    within each range partition (window PARTITIONED by
    spark_partition_id — parallel), then add each partition's starting
    offset, computed from the per-partition counts (an N-row frame,
    N = partition count, so its prefix-sum window is bounded by
    cluster parallelism, not data). The result is the exact global
    rank for ANY range boundaries the sampler picks, so the output is
    deterministic even though the sampling is internal.

    `order` must be a total order (add a unique tiebreak column) —
    equal keys split across a range boundary would otherwise get
    arbitrary relative ranks.

    The partitioned frame is localCheckpointed: the plan references it
    from two subtrees (per-partition counts, row labeling), and each
    Exchange re-SAMPLES range boundaries independently — without the
    checkpoint the offsets and the labels can come from two different
    partitionings, silently corrupting ranks."""
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = (df.repartitionByRange(n_parts, *order)
         .withColumn("__pid", F.spark_partition_id())
         .localCheckpoint(eager=True))
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order))
    counts = d.groupBy("__pid").agg(F.count("*").alias("__n"))
    offs = counts.select(
        "__pid",
        (F.sum("__n").over(
            Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .alias("__off")).na.fill({"__off": 0})
    return (d.withColumn("__rn", local)
            .join(F.broadcast(offs), "__pid")
            .withColumn(out_col,
                        (F.col("__off") + F.col("__rn")).cast("bigint"))
            .drop("__pid", "__rn", "__off"))


def interval_join(left: DataFrame, right: DataFrame,
                  left_ts: str, right_start: str, right_end: str,
                  bucket_width: int) -> DataFrame:
    """Equi-join-by-bucket containment join: rows of `left` paired with
    every `right` interval containing them (start <= ts < end, epoch
    seconds). Returns all columns of both sides (names must not clash).
    """
    # exact integer micros, not cast("long") seconds: a fractional-
    # second interval end truncated to seconds would drop the final
    # bucket and silently lose containments. The cast makes NTZ inputs
    # work too (unix_micros rejects TIMESTAMP_NTZ); it shifts both
    # sides by the same session-tz offset, so containment is invariant.
    wus = bucket_width * 1_000_000

    def _us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    lb = left.withColumn("__bkt", F.floor(_us(left_ts) / wus))
    rb = right.withColumn(
        "__bkt",
        F.explode(F.sequence(
            F.floor(_us(right_start) / wus),
            # end is exclusive: an interval ending exactly on a bucket
            # edge does not reach into that bucket
            F.floor((_us(right_end) - 1) / wus))))
    return (lb.join(rb, "__bkt")
            .filter((F.col(left_ts) >= F.col(right_start))
                    & (F.col(left_ts) < F.col(right_end)))
            .drop("__bkt"))


ALL_LABEL = "(all)"  # rollup subtotal marker, shared with the oracle

def partition_gap_audit(events: DataFrame) -> DataFrame:
    """Backfill planner: per event type, the calendar days between the
    type's first and last event that have NO rows — exactly the
    partitions a daily ingestion job must re-run. Emits
    (event_type, missing_day) rows; empty when ingestion is complete.

    Shape: per-type min/max is one map-side-combinable aggregate; the
    calendar explodes from a sequence() on the type-count-sized frame
    (days x types, a dimension); observed days left_anti against it.
    The calendar side is never corpus-sized."""
    span = (events
            .groupBy("event_type")
            .agg(F.min(F.to_date("ts")).alias("d0"),
                 F.max(F.to_date("ts")).alias("d1")))
    cal = span.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("day"))
    seen = (events
            .select("event_type", F.to_date("ts").alias("day"))
            .distinct())
    return (cal.join(seen, ["event_type", "day"], "left_anti")
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd")
                    .alias("missing_day")))


ZORDER_BITS = 8  # per-dimension bucket bits for the Morton key


def zorder_keys(events: DataFrame, bits: int = ZORDER_BITS) -> DataFrame:
    """Z-order (Morton) layout keys — the multi-dimensional clustering
    trick behind Delta/Iceberg Z-ORDER: interleave the bits of two
    bucketed dimensions (user and value rank here) so rows close in
    BOTH dimensions land close in the sort order, letting min/max
    file-skipping prune on either predicate. Emits (event_id,
    u_bucket, v_bucket, zkey); a writer would sortWithinPartitions
    on zkey before writing.

    Pure integer bit arithmetic (shiftright/and/shiftleft sums) —
    exact in both engines; value buckets come from a fixed linear
    scale of the value column (not quantiles), so the key is a
    per-row expression with no aggregate dependence."""
    n = 1 << bits
    ub = (F.col("user_id") % n).cast("bigint")
    vb = F.least(F.floor(F.col("value") / 500.0 * n),
                 F.lit(n - 1)).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(ub, b).bitwiseAND(1), 2 * b)
             + F.shiftleft(F.shiftright(vb, b).bitwiseAND(1),
                           2 * b + 1))
    return events.select("event_id", ub.alias("u_bucket"),
                         vb.alias("v_bucket"), z.alias("zkey"))


# ordered-funnel demo steps, shared with the oracle
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_steps(events: DataFrame,
                 steps: Sequence[str] = FUNNEL_STEPS) -> DataFrame:
    """Ordered-funnel conversion over events: step i counts users whose
    earliest qualifying step-i event falls strictly AFTER their step-
    (i-1) entry time (min-chaining — the standard ordered funnel,
    immune to repeats and out-of-order arrivals because only the
    earliest qualifying time per user advances a stage).

    Output: (step_idx, step, n_users, conv_from_prev, conv_from_first),
    one row per step.

    Shape: one filtered min-groupBy per step (map-side combinable) and
    a user-keyed equi-join per stage transition; stage frames only
    shrink down the funnel. The per-step counts are one-row aggregates
    unioned into a k-row frame, so the ranking window that derives the
    conversion ratios runs over k rows, never over users. Each step's
    count re-evaluates its (short) upstream stage chain — O(k^2) tiny
    aggregates for k steps, irrelevant beside the k corpus scans."""
    from pyspark.sql import Window

    counts = None
    stage = None
    for i, s in enumerate(steps):
        ev = events.filter(F.col("event_type") == s)
        if stage is None:
            stage = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            prev = stage.select("user_id", F.col("t").alias("t_prev"))
            stage = (ev.join(prev, "user_id")
                     .filter(F.col("ts") > F.col("t_prev"))
                     .groupBy("user_id").agg(F.min("ts").alias("t")))
        row = (stage.agg(F.count("*").cast("bigint").alias("n_users"))
               .select(F.lit(i + 1).alias("step_idx"),
                       F.lit(s).alias("step"), "n_users"))
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("step_idx")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (counts
            .withColumn("conv_from_prev", F.round(
                F.col("n_users") / F.coalesce(
                    F.lag("n_users").over(w), F.col("n_users"))
                .cast("double"), 6))
            .withColumn("conv_from_first", F.round(
                F.col("n_users")
                / F.first("n_users").over(wf).cast("double"), 6)))


def rollup_totals(events: DataFrame, day_col: Column,
                  levels: Sequence[str] = ("event_type",)) -> DataFrame:
    """One-pass hierarchical totals over (levels..., day): per-group
    rows plus per-prefix subtotals plus the grand total, aggregated
    level labels coalesced to '(all)' (null group markers stringify
    differently across engines)."""
    base = events.withColumn("__day", day_col)
    out = (base.rollup(*levels, "__day")
           .agg(F.count("*").cast("bigint").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value")))
    sel = [F.coalesce(F.col(c), F.lit(ALL_LABEL)).alias(c) for c in levels]
    sel.append(F.coalesce(F.col("__day"), F.lit(ALL_LABEL)).alias("day"))
    return out.select(*sel, "n_events", "total_value")


def cumulative_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running aggregates over event time: sequence number,
    cumulative value sum, and cumulative max — the batch twin of the
    stateful streaming running-total operator (streaming/pipeline.py),
    here as one window pass for backfills and reconciliation checks
    against the stream's state store.

    Ties on ts break by event_id, so the running frame is a total
    order and both engines accumulate identically. Scale shape: the
    window partitions by user_id — embarrassingly parallel, state per
    partition is one user's history; there is no global sort and no
    single-partition window (the classic running-total trap of
    `Window.orderBy(ts)` with no partition key)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        "event_id", "user_id",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("bigint").alias("seq"),
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.round(F.max("value").over(w), 6).alias("running_max"))


def cube_totals(events: DataFrame, day_col: Column,
                levels: Sequence[str] = ("event_type",)) -> DataFrame:
    """One-pass CUBE over (levels..., day): every subset of the
    grouping columns gets its subtotal row (rollup emits only the
    hierarchical prefixes; cube emits the full lattice — here also the
    per-day-across-all-types marginals rollup cannot produce). `gid`
    marks which columns are aggregated, built explicitly as
    sum(grouping(c) << position) so both engines' bit orders agree by
    construction rather than by grouping_id() convention.

    Scale shape: like rollup, Spark expands the grouping sets in ONE
    pass (Expand + single hash aggregate), never a union of re-scans;
    the output is bounded by the product of per-level cardinalities,
    a dimension-sized frame."""
    base = events.withColumn("__day", day_col)
    cols = [*levels, "__day"]
    gid = F.lit(0)
    for pos, c in enumerate(cols):
        # grouping() is only resolvable inside the cube's agg list
        gid = gid + (F.grouping(c) * F.lit(1 << (len(cols) - 1 - pos)))
    out = (base.cube(*cols)
           .agg(gid.cast("bigint").alias("gid"),
                F.count("*").cast("bigint").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value")))
    sel = [F.coalesce(F.col(c), F.lit(ALL_LABEL)).alias(c) for c in levels]
    sel.append(F.coalesce(F.col("__day"), F.lit(ALL_LABEL)).alias("day"))
    return out.select(*sel, "gid", "n_events", "total_value")


K_ANON_DEFAULT = 5  # minimum group size below which a cell is risky
K_ANON_BUCKETS = 10  # user-attribute quasi-identifier bucket count


def k_anonymity_audit(events: DataFrame, k: int = K_ANON_DEFAULT,
                      buckets: int = K_ANON_BUCKETS) -> DataFrame:
    """Re-identification risk audit: group rows by the quasi-identifier
    tuple (event_type, calendar day, user-attribute bucket) and emit
    every cell whose population is below k — the cells a k-anonymity
    release policy must suppress or generalize. Emits (event_type,
    day, u_bucket, n_rows) for risky cells only.

    Shape: one map-side-combinable count per cell; output is bounded
    by the quasi-identifier cardinality (a dimension), never by the
    corpus. No reference counterpart (the reference has no governance
    surface); pairs with pii.py's redaction as the release-side QC."""
    qi = (events
          .select(F.col("event_type"),
                  F.date_format("ts", "yyyy-MM-dd").alias("day"),
                  (F.col("user_id") % buckets).cast("bigint")
                  .alias("u_bucket")))
    return (qi.groupBy("event_type", "day", "u_bucket")
            .agg(F.count("*").cast("bigint").alias("n_rows"))
            .filter(F.col("n_rows") < k))


def pivot_counts(events: DataFrame, key: str, pivot_col: str,
                 values: Sequence[str]) -> DataFrame:
    """key x pivot_col count matrix with an explicit (stable, oracle-
    shared) pivot value list; absent combinations are 0, not null."""
    out = (events.groupBy(key)
           .pivot(pivot_col, list(values)).count()
           .na.fill(0, list(values)))
    return out.select(key, *[F.col(v).cast("bigint").alias(f"n_{v}")
                             for v in values])


PRUNE_FILE_BITS = 6            # 64 simulated files per layout
PRUNE_BOX_U = (10, 25)         # box predicate on the user dimension
PRUNE_BOX_V = (40, 80)         # box predicate on the value dimension


def zorder_prune_stats(events: DataFrame,
                       bits: int = ZORDER_BITS,
                       file_bits: int = PRUNE_FILE_BITS) -> DataFrame:
    """File-skipping simulator: how many data files a min/max-pruning
    scan (the Iceberg/Delta manifest check) must read for a 2-D box
    predicate under (a) Z-ORDER clustering vs (b) a single-dimension
    linear sort. Rows are binned into 2^file_bits equal-key-range
    'files' (zkey prefix for the Z layout, u_bucket prefix for the
    linear one); a file is scanned unless its per-file [min, max]
    range on EITHER dimension is disjoint from the box. The Z layout
    must bound BOTH dimensions per file; the linear layout bounds only
    its sort dimension, so the v-side of the box prunes nothing —
    this operator turns that claim into a measured row.

    Output: (layout, n_files, n_files_scanned, n_rows_scanned,
    frac_files_scanned) — 2 rows. One pass per layout over the keyed
    frame, dimension-sized aggregates after; exact integer min/max so
    both engines agree bit-for-bit."""
    u_lo, u_hi = PRUNE_BOX_U
    v_lo, v_hi = PRUNE_BOX_V
    keyed = zorder_keys(events, bits)
    layouts = [
        ("zorder", F.shiftright(F.col("zkey"), 2 * bits - file_bits)),
        ("linear", F.shiftright(F.col("u_bucket"), bits - file_bits)),
    ]
    outs = []
    for name, file_of in layouts:
        per_file = (keyed
                    .groupBy(file_of.cast("bigint").alias("file_id"))
                    .agg(F.count("*").cast("bigint").alias("n_rows"),
                         F.min("u_bucket").alias("min_u"),
                         F.max("u_bucket").alias("max_u"),
                         F.min("v_bucket").alias("min_v"),
                         F.max("v_bucket").alias("max_v")))
        scanned = ~((F.col("max_u") < u_lo) | (F.col("min_u") > u_hi)
                    | (F.col("max_v") < v_lo) | (F.col("min_v") > v_hi))
        outs.append(per_file.agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(scanned.cast("bigint")).cast("bigint")
            .alias("n_files_scanned"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("bigint").alias("n_rows_scanned"),
            F.round(F.sum(scanned.cast("double")) / F.count("*"), 6)
            .alias("frac_files_scanned")))
    return outs[0].unionByName(outs[1])


SALT_PARTITIONS = 32   # reduce-side partition count being simulated
SALT_FACTOR = 8        # salt fan-out for the skewed side


def salt_balance_audit(df: DataFrame, key: str, row_id: str,
                       n_parts: int = SALT_PARTITIONS,
                       salt: int = SALT_FACTOR) -> DataFrame:
    """Measured effect of key salting on reduce-partition balance: the
    planning probe behind canonicalize.py's salted min and asof.py's
    hub split. Rows are assigned to `n_parts` simulated shuffle
    partitions by (a) hash(key) and (b) hash(key, row-derived salt in
    [0, salt)); for each layout the audit reports the heaviest
    partition's row share and the max/mean skew ratio — the number
    that decides whether a 100-TB join needs the salt (a hub key
    pins its whole partition at share ~ hub_share under (a); under
    (b) it spreads across `salt` partitions).

    Hashing is the md5 idiom both engines share (NOT Spark's
    murmur3, which DuckDB cannot replay). Two map-side-combinable
    counts + dimension-sized summaries."""
    def bucket(col: F.Column) -> F.Column:
        return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
                .cast("bigint") % n_parts)

    raw_part = bucket(F.col(key))
    salt_col = (F.conv(F.substring(F.md5(F.col(row_id)), 1, 8), 16, 10)
                .cast("bigint") % salt)
    salted_part = bucket(
        F.concat(F.col(key), F.lit(":"), salt_col.cast("string")))
    outs = []
    for name, part in (("unsalted", raw_part), ("salted", salted_part)):
        per = (df.groupBy(part.alias("part"))
               .agg(F.count("*").cast("bigint").alias("n")))
        outs.append(per.agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("bigint").alias("n_parts_used"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.round(F.avg("n"), 6).alias("mean_rows"),
            F.round(F.max("n") / F.sum("n"), 6).alias("max_share"),
            F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio")))
    return outs[0].unionByName(outs[1])


def grouped_ntile(df: DataFrame, group: str, order: Sequence[Column],
                  k: int, out_col: str = "bucket",
                  num_partitions: int | None = None) -> DataFrame:
    """Exact per-group ntile(k) without the per-group single-task
    window (`Window.partitionBy(group)` puts each group in ONE task —
    a mega-group, e.g. the English split of a web corpus, becomes the
    straggler). Same two-phase shape as global_row_number, extended
    with the group key: range-partition on (group, *order) so each
    group's sorted run stays contiguous, rank locally per (partition,
    group), then add per-(partition, group) prefix offsets — a
    dimension-sized frame (<= n_partitions x n_groups rows) whose
    window and the per-group totals both broadcast.

    Bucket assignment replays SQL ntile semantics exactly (first
    n mod k buckets get the extra row) in integer arithmetic, so the
    DuckDB oracle's native ntile agrees bit-for-bit. `order` must be a
    total order within each group. localCheckpoint pins ONE sampled
    range partitioning across the counts and labeling subtrees (see
    global_row_number)."""
    ranked = grouped_row_number(df, group, order, "__grank",
                                num_partitions)
    rank = F.col("__grank")
    q = (F.col("__tot") / k).cast("bigint")          # floor: tot >= 0
    rem = F.col("__tot") % k
    head = rem * (q + 1)
    # integer ceil(a/b) = (a + b - 1) div b; guard q=0 (never selected
    # when rank > head is impossible, but keep the division total)
    bucket = F.when(rank <= head,
                    ((rank + q) / (q + 1)).cast("bigint")) \
        .otherwise(rem + ((rank - head + F.greatest(q, F.lit(1)) - 1)
                          / F.greatest(q, F.lit(1))).cast("bigint"))
    return (ranked.withColumn(out_col, bucket.cast("int"))
            .drop("__grank", "__tot"))


def grouped_row_number(df: DataFrame, group: str,
                       order: Sequence[Column], out_col: str,
                       num_partitions: int | None = None) -> DataFrame:
    """Exact PER-GROUP row_number + group totals ("__tot") with the
    two-phase range-partitioned decomposition of global_row_number —
    shared by grouped_ntile (tier assignment) and the exact-percentile
    extractor. localCheckpoint pins ONE sampled partitioning across
    the counts and labeling subtrees."""
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = (df.repartitionByRange(n_parts, F.col(group), *order)
         .withColumn("__pid", F.spark_partition_id())
         .localCheckpoint(eager=True))
    local = F.row_number().over(
        Window.partitionBy("__pid", group).orderBy(*order))
    counts = d.groupBy("__pid", group).agg(F.count("*").alias("__n"))
    offs = counts.select(
        "__pid", group,
        F.coalesce(
            F.sum("__n").over(
                Window.partitionBy(group).orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("__off"))
    totals = counts.groupBy(group).agg(F.sum("__n").alias("__tot"))
    return (d.withColumn("__rn", local)
            .join(F.broadcast(offs), ["__pid", group])
            .join(F.broadcast(totals), group)
            .withColumn(out_col,
                        (F.col("__off") + F.col("__rn")).cast("bigint"))
            .drop("__pid", "__rn", "__off"))


WATERMARK_LEVELS_S = (1800, 7200)    # 30 min / 2 h candidate delays


def watermark_audit(events: DataFrame,
                    arrival_col: str = "arrival_seq") -> DataFrame:
    """Watermark-sizing audit for a streaming ingest: replay the
    arrival order, track the high-water mark (max event time seen so
    far), measure each event's lateness against it, and report — per
    event type — how many events a 30-minute or 2-hour watermark
    delay would have DROPPED, plus the worst lateness observed. This
    is the batch-side measurement that decides the `withWatermark`
    delay the streaming pipeline (streaming/pipeline.py) should run
    with: too short drops data, too long holds state.

    The running max over the global arrival stream is the same
    two-phase decomposition as global_row_number: range-partition by
    arrival order, per-partition running max (parallel windows), then
    fold in the per-partition prefix maxima — a dimension-sized frame.
    All arithmetic is integer microseconds, so both engines agree
    exactly."""
    lo, hi = WATERMARK_LEVELS_S
    n_parts = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # cast makes NTZ inputs work (same idiom as interval_join); the
    # uniform session-tz shift cancels in every lateness difference
    d = (events
         .withColumn("__us", F.unix_micros(F.col("ts").cast("timestamp")))
         .repartitionByRange(n_parts, F.col(arrival_col), F.col("event_id"))
         .withColumn("__pid", F.spark_partition_id())
         .localCheckpoint(eager=True))  # pin ONE sampled partitioning
    w_local = (Window.partitionBy("__pid")
               .orderBy(arrival_col, "event_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    pmax = d.groupBy("__pid").agg(F.max("__us").alias("__pm"))
    prefix = pmax.select(
        "__pid",
        F.max("__pm").over(
            Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)).alias("__pre"))
    hwm = F.greatest(F.coalesce(F.max("__us").over(w_local), F.lit(-1)),
                     F.coalesce(F.col("__pre"), F.lit(-1)))
    late_us = F.greatest(F.lit(0), hwm - F.col("__us"))
    return (d.join(F.broadcast(prefix), "__pid")
            .withColumn("__late", late_us)
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum((F.col("__late") > 0).cast("bigint"))
                 .cast("bigint").alias("n_late"),
                 F.sum((F.col("__late") > lo * 1_000_000).cast("bigint"))
                 .cast("bigint").alias(f"n_dropped_{lo}s"),
                 F.sum((F.col("__late") > hi * 1_000_000).cast("bigint"))
                 .cast("bigint").alias(f"n_dropped_{hi}s"),
                 (F.max("__late") / 1_000_000).cast("bigint")
                 .alias("max_lateness_s")))


L_DIV_DEFAULT = 3
L_DIV_BUCKETS = 64   # finer QI than k-anonymity: diversity is judged
                     # within smaller cells, where homogeneity hides


def l_diversity_audit(events: DataFrame, l: int = L_DIV_DEFAULT,
                      buckets: int = L_DIV_BUCKETS) -> DataFrame:
    """l-diversity release audit — the attribute-disclosure complement
    of k_anonymity_audit: a quasi-identifier cell can be k-anonymous
    yet still leak if (nearly) all its rows share one SENSITIVE value
    (here the event_type, treating (day, user-bucket) as the
    quasi-identifier). Emits every cell whose count of DISTINCT
    sensitive values is below l, with its population and its dominant
    value's share (the homogeneity-attack risk number). Machanavajjhala
    et al. 2007 semantics, distinct-l variant.

    Shape: one (cell, value) count + two dimension-sized rollups —
    all map-side-combinable, output bounded by quasi-identifier
    cardinality."""
    qi = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.col("user_id") % buckets).cast("bigint").alias("u_bucket"),
        F.col("event_type").alias("sensitive"))
    per_val = (qi.groupBy("day", "u_bucket", "sensitive")
               .agg(F.count("*").cast("bigint").alias("n")))
    return (per_val.groupBy("day", "u_bucket")
            .agg(F.countDistinct("sensitive").cast("bigint")
                 .alias("n_distinct"),
                 F.sum("n").cast("bigint").alias("n_rows"),
                 F.round(F.max("n") / F.sum("n"), 6)
                 .alias("dominant_share"))
            .filter(F.col("n_distinct") < l))


PCTL_QS = (0.5, 0.9, 0.99)


def exact_percentiles(events: DataFrame, group: str = "event_type",
                      value: str = "value",
                      qs: Sequence[float] = PCTL_QS) -> DataFrame:
    """EXACT per-group percentiles (P50/P90/P99) by rank extraction —
    the ground truth event_approx_quantiles' sketches are judged
    against, computed scalably: rank every row per group with the
    two-phase grouped_row_number (no per-group single task), then keep
    the rows sitting at rank ceil(q*n) and pivot them wide. Exactness
    matters when the percentile IS the SLO (a P99 latency gate);
    sketches are for dashboards.

    One range shuffle + broadcast offsets for the rank; the percentile
    pick is a row filter; the pivot is a group-cardinality aggregate."""
    ranked = grouped_row_number(
        events.select(group, value, "event_id"), group,
        [F.col(value), F.col("event_id")], "__r")
    picks = [F.max(F.when(
        F.col("__r") == F.least(
            F.col("__tot"), F.ceil(F.lit(q) * F.col("__tot"))),
        F.col(value))).alias(f"p{int(q * 100)}") for q in qs]
    return (ranked.groupBy(group)
            .agg(F.max("__tot").cast("bigint").alias("n"), *picks))


def time_weighted_avg(events: DataFrame,
                      key: str = "user_id") -> DataFrame:
    """Time-weighted average value per key (the TWAP of market data
    pipelines): each observation is weighted by how long it REMAINED
    the latest one (gap to the key's next event); the trailing
    observation carries no weight. Plain averages over-count bursts;
    the time weighting is what a sensor/pricing rollup actually wants.

    One lead() window per key ordered by event time — partition state
    is the key's own event count; integer-microsecond weights keep
    both engines exact."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    dt = (F.lead(us, 1).over(w) - us)
    d = events.withColumn("__dt", dt).filter(F.col("__dt").isNotNull())
    return (d.groupBy(key)
            .agg(F.count("*").cast("bigint").alias("n_weighted"),
                 F.sum("__dt").cast("bigint").alias("span_us"),
                 F.round(F.sum(F.col("value") * F.col("__dt"))
                         / F.sum("__dt"), 6).alias("twap")))


def join_cardinality_audit(left: DataFrame, right: DataFrame,
                           key: str, name: str) -> DataFrame:
    """CBO sanity probe: the textbook equi-join cardinality estimate
    |L|*|R| / max(NDV_L, NDV_R) next to the ACTUAL join count — the
    number that explains a mis-planned join (est/actual off by 10x =
    correlated keys or skew the uniform-NDV model cannot see). Emits
    one row: (join_name, n_left, n_right, ndv_left, ndv_right,
    est_rows, actual_rows, est_ratio).

    Three map-side-combinable aggregates + the real equi-join count;
    all integer until the final ratio."""
    ls = left.agg(F.count("*").cast("bigint").alias("n_left"),
                  F.countDistinct(key).cast("bigint").alias("ndv_left"))
    rs = right.agg(F.count("*").cast("bigint").alias("n_right"),
                   F.countDistinct(key).cast("bigint")
                   .alias("ndv_right"))
    act = (left.join(right, key)
           .agg(F.count("*").cast("bigint").alias("actual_rows")))
    est = F.floor(F.col("n_left") * F.col("n_right")
                  / F.greatest("ndv_left", "ndv_right")).cast("bigint")
    return (ls.crossJoin(rs).crossJoin(act)
            .select(F.lit(name).alias("join_name"),
                    "n_left", "n_right", "ndv_left", "ndv_right",
                    est.alias("est_rows"), "actual_rows",
                    F.round(F.col("actual_rows") / est, 6)
                    .alias("est_ratio")))


LAG_QS = (0.5, 0.9)


def conversion_lag(events: DataFrame,
                   first_step: str = FUNNEL_STEPS[0],
                   last_step: str = FUNNEL_STEPS[-1]) -> DataFrame:
    """Time-to-convert distribution for the funnel's endpoints: per
    user, the lag from the earliest `first_step` event to the earliest
    `last_step` event strictly after it (funnel_steps' min-chaining
    rule), summarized as exact P50/P90/max seconds — the number a
    "how long until purchase" dashboard actually wants next to the
    funnel's conversion rates.

    Two filtered min-groupBys + one user equi-join for the lags; the
    exact percentiles run through global_row_number (converters form
    ONE distribution, but the rank is still range-partitioned — no
    single-task sort)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = (events.filter(F.col("event_type") == first_step)
         .groupBy("user_id").agg(F.min(us).alias("t0")))
    l = (events.filter(F.col("event_type") == last_step)
         .select("user_id", us.alias("t1"))
         .join(f, "user_id").filter(F.col("t1") > F.col("t0"))
         .groupBy("user_id").agg(F.min("t1").alias("t1"),
                                 F.min("t0").alias("t0")))
    lags = l.select("user_id",
                    ((F.col("t1") - F.col("t0")) / 1_000_000)
                    .cast("bigint").alias("lag_s"))
    ranked = global_row_number(
        lags, [F.col("lag_s"), F.col("user_id")], "r")
    n = ranked.agg(F.count("*").cast("bigint").alias("n_converted"),
                   F.max("lag_s").cast("bigint").alias("max_s"))
    picks = [F.max(F.when(
        F.col("r") == F.least(F.col("n_converted"),
                              F.ceil(F.lit(q) * F.col("n_converted"))),
        F.col("lag_s"))).cast("bigint").alias(f"p{int(q * 100)}_s")
        for q in LAG_QS]
    return (ranked.crossJoin(F.broadcast(n))
            .agg(F.max("n_converted").cast("bigint")
                 .alias("n_converted"),
                 *picks,
                 F.max("max_s").cast("bigint").alias("max_s")))


JOURNEY_CONVERSION_RE = "vc*p"   # view, any clicks, purchase
JOURNEY_ERROR_RE = "ee+"         # >=2 consecutive errors


def journey_pattern_match(events: DataFrame) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event-processing over per-user
    event streams: each user's events collapse (ordered by ts,
    event_id) into a journey string of event-type initials — the five
    synthetic types (click/error/purchase/signup/view) have distinct
    initials by construction — and leftmost non-overlapping regex
    matches count conversion paths (view->clicks->purchase) and error
    bursts. Java regex and RE2 agree on these patterns, so the DuckDB
    oracle re-derives matches independently via string_agg ORDER BY +
    regexp_extract_all.

    Scale: one groupBy shuffle; per-user state is the journey string,
    bounded by that user's event count — a hub user with millions of
    events wants the sessionized variant (session_windows) upstream,
    exactly like any per-key collect. The regex runs JVM-side
    (codegen), one row per user."""
    journey = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("i")))),
            lambda s: s["i"]), "")
    return (events
            .groupBy("user_id")
            .agg(journey.alias("journey"))
            .select("user_id", "journey",
                    F.size(F.regexp_extract_all(
                        "journey", F.lit(JOURNEY_CONVERSION_RE), F.lit(0)))
                    .cast("int").alias("n_conversion_paths"),
                    F.size(F.regexp_extract_all(
                        "journey", F.lit(JOURNEY_ERROR_RE), F.lit(0)))
                    .cast("int").alias("n_error_bursts"),
                    F.length("journey").cast("int").alias("n_events")))


TRAILING_DAYS = 7


def trailing_window_avg(events: DataFrame,
                        days: int = TRAILING_DAYS) -> DataFrame:
    """Interval-frame sliding aggregate: per (user, active day), the
    trailing `days`-day average and sum of the user's daily spend —
    the RANGE BETWEEN INTERVAL window (time-based frame over sparse
    days, NOT a row-count frame: a user active on Mon and Fri has a
    2-day window, not 5). Daily pre-aggregation first (map-side
    combinable) so the window runs over per-(user, day) rows — the
    frame is bounded by `days`, and the partition by user is the same
    per-key bound every user-keyed window carries. The rangeBetween
    frame runs on epoch-day longs; the DuckDB twin uses its native
    RANGE BETWEEN over the same day numbers."""
    daily = (events
             .groupBy("user_id", F.to_date("ts").alias("day"))
             .agg(F.sum("value").alias("spend")))
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_date(F.col("day")))
         .rangeBetween(-(days - 1), 0))
    return (daily
            .select("user_id",
                    F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.round(F.sum("spend").over(w), 6)
                    .alias("trailing_sum"),
                    F.round(F.avg("spend").over(w), 6)
                    .alias("trailing_avg"),
                    F.count("*").over(w).cast("int")
                    .alias("n_active_days")))
