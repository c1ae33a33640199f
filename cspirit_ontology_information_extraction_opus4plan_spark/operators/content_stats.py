"""Numeric content statistics over the `events` table — the Spark
re-expression of the reference's StatisticalAnalyzer
(parsers/content_utils.py:125 analyze_distribution, :158 detect_outliers,
:191 correlation_analysis) and the numeric table-summary path
(metadata_framework.py:381).

All three are single groupBy aggregations (map-side combinable) or a
join against per-group quantiles — no windows, no collects; the shapes
hold at any scale because the per-group state is O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

IQR_FACTOR = 1.5  # Tukey fences, content_utils.py:158


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rank_quartiles(events: DataFrame) -> DataFrame:
    """Per-type RANK-PICKED quartiles — the reference's exact
    convention (analyze_distribution / detect_outliers
    content_utils.py:143-146, :166-169: q1 = sorted[n // 4],
    q3 = sorted[3n // 4], None below 4 values), verified equal
    in-process by tests/test_reference_parity.py. An interpolated
    percentile() is NOT the same number — the parity harness caught
    that divergence. The ordered-window + position-match shape is
    event_exact_percentiles'; deterministic via the (value, event_id)
    order (ties pick the same concrete element on both engines)."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    rk = (events.select("event_type", "value", "event_id")
          .withColumn("r", F.row_number().over(w))
          .withColumn("n", F.count("*").over(wn)))
    pos1 = (F.col("n") / 4).cast("int") + 1
    pos3 = (F.col("n") * 3 / 4).cast("int") + 1
    return (rk.groupBy("event_type")
            .agg(F.max("n").alias("n"),
                 F.max(F.when((F.col("r") == pos1) & (F.col("n") >= 4),
                              F.col("value"))).alias("q1"),
                 F.max(F.when((F.col("r") == pos3) & (F.col("n") >= 4),
                              F.col("value"))).alias("q3")))


def value_distribution(events: DataFrame) -> DataFrame:
    """Per event_type distribution summary: n, mean, stddev (sample),
    min/max, median (statistics.median = linear mid-interpolation) and
    the reference's rank-picked quartiles (analyze_distribution
    content_utils.py:125)."""
    base = (events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_v"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_v")))
    qs = _rank_quartiles(events).select(
        "event_type", F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"))
    return (base.join(F.broadcast(qs), "event_type")
            .select("event_type", "n", "mean_v", "stddev_v", "min_v",
                    "max_v", "q1", "median_v", "q3"))


def iqr_outliers(events: DataFrame) -> DataFrame:
    """IQR-method outliers per event_type: value outside
    [q1 - 1.5*iqr, q3 + 1.5*iqr] with the reference's RANK-PICKED
    quartiles and its n >= 4 guard (detect_outliers
    content_utils.py:160-177). Per-group fences are a tiny aggregate
    broadcast back against the stream — the window-free probe shape
    from SURVEY §2.4 (the quartile pick itself pays one ordered
    window, the event_exact_percentiles shape)."""
    fences = (_rank_quartiles(events)
              .filter(F.col("n") >= 4)
              .select("event_type",
                      (F.col("q1") - IQR_FACTOR
                       * (F.col("q3") - F.col("q1"))).alias("lo"),
                      (F.col("q3") + IQR_FACTOR
                       * (F.col("q3") - F.col("q1"))).alias("hi")))
    return (events.join(F.broadcast(fences), "event_type")
            .filter((F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")))
            .select("event_id", "event_type", "value"))


ZSCORE_SIGMA = 3.0  # 3-sigma rule, content_utils.py:185
ZSCORE_MIN_N = 4    # detect_outliers returns [] below 4 values (:160)


def zscore_outliers(events: DataFrame) -> DataFrame:
    """Z-score-method outliers per event_type: |value - mean| / stddev
    > 3 (detect_outliers(method='zscore') content_utils.py:179-187,
    sample stddev like statistics.stdev). Groups with fewer than 4
    values or zero spread emit nothing, mirroring the reference's
    guards. Same window-free shape as iqr_outliers: per-group moments
    are a tiny aggregate broadcast back against the stream."""
    stats = (events.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.avg("value").alias("mean_v"),
                  F.stddev_samp("value").alias("std_v"))
             .filter((F.col("n") >= ZSCORE_MIN_N) & (F.col("std_v") > 0)))
    return (events.join(
        F.broadcast(stats.select("event_type", "mean_v", "std_v")),
        "event_type")
        .filter(F.abs((F.col("value") - F.col("mean_v")) / F.col("std_v"))
                > ZSCORE_SIGMA)
        .select("event_id", "event_type", "value"))


TABLE_QUALITY_COLS = ["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"]


def table_quality(lineitem: DataFrame) -> DataFrame:
    """Per-column numeric summary + completeness ratio over a parsed
    table (_generate_data_summary content_utils.py:462,
    _calculate_data_quality :496, analyze_numerical_data
    metadata_framework.py:381). One `stack` melt + one
    map-side-combinable groupBy — the unpivot never materializes the
    wide row twice."""
    n = len(TABLE_QUALITY_COLS)
    pairs = ", ".join(f"'{c}', cast({c} as double)"
                      for c in TABLE_QUALITY_COLS)
    melted = lineitem.select(
        F.expr(f"stack({n}, {pairs}) as (col_name, v)"))
    return (melted.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_present"),
        F.round(F.count("v") / F.count("*"), 6).alias("completeness"),
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v")))


def value_prop_correlation(events: DataFrame) -> DataFrame:
    """Pearson r between `value` and the numeric JSON prop `k` per
    event_type (correlation_analysis + the reference's ubiquitous JSON
    field access, mapped to get_json_object)."""
    k = F.get_json_object("props", "$.k").cast("double")
    return (events.select("event_type", "value", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.corr("value", "k"), 6).alias("pearson_r")))


SKEW_TOP_K = 10


def key_skew_profile(df: DataFrame, key: str,
                     top_k: int = SKEW_TOP_K) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the top-k heaviest values of
    `key` with their row share, against the global key-distribution
    summary (n_keys, mean, stddev, max, max/mean skew ratio). This is
    the probe a 100-TB run consults before choosing a salting factor
    for the key (canonicalize.py salts hub entities; asof.py splits
    hub users — this operator is how those hubs are found).

    Scale shape: per-key counts are one map-side-combinable groupBy;
    the global summary uses only streaming aggregates (count / avg /
    stddev / max — deliberately no exact percentile, whose O(n_keys)
    reduce-side buffer would not survive billions of keys) and comes
    back as a 1-row broadcast; top-k is orderBy+limit, which Spark
    plans as TakeOrderedAndProject (per-partition heap of k, no global
    sort shuffle)."""
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")) \
        .agg(F.count("*").alias("n"))
    summary = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.round(F.avg("n"), 6).alias("mean_n"),
        F.round(F.stddev_samp("n"), 6).alias("stddev_n"),
        F.max("n").alias("max_n"))
    top = counts.orderBy(F.desc("n"), F.asc("key_value")).limit(top_k)
    return (top.crossJoin(F.broadcast(summary))
            .select("key_value", "n",
                    F.round(F.col("n") / F.col("total_rows"), 6)
                    .alias("share"),
                    "total_rows", "n_keys", "mean_n", "stddev_n", "max_n",
                    F.round(F.col("max_n") / F.col("mean_n"), 6)
                    .alias("skew_ratio")))


HLL_RSD = 0.02
HLL_TOL = 0.05


def approx_distinct_users(events: DataFrame,
                          rsd: float = HLL_RSD,
                          tol: float = HLL_TOL) -> DataFrame:
    """Per event_type (event_type, n_users_exact, approx_ok): exact
    distinct-user count next to a verdict that Spark's HLL++ sketch
    (approx_count_distinct, relative sd `rsd`) landed within `tol` of
    it. At 100 TB the sketch IS the distinct-count path — exact
    count-distinct shuffles every (type, user) pair, HLL++ merges
    fixed 2^p-byte registers map-side — so the engine must prove the
    sketch's error envelope, not just expose it. The exact column
    stays only as the audit anchor (and is what the oracle can
    recompute; DuckDB's approx sketch differs, so the PARITY contract
    is exact count + the tolerance verdict, the honest cross-engine
    statement about an approximate structure). Deterministic: HLL++ is
    seed-free, so the verdict is stable for a fixed corpus."""
    return (events
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").cast("bigint")
                 .alias("n_users_exact"),
                 F.approx_count_distinct("user_id", rsd).alias("n_approx"))
            .select("event_type", "n_users_exact",
                    (F.abs(F.col("n_approx") - F.col("n_users_exact"))
                     <= F.lit(tol) * F.col("n_users_exact"))
                    .alias("approx_ok")))


QUANTILE_PROBS = (0.5, 0.9, 0.99)
QUANTILE_ACCURACY = 10000     # GK rank error <= n/accuracy


def approx_quantiles(events: DataFrame) -> DataFrame:
    """Per event_type (event_type, p50_exact, p90_exact, p99_exact,
    approx_ok): exact interpolated percentiles next to a verdict that
    Spark's Greenwald-Khanna sketch (percentile_approx) honored its
    RANK guarantee. Same contract as approx_distinct_users: at 100 TB
    the SKETCH is the quantile path — exact percentile buffers every
    group's values, GK merges bounded summaries map-side — so the
    engine proves the error envelope rather than exposing an
    unverifiable number.

    The verdict is rank-based, not value-based: GK promises a value
    whose rank is within n/accuracy of the target, and it returns an
    ACTUAL sample while the exact anchor interpolates — so a value-
    relative tolerance is a category error that false-alarms whenever
    adjacent order statistics are far apart (tiny groups, heavy
    tails). approx_ok therefore checks each sketch output against the
    order-statistic bracket at ranks target -/+ (ceil(n/accuracy) + 1)
    (+1 absorbs the interpolated-vs-discrete offset), a bound that
    MUST hold for a correct sketch on any data. The bracket reads
    sorted order statistics of the group — fine for the audit anchor,
    which buffers the group exactly like the exact percentile it sits
    next to (the sketch column itself never does). The exact columns
    are what DuckDB's quantile_cont recomputes — both sides use
    (n-1)*p linear interpolation. Deterministic: GK is seed-free."""
    probs = F.array(*[F.lit(p) for p in QUANTILE_PROBS])
    ex, ap, arr = F.col("ex"), F.col("ap"), F.col("arr")
    n = F.size(arr)
    slack = F.ceil(n / F.lit(QUANTILE_ACCURACY)).cast("int") + F.lit(1)
    ok = F.lit(True)
    for i, p in enumerate(QUANTILE_PROBS):
        target = F.floor((n - 1) * F.lit(p)).cast("int") + F.lit(1)
        lo = F.element_at(arr, F.greatest(target - slack, F.lit(1)))
        hi = F.element_at(arr, F.least(target + slack, n))
        ok = ok & (ap[i] >= lo - 1e-9) & (ap[i] <= hi + 1e-9)
    return (events
            .groupBy("event_type")
            .agg(F.percentile("value", probs).alias("ex"),
                 F.percentile_approx(
                     "value", probs,
                     F.lit(QUANTILE_ACCURACY)).alias("ap"),
                 F.sort_array(F.collect_list("value")).alias("arr"))
            .select("event_type",
                    F.round(ex[0], 6).alias("p50_exact"),
                    F.round(ex[1], 6).alias("p90_exact"),
                    F.round(ex[2], 6).alias("p99_exact"),
                    ok.alias("approx_ok")))


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition mining over per-user event
    streams — the clickstream model behind next-action prediction and
    funnel design: consecutive event pairs within each user's timeline
    are counted into a transition matrix with row-normalized
    probabilities. Emits (prev_type, next_type, n, p) where p =
    n / sum(n over prev_type).

    Determinism: the per-user ordering breaks timestamp ties by
    event_id, so simultaneous events sequence identically in both
    engines. Scale shape: the lag window partitions BY USER (state =
    one user's events — the irreducible sequence unit, same argument
    as sessionization); the matrix aggregate is map-side combinable
    and the row-normalizer is a transition-matrix-sized self-aggregate
    (event-type vocabulary squared, a dimension, never corpus-sized)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("user_id", "ts", "event_id",
                     F.col("event_type").alias("next_type"),
                     F.lag("event_type").over(w).alias("prev_type"))
             .filter(F.col("prev_type").isNotNull()))
    mat = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n"))
    row = mat.groupBy("prev_type").agg(
        F.sum("n").cast("double").alias("row_n"))
    return (mat.join(row, "prev_type")
            .select("prev_type", "next_type", "n",
                    F.round(F.col("n") / F.col("row_n"), 6).alias("p")))


CHI2_CRIT_6DOF = 12.591587  # chi-square 95% critical value, 6 dof


def weekly_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week seasonality test per event type: chi-square
    goodness-of-fit of the observed DOW counts against uniform — the
    load-planning / bot-detection probe (organic traffic has weekly
    shape; uniform streams are synthetic or scheduled). Emits
    (event_type, n_total, chi2, is_uniform) with is_uniform = chi2
    below the 95% critical value at 6 dof.

    Integer DOW counts -> one closed-form float expression per type;
    the chi2 sum runs over <= 7 rows per type (round 6)."""
    per = (events
           .groupBy("event_type",
                    F.dayofweek("ts").alias("dow"))
           .agg(F.count("*").cast("bigint").alias("n")))
    tot = per.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_total"))
    e = F.col("n_total").cast("double") / 7
    term = (F.col("n") - e) * (F.col("n") - e) / e
    return (per.join(tot, "event_type")
            .groupBy("event_type")
            .agg(F.min("n_total").alias("n_total"),
                 F.round(F.sum(term), 6).alias("chi2"))
            .withColumn("is_uniform",
                        F.col("chi2") < CHI2_CRIT_6DOF))


KS_SHIFT_SRC = "src0"   # planted 1.5x length shift fires the monitor
KS_ALPHA_C = 1.358      # two-sample KS 95% coefficient


def source_length_ks(docs: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift monitor on document length:
    each source's n_chars distribution against ALL OTHER sources —
    the ingest-QC that catches a feed whose extraction changed
    (truncation, boilerplate regression) before any content metric
    moves. src0's lengths get a documented synthetic 1.5x shift so the
    monitor demonstrably fires. Emits (source, n_src, ks, ks_crit,
    reject).

    Shape: per-(source, value) counts collapse the corpus to a
    sources x distinct-lengths grid (a dimension); CDFs come from
    cumulative-sum windows partitioned per source over that grid
    (never over documents); the source-vs-rest comparison derives
    rest counts by subtraction from the corpus marginal, so no
    self-join. KS and its critical value are exact functions of
    integer counts (round 6)."""
    from pyspark.sql import Window

    v = docs.select(
        "source",
        F.when(F.col("source") == KS_SHIFT_SRC,
               F.floor(F.col("n_chars") * 3 / 2).cast("bigint"))
        .otherwise(F.col("n_chars")).alias("v"))
    cnt = v.groupBy("source", "v").agg(
        F.count("*").cast("bigint").alias("c"))
    marg = cnt.groupBy("v").agg(F.sum("c").cast("bigint").alias("cm"))
    srcs = cnt.select("source").distinct()
    grid = (srcs.crossJoin(marg)
            .join(cnt, ["source", "v"], "left")
            .select("source", "v", "cm",
                    F.coalesce("c", F.lit(0)).alias("c")))
    w = (Window.partitionBy("source").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (grid
           .withColumn("cs", F.sum("c").over(w))
           .withColumn("ct", F.sum("cm").over(w)))
    tot = (cnt.groupBy("source")
           .agg(F.sum("c").cast("bigint").alias("n_src")))
    n_all = cnt.agg(F.sum("c").cast("double").alias("n_all"))
    scored = (cum.join(tot, "source").crossJoin(F.broadcast(n_all))
              .withColumn("n_rest", F.col("n_all") - F.col("n_src"))
              .withColumn("diff", F.abs(
                  F.col("cs") / F.col("n_src").cast("double")
                  - (F.col("ct") - F.col("cs")) / F.col("n_rest"))))
    return (scored.groupBy("source")
            .agg(F.min("n_src").alias("n_src"),
                 F.round(F.max("diff"), 6).alias("ks"),
                 F.round(F.lit(KS_ALPHA_C) * F.sqrt(
                     (F.min("n_src") + F.min("n_rest"))
                     / (F.min("n_src") * F.min("n_rest"))), 6)
                 .alias("ks_crit"))
            .withColumn("reject", F.col("ks") > F.col("ks_crit")))


AB_CHI2_CRIT = 3.841459  # chi-square 95% critical value, 1 dof


def ab_srm_check(events: DataFrame) -> DataFrame:
    """Deterministic A/B assignment + sample-ratio-mismatch check, the
    experimentation-platform guardrail: users hash into arm A or B by
    md5 parity (sticky, engine-independent), and the per-event-type
    arm counts are chi-square-tested against the designed 50/50 split
    (SRM — the classic symptom of assignment or logging bugs). Emits
    (event_type, n_a, n_b, chi2, srm) per type plus an '(all)' row.

    Integer counts -> one closed-form float expression, so no
    accumulation noise; grouping-sets rollup computes the per-type and
    total rows in ONE pass (no re-scan union); the md5 idiom is shared
    with every oracle."""
    arm_a = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                1, 8), 16, 10)
             .cast("bigint") % 2 == 0)
    per = (events
           .select("event_type", arm_a.alias("is_a"))
           .rollup("event_type")
           .agg(F.sum(F.when(F.col("is_a"), 1).otherwise(0))
                .cast("bigint").alias("n_a"),
                F.sum(F.when(F.col("is_a"), 0).otherwise(1))
                .cast("bigint").alias("n_b")))
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    exp = n / 2
    chi2 = ((F.col("n_a") - exp) * (F.col("n_a") - exp)
            + (F.col("n_b") - exp) * (F.col("n_b") - exp)) / exp
    return per.select(
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        "n_a", "n_b", F.round(chi2, 6).alias("chi2"),
        (chi2 > AB_CHI2_CRIT).alias("srm"))


ANOM_TRAIL = 7    # trailing days in the baseline window
ANOM_Z = 2.0      # |z| flag threshold


def daily_anomalies(events: DataFrame, trail: int = ANOM_TRAIL,
                    z_thresh: float = ANOM_Z) -> DataFrame:
    """Per-(event_type, day) volume anomaly detection: each day's count
    is z-scored against the TRAILING `trail` observed days of the same
    type (current day excluded — the baseline never contains the point
    it judges). Emits (event_type, day, n, base_mean, base_sd, z,
    is_anomaly); days with fewer than 2 trailing observations or zero
    variance get NULL z and are never flagged.

    Float parity by construction: the window aggregates are INTEGER
    sums (sum, sum of squares, count) — exact in both engines — and
    mean/variance/z derive from them in one fixed expression order, so
    no accumulation-order noise exists for the 6-dp round to absorb.
    The window partitions by event_type over its own DAY series
    (bounded by the calendar, not the corpus — the per-type daily
    rollup happens first, map-side combinable)."""
    per = (events
           .groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.count("*").cast("bigint").alias("n")))
    return score_daily_counts(per, trail=trail, z_thresh=z_thresh)


def score_daily_counts(per: DataFrame, trail: int = ANOM_TRAIL,
                       z_thresh: float = ANOM_Z) -> DataFrame:
    """The scoring stage of daily_anomalies, split out so the
    streaming-maintained count store (streaming.pipeline.
    stream_daily_counts) scores its CURRENT snapshot with the exact
    batch semantics. Input: (event_type, day DATE, n)."""
    from pyspark.sql import Window

    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-trail, -1))
    s = F.sum("n").over(w).cast("double")
    ss = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    c = F.count("n").over(w).cast("double")
    # try_divide == DuckDB's NULL-on-zero-divisor `/` (tested parity)
    mean = F.try_divide(s, c)
    var = F.try_divide(ss - F.try_divide(s * s, c), c - 1)
    sd = F.when(var > 0, F.sqrt(var))
    z = F.try_divide(F.col("n") - mean, sd)
    return (per
            .withColumn("base_mean", F.when(c >= 2, F.round(mean, 6)))
            .withColumn("base_sd", F.when(c >= 2, F.round(sd, 6)))
            .withColumn("z", F.when(c >= 2, F.round(z, 6)))
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(z) >= z_thresh, F.lit(False)))
            .select("event_type", F.date_format("day", "yyyy-MM-dd")
                    .alias("day"), "n", "base_mean", "base_sd", "z",
                    "is_anomaly"))


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention — the canonical activity OLAP rollup:
    users are cohorted by the Monday week of their FIRST event;
    (cohort_week, weeks_since, n_active, cohort_size, retention) counts
    how many of each cohort were active again N weeks later. Shape:
    one groupBy for first-event times, per-(user, week) distinct
    activity (map-side combinable), a user-keyed equi-join cohort x
    activity, then a two-key aggregate + a cohort-size join — no
    windows, nothing driver-sized; at 100 TB the user-keyed join is
    the only wide shuffle and both sides are already user-bucketed."""
    firsts = (events.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cw")))
    act = (events
           .select("user_id", F.date_trunc("week", "ts").alias("ew"))
           .distinct())
    per = (act.join(firsts, "user_id")
           .groupBy("cw", F.floor(F.datediff("ew", "cw") / 7)
                    .cast("int").alias("weeks_since"))
           .agg(F.count("*").cast("bigint").alias("n_active")))
    sizes = (firsts.groupBy("cw")
             .agg(F.count("*").cast("bigint").alias("cohort_size")))
    return (per.join(sizes, "cw")
            .select(F.date_format("cw", "yyyy-MM-dd")
                    .alias("cohort_week"),
                    "weeks_since", "n_active", "cohort_size",
                    F.round(F.col("n_active")
                            / F.col("cohort_size").cast("double"), 6)
                    .alias("retention")))


CUPED_CUTOFF = "2024-01-16"  # pre-period < cutoff <= post-period


def cuped_adjust(events: DataFrame) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. 2013, WSDM):
    per-user pre-period spend is the covariate, theta = cov(pre,post)
    / var(pre) pooled across arms, adjusted arm mean = mean_post -
    theta * (mean_pre_arm - mean_pre_all). Arms come from the same
    sticky md5 parity as ab_srm_check.

    Determinism at the hash gate: value quantizes to integer cents
    BEFORE any aggregation, so every sum (x, y, xy, xx, yy) is an
    exact bigint, order-independent across engines; theta / means /
    variance-reduction are closed-form doubles over those integers,
    computed once. Scale: one user-keyed aggregation plus two
    single-row reductions broadcast back — no windows, no collect.
    (At 100 TB swap the bigint cross-moments to DECIMAL(38,0) — same
    plan, wider lattice — to keep whale-user products exact.)"""
    cents = F.round(F.col("value") * 100).cast("bigint")
    pre = F.col("ts") < F.lit(CUPED_CUTOFF).cast("timestamp")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
               16, 10).cast("bigint") % 2 == 0, "A").otherwise("B")
    per_user = (events
                .select("user_id", arm.alias("arm"),
                        F.when(pre, cents).otherwise(F.lit(0)).alias("xc"),
                        F.when(pre, F.lit(0)).otherwise(cents).alias("yc"))
                .groupBy("user_id", "arm")
                .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y")))
    g = (per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    theta = num.cast("double") / den_x.cast("double")
    # square in double: num^2 overflows bigint (ANSI mode would abort)
    rho2 = (num.cast("double") * num.cast("double")
            / (den_x.cast("double") * den_y.cast("double")))
    mean_x_all = F.col("sx").cast("double") / F.col("n").cast("double")
    per_arm = (per_user.groupBy("arm")
               .agg(F.count("*").cast("bigint").alias("n_users"),
                    F.sum("x").alias("ax"), F.sum("y").alias("ay")))
    mean_pre = F.col("ax").cast("double") / F.col("n_users") / 100.0
    mean_post = F.col("ay").cast("double") / F.col("n_users") / 100.0
    return (per_arm.crossJoin(F.broadcast(g))
            .select("arm", "n_users",
                    F.round(mean_post, 6).alias("mean_post"),
                    F.round(mean_post - theta
                            * (mean_pre - mean_x_all / 100.0), 6)
                    .alias("mean_post_adj"),
                    F.round(theta, 6).alias("theta"),
                    F.round(rho2, 6).alias("var_reduction")))


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """CUSUM changepoint per event type over the daily count series
    (Page 1954): cusum_k = prefix_k - k * mean; the changepoint is the
    day with max |cusum| (earliest on ties). Exact integer argmax: the
    comparison key is |d * prefix_k - k * S| (all bigints), so the
    winner is engine-independent; the reported cusum divides by d once
    at the end. One groupBy + one per-type window over O(days) rows."""
    from pyspark.sql import Window
    daily = (events.groupBy("event_type",
                            F.to_date("ts").alias("day"))
             .agg(F.count("*").cast("bigint").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    cum = (daily
           .withColumn("k", F.count("*").over(w).cast("bigint"))
           .withColumn("prefix", F.sum("n").over(w))
           .withColumn("d", F.count("*").over(wt).cast("bigint"))
           .withColumn("s", F.sum("n").over(wt))
           .withColumn("dev", F.col("d") * F.col("prefix")
                       - F.col("k") * F.col("s")))
    pick = Window.partitionBy("event_type").orderBy(
        F.abs("dev").desc(), F.col("day").asc())
    return (cum.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
                    F.round(F.col("dev").cast("double")
                            / F.col("d").cast("double"), 6).alias("cusum"),
                    F.round(F.col("s").cast("double")
                            / F.col("d").cast("double"), 6)
                    .alias("mean_daily"),
                    F.col("d").alias("n_days")))


def engagement_daily(events: DataFrame) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per active day — the
    product-engagement rollup. WAU comes from a COVERING explode:
    each distinct (user, day) contributes to the 7 window-end days it
    covers (day .. day+6), so WAU is a plain distinct-count group —
    no range self-join, no per-day re-scan; the fan-out is a fixed
    x7 on user-day rows, which is how you'd compute it at 100 TB.
    Days with no events emit no row (stickiness is undefined there).
    Integer counts -> one exact division per row."""
    ud = (events.select(F.to_date("ts").alias("day"), "user_id")
          .distinct())
    dau = ud.groupBy("day").agg(
        F.count("*").cast("bigint").alias("dau"))
    cover = (ud.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6)))
        .alias("day"), "user_id").distinct())
    wau = cover.groupBy("day").agg(
        F.count("*").cast("bigint").alias("wau"))
    return (dau.join(wau, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "dau", "wau",
                    F.round(F.col("dau").cast("double")
                            / F.col("wau").cast("double"), 6)
                    .alias("stickiness")))


RFM_BINS = 5


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation per
    user: recency = days since last event (vs the corpus max day),
    frequency = event count, monetary = exact integer-cent spend.
    Quintile = ceil(RFM_BINS * row_number / n) over (metric, user_id)
    — the user_id tiebreak makes every rank, hence every label,
    engine-independent. Segment labels follow the classic rules
    (champion / loyal / at_risk / hibernating / regular).

    Scale shape: the three exact ranks run through
    olap.global_row_number — range-repartitioned two-phase rank, so
    no single-partition window ever sees the O(users) frame; each
    rank costs one range shuffle + one hash shuffle at full
    parallelism and stays exact (the oracle replays it bit-for-bit
    because the rank is deterministic whatever range boundaries the
    sampler picks)."""
    from .olap import global_row_number
    per = (events.groupBy("user_id")
           .agg(F.max(F.to_date("ts")).alias("last_day"),
                F.count("*").cast("bigint").alias("frequency"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .alias("cents")))
    mx = per.agg(F.max("last_day").alias("max_day"))
    per = (per.crossJoin(F.broadcast(mx))
           .withColumn("recency",
                       F.datediff("max_day", "last_day").cast("bigint"))
           .drop("max_day", "last_day"))
    n = per.count()

    def quintile(d: DataFrame, col: str, asc_good: bool,
                 q_col: str) -> DataFrame:
        order = ([F.col(col).asc(), F.col("user_id").asc()] if asc_good
                 else [F.col(col).desc(), F.col("user_id").asc()])
        # size range partitions to the (already counted) user
        # dimension: ~100k users per rank partition, so tiny inputs
        # skip the fan-out while 100-TB user counts get the full
        # two-phase spread
        d = global_row_number(d, order, out_col="__gr",
                              num_partitions=max(1, min(
                                  2048, n // 100_000 + 1)))
        return (d.withColumn(
            q_col,
            F.ceil(F.lit(RFM_BINS) * F.col("__gr") / F.lit(n))
            .cast("int")).drop("__gr"))

    out = quintile(per, "recency", True, "r_q")
    out = quintile(out, "frequency", False, "f_q")
    out = quintile(out, "cents", False, "m_q")
    seg = (F.when((F.col("r_q") <= 2) & (F.col("f_q") <= 2)
                  & (F.col("m_q") <= 2), "champion")
           .when((F.col("r_q") <= 2) & (F.col("f_q") <= 3), "loyal")
           .when((F.col("r_q") >= 4) & (F.col("f_q") >= 4), "hibernating")
           .when(F.col("r_q") >= 4, "at_risk")
           .otherwise("regular"))
    return (out.select("user_id", "recency", "frequency",
                       F.round(F.col("cents") / 100.0, 2)
                       .alias("monetary"),
                       "r_q", "f_q", "m_q", seg.alias("segment")))


def ses_forecast(events: DataFrame) -> DataFrame:
    """Simple exponential smoothing (alpha = 1/2) over the per-type
    daily count series, evaluated at every day plus the one-step-ahead
    forecast for the next day (s_t IS that forecast). alpha is fixed
    at 1/2 so every step is one exact halving:

        s_1 = x_1,   s_t = (x_t + s_{t-1}) / 2

    and BOTH engines execute the identical IEEE expression sequence —
    Spark as an `aggregate` fold over the sorted daily array (the
    holt_forecast shape), DuckDB as a recursive CTE with the same
    formula — so the doubles track bit-for-bit. (An earlier closed
    form accumulated P_t = sum x_i * 2^i in a BIGINT, which silently
    overflows once a series exceeds ~62 days; the fold has no
    magnitude limit.)

    Scale shape: the daily aggregate is map-side combinable; the
    per-type series array is calendar-bounded (O(days)), the fold and
    the arrays_zip re-explosion are single JVM higher-order
    expressions — no Python, no window over raw events."""
    daily = (events.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").cast("bigint").alias("n")))
    series = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("day", "n")))
                   .alias("xs")))
    states = F.aggregate(
        F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.array(F.element_at("xs", 1)["n"].cast("double")),
        lambda acc, x: F.concat(
            acc, F.array((x["n"].cast("double") + F.element_at(acc, -1))
                         / F.lit(2.0))))
    z = series.select(
        "event_type",
        F.explode(F.arrays_zip("xs", states.alias("st"))).alias("e"))
    return z.select(
        "event_type",
        F.date_format(F.col("e")["xs"]["day"], "yyyy-MM-dd").alias("day"),
        F.col("e")["xs"]["n"].alias("n"),
        F.round(F.col("e")["st"], 6).alias("smoothed"))


BENFORD_DIGITS = 9  # leading digits 1..9


def benford_digits(events: DataFrame) -> DataFrame:
    """Benford's-law first-significant-digit audit per event_type: the
    classic fabricated-numbers screen for metric pipelines. Values are
    scaled to exact integer cents (the rfm_segments convention, so the
    leading digit comes from bigint->string, never from float log10 /
    pow, whose edge rounding differs across engines); zero-cent rows
    are excluded (no leading digit). Emits the full event_type x digit
    1..9 grid — absent digits count 0 but still contribute their
    expected mass to the chi-square — with observed count, observed
    and Benford-expected fractions, and the per-type chi-square
    statistic repeated on each row.

    Scale shape: one map-side-combinable count per (type, digit);
    everything after is dimension-sized (|types| * 9 rows) with
    broadcast joins. No windows, no UDFs."""
    cents = F.abs(F.round(F.col("value") * 100)).cast("bigint")
    obs = (events.select("event_type", cents.alias("c"))
           .filter(F.col("c") > 0)
           .select("event_type",
                   F.substring(F.col("c").cast("string"), 1, 1)
                   .cast("bigint").alias("digit"))
           .groupBy("event_type", "digit")
           .agg(F.count("*").cast("bigint").alias("n_obs")))
    types = obs.select("event_type").distinct()
    digits = (events.sparkSession.range(1, BENFORD_DIGITS + 1)
              .select(F.col("id").cast("bigint").alias("digit")))
    grid = (types.crossJoin(F.broadcast(digits))
            .join(obs, ["event_type", "digit"], "left")
            .na.fill({"n_obs": 0}))
    tot = grid.groupBy("event_type").agg(
        F.sum("n_obs").cast("double").alias("n_total"))
    e_frac = (F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)))
    per = (grid.join(F.broadcast(tot), "event_type")
           .withColumn("exp_frac", e_frac)
           .withColumn("chi_term",
                       F.pow(F.col("n_obs") - F.col("n_total")
                             * F.col("exp_frac"), 2)
                       / (F.col("n_total") * F.col("exp_frac"))))
    chi = per.groupBy("event_type").agg(
        F.round(F.sum("chi_term"), 6).alias("chi_square"))
    return (per.join(F.broadcast(chi), "event_type")
            .select("event_type", "digit", "n_obs",
                    F.round(F.col("n_obs") / F.col("n_total"), 6)
                    .alias("obs_frac"),
                    F.round("exp_frac", 6).alias("exp_frac"),
                    "chi_square"))


EF_GAP_S = 8 * 3600   # same session gap as streaming.SESSION_GAP


def eventually_follows(events: DataFrame,
                       gap_s: int = EF_GAP_S) -> DataFrame:
    """Process-mining eventually-follows graph: for every ordered pair
    of event types (A, B), the number of sessions in which A's first
    occurrence precedes B's — the relation process-discovery tools
    (alpha miner, Celonis-style EF graphs) start from, and a strictly
    coarser signal than markov_transitions' immediate-successor counts
    (A can eventually-follow B across any number of intervening
    events). Sessions are the same gap-merged islands as
    event_sessions. Emits (antecedent, consequent, n_sessions,
    support) with support = n_sessions / total sessions.

    Shape: the islands pass is one lag+cumsum window per user (state
    bounded by the user's own events); per-session type-firsts cut
    each session to <= |type| rows, so the within-session pair join is
    a bounded fan-out equi-join on (user, session); the EF counts are
    a type-pair-cardinality aggregate."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us, 1).over(w)
    new_s = (prev.isNull()
             | ((us - prev) >= gap_s * 1_000_000)).cast("bigint")
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    d = (events
         .withColumn("__us", us)
         .withColumn("__sid", sid))
    firsts = (d.groupBy("user_id", "__sid", "event_type")
              .agg(F.min(F.struct(F.col("__us").alias("u"),
                                  F.col("event_id").alias("e")))
                   .alias("fk"))
              .localCheckpoint(eager=True))
    total = (firsts.select("user_id", "__sid").distinct()
             .agg(F.count("*").cast("double").alias("__total")))
    a, b = firsts.alias("a"), firsts.alias("b")
    pairs = (a.join(b, ["user_id", "__sid"])
             .filter((F.col("a.event_type") != F.col("b.event_type"))
                     & (F.col("a.fk") < F.col("b.fk"))))
    return (pairs.groupBy(F.col("a.event_type").alias("antecedent"),
                          F.col("b.event_type").alias("consequent"))
            .agg(F.count("*").cast("bigint").alias("n_sessions"))
            .crossJoin(F.broadcast(total))
            .select("antecedent", "consequent", "n_sessions",
                    F.round(F.col("n_sessions") / F.col("__total"), 6)
                    .alias("support")))


EXPECT_VALUE_MIN = 0.0
EXPECT_VALUE_MAX = 100.0      # deliberately tight: the long value tail
                              # SHOULD fail, proving the audit reports
                              # failures instead of masking them
EXPECT_TYPES = ("click", "error", "purchase", "signup", "view")


def expectations_audit(events: DataFrame) -> DataFrame:
    """Declarative data-contract audit (the Great-Expectations /
    dbt-test staple): evaluate a fixed expectation suite — not-null,
    key uniqueness, value bounds, enum membership — in ONE scan and
    emit a verdict row per rule: (column, rule, param, n_rows,
    n_failed, passed). A failing rule reports its failure count, never
    aborts the job: contracts gate the PUBLISH, not the compute
    (guards.py's quarantine discipline at dataset granularity).

    All checks are map-side-combinable counts folded into a single
    aggregate; the rule explosion is a literal unpivot of that one
    row, so the audit costs one pass whatever the suite size."""
    null_ck = lambda c: F.sum(F.col(c).isNull().cast("bigint"))
    agg = events.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        null_ck("event_id").alias("f_eid_null"),
        (F.count("*") - F.countDistinct("event_id")).cast("bigint")
        .alias("f_eid_dup"),
        F.sum((F.col("value") < EXPECT_VALUE_MIN).cast("bigint"))
        .alias("f_val_min"),
        F.sum((F.col("value") > EXPECT_VALUE_MAX).cast("bigint"))
        .alias("f_val_max"),
        F.sum((~F.col("event_type").isin(*EXPECT_TYPES))
              .cast("bigint")).alias("f_type_enum"),
        null_ck("user_id").alias("f_uid_null"))
    rules = [
        ("event_id", "not_null", "", "f_eid_null"),
        ("event_id", "unique", "", "f_eid_dup"),
        ("value", "min", str(EXPECT_VALUE_MIN), "f_val_min"),
        ("value", "max", str(EXPECT_VALUE_MAX), "f_val_max"),
        ("event_type", "enum", "|".join(EXPECT_TYPES), "f_type_enum"),
        ("user_id", "not_null", "", "f_uid_null"),
    ]
    stack = F.expr("stack({}, {})".format(
        len(rules),
        ", ".join(f"'{c}', '{r}', '{p}', {m}" for c, r, p, m in rules)
    )).alias("column", "rule", "param", "n_failed")
    return (agg.select("n_rows", stack)
            .select(F.col("column").alias("col_name"), "rule", "param",
                    "n_rows", F.col("n_failed").cast("bigint")
                    .alias("n_failed"),
                    (F.col("n_failed") == 0).alias("passed")))


HT_RATE_PCT = 10    # deterministic 10% md5 sample


def ht_estimate_audit(events: DataFrame,
                      rate_pct: int = HT_RATE_PCT) -> DataFrame:
    """Approximate-query-processing accuracy audit: estimate per-type
    row counts and value totals from a deterministic md5 p% sample
    with Horvitz-Thompson inverse-probability weighting, next to the
    exact answers — the error column is the evidence for (or against)
    answering dashboards from the sample at 100 TB instead of scanning
    everything. Sampling is the same md5-threshold idiom as
    doc_hash_sample, so membership is replayable by the oracle.

    Two map-side-combinable aggregates over one scan (WHEN-guarded
    sampled measures next to exact ones) — the audit costs one pass."""
    in_sample = (F.conv(F.substring(F.md5(F.col("event_id")
                                          .cast("string")), 1, 8),
                        16, 10).cast("bigint") % 100) < rate_pct
    w = 100.0 / rate_pct
    return (events
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_exact"),
                 F.round(F.sum("value"), 6).alias("sum_exact"),
                 F.sum(in_sample.cast("bigint")).cast("bigint")
                 .alias("n_sampled"),
                 (F.sum(in_sample.cast("bigint")) * F.lit(w))
                 .cast("bigint").alias("n_est"),
                 F.round(F.sum(F.when(in_sample, F.col("value"))
                               .otherwise(0.0)) * w, 6)
                 .alias("sum_est"))
            .select("event_type", "n_exact", "n_sampled", "n_est",
                    "sum_exact", "sum_est",
                    F.round(F.abs(F.col("sum_est") - F.col("sum_exact"))
                            / F.col("sum_exact"), 6)
                    .alias("rel_err")))


ENC_COLS = ("event_type", "props")


def encoding_benefit_audit(events: DataFrame,
                           cols: tuple = ENC_COLS) -> DataFrame:
    """Storage-layout probe: for each candidate string column, the
    dictionary-encoding benefit estimate a columnar writer computes —
    plain size (sum of value byte lengths) vs dictionary size
    (distinct values stored once + ceil(log2(ndv))-bit codes per
    row). A ratio near 1 says skip the dictionary (high-cardinality
    payloads); well under 1 says dictionary wins (enums). The same
    arithmetic drives parquet's per-chunk PLAIN vs RLE_DICTIONARY
    choice; surfaced as a table so layout decisions are measured, not
    guessed.

    Per column: one aggregate over the scan + one over the distinct
    value set (bounded by ndv); integer byte math except the final
    ratio."""
    outs = []
    for c in cols:
        base = events.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(c).cast("bigint").alias("ndv"),
            F.sum(F.length(c)).cast("bigint").alias("plain_bytes"))
        dlen = (events.select(c).distinct()
                .agg(F.sum(F.length(c)).cast("bigint")
                     .alias("dict_val_bytes")))
        bits = F.greatest(F.ceil(F.log2("ndv")), F.lit(1))
        dict_bytes = (F.col("dict_val_bytes")
                      + F.ceil(F.col("n_rows") * bits / 8))             .cast("bigint")
        outs.append(base.crossJoin(F.broadcast(dlen)).select(
            F.lit(c).alias("col_name"), "n_rows", "ndv",
            "plain_bytes", dict_bytes.alias("dict_bytes"),
            F.round(dict_bytes / F.col("plain_bytes"), 6)
            .alias("dict_ratio")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


PASSK_KS = (1, 5, 10)
PASSK_THRESHOLD = 40.0


def pass_at_k(events: DataFrame, ks=PASSK_KS,
              threshold: float = PASSK_THRESHOLD) -> DataFrame:
    """Unbiased pass@k estimation (Chen et al. 2021, the Codex
    estimator) over an attempts table — the eval-suite aggregation an
    LLM pipeline runs nightly: tasks = users, attempts = their
    events, an attempt is correct when value >= threshold; pass@k =
    E_tasks[1 - C(n-c, k)/C(n, k)], computed per task as the
    LEFT-ASSOCIATIVE product prod_{i<k} (n-c-i)/(n-i) — hits zero
    exactly when fewer than k failures exist (pass@k = 1), no
    combinatorial overflow, and the same factor order in the DuckDB
    twin makes the doubles track bit-identically. One
    map-side-combinable groupBy per task + one global mean per k."""
    per_task = (events.groupBy("user_id")
                .agg(F.count("*").alias("n"),
                     F.sum((F.col("value") >= threshold).cast("int"))
                     .alias("c")))
    out = None
    for k in ks:
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * ((F.col("n") - F.col("c") - F.lit(i))
                           .cast("double")
                           / (F.col("n") - F.lit(i)))
        row = (per_task.filter(F.col("n") >= k)
               .agg(F.count("*").cast("bigint").alias("n_tasks"),
                    F.round(F.avg(F.lit(1.0) - prod), 6)
                    .alias("pass_at_k"))
               .select(F.lit(k).cast("int").alias("k"), "n_tasks",
                       "pass_at_k"))
        out = row if out is None else out.unionByName(row)
    return out


BT_ITER = 5


def bradley_terry_ratings(events: DataFrame,
                          n_iter: int = BT_ITER) -> DataFrame:
    """Bradley-Terry preference ratings via Hunter's MM algorithm —
    the model behind every RLHF preference pipeline and chatbot-arena
    leaderboard. Matches derive deterministically from the events
    stream (consecutive event_ids with different users compete,
    higher value wins, lower user id wins ties); the MM iteration
    p_i <- W_i / sum_j n_ij / (p_i + p_j), renormalized to sum N and
    rounded to 12 dp per round, runs a FIXED n_iter times so the
    DuckDB twin unrolls the identical recurrence.

    Scale shape: the state is one rating per player and the pair
    table aggregates matches once up front (map-side combinable);
    each round is one equi-join per side of the pair table + one
    groupBy sum — the exact shape of pagerank_fixed, with players as
    nodes and head-to-head counts as edges."""
    e1 = events.select(F.col("event_id").alias("m"),
                       F.col("user_id").alias("u1"),
                       F.col("value").alias("v1"))
    e2 = events.select((F.col("event_id") - 1).alias("m"),
                       F.col("user_id").alias("u2"),
                       F.col("value").alias("v2"))
    matches = (e1.join(e2, "m")
               .filter(F.col("u1") != F.col("u2"))
               .select(
                   F.when((F.col("v1") > F.col("v2"))
                          | ((F.col("v1") == F.col("v2"))
                             & (F.col("u1") < F.col("u2"))),
                          F.col("u1")).otherwise(F.col("u2"))
                   .alias("winner"),
                   F.when((F.col("v1") > F.col("v2"))
                          | ((F.col("v1") == F.col("v2"))
                             & (F.col("u1") < F.col("u2"))),
                          F.col("u2")).otherwise(F.col("u1"))
                   .alias("loser")))
    pairs = (matches
             .select(F.least("winner", "loser").alias("i"),
                     F.greatest("winner", "loser").alias("j"))
             .groupBy("i", "j").agg(F.count("*").alias("nij"))
             .localCheckpoint(eager=True))
    wins = (matches.groupBy(F.col("winner").alias("u"))
            .agg(F.count("*").alias("w")))
    played = (matches.select(F.col("winner").alias("u"))
              .unionByName(matches.select(F.col("loser").alias("u")))
              .groupBy("u").agg(F.count("*").alias("n_matches")))
    players = (played.join(wins, "u", "left")
               .select("u", F.coalesce("w", F.lit(0)).alias("w"),
                       "n_matches")
               .localCheckpoint(eager=True))
    n_players = players.count()
    sym = (pairs.select(F.col("i").alias("u"), F.col("j").alias("o"),
                        "nij")
           .unionByName(pairs.select(F.col("j").alias("u"),
                                     F.col("i").alias("o"), "nij")))
    p = players.select("u", F.lit(1.0).alias("r"))
    for _ in range(n_iter):
        denom = (sym
                 .join(p.select(F.col("u"), F.col("r").alias("r_u")),
                       "u")
                 .join(p.select(F.col("u").alias("o"),
                                F.col("r").alias("r_o")), "o")
                 .groupBy("u")
                 .agg(F.sum(F.col("nij")
                            / (F.col("r_u") + F.col("r_o")))
                      .alias("d")))
        raw = (players.join(denom, "u")
               .select("u", (F.col("w") / F.col("d")).alias("r")))
        tot = raw.agg(F.sum("r").alias("t"))
        p = (raw.crossJoin(F.broadcast(tot))
             .select("u", F.round(F.col("r") * n_players / F.col("t"),
                                  12).alias("r"))
             .localCheckpoint(eager=True))
    return (players.join(p, "u")
            .select(F.col("u").alias("user_id"),
                    F.round("r", 6).alias("rating"),
                    F.col("w").cast("bigint").alias("wins"),
                    F.col("n_matches").cast("bigint")
                    .alias("n_matches")))


BANDIT_THRESHOLD = 40.0


def bandit_posteriors(events: DataFrame,
                      threshold: float = BANDIT_THRESHOLD) -> DataFrame:
    """Multi-armed-bandit state from logged feedback: per event-type
    arm, Beta(1+s, 1+f) posterior over the success rate (success =
    value >= threshold) and the UCB1 index at the logged horizon —
    the nightly batch job that seeds an online Thompson/UCB policy
    from historical data. One map-side-combinable groupBy; the
    horizon total broadcasts as a 1-row dimension."""
    arms = (events.groupBy(F.col("event_type").alias("arm"))
            .agg(F.count("*").alias("n"),
                 F.sum((F.col("value") >= threshold).cast("int"))
                 .alias("s")))
    total = events.agg(F.count("*").alias("t"))
    return (arms.crossJoin(F.broadcast(total))
            .select("arm", F.col("n").cast("bigint").alias("n_pulls"),
                    F.col("s").cast("bigint").alias("n_successes"),
                    F.round((F.lit(1.0) + F.col("s"))
                            / (F.lit(2.0) + F.col("n")), 6)
                    .alias("posterior_mean"),
                    F.round(F.col("s") / F.col("n")
                            + F.sqrt(F.lit(2.0) * F.log(F.col("t"))
                                     / F.col("n")), 6)
                    .alias("ucb1")))


# --- difference-in-differences ---------------------------------------------

DID_CUTOVER_DAY = 16


def did_estimate(events: DataFrame) -> DataFrame:
    """2x2 difference-in-differences over the event log: treatment arm
    by the shared md5-user assignment (the ab_srm idiom), post period =
    day-of-month >= DID_CUTOVER_DAY, cell means of value, effect =
    (treat_post - treat_pre) - (ctrl_post - ctrl_pre) — the
    quasi-experimental estimator for a launch that can't be randomized
    at exposure time (CUPED's sibling; event_cuped handles the
    randomized case). ONE map-side-combinable aggregate over the scan
    (four conditional means), single-row output — nothing here grows
    with data size."""
    arm_t = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                1, 8), 16, 10)
             .cast("bigint") % 2 == 0)
    post = F.dayofmonth("ts") >= DID_CUTOVER_DAY

    def cell(t: bool, p: bool):
        cond = (arm_t == F.lit(t)) & (post == F.lit(p))
        return F.avg(F.when(cond, F.col("value")))

    return events.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(cell(False, False), 6).alias("ctrl_pre"),
        F.round(cell(False, True), 6).alias("ctrl_post"),
        F.round(cell(True, False), 6).alias("treat_pre"),
        F.round(cell(True, True), 6).alias("treat_post"),
        F.round((cell(True, True) - cell(True, False))
                - (cell(False, True) - cell(False, False)), 6)
        .alias("did"))


# --- Holt linear-trend forecast --------------------------------------------

HOLT_HORIZONS = (1, 2, 3)


def holt_forecast(events: DataFrame) -> DataFrame:
    """Holt double exponential smoothing (alpha = beta = 1/2) over the
    per-type daily count series -> one row per event_type with the
    final level/trend state and the h-step-ahead forecasts
    level + h*trend (ses_forecast is the trendless sibling; Holt
    tracks a drifting daily volume). Init: level_1 = x_1, trend_1 = 0.

    alpha = beta = 1/2 makes every step two exact halvings:
        l_t = (x_t + l_{t-1} + b_{t-1}) / 2
        b_t = (l_t - l_{t-1} + b_{t-1}) / 2
    and BOTH engines execute the identical IEEE expression sequence —
    Spark as an `aggregate` fold over the sorted daily array, DuckDB
    as a recursive CTE with the same two formulas — so the doubles
    track bit-for-bit with no per-step rounding needed.

    Scale shape: the daily aggregate is map-side combinable; the
    per-type series array is bounded by the calendar (O(days), the
    same bound event_seasonality relies on), so sort_array +
    collect_list state stays dimension-sized however large the event
    log grows; the fold itself is one JVM higher-order expression —
    no Python, no window over raw events."""
    daily = (events.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").cast("double").alias("n")))
    series = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("day", "n")))
                   .alias("xs")))
    fold = F.aggregate(
        F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(F.element_at("xs", 1)["n"].alias("l"),
                 F.lit(0.0).alias("b")),
        lambda acc, x: F.struct(
            ((x["n"] + acc["l"] + acc["b"]) / F.lit(2.0)).alias("l"),
            ((((x["n"] + acc["l"] + acc["b"]) / F.lit(2.0))
              - acc["l"] + acc["b"]) / F.lit(2.0)).alias("b")))
    out = series.select(
        "event_type", F.size("xs").cast("int").alias("n_days"),
        fold.alias("st"))
    cols = ["event_type", "n_days",
            F.round(F.col("st")["l"], 6).alias("level"),
            F.round(F.col("st")["b"], 6).alias("trend")]
    for h in HOLT_HORIZONS:
        cols.append(F.round(F.col("st")["l"]
                            + F.lit(float(h)) * F.col("st")["b"], 6)
                    .alias(f"fc_{h}"))
    return out.select(*cols)


# --- A/B power analysis ----------------------------------------------------

POWER_Z_ALPHA = 1.959964   # two-sided alpha = 0.05
POWER_Z_BETA = 0.841621    # power = 0.80
POWER_MDE_REL = 0.05       # minimum detectable effect, relative


def power_analysis(events: DataFrame,
                   mde_rel: float = POWER_MDE_REL) -> DataFrame:
    """Per-event-type A/B sample-size calculation from OBSERVED
    variance: n per arm = 2 (z_a + z_b)^2 sigma^2 / delta^2 with
    delta = mde_rel * mean — the pre-experiment planning twin of
    event_ab_srm (which audits a running one) and event_cuped (which
    shrinks sigma after the fact). Also emits the days-to-power at
    the type's observed daily event rate, rounding UP (ceil) like
    every power calculator.

    One map-side-combinable aggregate (count/mean/variance/active
    days); z constants are published literals shared with the oracle,
    so both engines compute the identical closed form."""
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    per = (events.groupBy("event_type")
           .agg(F.count("*").cast("bigint").alias("n_obs"),
                F.avg("value").alias("mu"),
                F.var_samp("value").alias("s2"),
                F.count_distinct(F.to_date("ts")).alias("n_days")))
    delta = F.lit(mde_rel) * F.col("mu")
    # mean == 0 makes delta^2 = 0: nullif the denominator so both
    # engines publish NULL (undefined sample size) instead of Spark
    # NULL vs DuckDB inf → CAST abort.
    n_arm = F.ceil(F.lit(2.0 * z2) * F.col("s2")
                   / F.nullif(delta * delta, F.lit(0.0)))
    return per.select(
        "event_type", "n_obs",
        F.round("mu", 6).alias("mean_value"),
        F.round("s2", 6).alias("var_value"),
        n_arm.cast("bigint").alias("n_per_arm"),
        F.ceil(F.lit(2.0) * n_arm
               / (F.col("n_obs") / F.col("n_days")))
        .cast("bigint").alias("days_to_power"))


# --- winsorized robust statistics ------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_stats(events: DataFrame, lo: float = WINSOR_LO,
                     hi: float = WINSOR_HI) -> DataFrame:
    """Per-type winsorized mean: clip values at the rank-picked
    lo/hi percentiles (value at row ceil(q*n) under the deterministic
    (value, event_id) order — rank picking, NOT interpolation, so both
    engines select the identical concrete value), then one aggregate
    of raw vs clipped means and the clip counts — the robust-mean
    companion to the IQR/z-score outlier detectors (which FLAG rows;
    winsorizing bounds their influence instead).

    Two passes: a per-type ordered window finds the two threshold
    rows (the same shape event_exact_percentiles already pays), the
    thresholds broadcast back as a dimension, and the clip itself is
    one map-side-combinable aggregate."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    rk = (events.select("event_type", "value", "event_id")
          .withColumn("r", F.row_number().over(w))
          .withColumn("n", F.count("*").over(wn)))
    th = (rk.groupBy("event_type")
          .agg(F.max(F.when(F.col("r")
                            == F.ceil(F.lit(lo) * F.col("n")),
                            F.col("value"))).alias("p_lo"),
               F.max(F.when(F.col("r")
                            == F.ceil(F.lit(hi) * F.col("n")),
                            F.col("value"))).alias("p_hi")))
    clipped = (events.join(F.broadcast(th), "event_type")
               .select("event_type", "value", "p_lo", "p_hi",
                       F.greatest(F.least("value", F.col("p_hi")),
                                  F.col("p_lo")).alias("wv")))
    return (clipped.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.first("p_lo"), 6).alias("p_lo"),
                 F.round(F.first("p_hi"), 6).alias("p_hi"),
                 F.round(F.avg("value"), 6).alias("mean_raw"),
                 F.round(F.avg("wv"), 6).alias("mean_winsorized"),
                 F.sum((F.col("value") < F.col("p_lo")).cast("int"))
                 .cast("bigint").alias("n_clipped_lo"),
                 F.sum((F.col("value") > F.col("p_hi")).cast("int"))
                 .cast("bigint").alias("n_clipped_hi")))


# --- rolling-origin forecast backtest --------------------------------------


def ses_backtest(events: DataFrame) -> DataFrame:
    """Rolling-origin one-step-ahead backtest of the SES forecaster:
    s_{t-1} IS the day-t forecast, so the whole evaluation is one lag
    over ses_forecast's per-day output — per type: MAE, RMSE, the
    naive last-value baseline's MAE, and the MASE-style skill ratio
    (< 1 means the smoother beats carry-forward). Forecast evaluation
    as a first-class operator: a forecaster without a backtest is a
    guess. Consumes the ROUNDED published forecasts (what a consumer
    sees), the same values the oracle recomputes."""
    s = ses_forecast(events)
    w = Window.partitionBy("event_type").orderBy("day")
    e = (s.withColumn("fc", F.lag("smoothed").over(w))
         .withColumn("prev_n", F.lag("n").over(w))
         .filter(F.col("fc").isNotNull()))
    err = F.abs(F.col("n") - F.col("fc"))
    nerr = F.abs((F.col("n") - F.col("prev_n")).cast("double"))
    return (e.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_eval"),
                 F.round(F.avg(err), 6).alias("mae"),
                 F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
                 F.round(F.avg(nerr), 6).alias("mae_naive"),
                 F.round(F.try_divide(F.avg(err), F.nullif(
                     F.avg(nerr), F.lit(0.0))), 6).alias("skill")))


# --- equi-width histogram --------------------------------------------------

HIST_BINS = 12


def value_histogram(events: DataFrame,
                    n_bins: int = HIST_BINS) -> DataFrame:
    """Per-type equi-width histogram of value: bin i covers
    [min + i*w, min + (i+1)*w), w = (max-min)/n_bins, the max value
    folded into the last bin — the dashboard/distribution-viz feed
    next to value_distribution's moments. Two passes: per-type
    min/max (map-side combinable) broadcast back as a dimension, then
    one groupBy over the binned scan; empty bins are absent by
    construction (the consumer densifies)."""
    rng = (events.groupBy("event_type")
           .agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    w = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    # hi == lo (a constant-valued type) makes the bin width 0; both
    # engines must short-circuit to bin 0 rather than divide (DuckDB's
    # IEEE '/' gives inf and CAST(inf AS INT) aborts the gate).
    binned = (events.join(F.broadcast(rng), "event_type")
              .select("event_type", "lo", "hi",
                      F.when(F.col("hi") == F.col("lo"), F.lit(0))
                      .otherwise(
                          F.least(F.floor((F.col("value") - F.col("lo"))
                                          / w).cast("int"),
                                  F.lit(n_bins - 1)))
                      .alias("bin")))
    return (binned.groupBy("event_type", "bin")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.first("lo")
                         + F.col("bin") * (F.first("hi") - F.first("lo"))
                         / F.lit(float(n_bins)), 6).alias("bin_lo")))


# --- differentially-private count release ----------------------------------

DP_EPSILON = 1.0
DP_SEED = "dpseed"


def dp_noisy_counts(events: DataFrame, epsilon: float = DP_EPSILON,
                    seed: str = DP_SEED) -> DataFrame:
    """Laplace-mechanism count release per event type: count + Lap(1/eps)
    noise with the noise drawn DETERMINISTICALLY from an md5 uniform via
    the inverse CDF (u in (-1/2, 1/2), noise = -(1/eps) * sign(u) *
    ln(1 - 2|u|)) — the publishable-aggregate member of the privacy
    family (event_k_anonymity and event_l_diversity audit; user_erasure
    deletes; this RELEASES). A count query has sensitivity 1, so
    Lap(1/eps) gives eps-DP; the deterministic seed makes the release
    reproducible across engines and reruns (a production system would
    draw fresh noise per release and budget eps across them — noted,
    not reproduced, because the oracle gate needs bit-equality).

    One map-side-combinable aggregate; the noise is one md5 + one ln
    per OUTPUT row."""
    per = (events.groupBy("event_type")
           .agg(F.count("*").cast("bigint").alias("true_n")))
    u = ((F.conv(F.substring(F.md5(F.concat("event_type", F.lit(seed))),
                             1, 6), 16, 10).cast("double") + 0.5)
         / F.lit(16777216.0) - F.lit(0.5))
    noise = (F.lit(-1.0 / epsilon) * F.signum(u)
             * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u)))
    return per.select(
        "event_type", "true_n",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_n") + noise, 6).alias("released_n"))


# --- Wald SPRT sequential test ---------------------------------------------

SPRT_P0, SPRT_P1 = 0.45, 0.55      # H0 vs H1 conversion rates
SPRT_ALPHA = 0.05                  # -> upper bound ln((1-b)/a)
SPRT_BETA = 0.20                   # -> lower bound ln(b/(1-a))


def sprt_monitor(events: DataFrame, threshold: float = BANDIT_THRESHOLD
                 ) -> DataFrame:
    """Wald sequential probability-ratio test over the daily
    conversion stream, per event type: cumulative log-likelihood
    ratio of H1 (p=SPRT_P1) vs H0 (p=SPRT_P0) on the success =
    (value >= threshold) indicator, with the day-by-day decision
    against Wald's alpha/beta bounds — the always-monitoring member
    of the experimentation family (power_analysis sizes a fixed
    horizon; SPRT stops as soon as the evidence does).

    llr_t = cumsum_days[ s_d * ln(p1/p0) + (n_d - s_d) *
    ln((1-p1)/(1-p0)) ] — the log constants fold at plan time, the
    daily aggregate is map-side combinable, and the cumsum is one
    ordered window over O(days) rows per type."""
    import math as _m
    l_s = _m.log(SPRT_P1 / SPRT_P0)
    l_f = _m.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
    hi = _m.log((1.0 - SPRT_BETA) / SPRT_ALPHA)
    lo = _m.log(SPRT_BETA / (1.0 - SPRT_ALPHA))
    daily = (events.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").alias("n"),
                  F.sum((F.col("value") >= threshold).cast("int"))
                  .alias("s")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    llr = F.sum(F.col("s") * F.lit(l_s)
                + (F.col("n") - F.col("s")) * F.lit(l_f)).over(w)
    return daily.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.col("s").cast("bigint").alias("s"),
        F.round(llr, 6).alias("llr"),
        F.when(llr >= F.lit(hi), F.lit("accept_h1"))
        .when(llr <= F.lit(lo), F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"))


# --- MAD robust anomalies --------------------------------------------------

MAD_SIGMA = 3.5          # Iglewicz-Hoaglin modified-z cutoff
MAD_CONSISTENCY = 1.4826  # Gaussian consistency constant


def mad_outliers(events: DataFrame, cutoff: float = MAD_SIGMA
                 ) -> DataFrame:
    """Median-absolute-deviation outlier summary per event type:
    modified z = |x - median| / (1.4826 * MAD) > cutoff
    (Iglewicz & Hoaglin) — the robust third member of the outlier
    family (IQR fences and 3-sigma z-scores both move when the
    outliers themselves inflate the spread; MAD doesn't). Medians are
    RANK-PICKED (value at row ceil(n/2) under the deterministic
    (value, event_id) order), not interpolated, so both engines
    select identical concrete values; the same trick re-runs on the
    absolute deviations for the MAD.

    Two ordered windows (the event_exact_percentiles shape) + one
    final aggregate; thresholds travel as a broadcast dimension."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    rk = (events.select("event_type", "value", "event_id")
          .withColumn("r", F.row_number().over(w))
          .withColumn("n", F.count("*").over(wn)))
    med = (rk.groupBy("event_type")
           .agg(F.max(F.when(F.col("r") == F.ceil(F.col("n") / 2),
                             F.col("value"))).alias("med")))
    dev = (events.join(F.broadcast(med), "event_type")
           .select("event_type", "event_id", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("ad")))
    w2 = Window.partitionBy("event_type").orderBy("ad", "event_id")
    rk2 = (dev.withColumn("r", F.row_number().over(w2))
           .withColumn("n", F.count("*").over(wn)))
    mad = (rk2.groupBy("event_type")
           .agg(F.max(F.when(F.col("r") == F.ceil(F.col("n") / 2),
                             F.col("ad"))).alias("mad")))
    # MAD = 0 (over half a type's values equal the median) would turn
    # z into a div-by-zero: Spark's non-ANSI '/' yields NULL but
    # DuckDB's IEEE '/' yields inf/nan and aborts the gate on the
    # int cast — nullif the denominator on BOTH engines so degenerate
    # distributions report n_outliers = 0 and a NULL max_modified_z.
    z = F.col("ad") / F.nullif(F.lit(MAD_CONSISTENCY) * F.col("mad"),
                               F.lit(0.0))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.first("med"), 6).alias("median"),
                 F.round(F.first("mad"), 6).alias("mad"),
                 F.sum(F.when(z > cutoff, 1).otherwise(0))
                 .cast("bigint").alias("n_outliers"),
                 F.round(F.max(z), 6).alias("max_modified_z")))
