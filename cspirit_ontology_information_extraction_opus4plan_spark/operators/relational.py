"""Relational star-schema operators over the TPC-H-shaped side tables
(lineitem/orders/customer/nation/region/supplier) — the classic
fact-to-dimension analytics an engine must plan well, kept next to the
KG/document surface so a reference user's relational workloads also
have a home.

Scale notes:
  * the star rollup joins the FACT (lineitem) up the dimension chain;
    nation/region are genuinely bounded dimensions -> explicit
    broadcast; customer/orders are corpus-scale -> shuffle equi-joins
    Catalyst is free to reorder. Money math runs in DECIMAL: double
    inputs cast to DECIMAL(18,4) (deterministic — a binary double is
    never exactly halfway between two scale-4 decimals), so the
    revenue sum is EXACT and order-independent, unlike a double sum
    whose accumulation order differs across engines; the final cast
    back to double happens after rounding, once per output row.
  * the FK orphan audit is one left_anti count per relation — the
    referential-integrity QC a warehouse load runs post-ingest; each
    probe is a semi-join the planner can broadcast when the parent is
    small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"


def load_rel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def star_revenue_rollup(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, nation: DataFrame,
                        region: DataFrame) -> DataFrame:
    """Revenue per (region, order year): the TPC-H Q5-family star
    rollup. revenue = sum(extendedprice * (1 - discount)) in exact
    decimal; emits (r_name, o_year, n_items, revenue)."""
    rev = (F.col("l_extendedprice").cast(MONEY)
           * (F.lit(1).cast(MONEY) - F.col("l_discount").cast(MONEY)))
    return (lineitem
            .select("l_orderkey", rev.alias("rev"))
            .join(orders.select("o_orderkey", "o_custkey",
                                F.year("o_orderdate").cast("bigint")
                                .alias("o_year")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer.select("c_custkey", "c_nationkey"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation.select("n_nationkey",
                                            "n_regionkey")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region.select("r_regionkey", "r_name")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("r_name", "o_year")
            .agg(F.count("*").cast("bigint").alias("n_items"),
                 F.round(F.sum("rev"), 2).cast("double")
                 .alias("revenue")))


SCD2_OPEN_END = "9999-12-31"  # open-interval sentinel, shared w/ oracle


def scd2_dimension(changes: DataFrame, key: str, ts: str, attr: str,
                   seq: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 build: compress a change stream
    (key, ts, attr) into versioned validity intervals — the standard
    warehouse dimension-history table. Steps:

      1. dedup to one change per (key, day): deterministic max_by(seq)
         winner, so replayed/duplicate feeds converge;
      2. collapse consecutive equal attribute values (lag compare) —
         only genuine transitions open a new version;
      3. assign half-open [valid_from, valid_to) via lead(), version
         numbers via row_number(), is_current on the open row.

    Output: (key, version, attr, valid_from, valid_to, is_current),
    valid_to = '9999-12-31' on the current version.

    Scale shape: every window partitions by the dimension key — fully
    parallel, per-key history is bounded (a dimension's change count,
    not the fact volume), so no global sort and no skew beyond the
    hottest key's own history. Distinct from the bitemporal snapshot
    read (kg_snapshot_asof): this BUILDS the interval table from a
    change log; that QUERIES one."""
    w = Window.partitionBy(key).orderBy("__d")
    transitions = _scd2_transitions(changes, key, ts, attr, seq)
    vt = F.lead(F.date_format("__d", "yyyy-MM-dd")).over(w)
    return (transitions
            .select(F.col(key),
                    F.row_number().over(w).cast("bigint").alias("version"),
                    F.col("__a").alias(attr),
                    F.date_format("__d", "yyyy-MM-dd").alias("valid_from"),
                    F.coalesce(vt, F.lit(SCD2_OPEN_END)).alias("valid_to"),
                    F.when(vt.isNull(), F.lit(1)).otherwise(F.lit(0))
                    .cast("bigint").alias("is_current")))


def _scd2_transitions(changes: DataFrame, key: str, ts: str, attr: str,
                      seq: str) -> DataFrame:
    """(key, __d, __a) genuine transitions of a change stream: one
    deterministic winner per (key, day), consecutive equal values
    collapsed. Shared by the full build and the incremental apply.

    ONE shuffle end-to-end: the explicit repartition on the key alone
    satisfies both the (key, day) groupBy's clustered distribution
    (partitioning on a subset of the grouping keys co-locates every
    group) and the downstream per-key windows — without it the plan
    pays two exchanges, (key, day) then (key). Pinned by a plan test."""
    w = Window.partitionBy(key).orderBy("__d")
    per_day = (changes
               .select(F.col(key),
                       F.to_date(ts).alias("__d"),
                       F.col(attr).alias("__a"),
                       F.col(seq).alias("__s"))
               .repartition(key)
               .groupBy(key, "__d")
               .agg(F.max_by("__a", "__s").alias("__a")))
    return (per_day
            .withColumn("__prev", F.lag("__a").over(w))
            .filter(F.col("__prev").isNull()
                    | (F.col("__a") != F.col("__prev")))
            .drop("__prev"))


def scd2_apply(dim: DataFrame, changes: DataFrame, key: str, ts: str,
               attr: str, seq: str) -> DataFrame:
    """Incremental SCD Type-2 maintenance: apply a NEW batch of changes
    (all later than every date already in `dim` — the nightly-batch
    contract) to an existing dimension, producing exactly what a full
    rebuild over old+new changes would — without touching the closed
    history. The 100-TB point: the nightly job's cost is O(new batch +
    current rows), never O(all history).

    Steps, all equi-keyed on the dimension key:
      1. reduce the new batch to genuine transitions (shared helper);
      2. drop each key's LEADING new transition when it equals the
         key's current attribute (cross-boundary collapse — a no-op
         "change" must not open a version);
      3. close the key's open row at its first surviving new
         transition date; renumber new versions from the key's current
         version; last new row becomes the open one.

    Keys unseen by `dim` start at version 1. Rows of `dim` for keys
    with no surviving new transitions pass through untouched."""
    wk = Window.partitionBy(key).orderBy("__d")
    cur = (dim.filter(F.col("is_current") == 1)
           .select(F.col(key),
                   F.col(attr).alias("__cur_a"),
                   F.col("version").alias("__cur_v")))
    inc = (_scd2_transitions(changes, key, ts, attr, seq)
           .withColumn("__rn", F.row_number().over(wk))
           .join(cur, key, "left")
           # NULL-safe: a key with no current row (new customer) keeps
           # its leading transition — `__a == NULL` would be NULL and
           # silently drop it under a plain negated conjunction
           .filter(F.col("__cur_a").isNull()
                   | (F.col("__rn") != 1)
                   | (F.col("__a") != F.col("__cur_a")))
           .withColumn("__rn2", F.row_number().over(wk)))
    vt = F.lead(F.date_format("__d", "yyyy-MM-dd")).over(wk)
    new_rows = inc.select(
        F.col(key),
        (F.coalesce(F.col("__cur_v"), F.lit(0)) + F.col("__rn2"))
        .cast("bigint").alias("version"),
        F.col("__a").alias(attr),
        F.date_format("__d", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(vt, F.lit(SCD2_OPEN_END)).alias("valid_to"),
        F.when(vt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint").alias("is_current"))
    closes = (inc.groupBy(key)
              .agg(F.date_format(F.min("__d"), "yyyy-MM-dd")
                   .alias("__close_at")))
    kept = (dim.join(closes, key, "left")
            .withColumn(
                "valid_to",
                F.when((F.col("is_current") == 1)
                       & F.col("__close_at").isNotNull(),
                       F.col("__close_at"))
                .otherwise(F.col("valid_to")))
            .withColumn(
                "is_current",
                F.when(F.col("__close_at").isNotNull(), F.lit(0))
                .otherwise(F.col("is_current")).cast("bigint"))
            .drop("__close_at"))
    return kept.unionByName(new_rows.select(*kept.columns))


def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema: per FK
    relation, total child rows and orphans (children whose parent key
    has no parent row), via one left_anti count each. Emits
    (relation, n_rows, n_orphans)."""
    rels = [
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    out = None
    for label, child, ck, parent, pk in rels:
        c = load_rel(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_rel(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        row = (c.join(p, "k", "left_anti")
               .agg(F.count("*").cast("bigint").alias("n_orphans"))
               .crossJoin(c.agg(F.count("*").cast("bigint")
                                .alias("n_rows")))
               .select(F.lit(label).alias("relation"), "n_rows",
                       "n_orphans"))
        out = row if out is None else out.unionByName(row)
    return out


Q1_CUTOFF = "1998-09-02"   # TPC-H Q1's DATE '1998-12-01' - 90 days
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"
Q3_TOP_N = 10


def tpch_q1_pricing_summary(lineitem: DataFrame,
                            cutoff: str = Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical wide-aggregate OLAP
    benchmark, included so a reference user gets the well-known
    baseline query verbatim: per (returnflag, linestatus), quantity /
    price / discounted / charged sums, averages, and row count over
    lineitems shipped on or before the cutoff. All money math in
    exact DECIMAL (module header), averages derived FROM the exact
    sums so both engines round the same quotient once.

    One filter-then-aggregate — map-side combinable, the textbook
    whole-stage-codegen plan; the shipdate predicate pushes to the
    parquet scan."""
    one = F.lit(1).cast(MONEY)
    price = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(MONEY)
    qty = F.col("l_quantity").cast(MONEY)
    agg = (lineitem
           .filter(F.to_date("l_shipdate") <= F.lit(cutoff))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(qty).alias("sum_qty"),
                F.sum(price).alias("sum_base_price"),
                F.sum(price * (one - disc)).alias("sum_disc_price"),
                F.sum(price * (one - disc)
                      * (one + F.col("l_tax").cast(MONEY)))
                .alias("sum_charge"),
                F.sum(disc).alias("sum_disc"),
                F.count("*").cast("bigint").alias("count_order")))
    return agg.select(
        "l_returnflag", "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.round(F.col("sum_disc_price").cast("double"), 4)
        .alias("sum_disc_price"),
        F.round(F.col("sum_charge").cast("double"), 4)
        .alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double")
                / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_price").cast("double")
                / F.col("count_order"), 6).alias("avg_price"),
        F.round(F.col("sum_disc").cast("double")
                / F.col("count_order"), 6).alias("avg_disc"),
        "count_order")


def tpch_q3_shipping_priority(lineitem: DataFrame, orders: DataFrame,
                              customer: DataFrame,
                              segment: str = Q3_SEGMENT,
                              date: str = Q3_DATE,
                              top_n: int = Q3_TOP_N) -> DataFrame:
    """TPC-H Q3 shipping priority: top unshipped orders of a market
    segment by discounted revenue. Customer-segment filter broadcasts
    (segment dimension is tiny after the filter); revenue in exact
    DECIMAL; the top-n is orderBy+limit, which Spark plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    rev = (F.col("l_extendedprice").cast(MONEY)
           * (F.lit(1).cast(MONEY) - F.col("l_discount").cast(MONEY)))
    cust = customer.filter(F.col("c_mktsegment") == segment) \
        .select("c_custkey")
    o = (orders.filter(F.to_date("o_orderdate") < F.lit(date))
         .join(F.broadcast(cust),
               F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    l = lineitem.filter(F.to_date("l_shipdate") > F.lit(date)) \
        .select("l_orderkey", rev.alias("rev"))
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate"),
                     "o_orderpriority")
            .agg(F.sum("rev").alias("rev"))
            .select(F.col("l_orderkey").alias("orderkey"),
                    F.round(F.col("rev").cast("double"), 4)
                    .alias("revenue"),
                    "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("orderkey"))
            .limit(top_n))


Q10_FROM, Q10_TO = "1995-10-01", "1996-01-01"   # one quarter
Q14_FROM, Q14_TO = "1995-09-01", "1995-10-01"   # one month
Q18_QTY_THRESHOLD = 150.0
Q18_TOP_N = 100


def tpch_q10_returned_items(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, nation: DataFrame,
                            date_from: str = Q10_FROM,
                            date_to: str = Q10_TO,
                            top_n: int = 20) -> DataFrame:
    """TPC-H Q10 returned-item report: customers who returned goods
    ('R' lineitems) in a quarter, ranked by lost revenue. The orders
    date filter pushes to the scan; nation is a bounded dimension ->
    explicit broadcast; customer/orders/lineitem join on their keys
    as shuffle equi-joins Catalyst may reorder. Exact-decimal revenue;
    top-n plans as TakeOrderedAndProject."""
    rev = (F.col("l_extendedprice").cast(MONEY)
           * (F.lit(1).cast(MONEY) - F.col("l_discount").cast(MONEY)))
    o = (orders
         .filter((F.to_date("o_orderdate") >= F.lit(date_from))
                 & (F.to_date("o_orderdate") < F.lit(date_to)))
         .select("o_orderkey", "o_custkey"))
    l = (lineitem.filter(F.col("l_returnflag") == "R")
         .select("l_orderkey", rev.alias("rev")))
    per_cust = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_custkey")
                .agg(F.sum("rev").alias("rev")))
    return (per_cust
            .join(customer,
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select(F.col("c_custkey").alias("custkey"), "c_name",
                    F.round(F.col("rev").cast("double"), 4)
                    .alias("revenue"),
                    F.round("c_acctbal", 6).alias("c_acctbal"),
                    "n_name")
            .orderBy(F.desc("revenue"), F.asc("custkey"))
            .limit(top_n))


def tpch_q14_promo_effect(lineitem: DataFrame, part: DataFrame,
                          date_from: str = Q14_FROM,
                          date_to: str = Q14_TO) -> DataFrame:
    """TPC-H Q14 promotion effect: the share of one month's revenue
    that came from PROMO-type parts (testdata p_type is categorical,
    so equality stands in for TPC-H's LIKE 'PROMO%%'). Part is a
    dimension equi-join on partkey — no hint, AQE broadcasts when it
    fits. Numerator/denominator summed in exact decimal; ONE double
    division at the end."""
    rev = (F.col("l_extendedprice").cast(MONEY)
           * (F.lit(1).cast(MONEY) - F.col("l_discount").cast(MONEY)))
    l = (lineitem
         .filter((F.to_date("l_shipdate") >= F.lit(date_from))
                 & (F.to_date("l_shipdate") < F.lit(date_to)))
         .select("l_partkey", rev.alias("rev")))
    j = l.join(part.select("p_partkey", "p_type"),
               F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))
              .otherwise(F.lit(0).cast(MONEY))).alias("promo"),
        F.sum("rev").alias("total"))
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo").cast("double")
                / F.col("total").cast("double"), 6)
        .alias("promo_revenue_pct"),
        F.round(F.col("promo").cast("double"), 4).alias("promo_revenue"),
        F.round(F.col("total").cast("double"), 4).alias("total_revenue"))


def tpch_q18_large_orders(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame,
                          qty_threshold: float = Q18_QTY_THRESHOLD,
                          top_n: int = Q18_TOP_N) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds the threshold, with their customer, ranked by total price.
    The HAVING aggregate runs on lineitem alone FIRST (map-side
    combinable, shrinks the fact before any join); survivors join to
    orders/customer. Top-n is TakeOrderedAndProject."""
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("sum_qty"))
           .filter(F.col("sum_qty") > F.lit(qty_threshold).cast(MONEY)))
    return (big
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name",
                    F.col("c_custkey").alias("custkey"),
                    F.col("o_orderkey").alias("orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    F.round("o_totalprice", 6).alias("o_totalprice"),
                    F.col("sum_qty").cast("double").alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("orderkey"))
            .limit(top_n))


def order_total_reconciliation(lineitem: DataFrame,
                               orders: DataFrame) -> DataFrame:
    """Warehouse reconciliation audit: per-order lineitem charge
    (sum of extendedprice*(1-discount)*(1+tax), exact decimal) vs the
    order header's o_totalprice — the financial-close QC every
    warehouse runs post-load. Emits ONE summary row: order counts,
    match/mismatch split at a 1-cent tolerance, and the mismatch
    magnitude profile (max / mean absolute diff). Left join from
    orders so headerless... lineitem-less orders count as mismatches
    with the full header amount as the diff.

    One map-side-combinable groupBy on the fact + one equi-join on
    the order key + one global agg — the minimal-shuffle shape."""
    one = F.lit(1).cast(MONEY)
    charge = (F.col("l_extendedprice").cast(MONEY)
              * (one - F.col("l_discount").cast(MONEY))
              * (one + F.col("l_tax").cast(MONEY)))
    per_order = (lineitem.groupBy("l_orderkey")
                 .agg(F.sum(charge).alias("computed")))
    j = (orders.select("o_orderkey",
                       F.col("o_totalprice").cast(MONEY).alias("header"))
         .join(per_order,
               F.col("o_orderkey") == F.col("l_orderkey"), "left")
         .select("o_orderkey", "header",
                 F.coalesce(F.col("computed"), F.lit(0).cast(MONEY))
                 .alias("computed")))
    diff = F.abs(F.col("header") - F.col("computed"))
    tol = F.lit("0.01").cast(MONEY)
    return j.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(diff <= tol, 1).otherwise(0)).cast("bigint")
        .alias("n_reconciled"),
        F.sum(F.when(diff > tol, 1).otherwise(0)).cast("bigint")
        .alias("n_mismatched"),
        F.round(F.max(diff).cast("double"), 4).alias("max_abs_diff"),
        F.round(F.sum(diff).cast("double") / F.count("*"), 4)
        .alias("mean_abs_diff"))


BT_TX_AT = "1997-06-01"      # transaction-time cut: what we KNEW then
BT_VALID_AT = "1996-06-01"   # valid-time cut: about WHEN


def bitemporal_snapshot(changes: DataFrame, key: str, valid_ts: str,
                        tx_ts: str, attr: str, seq: str,
                        tx_at: str, valid_at: str) -> DataFrame:
    """Bitemporal point query: "what did we BELIEVE as of transaction
    time tx_at about each key's attribute as of valid time valid_at"
    — the two-axis generalization of scd2_dimension (valid time only)
    and kg_snapshot_asof (transaction time only); the audit/backtest
    query a regulated warehouse must answer exactly.

    Evaluation order is the bitemporal contract: (1) discard facts
    not yet recorded at tx_at (tx_ts > tx_at); (2) among surviving
    records of the SAME valid instant, the latest-recorded wins
    (arg_max by (tx_ts, seq) — a late correction supersedes); (3)
    the belief at valid_at is the surviving record with the greatest
    valid_ts <= valid_at (arg_max again). Two map-side-combinable
    max_by aggregations on the key — no window, no sort, two
    shuffles total, both on the entity key."""
    visible = changes.filter(F.col(tx_ts) <= F.lit(tx_at))
    latest_belief = (visible
                     .groupBy(key, valid_ts)
                     .agg(F.max_by(F.col(attr),
                                   F.struct(F.col(tx_ts), F.col(seq)))
                          .alias("attr")))
    return (latest_belief
            .filter(F.col(valid_ts) <= F.lit(valid_at))
            .groupBy(key)
            .agg(F.max_by(F.struct(F.col("attr"),
                                   F.date_format(valid_ts, "yyyy-MM-dd")
                                   .alias("vf")),
                          F.col(valid_ts)).alias("s"))
            .select(F.col(key),
                    F.col("s.attr").alias(attr),
                    F.col("s.vf").alias("valid_from")))


Q4_FROM, Q4_TO = "1996-01-01", "1996-04-01"   # one quarter
LATE_DAYS = 60                                # shipdate lateness rule
Q21_TOP_N = 20


def tpch_q4_order_priority(lineitem: DataFrame, orders: DataFrame,
                           date_from: str = Q4_FROM,
                           date_to: str = Q4_TO,
                           late_days: int = LATE_DAYS) -> DataFrame:
    """TPC-H Q4 order-priority check, adapted to this corpus: count a
    quarter's orders per priority where AT LEAST ONE lineitem shipped
    more than `late_days` after the order date (the testdata carries
    no commit/receipt dates, so shipdate-vs-orderdate lateness stands
    in for TPC-H's commitdate < receiptdate — same EXISTS shape).

    The canonical semi-join aggregate: a LEFT SEMI equi-join on
    orderkey with the lateness predicate folded into the join
    condition — Spark never materializes per-order match counts, and
    the date filter pushes to the orders scan."""
    o = (orders
         .filter((F.to_date("o_orderdate") >= F.lit(date_from))
                 & (F.to_date("o_orderdate") < F.lit(date_to)))
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    l = lineitem.select("l_orderkey", "l_shipdate")
    late = ((F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.to_date("l_shipdate")
               > F.date_add(F.to_date("o_orderdate"), late_days)))
    return (o.join(l, late, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("order_count")))


def tpch_q21_waiting_suppliers(lineitem: DataFrame, orders: DataFrame,
                               supplier: DataFrame,
                               late_days: int = LATE_DAYS,
                               top_n: int = Q21_TOP_N) -> DataFrame:
    """TPC-H Q21 suppliers-who-kept-orders-waiting, adapted to this
    corpus (same lateness rule as Q4; multi-supplier finished orders
    where EXACTLY ONE supplier shipped late): per supplier, the number
    of 'F' orders it alone delayed. The classic EXISTS + NOT-EXISTS
    pair becomes two bounded aggregates instead of two correlated
    self-joins: per order, distinct-supplier count and distinct-LATE-
    supplier count (map-side combinable), then a filter and one
    fact-sized equi-join back to the late rows — no second scan of
    lineitem per EXISTS branch. Top-n plans as
    TakeOrderedAndProject."""
    o = (orders.filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    l = (lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
         .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .select("l_orderkey", "l_suppkey",
                 (F.to_date("l_shipdate")
                  > F.date_add(F.to_date("o_orderdate"), late_days))
                 .alias("late"))
         # both the per-order aggregate and the late-rows branch read
         # this 3-column frame: materialize it once (the repo's
         # frame-read-twice discipline) instead of re-scanning
         # lineitem+orders per branch
         .localCheckpoint(eager=True))
    per_order = (l.groupBy("l_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(F.col("late"),
                                              F.col("l_suppkey")))
                      .alias("n_late_supp")))
    blamed = per_order.filter((F.col("n_supp") >= 2)
                              & (F.col("n_late_supp") == 1)) \
        .select("l_orderkey")
    waits = (l.filter(F.col("late"))
             .join(blamed, "l_orderkey")
             .select("l_orderkey", "l_suppkey").distinct()
             .groupBy("l_suppkey")
             .agg(F.count("*").cast("bigint").alias("numwait")))
    return (waits.join(supplier,
                       F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey").cast("bigint").alias("suppkey"),
                    "s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("suppkey"))
            .limit(top_n))
