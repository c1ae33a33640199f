"""Distributed as-of (point-in-time) join — for every left row, the
most recent right row at-or-before its timestamp, per key.

The reference has no temporal operator family at all; this is part of
the beyond-the-reference event-time surface (with the tumbling/session
windows in streaming/pipeline.py) that a training-data pipeline needs
for point-in-time-correct feature attachment (e.g. "the user's last
purchase before this click" without leaking future data).

Spark has no built-in ASOF JOIN (DuckDB/Pandas do), and the naive
formulations are scale-killers:

* theta-join `l.key = r.key AND r.ts <= l.ts` + argmax: Catalyst plans
  the inequality as part of a SortMergeJoin but the per-key match set
  is O(|l_k| * |r_k|) before the argmax prunes it — quadratic in hot
  keys.
* per-key collect + pandas merge_asof: driver-bound.

Instead: UNION the two sides with a side tag, one window per key
ordered by (ts, tag, seq), and carry the right payload forward with
`last(ignorenulls=True)` over ROWS UNBOUNDED PRECEDING. One shuffle on
the key, one in-partition sort, O(n log n) total, no join blow-up. Tag
orders right (0) before left (1) at equal timestamps, so ties match
(`<=` semantics, like ASOF JOIN's `l.ts >= r.ts`).

Skew note (100-TB): a hub key lands in one task, like any per-key
window. Carry-forward is a prefix scan, so `split_bucket_s` range-
splits each key's timeline into fixed buckets with a boundary
hand-off: pass 1 aggregates the last right payload per (key, bucket)
and a per-key window over the BUCKET-level rows (O(buckets), not
O(rows)) computes each bucket's carry-in; pass 2 seeds that carry-in
as a synthetic first row and runs the carry-forward window partitioned
by (key, bucket) — a hub key becomes many tasks. Identical output to
the unsplit path (pinned by test). AQE handles moderate skew without
it; the window state is O(1) per row either way.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG, _TS, _SEQ = "__asof_tag", "__asof_ts", "__asof_seq"
_PAYLOAD, _BKT = "__asof_payload", "__asof_bkt"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: Sequence[str] = (), right_seq: str | None = None,
              prefix: str = "asof_",
              split_bucket_s: int | None = None) -> DataFrame:
    """Left as-of-backward join: every `left` row gains `prefix<c>` for
    each payload column `c` of `right`, taken from the latest right row
    with right_ts <= left_ts on the same key(s) (null when none).

    `right_seq` breaks exact (key, ts) ties deterministically — the
    right row with the greatest seq wins; pass a unique id column when
    duplicates are possible.

    `split_bucket_s` enables the hub-key range split (module docstring):
    the carry-forward window partitions by (key, time-bucket) instead of
    key alone, with per-bucket carry-ins handed off through a bucket-
    level aggregate — set it when one key can hold a task-breaking share
    of the rows. Output is identical either way.

    All payload columns are carried forward as ONE struct with a single
    last(ignorenulls=True): per-column carries would compose a row from
    different right rows whenever a right row holds NULL in one payload
    column (each column finding its own most-recent non-null) — the
    struct itself is never null on right rows, so the matched values
    always come from the same right row, nullable fields included.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not payload:
        raise ValueError("asof_join: payload columns required")
    out_names = {c: f"{prefix}{c}" for c in payload}

    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        (F.col(right_seq) if right_seq else F.lit(0)).alias(_SEQ),
        F.struct(*[F.col(c).alias(out_names[c]) for c in payload])
        .alias(_PAYLOAD))
    l = (left.withColumn(_TS, F.col(left_ts))
         .withColumn(_TAG, F.lit(1)).withColumn(_SEQ, F.lit(0)))

    u = l.unionByName(r, allowMissingColumns=True)
    if split_bucket_s is None:
        part_cols = list(keys)
    else:
        # range split: bucket the timeline, hand the last right payload
        # of all earlier buckets in as a synthetic first row per bucket
        wus = split_bucket_s * 1_000_000
        u = u.withColumn(
            _BKT, F.floor(F.unix_micros(F.col(_TS).cast("timestamp")) / wus))
        rights = u.filter(F.col(_TAG) == 0)
        bucket_last = rights.groupBy(*keys, _BKT).agg(
            F.max_by(_PAYLOAD, F.struct(_TS, _SEQ)).alias("__bl"))
        grid = u.select(*keys, _BKT).distinct()
        wb = (Window.partitionBy(*keys).orderBy(_BKT)
              .rowsBetween(Window.unboundedPreceding, -1))
        seeds = (grid.join(bucket_last, [*keys, _BKT], "left")
                 .withColumn(_PAYLOAD,
                             F.last("__bl", ignorenulls=True).over(wb))
                 .filter(F.col(_PAYLOAD).isNotNull())
                 .select(*keys, _BKT,
                         F.lit(None).cast(u.schema[_TS].dataType).alias(_TS),
                         F.lit(-1).alias(_TAG), F.lit(0).alias(_SEQ),
                         _PAYLOAD))
        u = u.unionByName(seeds, allowMissingColumns=True)
        part_cols = [*keys, _BKT]
    # seeds carry _TS = NULL, which sorts FIRST ascending — before every
    # real row of the bucket, as a strictly-earlier-bucket value must
    w = (Window.partitionBy(*part_cols).orderBy(_TS, _TAG, _SEQ)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    u = u.filter(F.col(_TAG) == 1)
    for c in payload:
        u = u.withColumn(out_names[c], F.col(_PAYLOAD)[out_names[c]])
    return u.drop(_TAG, _TS, _SEQ, _BKT, _PAYLOAD)


def last_purchase_features(events: DataFrame,
                           split_bucket_s: int | None = None) -> DataFrame:
    """Point-in-time feature: for each non-purchase event, the user's
    most recent at-or-before purchase (its event_id and value). The
    oracle is DuckDB's native ASOF LEFT JOIN over the same frames."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 # one row per (user, ts): greatest event_id wins, so the
                 # oracle's ASOF (which can't break exact-ts ties) agrees
                 .groupBy("user_id", "ts")
                 .agg(F.max("event_id").alias("purchase_event_id"),
                      F.max_by("value", "event_id").alias("purchase_value")))
    rest = events.filter(F.col("event_type") != "purchase")
    out = asof_join(rest, purchases, on="user_id",
                    payload=["purchase_event_id", "purchase_value"],
                    right_seq="purchase_event_id", prefix="last_",
                    split_bucket_s=split_bucket_s)
    return out.select(
        "event_id", "user_id", "event_type",
        F.col("last_purchase_event_id").alias("last_purchase_event_id"),
        F.round("last_purchase_value", 6).alias("last_purchase_value"))
