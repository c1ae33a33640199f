"""Structured Streaming ingestion for the KG pipeline.

The reference is batch-only (SURVEY §2.9: parse_stream fully reads its
handle; no watermarks/event-time semantics exist to reproduce), and the
north rule's resumability requirement is met by the batch idempotent
writes in plans/checkpointing.py. This module is the *incremental
ingestion* face of the same engine: new document files landing in a
directory flow through the identical NER -> link -> extract stages via
``foreachBatch`` — one code path for batch and streaming, which is the
Spark-idiomatic way to run a batch-defined pipeline continuously.

Exactly-once: the stream checkpoint (WAL + source offsets) makes each
input file processed once, and each micro-batch writes to its own
``batch_id=N`` subdirectory with overwrite — so a crash-replay of an
already-written batch is idempotent rather than at-least-once. The
7-tuple dedup is applied by readers (dedup is a global property the
batch `dedup_triples` provides; a streaming GLOBAL dedup would need
stateful dropDuplicates over an unbounded key space — deliberately NOT
done, matching the partition-overwrite + read-side-dedup design of the
batch materializer). The bounded-state variant IS provided:
`dedup_events_within_watermark` suppresses re-deliveries inside the
watermark horizon with state that expires as the watermark advances.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import explode_spans, interleave_docs
from ..operators.gazetteer import gazetteer_df
from ..plans.checkpointing import fs_list_names
from ..operators.linking import link_mentions
from ..operators.ner import detect_mentions
from ..operators.relations import extract_triples

DOCS_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
               "n_chars bigint")


def triples_from_docs(docs: DataFrame) -> DataFrame:
    """Flat documents -> triples; shared by batch and every micro-batch."""
    spans = explode_spans(interleave_docs(docs))
    linked = link_mentions(detect_mentions(spans),
                           gazetteer_df(docs.sparkSession))
    return extract_triples(spans, linked)


def stream_triples(spark: SparkSession, input_dir: str, out_dir: str,
                   checkpoint_dir: str, trigger_available_now: bool = True):
    """readStream over a documents directory -> foreachBatch(pipeline)
    -> parquet append. Returns the started StreamingQuery (caller
    awaits/stops). availableNow drains what exists and stops — the
    backfill-then-incremental pattern."""
    # batch_id=N overwrite idempotency holds only while checkpoint_dir
    # and out_dir stay paired: a fresh checkpoint over an existing
    # out_dir restarts batch ids at 0 and silently overwrites SOME old
    # batch dirs while leaving others — a mixed old/new triples table.
    # Refuse the mismatch instead.
    if any(name.startswith("batch_id=")
           for name in fs_list_names(spark, out_dir)):
        ckpt_populated = fs_list_names(spark, checkpoint_dir)
        if not ckpt_populated:
            raise ValueError(
                f"out_dir {out_dir} already holds batch_id=* output but "
                f"checkpoint_dir {checkpoint_dir} is empty — restarting "
                f"would reuse batch ids and mix old and new batches; "
                f"clear out_dir or reuse the original checkpoint_dir")
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # per-batch subdirectory + overwrite = idempotent under replay:
        # if the driver dies after the write but before the stream
        # checkpoint commits this batch's offsets, the replay overwrites
        # the same subdir instead of appending duplicates (a blind
        # append would silently inflate dedup support counts downstream)
        (triples_from_docs(batch_df)
         .write.mode("overwrite")
         .parquet(f"{out_dir}/batch_id={batch_id}"))

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- event-time windowed aggregation + sessionization -----------------------
#
# Beyond the batch-only reference: the Structured Streaming event-time
# surface (tumbling windows + watermark late-data handling, session
# windows). Both operators take EITHER a batch or a streaming frame —
# `F.window` / `F.session_window` are plan nodes, so the one definition
# serves the oracle-gated batch queries and the watermarked streams
# (tested by replaying the events table file-by-file).

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")

TUMBLE_DUR = "6 hours"
SESSION_GAP = "8 hours"
LATE_WATERMARK = "12 hours"
HOP_DUR = "6 hours"   # hopping window width
HOP_SLIDE = "3 hours"  # hopping window slide (width/slide windows/event)


def windowed_event_counts(events: DataFrame,
                          window_dur: str = TUMBLE_DUR,
                          watermark: str | None = None) -> DataFrame:
    """Tumbling event-time windows per event_type: count + value total.
    With `watermark` set (streaming), state for windows older than
    max(event time) - watermark is finalized and late rows beyond it
    are dropped; batch callers leave it None (watermark is a no-op on
    batch plans anyway). Epoch-aligned windows — the oracle recomputes
    them with time_bucket."""
    src = events.withWatermark("ts", watermark) if watermark else events
    w = F.window("ts", window_dur)
    return (src.groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def hopping_event_counts(events: DataFrame,
                         window_dur: str = HOP_DUR,
                         slide: str = HOP_SLIDE,
                         watermark: str | None = None) -> DataFrame:
    """Hopping (sliding) event-time windows per event_type — the
    overlapping-window mode tumbling can't express: each event lands in
    width/slide windows, so a 6h/3h hop gives every 3h-aligned start a
    full 6h trailing view (rolling KPIs, rate limiting, trend windows).
    Same single definition serves batch and watermarked streaming,
    like windowed_event_counts above.

    Scale shape: Spark expands each row to width/slide window
    assignments (a constant, 2 here) before one hash aggregate — cost
    is the same groupBy as tumbling at 2x row fan-out, map-side
    combinable, no window function and no global sort."""
    src = events.withWatermark("ts", watermark) if watermark else events
    w = F.window("ts", window_dur, slide)
    return (src.groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


ATTR_HORIZON = "2 hours"  # click->purchase attribution window


def attributed_purchases(clicks: DataFrame,
                         purchases: DataFrame,
                         horizon: str = ATTR_HORIZON) -> DataFrame:
    """Click->purchase attribution join: every purchase paired with the
    same user's clicks in the preceding `horizon` (click_ts <=
    purchase_ts < click_ts + horizon). ONE definition serves batch and
    stream-stream: on streams, watermark BOTH inputs before calling —
    the time-bound condition lets Spark expire join state older than
    watermark + horizon instead of buffering both streams forever
    (the unbounded-state trap of an unconstrained stream-stream join).

    Emits (click_id, purchase_id, user_id, click_ts, purchase_ts,
    value). Scale shape: equi-join on user_id with the range condition
    as a post-filter — shuffle-partitionable, AQE-skew-splittable,
    never a nested loop; per-user click x purchase fan-out is bounded
    by the horizon."""
    c = clicks.select(F.col("event_id").alias("click_id"),
                      "user_id", F.col("ts").alias("click_ts"))
    p = purchases.select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user"),
                         F.col("ts").alias("purchase_ts"), "value")
    cond = ((F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")))
    return (c.join(p, cond)
            .select("click_id", "purchase_id", "user_id",
                    "click_ts", "purchase_ts",
                    F.round("value", 6).alias("value")))


def sessionized_events(events: DataFrame,
                       gap: str = SESSION_GAP,
                       watermark: str | None = None) -> DataFrame:
    """Per-user session windows (gap-merged event-time sessions): the
    built-in session_window plan node — Spark merges events whose gaps
    are under `gap` into [min ts, max ts + gap) windows, in one
    stateful aggregation (no self-join, no per-user sort exported to
    the caller). The oracle re-derives sessions independently with the
    SQL islands technique (lag + gap flag + running sum)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    w = F.session_window("ts", gap)
    return (src.groupBy(w.alias("win"), "user_id")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select("user_id",
                    F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "n_events", "total_value"))


# --- custom stateful operator: applyInPandasWithState ----------------------

RUNNING_TOTALS_SCHEMA = ("user_id bigint, n_events bigint, "
                         "total_value double")
_STATE_SCHEMA = "n bigint, tot double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cross-micro-batch running totals per user — the custom stateful
    operator class (applyInPandasWithState): arbitrary per-key state
    that `groupBy().agg()` can't express incrementally when the update
    logic is imperative. State is O(1) per user (count + sum), Arrow
    batches in/out (no per-row Python), keys partitioned by the state
    store — one row per user per micro-batch it appears in, carrying
    the cumulative totals so far. Batch equivalent for testing: plain
    groupBy count/sum."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((n, tot))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(tot, 6)]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, RUNNING_TOTALS_SCHEMA,
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def dedup_events_within_watermark(events: DataFrame,
                                  watermark: str = LATE_WATERMARK,
                                  keys: Sequence[str] = ("event_id",)
                                  ) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: dropDuplicatesWithinWatermark
    keeps a key's dedup state only until the watermark passes its event
    time, so re-deliveries inside the watermark horizon (the realistic
    at-least-once-source case: source retries, overlapping file drops)
    are suppressed without the unbounded key-space state a plain
    streaming dropDuplicates would accumulate. Complements the batch
    materializer's read-side 7-tuple dedup (module docstring): readers
    still own *global* dedup; this bounds the duplicate volume they see."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


# --- streaming MERGE INTO the canonical store --------------------------------

STORE_POINTER = "_latest.json"


def current_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The latest committed canonical-store version, or None before the
    first commit. Readers resolve through the atomic pointer marker, so
    a half-written version dir is never visible."""
    ptr = _read_pointer(spark, store_dir)
    if not ptr:
        return None
    return spark.read.parquet(f"{store_dir}/v={ptr['version']}")


def _read_pointer(spark: SparkSession, store_dir: str) -> dict | None:
    """The pointer marker, or None before the first commit
    (_fs_read_json raises on a missing path, so probe the listing)."""
    from ..plans.checkpointing import _fs_read_json
    if STORE_POINTER not in fs_list_names(spark, store_dir):
        return None
    return _fs_read_json(spark, f"{store_dir}/{STORE_POINTER}")


def stream_merge_triples(spark: SparkSession, input_dir: str,
                         store_dir: str, checkpoint_dir: str,
                         trigger_available_now: bool = True):
    """Streaming MERGE INTO: each micro-batch extracts triples from its
    NEW documents and upserts them into a versioned canonical store via
    relations.merge_triples_incremental(mode='append') — the
    snapshot-chain pattern Iceberg gives MERGE for free, reproduced on
    plain parquet so crash-replays stay exactly-once:

      * version v=<batch_id> is derived from the latest COMMITTED
        parent and written whole (overwrite);
      * a JSON pointer marker {version, parent} commits the version
        atomically AFTER the data lands;
      * a replayed batch (driver died between pointer commit and the
        stream checkpoint's offset commit) sees pointer.version ==
        its own batch_id and re-derives from the SAME parent — support
        counts are never double-applied.

    Old versions accumulate like Iceberg snapshots; expiring them is a
    maintenance pass (delete every v= dir except the pointer's version
    and parent), deliberately out of the hot path. Returns the started
    StreamingQuery."""
    from ..operators.relations import (dedup_triples,
                                       merge_triples_incremental)
    from ..plans.checkpointing import _fs_write_json_atomic

    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc = dedup_triples(triples_from_docs(batch_df))
        ptr = _read_pointer(spark, store_dir)
        if ptr and ptr["version"] == batch_id:     # crash replay
            parent = ptr["parent"]
        elif ptr:
            parent = ptr["version"]
        else:
            parent = None
        cur = (spark.read.parquet(f"{store_dir}/v={parent}")
               if parent is not None else inc.limit(0))
        merged = merge_triples_incremental(cur, inc, mode="append") \
            .drop("action")
        merged.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}")
        # per-version commit marker BEFORE the pointer flips: the row
        # count re-reads only parquet footers (metadata, not data) and
        # gives store_history/expiry an authoritative snapshot log —
        # the role Iceberg's metadata.json + snapshot list plays
        n_rows = spark.read.parquet(f"{store_dir}/v={batch_id}").count()
        _fs_write_json_atomic(
            spark, f"{store_dir}/_commit_v{batch_id}.json",
            {"version": batch_id, "parent": parent, "n_rows": n_rows})
        _fs_write_json_atomic(
            spark, f"{store_dir}/{STORE_POINTER}",
            {"version": batch_id, "parent": parent})

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_daily_counts(spark: SparkSession, input_dir: str,
                        store_dir: str, checkpoint_dir: str,
                        trigger_available_now: bool = True):
    """Streaming maintenance of the per-(event_type, day) volume table
    that feeds content_stats.score_daily_counts — the anomaly monitor
    advances with batch-sized increments instead of re-scanning the
    event history. Same versioned snapshot-chain discipline as
    stream_merge_triples: each micro-batch's counts SUM into the
    latest committed parent, the version commits via the atomic
    pointer AFTER the data lands, and a crash-replayed batch
    re-derives from the SAME parent — counts are never double-applied
    (the additive-merge analog of the triple store's support rule).
    Scoring the CURRENT snapshot reproduces the batch operator exactly
    (pinned by test_streaming), so alert flags are always consistent
    with one committed version. Returns the started StreamingQuery."""
    from ..plans.checkpointing import _fs_write_json_atomic

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc = (batch_df
               .groupBy("event_type", F.to_date("ts").alias("day"))
               .agg(F.count("*").cast("bigint").alias("n")))
        ptr = _read_pointer(spark, store_dir)
        if ptr and ptr["version"] == batch_id:     # crash replay
            parent = ptr["parent"]
        elif ptr:
            parent = ptr["version"]
        else:
            parent = None
        cur = (spark.read.parquet(f"{store_dir}/v={parent}")
               if parent is not None else inc.limit(0))
        merged = (cur.unionByName(inc)
                  .groupBy("event_type", "day")
                  .agg(F.sum("n").cast("bigint").alias("n")))
        merged.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}")
        n_rows = spark.read.parquet(f"{store_dir}/v={batch_id}").count()
        _fs_write_json_atomic(
            spark, f"{store_dir}/_commit_v{batch_id}.json",
            {"version": batch_id, "parent": parent, "n_rows": n_rows})
        _fs_write_json_atomic(
            spark, f"{store_dir}/{STORE_POINTER}",
            {"version": batch_id, "parent": parent})

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- snapshot maintenance (the Iceberg metadata surface) ---------------------

def store_history(spark: SparkSession, store_dir: str) -> list[dict]:
    """The committed snapshot log, latest first: one dict per version
    {version, parent, n_rows, is_current} — Iceberg's snapshot-list
    read, reconstructed from the per-version commit markers. A version
    dir without a marker never committed (torn write) and is invisible,
    exactly like the pointer-based reader."""
    ptr = _read_pointer(spark, store_dir)
    if not ptr:
        return []
    from ..plans.checkpointing import _fs_read_json
    out = []
    for name in fs_list_names(spark, store_dir):
        if name.startswith("_commit_v") and name.endswith(".json"):
            c = _fs_read_json(spark, f"{store_dir}/{name}")
            c["is_current"] = c["version"] == ptr["version"]
            out.append(c)
    return sorted(out, key=lambda c: c["version"], reverse=True)


def store_at_version(spark: SparkSession, store_dir: str,
                     version: int) -> DataFrame:
    """Time-travel read: the store exactly as of snapshot `version`
    (Iceberg's VERSION AS OF). Only committed versions are readable."""
    committed = {c["version"] for c in store_history(spark, store_dir)}
    if version not in committed:
        raise ValueError(
            f"version {version} is not a committed snapshot of "
            f"{store_dir} (committed: {sorted(committed)})")
    return spark.read.parquet(f"{store_dir}/v={version}")


def store_changes(spark: SparkSession, store_dir: str,
                  v_from: int, v_to: int) -> DataFrame:
    """CDC read between two committed snapshots (Iceberg's incremental
    changelog): triple rows tagged insert / update / delete, unchanged
    rows dropped. A full-outer null-safe equi-join on the 7-tuple key —
    one shuffle, no window; at store scale both sides are the published
    snapshots, so the join key is the store's own identity."""
    from ..operators.relations import TRIPLE_KEY
    old = store_at_version(spark, store_dir, v_from)
    new = store_at_version(spark, store_dir, v_to)
    o = old.select(*TRIPLE_KEY,
                   F.col("confidence").alias("old_confidence"),
                   F.col("support").alias("old_support"))
    n = new.select(*TRIPLE_KEY,
                   F.col("confidence").alias("new_confidence"),
                   F.col("support").alias("new_support"))
    cond = [o[c].eqNullSafe(n[c]) for c in TRIPLE_KEY]
    j = o.join(n, cond, "full_outer")
    keyed = j.select(
        *[F.coalesce(o[c], n[c]).alias(c) for c in TRIPLE_KEY],
        "old_confidence", "old_support", "new_confidence", "new_support",
        F.when(F.col("old_support").isNull(), F.lit("insert"))
         .when(F.col("new_support").isNull(), F.lit("delete"))
         .when((F.col("new_support") != F.col("old_support"))
               | (F.col("new_confidence") != F.col("old_confidence")),
               F.lit("update"))
         .otherwise(F.lit("unchanged")).alias("action"))
    return keyed.filter(F.col("action") != "unchanged")


def expire_store_versions(spark: SparkSession, store_dir: str,
                          keep_last: int = 2) -> list[int]:
    """Snapshot expiry (Iceberg's expire_snapshots maintenance pass,
    deliberately OUT of the hot path): delete every committed version
    dir + marker except the `keep_last` most recent, and never the
    current pointer's version or its parent (the crash-replay
    re-derivation source). Returns the expired version numbers."""
    ptr = _read_pointer(spark, store_dir)
    if not ptr:
        return []
    keep = {ptr["version"]}
    if ptr["parent"] is not None:
        keep.add(ptr["parent"])
    hist = store_history(spark, store_dir)
    keep.update(c["version"] for c in hist[:max(keep_last, 0)])
    from ..plans.checkpointing import _fs
    fs, _ = _fs(spark, store_dir)
    expired = []
    for c in hist:
        v = c["version"]
        if v in keep:
            continue
        _, vdir = _fs(spark, f"{store_dir}/v={v}")
        _, marker = _fs(spark, f"{store_dir}/_commit_v{v}.json")
        if fs.exists(vdir):
            fs.delete(vdir, True)
        if fs.exists(marker):
            fs.delete(marker, False)
        expired.append(v)
    return sorted(expired)


def compact_store_version(spark: SparkSession, store_dir: str,
                          target_files: int = 8) -> dict:
    """Data-file compaction (Iceberg's rewrite_data_files maintenance
    action): rewrite the CURRENT snapshot's rows into `target_files`
    parquet files as a NEW committed version whose parent is the
    current one, then flip the pointer. Readers through current_store
    never see a half-rewritten table (same atomic-pointer contract as
    the streaming merge); time travel to the pre-compaction version
    still works until it is expired. Rows are identical by
    construction — only the file layout changes.

    Version id = current + 1 shifted past the streaming batch-id space
    is NOT needed: the stream derives its version from batch_id, so a
    compaction between stream runs must not collide with a future
    batch id. We use negative-free, collision-free ids by continuing
    the chain at max(committed) + 1; a later stream restart on the
    same checkpoint resumes at its own batch ids only on a FRESH
    store, so the documented contract is: compact between ingest
    generations, not between micro-batches of a live stream.

    Returns the new commit marker dict."""
    from ..plans.checkpointing import _fs_write_json_atomic
    ptr = _read_pointer(spark, store_dir)
    if not ptr:
        raise ValueError(f"nothing to compact: {store_dir} has no "
                         f"committed snapshot")
    hist = store_history(spark, store_dir)
    new_v = max(c["version"] for c in hist) + 1
    cur = spark.read.parquet(f"{store_dir}/v={ptr['version']}")
    (cur.repartition(target_files)
        .write.mode("overwrite").parquet(f"{store_dir}/v={new_v}"))
    n_rows = spark.read.parquet(f"{store_dir}/v={new_v}").count()
    marker = {"version": new_v, "parent": ptr["version"],
              "n_rows": n_rows, "compaction": True}
    _fs_write_json_atomic(spark, f"{store_dir}/_commit_v{new_v}.json",
                          marker)
    _fs_write_json_atomic(spark, f"{store_dir}/{STORE_POINTER}",
                          {"version": new_v, "parent": ptr["version"]})
    return marker


# --- stream-stream join ------------------------------------------------------

ATTRIB_HORIZON = "1 hour"


def view_purchase_attribution(views: DataFrame, purchases: DataFrame,
                              watermark: str | None = LATE_WATERMARK,
                              horizon: str = ATTRIB_HORIZON) -> DataFrame:
    """Watermarked stream-stream inner join — the attribution query
    (purchase within `horizon` after a view by the same user), the one
    streaming-algebra member the rest of this module doesn't cover.
    State on both sides is bounded by the watermark + the time-range
    predicate: Spark evicts view rows older than max(event time) -
    watermark - horizon, so state never grows with the stream.

    The SAME definition runs on batch frames (watermark no-op), which
    is how the test proves the streamed result equals the batch
    interval join. Columns: (user_id, view_id, view_ts, purchase_id,
    purchase_ts, latency_us)."""
    v = views.select(F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"), "user_id")
    p = purchases.select(F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"), "user_id")
    if watermark:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    return (v.join(
        p,
        (v["user_id"] == p["user_id"])
        & (p["purchase_ts"] >= v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"]
           + F.expr(f"INTERVAL {horizon}")),
        "inner")
        .select(v["user_id"], "view_id", "view_ts",
                "purchase_id", "purchase_ts",
                # cast for NTZ inputs (unix_micros rejects TIMESTAMP_NTZ;
                # both sides shift by the same session-tz offset, so the
                # difference is invariant — same note as olap.interval_join)
                (F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                 - F.unix_micros(F.col("view_ts").cast("timestamp")))
                .cast("double").alias("latency_us")))


def stream_entailment_triples(spark: SparkSession, input_dir: str,
                              store_dir: str, checkpoint_dir: str,
                              trigger_available_now: bool = True):
    """Streaming OWL entailment maintenance: each micro-batch upserts
    its asserted edges AND brings the materialized saturation forward
    via graphops.kg_entailment_delta — semi-naive frontiers sized by
    the BATCH, never a re-closure of the accumulated store. Versioned
    snapshots + atomic pointer, the same exactly-once discipline as
    stream_merge_triples; each version commits two tables together
    (v=N/asserted, v=N/inferred).

    The inferred table is maintained at (subject, predicate, object)
    granularity: growth is monotone on the saturation, so
        inferred' = (inferred + delta-inferred) minus asserted'
    — the subtraction also retires a previously-inferred edge the
    moment it arrives asserted. Rule provenance is deliberately NOT
    maintained here: an edge can gain additional derivations as the
    graph grows (a transitive-only edge becomes inverse-derivable when
    its flip is asserted), and reconstructing per-rule rows would
    re-run the full rules over the store — the batch operator
    kg_entailment exists for provenance audits."""
    from ..operators.graphops import kg_entailment_delta
    from ..operators.relations import dedup_triples
    from ..plans.checkpointing import _fs_write_json_atomic

    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc = (dedup_triples(triples_from_docs(batch_df))
               .select("subject", "predicate", "object").distinct())
        ptr = _read_pointer(spark, store_dir)
        if ptr and ptr["version"] == batch_id:     # crash replay
            parent = ptr["parent"]
        elif ptr:
            parent = ptr["version"]
        else:
            parent = None
        if parent is not None:
            old_a = spark.read.parquet(
                f"{store_dir}/v={parent}/asserted")
            old_i = spark.read.parquet(
                f"{store_dir}/v={parent}/inferred")
        else:
            old_a, old_i = inc.limit(0), inc.limit(0)
        delta_inf = (kg_entailment_delta(old_a, inc)
                     .select("subject", "predicate", "object"))
        asserted = (old_a.unionByName(inc).distinct()
                    .localCheckpoint(eager=True))
        inferred = (old_i.unionByName(delta_inf).distinct()
                    .join(asserted, ["subject", "predicate", "object"],
                          "left_anti"))
        asserted.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/asserted")
        inferred.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/inferred")
        n_a = spark.read.parquet(
            f"{store_dir}/v={batch_id}/asserted").count()
        n_i = spark.read.parquet(
            f"{store_dir}/v={batch_id}/inferred").count()
        _fs_write_json_atomic(
            spark, f"{store_dir}/_commit_v{batch_id}.json",
            {"version": batch_id, "parent": parent,
             "n_asserted": n_a, "n_inferred": n_i})
        _fs_write_json_atomic(
            spark, f"{store_dir}/{STORE_POINTER}",
            {"version": batch_id, "parent": parent})

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_neardup_pairs(spark: SparkSession, input_dir: str,
                         store_dir: str, checkpoint_dir: str,
                         trigger_available_now: bool = True):
    """Streaming near-dup maintenance — the streaming leg of
    textops.minhash_delta_pairs: each micro-batch shingles/bands ONLY
    its own documents and joins them against the accumulated signature
    store, so the band frontier is batch-sized and old x old never
    re-forms (at 10^12 docs a per-batch re-LSH of the corpus is the
    difference between a streaming system and none). Each version
    commits three tables together — sets (shingle sets for the exact
    verify), bands (the signature store the next batch probes), pairs
    (the monotone near-dup ledger) — under the same versioned-snapshot
    + atomic-pointer + crash-replay discipline as
    stream_entailment_triples. Invariant the test pins: after draining,
    `pairs` equals the batch minhash_lsh_pairs over all arrived docs
    (every pair is found when its LATER doc arrives)."""
    from ..operators.textops import _minhash_tables, _verify_pairs
    from ..plans.checkpointing import _fs_write_json_atomic

    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new_sets, new_bands = _minhash_tables(
            batch_df.select("doc_id", "text"))
        ptr = _read_pointer(spark, store_dir)
        if ptr and ptr["version"] == batch_id:     # crash replay
            parent = ptr["parent"]
        elif ptr:
            parent = ptr["version"]
        else:
            parent = None
        if parent is not None:
            old_sets = spark.read.parquet(f"{store_dir}/v={parent}/sets")
            old_bands = spark.read.parquet(f"{store_dir}/v={parent}/bands")
            old_pairs = spark.read.parquet(f"{store_dir}/v={parent}/pairs")
        else:
            old_sets = new_sets.limit(0)
            old_bands = new_bands.limit(0)
            old_pairs = spark.createDataFrame(
                [], "a bigint, b bigint, jaccard double")
        all_bands = old_bands.unionByName(new_bands)
        all_sets = old_sets.unionByName(new_sets)
        d = new_bands.toDF("d", "band_idx", "band_key")
        x = all_bands.toDF("x", "band_idx", "band_key")
        cand = (d.join(x, ["band_idx", "band_key"])
                .filter(F.col("d") != F.col("x"))
                .select(F.least("d", "x").alias("a"),
                        F.greatest("d", "x").alias("b"))
                .distinct())
        pairs = (old_pairs
                 .unionByName(_verify_pairs(cand, all_sets))
                 .distinct()
                 .localCheckpoint(eager=True))
        all_sets.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/sets")
        all_bands.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/bands")
        pairs.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/pairs")
        n_docs = spark.read.parquet(
            f"{store_dir}/v={batch_id}/sets").count()
        n_pairs = spark.read.parquet(
            f"{store_dir}/v={batch_id}/pairs").count()
        _fs_write_json_atomic(
            spark, f"{store_dir}/_commit_v{batch_id}.json",
            {"version": batch_id, "parent": parent,
             "n_docs": n_docs, "n_pairs": n_pairs})
        _fs_write_json_atomic(
            spark, f"{store_dir}/{STORE_POINTER}",
            {"version": batch_id, "parent": parent})

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_fused_triples(spark: SparkSession, input_dir: str,
                         store_dir: str, checkpoint_dir: str,
                         trigger_available_now: bool = True):
    """Streaming truth discovery — the streaming leg of
    relations.triple_fusion: the per-(s, p, o) evidence rollup
    (summed confidence, distinct docs, mention count) is MERGEABLE
    across micro-batches because each document arrives in exactly one
    batch (doc sets are disjoint, so per-batch distinct-doc counts sum
    exactly); each batch aggregates only its own extractions and adds
    them into the stored rollup, then the fused winner per (subject,
    predicate) is re-derived from the updated rollup — batch-sized
    aggregation work, corpus-sized state only in the keyed rollup
    table. Versioned (evidence, fused) snapshots under the atomic
    pointer with crash replay, exactly-once like the other streams.
    Invariant the test pins: after draining, `fused` equals the batch
    triple_fusion over all arrived documents."""
    from ..plans.checkpointing import _fs_write_json_atomic

    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc = (triples_from_docs(batch_df)
               .groupBy("subject", "predicate", "object")
               .agg(F.sum("confidence").alias("w"),
                    F.countDistinct("doc_id").alias("n_docs"),
                    F.count("*").alias("n_mentions")))
        ptr = _read_pointer(spark, store_dir)
        if ptr and ptr["version"] == batch_id:     # crash replay
            parent = ptr["parent"]
        elif ptr:
            parent = ptr["version"]
        else:
            parent = None
        if parent is not None:
            old = spark.read.parquet(f"{store_dir}/v={parent}/evidence")
            merged = (old.unionByName(inc)
                      .groupBy("subject", "predicate", "object")
                      .agg(F.sum("w").alias("w"),
                           F.sum("n_docs").alias("n_docs"),
                           F.sum("n_mentions").alias("n_mentions")))
        else:
            merged = inc
        merged = merged.localCheckpoint(eager=True)
        fused = (merged.groupBy("subject", "predicate")
                 .agg(F.min_by(
                          F.struct("object", "w", "n_docs", "n_mentions"),
                          F.struct((-F.col("w")).alias("nw"),
                                   (-F.col("n_docs")).alias("nd"),
                                   F.col("object"))).alias("win"),
                      F.count("*").alias("n_alternatives"))
                 .select("subject", "predicate",
                         F.col("win.object").alias("object"),
                         F.round("win.w", 6).alias("evidence_weight"),
                         F.col("win.n_docs").alias("n_docs"),
                         F.col("win.n_mentions").alias("n_mentions"),
                         "n_alternatives"))
        merged.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/evidence")
        fused.write.mode("overwrite") \
            .parquet(f"{store_dir}/v={batch_id}/fused")
        n_ev = spark.read.parquet(
            f"{store_dir}/v={batch_id}/evidence").count()
        n_fused = spark.read.parquet(
            f"{store_dir}/v={batch_id}/fused").count()
        _fs_write_json_atomic(
            spark, f"{store_dir}/_commit_v{batch_id}.json",
            {"version": batch_id, "parent": parent,
             "n_evidence": n_ev, "n_fused": n_fused})
        _fs_write_json_atomic(
            spark, f"{store_dir}/{STORE_POINTER}",
            {"version": batch_id, "parent": parent})

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def retract_store_version(spark: SparkSession, store_dir: str,
                          evidence_dir: str,
                          removed_doc_ids: list[str]) -> dict:
    """Takedown pass on the versioned triple store: commit a new
    snapshot with every 7-tuple key the removed docs evidenced
    re-aggregated from the surviving per-doc evidence table (the
    lineage output of jobs/kg_construct_job.py), via
    relations.dedup_retract — delta-sized work, never a corpus
    re-aggregation. The new version rides the same commit-marker +
    atomic-pointer discipline as every other store writer, so
    store_history shows the retraction and store_changes between the
    two snapshots yields exactly the delete/update rows the takedown
    caused. Returns the commit dict."""
    from ..operators.relations import dedup_retract
    from ..plans.checkpointing import _fs_write_json_atomic

    ptr = _read_pointer(spark, store_dir)
    if not ptr:
        raise ValueError(f"{store_dir} has no committed version to "
                         f"retract from")
    parent = ptr["version"]
    version = parent + 1
    ev = spark.read.parquet(evidence_dir)
    removed = spark.createDataFrame(
        [(d,) for d in removed_doc_ids], "doc_id string")
    new = dedup_retract(ev, removed)
    new.write.mode("overwrite").parquet(f"{store_dir}/v={version}")
    n_rows = spark.read.parquet(f"{store_dir}/v={version}").count()
    commit = {"version": version, "parent": parent, "n_rows": n_rows,
              "action": "retract", "n_docs_removed": len(removed_doc_ids)}
    _fs_write_json_atomic(
        spark, f"{store_dir}/_commit_v{version}.json", commit)
    _fs_write_json_atomic(
        spark, f"{store_dir}/{STORE_POINTER}",
        {"version": version, "parent": parent})
    return commit


# --- streaming RDF document ingestion with recovery --------------------------

RDF_DOCS_SCHEMA = "src_id string, payload string"


def stream_rdf_triples(spark: SparkSession, input_dir: str, out_dir: str,
                       checkpoint_dir: str,
                       trigger_available_now: bool = True):
    """Streaming full-grammar RDF ingestion: readStream over raw
    Turtle documents -> per micro-batch the REAL parser
    (rdf_full.parse_turtle_full) with its quarantine lane, then the
    REPLACE recovery pass (recovery.reparse_with_corrections) so
    mechanically-curable defects land in the triple stream in the SAME
    batch — cured rows never wait for a backfill job. Outputs are
    idempotent per-batch subdirectories (the stream_triples overwrite
    discipline): triples/batch_id=N for parsed quads and
    quarantine/batch_id=N for documents the corrections could not
    cure (the dead-letter table an operator pages on).

    One Arrow parse stage per batch plus one bounded reparse over the
    failed subset only — the recovery join broadcasts the failed-id
    dimension, so a clean batch pays nothing beyond the parse."""
    from ..operators.rdf_full import parse_turtle_full
    from ..operators.recovery import reparse_with_corrections

    if any(name.startswith("batch_id=")
           for name in fs_list_names(spark, f"{out_dir}/triples")):
        if not fs_list_names(spark, checkpoint_dir):
            raise ValueError(
                f"{out_dir} already holds batch output but "
                f"{checkpoint_dir} is empty — restarting would reuse "
                f"batch ids; clear out_dir or reuse the checkpoint")

    stream = (spark.readStream.schema(RDF_DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.localCheckpoint(eager=True)  # parsed twice below
        parsed = parse_turtle_full(docs).localCheckpoint(eager=True)
        second = reparse_with_corrections(docs, parsed) \
            .localCheckpoint(eager=True)
        good = (parsed.filter(F.col("predicate") != "parse_error")
                .unionByName(
                    second.filter(F.col("predicate") != "parse_error")))
        dead = second.filter(F.col("predicate") == "parse_error")
        good.write.mode("overwrite").parquet(
            f"{out_dir}/triples/batch_id={batch_id}")
        dead.write.mode("overwrite").parquet(
            f"{out_dir}/quarantine/batch_id={batch_id}")

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
