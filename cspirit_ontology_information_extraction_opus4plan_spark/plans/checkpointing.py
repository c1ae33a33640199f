"""Resumable triple materialization — per-partition checkpoints with
lineage + metrics (BASELINE.json north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Reference analog: the parsers' continue-on-error / progress-reporting
machinery (ParseResult parsers/__init__.py:392, ProgressReporter :234)
— re-expressed as batch-idempotent partitioned writes (SURVEY §2.9):

  * output partitioned by `part_id = pmod(xxhash64(doc_id), n_parts)` —
    content-addressed, stable under retries and re-runs;
  * ONE Spark job per (re)run covering all pending partitions, written
    with dynamic partition overwrite (idempotent per partition — a
    mid-job kill leaves partial partitions that the next run simply
    overwrites);
  * a checkpoint marker per completed partition carrying lineage
    (inputs, parameters) + metrics (row count, wall time) — JSON
    files beside the output, read/written through Hadoop's
    FileSystem API so hdfs:///s3a:// output paths work; a bigger
    deployment would keep rows in an Iceberg `checkpoints` table
    with the pending set derived by anti-join;
  * resume = rerun: pending = all partitions minus marked ones.

Determinism: triple content is a pure function of (sf_dir, code), and
ids are content-addressed (operators/relations.py), so resumed output
is byte-identical to a single-shot run — asserted by the kill/resume
pytest.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CKPT_DIR = "_checkpoints"


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path` via Hadoop's FileSystem API —
    resolves the scheme (file://, hdfs://, s3a://...) like spark.read
    does, so every probe/read/write against the output location agrees
    with what the distributed write produced. Driver-local os.* would
    raise (or silently touch the wrong filesystem) for the remote
    --out paths the spark-submit job advertises."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of `path` (see _fs); [] for a nonexistent path."""
    fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def _fs_read_json(spark: SparkSession, path: str) -> dict:
    fs, hpath = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _fs_write_json_atomic(spark: SparkSession, path: str,
                          obj: dict) -> None:
    """Write to <path>.tmp then rename — the same atomic-publish
    contract the local os.replace gave, through the output path's own
    filesystem."""
    fs, dst = _fs(spark, path)
    _, tmp = _fs(spark, path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"atomic publish failed: rename {path}.tmp -> "
                      f"{path}")


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))


def _marker_path(out_dir: str, part_id: int) -> str:
    return f"{out_dir.rstrip('/')}/{CKPT_DIR}/part_{part_id:05d}.json"


def _validate_existing_markers(spark: SparkSession, out_dir: str,
                               n_parts: int) -> None:
    """A marker written under a different n_parts means the existing
    partition layout is incompatible — resuming would mix pmod-K and
    pmod-N data (duplicates + losses) while reporting success. Refuse."""
    ckpt = f"{out_dir.rstrip('/')}/{CKPT_DIR}"
    for name in sorted(fs_list_names(spark, ckpt)):
        if not name.endswith(".json"):
            continue
        marker = _fs_read_json(spark, f"{ckpt}/{name}")
        prev = marker.get("lineage", {}).get("n_parts")
        if prev is not None and prev != n_parts:
            raise ValueError(
                f"checkpoints in {out_dir} were written with "
                f"n_parts={prev}, but this run uses n_parts={n_parts}; "
                f"clear the output directory or rerun with --parts {prev}")
        return  # all markers share one run config; first one suffices


def completed_partitions(spark: SparkSession, out_dir: str,
                         n_parts: int) -> list[int]:
    have = set(fs_list_names(spark, f"{out_dir.rstrip('/')}/{CKPT_DIR}"))
    return [k for k in range(n_parts)
            if f"part_{k:05d}.json" in have]


def pending_partitions(spark: SparkSession, out_dir: str,
                       n_parts: int) -> list[int]:
    done = set(completed_partitions(spark, out_dir, n_parts))
    return [k for k in range(n_parts) if k not in done]


def materialize_triples(
    spark: SparkSession,
    triples: DataFrame,
    out_dir: str,
    *,
    sf_dir: str,
    n_parts: int = 16,
    only_parts: list[int] | None = None,
) -> dict:
    """Write `triples` to `out_dir` partitioned by part_id, checkpointing
    each completed partition. Re-running resumes: completed partitions
    are skipped (not even scanned — the pending filter prunes them).
    `only_parts` restricts the run (the kill-simulation hook for tests).

    Returns a summary dict {written: [...], skipped: [...], rows: n}."""
    t0 = time.time()
    _validate_existing_markers(spark, out_dir, n_parts)
    pending = pending_partitions(spark, out_dir, n_parts)
    if only_parts is not None:
        pending = [k for k in pending if k in only_parts]
    done = completed_partitions(spark, out_dir, n_parts)
    if not pending:
        return {"written": [], "skipped": done, "rows": 0, "wall_s": 0.0}

    parted = with_part_id(triples, n_parts) \
        .filter(F.col("part_id").isin(pending))

    # one job, dynamic partition overwrite -> idempotent per partition
    (parted
     .repartition(len(pending), "part_id")
     .write
     .partitionBy("part_id")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite")
     .parquet(out_dir))

    # per-partition metrics from the written files (cheap scan of counts).
    # An all-empty input writes no parquet files at all (only the
    # partition dirs are absent), and reading the bare directory raises
    # (unable to infer schema) — that run is still complete with zero
    # rows and must publish its markers. The empty case is detected
    # explicitly (no part_id=* dirs at the output location) instead of
    # a blanket except: a transient/corruption read error must
    # propagate, not be recorded as a successful zero-row run.
    has_data = any(name.startswith("part_id=")
                   for name in fs_list_names(spark, out_dir))
    if has_data:
        counts = {
            r["part_id"]: r["n"]
            for r in spark.read.parquet(out_dir)
            .filter(F.col("part_id").isin(pending))
            .groupBy("part_id").agg(F.count("*").alias("n")).collect()
        }
    else:
        counts = {}
    wall = round(time.time() - t0, 3)
    for k in pending:
        marker = {
            "part_id": k,
            "status": "complete",
            "metrics": {"n_rows": int(counts.get(k, 0)),
                        "run_wall_s": wall},
            "lineage": {
                "input_sf_dir": sf_dir,
                "n_parts": n_parts,
                "partitioner": "pmod(xxhash64(doc_id), n_parts)",
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
            },
        }
        _fs_write_json_atomic(spark, _marker_path(out_dir, k), marker)

    return {"written": pending, "skipped": done,
            "rows": int(sum(counts.values())), "wall_s": wall}


# --- serving layout ---------------------------------------------------------

GRAPH_FILES_PER_PREDICATE = 4       # sandbox default; see docstring
GRAPH_MAX_RECORDS_PER_FILE = 5_000_000


def publish_graph_layout(triples: DataFrame, out_dir: str,
                         files_per_predicate: int =
                         GRAPH_FILES_PER_PREDICATE,
                         max_records_per_file: int =
                         GRAPH_MAX_RECORDS_PER_FILE) -> dict:
    """Publish the canonical triple store in its SERVING layout — the
    query-side counterpart to materialize_triples' doc-hash resume
    layout, and the Iceberg-table analog the north star names
    (partition spec = identity(predicate), sort order = (subject,
    object)):

      * directory-partitioned by `predicate` — the vocabulary is a
        closed semantic set (operators/ontology_data.py), so the
        directory count is bounded and per-predicate queries prune at
        the listing, never scanning other predicates;
      * each predicate's rows are hash-bucketed by subject into
        `files_per_predicate` writer tasks (a hub predicate therefore
        never funnels into one task — the same skew answer as
        canonicalize.py's salting), and every task sorts by (subject,
        object) so subject point/range lookups cluster into few row
        groups and parquet min/max stats skip the rest;
      * `maxRecordsPerFile` caps file size so a 100-TB predicate
        splits into many sorted files instead of one unsplittable blob.

    On Iceberg this maps 1:1 to `writeTo(t).partitionedBy(col) +
    write.sort-order = subject, object` with bucket write distribution;
    on plain parquet (this sandbox) the layout properties themselves —
    pruning, clustering, bounded file count — are what the test gates.
    Returns {n_predicates, n_files, rows}."""
    bucket = F.pmod(F.xxhash64("subject"), F.lit(files_per_predicate))
    (triples
     .repartition(F.col("predicate"), bucket.alias("sb"))
     .sortWithinPartitions("predicate", "subject", "object")
     .write.mode("overwrite")
     .option("maxRecordsPerFile", max_records_per_file)
     .partitionBy("predicate")
     .parquet(out_dir))
    spark = triples.sparkSession
    pred_dirs = [n for n in fs_list_names(spark, out_dir)
                 if n.startswith("predicate=")]
    n_files = sum(
        sum(1 for f in fs_list_names(spark, f"{out_dir}/{d}")
            if f.endswith(".parquet"))
        for d in pred_dirs)
    back = spark.read.parquet(out_dir)
    return {"n_predicates": len(pred_dirs), "n_files": n_files,
            "rows": back.count()}
