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
    (inputs, parameters) + metrics (row count, wall time) — here JSON
    files beside the output; on a cluster, rows in an Iceberg
    `checkpoints` table with the pending set derived by anti-join;
  * resume = rerun: pending = all partitions minus marked ones.

Determinism: triple content is a pure function of (sf_dir, code), and
ids are content-addressed (operators/relations.py), so resumed output
is byte-identical to a single-shot run — asserted by the kill/resume
pytest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CKPT_DIR = "_checkpoints"


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of `path` via Hadoop's FileSystem API — resolves the
    scheme (file://, hdfs://, s3a://...) like spark.read does, so probes
    against the output location agree with what the write produced.
    Returns [] for a nonexistent path. Driver-local os.listdir would
    raise (or silently probe the wrong filesystem) for the remote
    --out paths the spark-submit job advertises."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))


def _marker_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, CKPT_DIR, f"part_{part_id:05d}.json")


def _validate_existing_markers(out_dir: str, n_parts: int) -> None:
    """A marker written under a different n_parts means the existing
    partition layout is incompatible — resuming would mix pmod-K and
    pmod-N data (duplicates + losses) while reporting success. Refuse."""
    ckpt = os.path.join(out_dir, CKPT_DIR)
    if not os.path.isdir(ckpt):
        return
    for name in sorted(os.listdir(ckpt)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(ckpt, name)) as f:
            marker = json.load(f)
        prev = marker.get("lineage", {}).get("n_parts")
        if prev is not None and prev != n_parts:
            raise ValueError(
                f"checkpoints in {out_dir} were written with "
                f"n_parts={prev}, but this run uses n_parts={n_parts}; "
                f"clear the output directory or rerun with --parts {prev}")
        return  # all markers share one run config; first one suffices


def completed_partitions(out_dir: str, n_parts: int) -> list[int]:
    return [k for k in range(n_parts)
            if os.path.exists(_marker_path(out_dir, k))]


def pending_partitions(out_dir: str, n_parts: int) -> list[int]:
    done = set(completed_partitions(out_dir, n_parts))
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
    _validate_existing_markers(out_dir, n_parts)
    pending = pending_partitions(out_dir, n_parts)
    if only_parts is not None:
        pending = [k for k in pending if k in only_parts]
    done = completed_partitions(out_dir, n_parts)
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
    os.makedirs(os.path.join(out_dir, CKPT_DIR), exist_ok=True)
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
        tmp = _marker_path(out_dir, k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, _marker_path(out_dir, k))  # atomic publish

    return {"written": pending, "skipped": done,
            "rows": int(sum(counts.values())), "wall_s": wall}
