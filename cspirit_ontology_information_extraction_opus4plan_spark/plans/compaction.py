"""Small-file compaction planning for the materialized triple table —
the maintenance pass a 100-TB store needs continuously (Iceberg's
`rewrite_data_files` / Delta OPTIMIZE analog): resumable checkpointed
writes (checkpointing.py) and streaming micro-batches both accrete
files far below the optimal scan size, and a 100-TB table read through
millions of 5 MB files pays task-scheduling and footer-fetch overhead
that dwarfs the actual IO.

Planning is metadata-only — the plan is computed from file listings
(path, partition, bytes), never by reading data — so it runs on the
driver-facing metadata frame in seconds regardless of table size, and
the rewrite itself is one partition-pruned scan per group.

The grouping rule is deterministic next-fit over a stable file order:
within each table partition, files sort by path and a group boundary
falls wherever the running byte total crosses `target_bytes` (group id
= floor(preceding-cumsum / target)). Deterministic planning matters
operationally: re-running the planner over an unchanged listing yields
byte-identical groups, so a compaction job interrupted between groups
can resume by skipping groups whose output already committed — the
same marker discipline checkpointing.py applies to the data itself.
A file larger than target_bytes lands alone in its own group (next-fit
never splits files); groups therefore hold < target + max_file bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpointing import _fs

TARGET_BYTES = 128 * 1024 * 1024


def list_data_files(spark: SparkSession, table_dir: str) -> DataFrame:
    """Recursively list a table directory's parquet data files into the
    planner's metadata frame (file_path, partition, bytes). The
    partition key is the relative directory (e.g. 'part_id=7'); files
    at the table root get partition ''. Listing goes through Hadoop's
    FileSystem API, so HDFS/S3 paths work the same as local ones."""
    fs, root = _fs(spark, table_dir)
    rows, stack = [], [root]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            p = st.getPath()
            name = p.getName()
            if st.isDirectory():
                if not name.startswith("_"):
                    stack.append(p)
            elif name.endswith(".parquet"):
                rel = p.toString()[len(root.toString()):].lstrip("/")
                part = rel.rsplit("/", 1)[0] if "/" in rel else ""
                rows.append((p.toString(), part, int(st.getLen())))
    return spark.createDataFrame(
        rows, "file_path string, partition string, bytes long")


def compaction_plan(files: DataFrame,
                    target_bytes: int = TARGET_BYTES) -> DataFrame:
    """Metadata frame (file_path, partition, bytes) -> one row per
    file with its assigned rewrite group: (partition, group_id,
    file_path, bytes). group_id = floor(preceding cumulative bytes /
    target) over the path-sorted files of each partition — pure
    window arithmetic, no collect, no data read. Callers rewrite one
    (partition, group_id) at a time; single-file groups whose file
    already meets target_bytes need no rewrite and can be skipped with
    a trivial filter on the grouped rollup."""
    w = (Window.partitionBy("partition").orderBy("file_path")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (files.withColumn(
        "group_id",
        F.floor(F.coalesce(F.sum("bytes").over(w), F.lit(0))
                / F.lit(target_bytes)).cast("int"))
        .select("partition", "group_id", "file_path", "bytes"))


def plan_summary(plan: DataFrame, target_bytes: int = TARGET_BYTES
                 ) -> DataFrame:
    """Rollup per rewrite group: n_files, group_bytes, and whether the
    group actually needs rewriting (more than one file, or a lone file
    under half the target — the 'worth touching' heuristic)."""
    return (plan.groupBy("partition", "group_id")
            .agg(F.count("*").cast("bigint").alias("n_files"),
                 F.sum("bytes").cast("bigint").alias("group_bytes"))
            .withColumn(
                "needs_rewrite",
                ((F.col("n_files") > 1)
                 | (F.col("group_bytes") < target_bytes // 2))
                .cast("int")))
