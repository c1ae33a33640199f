"""Bucketed triple-store layout — paying the subject shuffle ONCE.

At 100 TB the dominant repeated cost on the emitted store is
re-shuffling the triple table on `subject` for every self-join (path
composition, CONSTRUCT, two-hop context, entailment seeding). Spark's
bucketed tables move that exchange to WRITE time: a table written with
`bucketBy(N, subject).sortBy(subject)` records the hash layout in the
catalog, and any subject-keyed equi-join between tables that share it
(including a self-join) runs bucket-local — a SortMergeJoin with NO
shuffle exchange on either side (tests/test_bucketing.py asserts the
plan). One shuffle at publish time buys every downstream join.

This is the plain-parquet analog of the Iceberg bucket-transform
partition spec the north star names (`bucket(N, subject)` in the
partition spec + `write.distribution-mode=hash`); the
directory-partitioned resumable writer in checkpointing.py remains the
LINEAGE layout — this module is the serving layout the analytics jobs
read. Reference parity: the reference keeps its triple store as an
in-memory rdflib graph keyed by subject index
(aim2_project/aim2_ontology/models.py triple registry) — same access
pattern, distributed.

Bucket-count guidance at scale: buckets are per-table-global (not
per-partition), so pick N so one bucket's rows fit a task comfortably
(~128-512 MB); both join sides MUST share N, or Spark shuffles the
smaller layout to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRIPLE_BUCKETS = 16


def write_bucketed(df: DataFrame, table: str,
                   n_buckets: int = TRIPLE_BUCKETS,
                   key: str = "subject") -> None:
    """Publish `df` as a catalog table hash-bucketed and sorted by
    `key`. mode=overwrite keeps re-publication idempotent (same
    contract as checkpointing.materialize_triples)."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key).sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def bucket_local_join(spark: SparkSession, left_table: str,
                      right_table: str, key: str = "subject") -> DataFrame:
    """Equi-join two same-bucketed catalog tables on the bucket key.
    With matching bucket specs the physical plan contains no shuffle
    exchange — each task zips bucket i with bucket i."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    renamed = right.toDF(*[c if c == key else f"r_{c}"
                           for c in right.columns])
    return left.join(renamed, key)
