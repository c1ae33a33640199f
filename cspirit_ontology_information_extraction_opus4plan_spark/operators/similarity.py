"""Embedding similarity search — brute-force cosine top-k and a
random-hyperplane-LSH bucketed variant over the `embeddings` table
(vec_id bigint, embedding array<float>[64], label int).

No reference analog (the reference has no vector ops); this is the
similarity-search leg of the training-data pipeline surface.

Float-parity design: every dot product / norm is an *explicit
left-associative 64-term column expression* over elements cast to
double. Addition order is therefore fixed and identical in Spark and in
the oracle SQL (both parse `a + b + c` left-assoc), so cosine values are
bit-identical across engines — no nondeterministic SUM() over unnested
rows, no implementation-defined list_sum.

Scale notes: the brute-force path broadcasts the (small) query set and
streams the corpus once — the standard exact re-rank kernel. The LSH
path buckets both sides by an 8-bit hyperplane signature first, turning
the cross product into an equi-join on bucket (shuffle bounded by 256
keys; at 10^12 scale use more planes so buckets stay executor-sized).
Hyperplane signs are deterministic md5-derived constants compiled at
plan-build time — shared verbatim with the oracle SQL builder.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
TOP_K = 5
N_PLANES = 8
QUERY_MOD = 20  # query set = vec_id % QUERY_MOD == 0


def plane_signs() -> list[list[int]]:
    """N_PLANES x DIM matrix of +/-1, from md5(f"{p}:{i}") high bit —
    pure-Python constants, identical for the SQL oracle builder."""
    return [
        [1 if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0] >= "8" else -1
         for i in range(DIM)]
        for p in range(N_PLANES)
    ]


def _el(col: str, i: int) -> Column:
    return F.col(col)[i].cast("double")


def _dot(a: str, b: str) -> Column:
    return reduce(lambda x, y: x + y,
                  [_el(a, i) * _el(b, i) for i in range(DIM)])


def _norm2(a: str) -> Column:
    return reduce(lambda x, y: x + y,
                  [_el(a, i) * _el(a, i) for i in range(DIM)])


def _proj(a: str, signs: list[int]) -> Column:
    terms = [(_el(a, i) if s > 0 else -_el(a, i))
             for i, s in enumerate(signs)]
    return reduce(lambda x, y: x + y, terms)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _with_norm(df: DataFrame) -> DataFrame:
    return df.select("vec_id", "embedding", _norm2("embedding").alias("n2"))


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    cos = F.col("dot") / F.sqrt(F.col("qn2") * F.col("vn2"))
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs
            .withColumn("cosine", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id",
                    F.round("cosine", 6).alias("score"), "rank"))


def brute_force_topk(emb: DataFrame, k: int = TOP_K,
                     query_mod: int = QUERY_MOD) -> DataFrame:
    """Exact cosine top-k: broadcast query set x full scan, window per
    query. The baseline every ANN variant is measured against."""
    v = _with_norm(emb)
    q = (v.filter(F.col("vec_id") % query_mod == 0)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("n2").alias("qn2")))
    pairs = (v.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id").alias("neighbor_id"),
                     _dot("q_emb", "embedding").alias("dot"),
                     "qn2", F.col("n2").alias("vn2")))
    return _ranked(pairs, k)


def lsh_bucket_col(col: str) -> Column:
    """8-bit signature: bit p set iff projection onto plane p > 0."""
    signs = plane_signs()
    bits = [F.when(_proj(col, signs[p]) > 0, F.lit(1 << p)).otherwise(0)
            for p in range(N_PLANES)]
    return reduce(lambda x, y: x + y, bits)


def lsh_topk(emb: DataFrame, k: int = TOP_K,
             query_mod: int = QUERY_MOD) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket (equi-join on
    the 8-bit signature), exact cosine re-rank within bucket."""
    v = _with_norm(emb).withColumn("bucket", lsh_bucket_col("embedding"))
    q = (v.filter(F.col("vec_id") % query_mod == 0)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("n2").alias("qn2"), "bucket"))
    pairs = (v.join(F.broadcast(q), "bucket")
             .filter(F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id").alias("neighbor_id"),
                     _dot("q_emb", "embedding").alias("dot"),
                     "qn2", F.col("n2").alias("vn2")))
    return _ranked(pairs, k)
