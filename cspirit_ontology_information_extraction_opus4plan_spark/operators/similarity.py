"""Embedding similarity search — brute-force cosine top-k and a
random-hyperplane-LSH bucketed variant over the `embeddings` table
(vec_id bigint, embedding array<float>[64], label int).

No reference analog (the reference has no vector ops); this is the
similarity-search leg of the training-data pipeline surface.

Float-parity design: every dot product / norm / projection is a
**left-associative 64-step accumulation in float64**, evaluated as 64
vectorized numpy elementwise ops inside an Arrow-batched kernel. Each
numpy step is one IEEE-754 double op per lane, so the result is
bit-identical to the oracle SQL's explicit `a0*b0 + a1*b1 + ...`
left-assoc expression — no BLAS matmul (whose blocked accumulation
order differs), no nondeterministic SUM() over unnested rows.

Scale notes: the query side is a **bounded table** — a fixed COUNT of
query vectors (default the N_QUERIES lowest vec_ids; production
callers pass their own query DataFrame), never a fixed FRACTION of
the corpus. The driver collect + broadcast is therefore O(n_queries *
dim) regardless of corpus size — at 10^12 rows the collected set is
still N_QUERIES rows. (A fixed-modulus query set was the round-1
scale-killer: 5% of a 100-TB corpus collected to the driver.) For a
query load that DOES grow with the corpus, block-partition the query
matrix and run the Gram computation as a bucket equi-join like the
LSH path — do not widen the broadcast. Broadcasts are cached per
distinct query set (module-level) so repeated calls in one session
reuse one broadcast instead of leaking a new one per call.

The brute-force path broadcasts the bounded query matrix once per
executor and streams the corpus through a single mapInPandas Gram
kernel; each Arrow batch prunes to its LOCAL top-k per query under
the final total order (cosine desc, neighbor asc), so the shuffle
into the global rank window carries only n_batches * n_queries * k
rows — never the full pair cross product. The LSH path buckets both
sides by an 8-bit hyperplane signature first, turning the cross
product into an equi-join on bucket (shuffle bounded by 256 keys; at
10^12 scale use more planes so buckets stay executor-sized);
within-bucket dots use a vectorized scalar pandas UDF over the joined
pairs. Hyperplane signs are deterministic md5-derived constants
compiled at plan-build time — shared verbatim with the oracle SQL
builder.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType)

DIM = 64
TOP_K = 5
N_PLANES = 8
# bounded demo query set: the N_QUERIES lowest vec_ids — a fixed COUNT
# (independent of corpus size), not a fixed fraction
N_QUERIES = 25


def plane_signs() -> list[list[int]]:
    """N_PLANES x DIM matrix of +/-1, from md5(f"{p}:{i}") high bit —
    pure-Python constants, identical for the SQL oracle builder."""
    return [
        [1 if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0] >= "8" else -1
         for i in range(DIM)]
        for p in range(N_PLANES)
    ]


# --- numpy kernels (left-assoc float64, bit-identical to the SQL) ----------


def _np_norm2(A: np.ndarray) -> np.ndarray:
    acc = A[:, 0] * A[:, 0]
    for i in range(1, DIM):
        acc = acc + A[:, i] * A[:, i]
    return acc


def _np_dot_rows(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot of two (n, DIM) matrices, left-assoc per row."""
    acc = A[:, 0] * B[:, 0]
    for i in range(1, DIM):
        acc = acc + A[:, i] * B[:, i]
    return acc


def _np_buckets(A: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """8-bit signature per row: bit p set iff sum_i(sign[p,i]*a_i) > 0,
    accumulated left-assoc (x + (-a) and x - a are the same IEEE op)."""
    out = np.zeros(len(A), dtype=np.int64)
    for p in range(N_PLANES):
        acc = A[:, 0] * signs[p, 0]
        for i in range(1, DIM):
            acc = acc + A[:, i] * signs[p, i]
        out |= (acc > 0).astype(np.int64) << p
    return out


def _stack(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


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


_PAIR_SCHEMA = StructType([
    StructField("q_id", LongType()),
    StructField("neighbor_id", LongType()),
    StructField("dot", DoubleType()),
    StructField("qn2", DoubleType()),
    StructField("vn2", DoubleType()),
])


def default_queries(emb: DataFrame, n_queries: int = N_QUERIES) -> DataFrame:
    """The bounded demo query table: the n_queries lowest vec_ids.
    Bounded by construction — the filter is on a constant, so the
    collected set never grows with the corpus."""
    return emb.filter(F.col("vec_id") < n_queries) \
              .select("vec_id", "embedding")


# per-distinct-query-set broadcast cache: repeated topk calls in one
# session reuse one broadcast instead of leaking a new one per call
_QUERY_BCAST: dict[str, object] = {}


def _query_broadcast(spark, qids: np.ndarray, Q: np.ndarray,
                     qn2: np.ndarray):
    key = hashlib.md5(qids.tobytes() + Q.tobytes()).hexdigest()
    bq = _QUERY_BCAST.get(key)
    if bq is None:
        bq = spark.sparkContext.broadcast((qids, Q, qn2))
        _QUERY_BCAST[key] = bq
    return bq


def _empty_ranked(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "q_id bigint, neighbor_id bigint, score double, rank int")


def brute_force_topk(emb: DataFrame, k: int = TOP_K,
                     queries: DataFrame | None = None) -> DataFrame:
    """Exact cosine top-k: broadcast BOUNDED query matrix x one corpus
    pass through a mapInPandas Gram kernel with per-batch local top-k
    pruning; global window re-ranks the per-batch winners. Any global
    top-k row is necessarily in its batch's local top-k under the same
    (cosine desc, neighbor asc) order, so pruning is lossless.

    `queries` is a (vec_id, embedding) DataFrame of FIXED size (defaults
    to default_queries); the driver collect is O(len(queries) * DIM)
    regardless of corpus size."""
    spark = emb.sparkSession
    if queries is None:
        queries = default_queries(emb)
    qpdf = queries.select("vec_id", "embedding").toPandas()
    if len(qpdf) == 0:
        return _empty_ranked(spark)
    Q = _stack(qpdf["embedding"])
    qids = qpdf["vec_id"].to_numpy()
    qn2 = _np_norm2(Q)
    bq = _query_broadcast(spark, qids, Q, qn2)

    def gram(batches):
        qids, Q, qn2 = bq.value
        nq = len(qids)
        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack(pdf["embedding"])
            vids = pdf["vec_id"].to_numpy()
            # (n_rows, n_q) Gram block, 64 left-assoc accumulation steps
            acc = A[:, 0:1] * Q[None, :, 0]
            for i in range(1, DIM):
                acc = acc + A[:, i:i + 1] * Q[None, :, i]
            vn2 = _np_norm2(A)
            cos = acc / np.sqrt(qn2[None, :] * vn2[:, None])
            cos[vids[:, None] == qids[None, :]] = -np.inf  # drop self
            kk = min(k, len(vids))
            order = np.lexsort(
                (np.broadcast_to(vids[:, None], cos.shape), -cos),
                axis=0)[:kk]
            rows = order.ravel(order="F")
            qcol = np.repeat(np.arange(nq), kk)
            keep = cos[rows, qcol] > -np.inf
            yield pd.DataFrame({
                "q_id": qids[qcol[keep]],
                "neighbor_id": vids[rows[keep]],
                "dot": acc[rows[keep], qcol[keep]],
                "qn2": qn2[qcol[keep]],
                "vn2": vn2[rows[keep]],
            })

    pairs = emb.select("vec_id", "embedding").mapInPandas(gram, _PAIR_SCHEMA)
    return _ranked(pairs, k)


@F.pandas_udf(DoubleType())
def _dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_np_dot_rows(_stack(a), _stack(b)))


@F.pandas_udf(DoubleType())
def _norm2_udf(a: pd.Series) -> pd.Series:
    return pd.Series(_np_norm2(_stack(a)))


@F.pandas_udf(IntegerType())
def _bucket_udf(a: pd.Series) -> pd.Series:
    signs = np.array(plane_signs(), dtype=np.float64)
    return pd.Series(_np_buckets(_stack(a), signs).astype(np.int32))


def lsh_bucket_col(col: str) -> Column:
    """8-bit hyperplane signature (vectorized Arrow UDF)."""
    return _bucket_udf(F.col(col))


NEARDUP_COS = 0.9
# (the planted-duplicate embeddings corpus lives in
# decorations.augmented_embeddings)


def embedding_neardup_pairs(emb: DataFrame,
                            threshold: float = NEARDUP_COS) -> DataFrame:
    """Embedding-cosine near-duplicate detection: candidate pairs from
    the LSH bucket equi-join (symmetric, a<b), exact cosine >= threshold.
    The dedup-by-embedding leg of the training-data surface — same
    bucket-bounded shuffle as lsh_topk, no global window needed."""
    # localCheckpoint: both self-join sides read v, and its two Arrow
    # UDF columns would otherwise run twice over the whole table; an
    # un-unpersistable Dataset.persist would leak a CacheManager entry
    v = emb.select("vec_id", "embedding",
                   _norm2_udf("embedding").alias("n2"),
                   lsh_bucket_col("embedding").alias("bucket")) \
        .localCheckpoint(eager=True)
    a = v.select(F.col("vec_id").alias("a"),
                 F.col("embedding").alias("emb_a"),
                 F.col("n2").alias("n2_a"), "bucket")
    b = v.select(F.col("vec_id").alias("b"),
                 F.col("embedding").alias("emb_b"),
                 F.col("n2").alias("n2_b"), "bucket")
    pairs = (a.join(b, "bucket").filter(F.col("a") < F.col("b"))
             .withColumn("cosine",
                         _dot_udf("emb_a", "emb_b")
                         / F.sqrt(F.col("n2_a") * F.col("n2_b"))))
    return (pairs.filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 6).alias("score")))


# --- IVF (inverted-file) ANN ------------------------------------------------

# deterministic "training" stub: centroids are a fixed bounded id range
# of corpus vectors (production would run distributed KMeans and persist
# the centroid table; everything downstream is identical)
IVF_C_BASE = 100
N_CENTROIDS = 16
N_PROBE = 4


def _centroid_matrix(emb: DataFrame):
    """Collect the BOUNDED centroid set (N_CENTROIDS rows regardless of
    corpus size), sorted by c_id so argmax tie-breaks to the lowest id."""
    cpdf = (emb.filter((F.col("vec_id") >= IVF_C_BASE)
                       & (F.col("vec_id") < IVF_C_BASE + N_CENTROIDS))
            .select("vec_id", "embedding")
            .toPandas().sort_values("vec_id"))
    if len(cpdf) == 0:
        raise ValueError(
            f"no centroid vectors in [{IVF_C_BASE}, "
            f"{IVF_C_BASE + N_CENTROIDS}) — corpus too small for the "
            f"demo centroid range")
    C = _stack(cpdf["embedding"])
    return cpdf["vec_id"].to_numpy(), C, _np_norm2(C)


def _centroid_cos(A: np.ndarray, C: np.ndarray,
                  cn2: np.ndarray) -> np.ndarray:
    """(n, n_cent) cosine block, left-assoc accumulation per lane."""
    acc = A[:, 0:1] * C[None, :, 0]
    for i in range(1, DIM):
        acc = acc + A[:, i:i + 1] * C[None, :, i]
    return acc / np.sqrt(cn2[None, :] * _np_norm2(A)[:, None])


def ivf_topk(emb: DataFrame, k: int = TOP_K,
             n_queries: int = N_QUERIES,
             n_probe: int = N_PROBE) -> DataFrame:
    """IVF ANN: assign every corpus vector to its nearest centroid's
    inverted list (one vectorized Arrow pass, broadcast bounded
    centroid matrix), probe the top-`n_probe` lists per query, exact
    cosine re-rank within the probed lists via the pair-dot UDF + the
    shared rank window.

    Scale shape: the corpus never self-joins — candidates come from the
    (list_id) equi-join against the bounded query probe table, so the
    shuffle is bounded by the probed fraction (~n_probe/n_centroids of
    the corpus). The centroid collect is O(N_CENTROIDS * DIM), fixed.
    At 10^12 rows, centroid count grows ~sqrt(n) (still driver-sized)
    and assignment stays a map-only pass. Ties in the nearest-centroid
    argmax break to the lowest c_id (same rule as the oracle's
    row_number ORDER BY cosine DESC, c_id ASC)."""
    spark = emb.sparkSession
    c_ids, C, cn2 = _centroid_matrix(emb)
    bc = spark.sparkContext.broadcast((c_ids, C, cn2))

    @F.pandas_udf(LongType())
    def assign_udf(a: pd.Series) -> pd.Series:
        c_ids, C, cn2 = bc.value
        cos = _centroid_cos(_stack(a), C, cn2)
        # argmax takes the FIRST max; columns are c_id-ascending
        return pd.Series(c_ids[np.argmax(cos, axis=1)])

    @F.pandas_udf("array<bigint>")
    def probe_udf(a: pd.Series) -> pd.Series:
        c_ids, C, cn2 = bc.value
        cos = _centroid_cos(_stack(a), C, cn2)
        nc = cos.shape[1]
        # per row: order by (cosine desc, c_id asc), keep first n_probe
        order = np.lexsort(
            (np.broadcast_to(c_ids[None, :], cos.shape), -cos), axis=1)
        keep = order[:, :min(n_probe, nc)]
        return pd.Series(list(c_ids[keep]))

    v = emb.select("vec_id", "embedding",
                   _norm2_udf("embedding").alias("n2"))
    assigned = v.withColumn("list_id", assign_udf("embedding"))
    q = (v.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("n2").alias("qn2"),
                 F.explode(probe_udf("embedding")).alias("list_id")))
    pairs = (assigned.join(F.broadcast(q), "list_id")
             .filter(F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id").alias("neighbor_id"),
                     _dot_udf("q_emb", "embedding").alias("dot"),
                     "qn2", F.col("n2").alias("vn2")))
    return _ranked(pairs, k)


def lsh_topk(emb: DataFrame, k: int = TOP_K,
             n_queries: int = N_QUERIES) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket (equi-join
    on the 8-bit signature), exact cosine re-rank within bucket via the
    vectorized pair-dot UDF. The query side is the bounded
    lowest-vec_id set, so the broadcast hint is genuinely
    dimension-sized; a corpus-scale query load would drop the hint and
    let the bucket equi-join shuffle both sides."""
    v = emb.select("vec_id", "embedding",
                   _norm2_udf("embedding").alias("n2"),
                   lsh_bucket_col("embedding").alias("bucket"))
    q = (v.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("n2").alias("qn2"), "bucket"))
    pairs = (v.join(F.broadcast(q), "bucket")
             .filter(F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id").alias("neighbor_id"),
                     _dot_udf("q_emb", "embedding").alias("dot"),
                     "qn2", F.col("n2").alias("vn2")))
    return _ranked(pairs, k)


# --- distributed fixed-iteration Lloyd's k-means ----------------------------
# Closes ivf_topk's acknowledged stub ("production would run distributed
# KMeans"): this IS that distributed KMeans, in the exact shape MLlib
# uses — broadcast k-row centroid matrix, map-only Arrow assignment,
# map-side-combinable per-cluster partial sums, bounded k x DIM driver
# collect per iteration. No corpus shuffle keyed on vec_id, ever.
K_CLUSTERS = 8
KMEANS_ITERS = 3


RRF_K = 60        # the standard RRF smoothing constant (Cormack'09)
RRF_TOP_K = 10
RRF_LEG_K = 20    # per-leg candidate depth
RRF_QUERY_VEC = 0  # dense leg demo query: vec 0 (doc 0's embedding)


def rrf_hybrid_search(docs: DataFrame, emb: DataFrame,
                      kfuse: int = RRF_K, leg_k: int = RRF_LEG_K,
                      top_k: int = RRF_TOP_K) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion: the BM25 lexical
    leg (textops.bm25_search, fixed bag-of-words query) and the dense
    cosine leg (brute_force_topk against one query embedding) each
    contribute 1/(kfuse + rank); docs in only one leg keep that leg's
    term — the standard sparse+dense fusion of a RAG data pipeline
    (Cormack/Clarke/Buettcher, SIGIR'09). Ranks are integers, so the
    fusion is float-exact across engines by construction.

    Output: (rank, doc_id, rrf_score, bm25_rank, dense_rank); absent-
    leg ranks surface as 0, not NULL (stable hashing).

    Scale shape: each leg is already bounded (top-leg_k rows) by its
    own scale-audited plan, so the full-outer fusion join, scoring,
    and ranking window all run on <= 2*leg_k rows — nothing here
    touches the corpus a second time."""
    from .textops import bm25_search

    lex = bm25_search(docs, top_k=leg_k).select(
        "doc_id", F.col("rank").cast("int").alias("bm25_rank"))
    dense = (brute_force_topk(
        emb, k=leg_k,
        queries=emb.filter(F.col("vec_id") == RRF_QUERY_VEC)
        .select("vec_id", "embedding"))
        .select(F.col("neighbor_id").alias("doc_id"),
                F.col("rank").cast("int").alias("dense_rank")))
    fused = (lex.join(dense, "doc_id", "full_outer")
             .select("doc_id",
                     F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
                     F.coalesce("dense_rank", F.lit(0)).alias("dense_rank")))
    rrf = (F.when(F.col("bm25_rank") > 0,
                  F.lit(1.0) / (F.lit(kfuse) + F.col("bm25_rank")))
           .otherwise(F.lit(0.0))
           + F.when(F.col("dense_rank") > 0,
                    F.lit(1.0) / (F.lit(kfuse) + F.col("dense_rank")))
           .otherwise(F.lit(0.0)))
    scored = fused.withColumn("rrf_score", F.round(rrf, 6))
    top = scored.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id", "rrf_score", "bm25_rank", "dense_rank")


PSI_DIMS = 8        # dimensions audited for drift
PSI_BINS = 8
PSI_RANGE = 3.0     # bin range [-3, 3)
PSI_SHIFT = 0.5     # planted drift on dim 0 of the 'new' half
PSI_DRIFT = 0.1     # industry-standard PSI alert threshold


def embedding_drift_psi(emb: DataFrame) -> DataFrame:
    """Population Stability Index per embedding dimension — the
    model-monitoring check a pipeline runs when a new crawl's
    embeddings arrive (encoder regression / domain shift shows up as
    per-dim distribution drift before any downstream metric moves).
    The corpus splits by vec_id parity into reference (even) and new
    (odd); dim 0 of the new half gets a documented synthetic +0.5
    shift so the audit demonstrably fires. PSI_d = sum over observed
    bins of (p_new - p_ref) * ln(p_new / p_ref), probabilities
    Laplace-smoothed as (cnt + 1) / (N_side + BINS). Emits
    (dim, psi, drift).

    Shape: one posexplode pass pruned to the audited dims, fixed-width
    binning per row, ONE conditional-count aggregate on (dim, bin)
    (map-side combinable, dims x bins keys), side totals as broadcast
    scalars, and the per-dim PSI sum runs over <= BINS rows. Counts
    are integers, so the derived floats carry no accumulation noise
    beyond the final 8-term sum (round 6)."""
    is_ref = (F.col("vec_id") % 2 == 0).alias("is_ref")
    ex = (emb.select(is_ref, F.posexplode("embedding").alias("d", "x"))
          .filter(F.col("d") < PSI_DIMS))
    x2 = F.when(~F.col("is_ref") & (F.col("d") == 0),
                F.col("x") + F.lit(PSI_SHIFT)).otherwise(F.col("x"))
    b = F.least(F.greatest(F.floor(
        (x2 + PSI_RANGE) / (2 * PSI_RANGE) * PSI_BINS), F.lit(0)),
        F.lit(PSI_BINS - 1))
    cnt = (ex.select("is_ref", F.col("d").cast("int").alias("dim"),
                     b.alias("b"))
           .groupBy("dim", "b")
           .agg(F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
                .alias("cr"),
                F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
                .alias("cn")))
    nr = emb.filter(F.col("vec_id") % 2 == 0).agg(
        F.count("*").cast("double").alias("nr"))
    nn = emb.filter(F.col("vec_id") % 2 != 0).agg(
        F.count("*").cast("double").alias("nn"))
    pr = (F.col("cr") + 1) / (F.col("nr") + PSI_BINS)
    pn = (F.col("cn") + 1) / (F.col("nn") + PSI_BINS)
    term = (pn - pr) * F.log(pn / pr)
    psi = (cnt.crossJoin(F.broadcast(nr)).crossJoin(F.broadcast(nn))
           .groupBy("dim").agg(F.sum(term).alias("psi_raw")))
    return psi.select("dim", F.round("psi_raw", 6).alias("psi"),
                      (F.col("psi_raw") > PSI_DRIFT).alias("drift"))


MAXSIM_SUB = 4                  # sub-vectors per embedding
MAXSIM_SUBDIM = DIM // MAXSIM_SUB
MAXSIM_QUERY_VEC = 1            # late-interaction demo query
MAXSIM_TOP_K = 10


def maxsim_topk(emb: DataFrame, q_vec: int = MAXSIM_QUERY_VEC,
                top_k: int = MAXSIM_TOP_K) -> DataFrame:
    """ColBERT-style late-interaction retrieval, reduced to the fixed
    partition of each embedding into MAXSIM_SUB contiguous
    MAXSIM_SUBDIM-dim sub-vectors ("token vectors"): score(q, d) =
    sum over query sub-vectors of max over doc sub-vectors of the
    normalized dot — MaxSim (Khattab & Zaharia 2020). Completes the
    retrieval family: BM25 (sparse), brute/IVF/LSH (dense single-
    vector), RRF (fusion), this (multi-vector late interaction).
    Emits (rank, vec_id, score) for the top_k docs.

    Pure JVM per-row arithmetic: the query's sub-vectors arrive as ONE
    broadcast-free literal-free crossJoin of a one-row frame (no
    collect of corpus data — the query row is filtered by a constant
    id); each doc row evaluates SUB x SUB fixed-order dot folds, then
    greatest() and a fixed-order sum — the exact expression tree the
    oracle's expanded SQL evaluates, bit-identical before rounding.
    Ranking sorts the bounded rounded-score frame."""
    def sub(col: str, s: int) -> Column:
        return F.slice(col, s * MAXSIM_SUBDIM + 1, MAXSIM_SUBDIM)

    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731

    q = (emb.filter(F.col("vec_id") == q_vec)
         .select(*[sub("embedding", s).alias(f"q{s}")
                   for s in range(MAXSIM_SUB)]))
    d = emb.filter(F.col("vec_id") != q_vec).crossJoin(F.broadcast(q))
    score = None
    for i in range(MAXSIM_SUB):
        best = None
        for j in range(MAXSIM_SUB):
            dot = F.aggregate(
                F.zip_with(F.col(f"q{i}"), sub("embedding", j),
                           lambda a, b: a.cast("double")
                           * b.cast("double")),
                F.lit(0.0), lambda acc, v: acc + v)
            qn = F.aggregate(F.col(f"q{i}"), F.lit(0.0), sq)
            dn = F.aggregate(sub("embedding", j), F.lit(0.0), sq)
            c = F.try_divide(dot, F.sqrt(qn * dn))
            best = c if best is None else F.greatest(best, c)
        score = best if score is None else score + best
    scored = d.select("vec_id", F.round(score, 6).alias("score"))
    top = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(top_k)
    w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    return top.select(F.row_number().over(w).cast("bigint").alias("rank"),
                      "vec_id", "score")


def _kmeans_sq_dists(A: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared-L2 block, left-assoc 64-step accumulation per
    lane — bit-identical to the oracle's unrolled
    `(a0-c0)*(a0-c0) + (a1-c1)*(a1-c1) + ...` expression."""
    d = A[:, 0:1] - C[None, :, 0]
    acc = d * d
    for i in range(1, DIM):
        d = A[:, i:i + 1] - C[None, :, i]
        acc = acc + d * d
    return acc


def _kmeans_fit(v: DataFrame, k: int, iters: int):
    """The Lloyd's fit loop shared by embedding_kmeans and semdedup:
    init = the k lowest vec_ids' vectors, `iters` rounds of (broadcast
    centroid matrix -> map-only Arrow argmin assignment -> per-cluster
    per-dim avg with k groups -> O(k x DIM) driver collect). Returns
    (c_ids, C) after the final update."""
    spark = v.sparkSession
    cpdf = (v.filter(F.col("vec_id") < k).toPandas()
            .sort_values("vec_id"))
    c_ids = cpdf["vec_id"].to_numpy()
    C = _stack(cpdf["embedding"])

    def assigner(bc):
        @F.pandas_udf(LongType())
        def assign(a: pd.Series) -> pd.Series:
            c_ids, C = bc.value
            # argmin takes the FIRST min; columns are c_id-ascending
            return pd.Series(c_ids[np.argmin(_kmeans_sq_dists(
                _stack(a), C), axis=1)])
        return assign

    avg_cols = [F.avg(F.col("embedding").getItem(i).cast("double"))
                .alias(f"c{i}") for i in range(DIM)]
    for _ in range(iters):
        bc = spark.sparkContext.broadcast((c_ids, C))
        assigned = v.withColumn("c_id", assigner(bc)("embedding"))
        upd = (assigned.groupBy("c_id").agg(*avg_cols)
               .toPandas().sort_values("c_id"))
        c_ids = upd["c_id"].to_numpy()
        C = np.stack([upd[f"c{i}"].to_numpy() for i in range(DIM)],
                     axis=1)
    return c_ids, C


def embedding_kmeans(emb: DataFrame, k: int = K_CLUSTERS,
                     iters: int = KMEANS_ITERS) -> DataFrame:
    """Distributed Lloyd's k-means, FIXED iteration count (deterministic
    — no data-dependent convergence test), squared-L2 metric, init =
    the k lowest vec_ids' vectors. Returns per-cluster
    (c_id, n_vecs, mean_sq_dist, centroid_norm) after `iters` updates
    plus a final assignment pass.

    Scale shape (the real thing, not a demo): each iteration is one
    map-only Arrow assignment pass over the corpus (broadcast k x DIM
    centroid matrix, numpy left-assoc kernel — memory trap #5: a
    512-term column expression would fall out of codegen) feeding a
    64-column avg groupBy with k groups — map-side combinable, the
    exchange carries k rows. The per-iteration driver collect is
    O(k * DIM) regardless of corpus size (same bound as ivf_topk's
    centroid matrix). Ties in the argmin break to the lowest c_id
    (numpy argmin = first minimum over c_id-ascending columns; oracle:
    row_number ORDER BY dist ASC, c_id ASC).

    Float parity: centroid updates are per-dim avg() in both engines
    (order-nondeterministic at ~1e-16 relative — the
    embedding_label_stats precedent); assignment margins on this
    corpus are >= 7e-06 at every sf (measured), eight orders above the
    noise floor, so assignments are engine-stable and the round-6
    output columns absorb the residue."""
    spark = emb.sparkSession
    v = emb.select("vec_id", "embedding")
    c_ids, C = _kmeans_fit(v, k, iters)
    bc = spark.sparkContext.broadcast((c_ids, C))

    @F.pandas_udf("c_id bigint, sq_dist double")
    def final_assign(a: pd.Series) -> pd.DataFrame:
        c_ids, C = bc.value
        D = _kmeans_sq_dists(_stack(a), C)
        j = np.argmin(D, axis=1)
        return pd.DataFrame({"c_id": c_ids[j],
                             "sq_dist": D[np.arange(len(j)), j]})

    norm2 = _np_norm2(C)
    norms = spark.createDataFrame(
        [(int(c), float(n2)) for c, n2 in zip(c_ids, norm2)],
        "c_id bigint, cn2 double")
    out = (v.select(final_assign("embedding").alias("s"))
           .select("s.c_id", "s.sq_dist")
           .groupBy("c_id")
           .agg(F.count("*").cast("bigint").alias("n_vecs"),
                F.round(F.avg("sq_dist"), 6).alias("mean_sq_dist")))
    return (out.join(F.broadcast(norms), "c_id")
            .select("c_id", "n_vecs", "mean_sq_dist",
                    F.round(F.sqrt("cn2"), 6).alias("centroid_norm")))


# --- SemDeDup: semantic dedup confined within k-means clusters ---------------

SEMDEDUP_COS = 0.9


def semdedup(emb: DataFrame, threshold: float = SEMDEDUP_COS,
             k: int = K_CLUSTERS, iters: int = KMEANS_ITERS) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then within
    each cluster mark cosine-near-duplicate pairs (cosine >= threshold)
    and KEEP the pair member FARTHEST from the cluster centroid — the
    paper's rule: prune the prototypical copy, keep the informative
    outlier. Equal distances break to keeping the lowest vec_id. One
    verdict row per vector: (vec_id, c_id, cent_sq_dist, is_dup).

    No reference analog (the reference dedups whole items lexically);
    this is the semantic leg of the dedup family next to
    embedding_neardup_pairs (LSH + exact cosine) — SemDeDup catches
    paraphrase-level duplication that lexical shingles and raw LSH
    buckets cannot, because candidate scope is the learned cluster.

    Scale shape: clustering is the bounded-collect distributed Lloyd's
    loop (_kmeans_fit: O(k x DIM) driver state, map-only Arrow passes,
    k-group map-side-combinable avg). The quadratic step is CONFINED
    WITHIN clusters by a self-equi-join on c_id — the SemDeDup design
    point: k grows with the corpus (the paper uses 100 k clusters), so
    each cluster stays task-sized and the shuffle is keyed by c_id,
    never a corpus cross join. A runaway cluster is an AQE skew-join
    case; sub-bucket by an LSH band inside the cluster if one cluster
    outgrows a task. Cosine margins: planted pairs sit at 1.0 vs a 0.9
    threshold; the keep rule compares squared-L2 centroid distances
    whose planted margin (a 1.25-rescaled twin) is ~0.56*|e|^2 — both
    orders of magnitude above the ~1e-16 cross-engine avg() noise in
    the centroid coordinates."""
    v0 = emb.select("vec_id", "embedding")
    c_ids, C = _kmeans_fit(v0, k, iters)
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, C))

    @F.pandas_udf("c_id bigint, sq_dist double")
    def assign(a: pd.Series) -> pd.DataFrame:
        c_ids, C = bc.value
        D = _kmeans_sq_dists(_stack(a), C)
        j = np.argmin(D, axis=1)
        return pd.DataFrame({"c_id": c_ids[j],
                             "sq_dist": D[np.arange(len(j)), j]})

    # localCheckpoint: both self-join sides read v (the
    # embedding_neardup_pairs precedent) — without it the Arrow
    # assignment + norm kernels run twice over the corpus
    v = (v0.select("vec_id", "embedding",
                   _norm2_udf("embedding").alias("n2"),
                   assign("embedding").alias("s"))
         .select("vec_id", "embedding", "n2", "s.c_id", "s.sq_dist")
         .localCheckpoint(eager=True))
    a = v.select(F.col("vec_id").alias("va"),
                 F.col("embedding").alias("emb_a"),
                 F.col("n2").alias("n2_a"),
                 F.col("sq_dist").alias("d_a"), "c_id")
    b = v.select(F.col("vec_id").alias("vb"),
                 F.col("embedding").alias("emb_b"),
                 F.col("n2").alias("n2_b"),
                 F.col("sq_dist").alias("d_b"), "c_id")
    pairs = (a.join(b, "c_id").filter(F.col("va") < F.col("vb"))
             .withColumn("cosine",
                         _dot_udf("emb_a", "emb_b")
                         / F.sqrt(F.col("n2_a") * F.col("n2_b")))
             .filter(F.col("cosine") >= threshold))
    # the member CLOSER to the centroid loses; exact tie -> the higher
    # vec_id loses (vb, since va < vb), i.e. keep the lowest id
    losers = (pairs.select(
        F.when(F.col("d_a") < F.col("d_b"), F.col("va"))
        .otherwise(F.col("vb")).alias("vec_id")).distinct())
    return (v.join(losers.withColumn("dup", F.lit(1)), "vec_id", "left")
            .select("vec_id", "c_id",
                    F.round("sq_dist", 6).alias("cent_sq_dist"),
                    F.coalesce("dup", F.lit(0)).cast("int")
                    .alias("is_dup")))


MRL_DIM = 16        # truncation prefix under evaluation
MRL_COS_MIN = 0.9   # retention threshold


def mrl_truncation_stats(emb: DataFrame, prefix: int = MRL_DIM,
                         cos_min: float = MRL_COS_MIN) -> DataFrame:
    """Matryoshka truncation audit: per vector, the cosine between the
    full embedding and its `prefix`-dim truncation (zero-padded), which
    reduces to sqrt(|prefix|^2 / |full|^2) — the number that decides
    whether a 4x-cheaper vector store keeps enough geometry (MRL,
    Kusupati et al. 2022). Emits (vec_id, label, cos_prefix, ok).

    Pure JVM per-row arithmetic: two higher-order aggregate folds
    (prefix slice + full) per row, no join, no shuffle, no Python —
    the fold starts at 0.0 and adds left-to-right, the exact order the
    oracle's expanded per-dim sum evaluates in, so the doubles are
    bit-identical before the 6-dp round."""
    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731
    p2 = F.aggregate(F.slice("embedding", 1, prefix), F.lit(0.0), sq)
    n2 = F.aggregate(F.col("embedding"), F.lit(0.0), sq)
    cos = F.sqrt(F.try_divide(p2, n2))
    return emb.select("vec_id", "label",
                      F.round(cos, 6).alias("cos_prefix"),
                      (cos >= cos_min).alias("ok"))


def label_embedding_stats(emb: DataFrame) -> DataFrame:
    """Per-label embedding cluster quality — the probe a training
    pipeline runs before trusting labels for mixture sampling or
    contrastive batching: member count, centroid L2 norm (random
    vectors' centroid collapses toward 0; a coherent cluster's does
    not), and mean cosine(member, centroid).

    Scale shape: one posexplode pass -> per-(label, dim) avg (map-side
    combinable; keys = labels x DIM, never corpus-sized), centroid
    regrouped via sort_array(collect_list(struct)) over DIM-sized
    groups, broadcast-joined back (labels are a genuine dimension),
    then one JVM higher-order zip_with/aggregate dot per row and a
    final label avg. No Python, no window, no self-join."""
    ex = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (ex.groupBy("label", "d")
            .agg(F.avg("x").alias("c"))
            .groupBy("label")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("d", "c"))),
                lambda s: s["c"]).alias("centroid")))
    withc = emb.join(F.broadcast(cent), "label")
    dot = F.aggregate(
        F.zip_with("embedding", "centroid",
                   lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, v: acc + v)
    en = F.aggregate(
        F.transform("embedding",
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    cn = F.aggregate(F.transform("centroid", lambda b: b * b),
                     F.lit(0.0), lambda acc, v: acc + v)
    scored = withc.select(
        "label",
        (dot / F.sqrt(en * cn)).alias("cos"),
        F.sqrt(cn).alias("cnorm"))
    return (scored.groupBy("label")
            .agg(F.count("*").cast("bigint").alias("n_vecs"),
                 F.round(F.min("cnorm"), 6).alias("centroid_norm"),
                 F.round(F.avg("cos"), 6).alias("mean_cos")))


def int8_quantization_stats(emb: DataFrame, levels: int = 255) -> DataFrame:
    """(vec_id, embedding) -> per-vector reconstruction-error stats
    after per-DIMENSION uniform int8 scalar quantization — the memory
    side of the ANN scale path (an IVF list of float32x64 is 256 B/vec;
    int8 codes are 64 B, so the quantization error budget decides
    whether the 4x shrink is admissible before exact re-rank).

    code_d(x) = floor((x - lo_d) / (hi_d - lo_d) * levels + 0.5) with
    per-dimension corpus [lo_d, hi_d]; recon = lo_d + code * step.
    Shape at scale: one map-side posexplode pass (64 rows/vec), the
    dim-stats aggregate is levels-of-free map-side combine onto 64
    groups, the 64-row stats frame broadcast-joins back, and the only
    corpus shuffle is the final groupBy(vec_id). Arithmetic is double
    with one fixed operation order so the DuckDB oracle reproduces
    codes bit-exactly; error sums rounded to 6 (sum-order noise)."""
    flat = (emb.select("vec_id",
                       F.posexplode("embedding").alias("dim", "raw"))
            .select("vec_id", "dim", F.col("raw").cast("double")
                    .alias("val")))
    rng = flat.groupBy("dim").agg(F.min("val").alias("lo"),
                                  F.max("val").alias("hi"))
    code = F.when(
        F.col("hi") > F.col("lo"),
        F.floor((F.col("val") - F.col("lo"))
                / (F.col("hi") - F.col("lo")) * levels + F.lit(0.5))
    ).otherwise(F.lit(0)).cast("bigint")
    scored = (flat.join(F.broadcast(rng), "dim")
              .withColumn("code", code)
              .withColumn(
                  "err",
                  F.abs(F.col("val") - (F.col("lo") + F.col("code")
                        * (F.col("hi") - F.col("lo")) / levels))))
    return (scored.groupBy("vec_id")
            .agg(F.round(F.avg("err"), 6).alias("mean_abs_err"),
                 F.round(F.max("err"), 6).alias("max_abs_err"),
                 F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 6)
                 .alias("rmse")))


# --- IVF-PQ (product quantization, ADC scoring) -----------------------------
# Completes the ANN memory ladder: float32 corpus (brute/LSH/IVF, 256 B
# per vector) -> int8 scalar quantization (64 B, int8_quantization_stats)
# -> PQ codes (PQ_M bytes = 8 B, a 32x shrink). At 10^12 vectors the
# inverted lists no longer fit executor memory as floats; IVF-PQ scans
# lists of M-byte codes and scores them against per-query lookup tables
# (asymmetric distance computation), touching full vectors never.
# No reference analog (the reference has no vector ops) — this is the
# FAISS IVFADC shape re-expressed as DataFrame ops.
PQ_M = 8                 # subspaces (codes per vector, 1 byte each)
PQ_SUB = DIM // PQ_M     # dims per subspace
PQ_K = 16                # codebook entries per subspace
# deterministic "training" stub, same convention as IVF_C_BASE: codebook
# entries are the subvectors of a fixed bounded id range (production
# would run embedding_kmeans per subspace and persist the codebooks;
# encode/score below are identical either way)
PQ_C_BASE = 40


def _pq_codebooks(emb: DataFrame) -> np.ndarray:
    """Bounded (PQ_M, PQ_K, PQ_SUB) codebook tensor; code ids are the
    source vec_id order (ascending), so argmin ties break to the lowest
    code id on both engines."""
    cpdf = (emb.filter((F.col("vec_id") >= PQ_C_BASE)
                       & (F.col("vec_id") < PQ_C_BASE + PQ_K))
            .select("vec_id", "embedding")
            .toPandas().sort_values("vec_id"))
    if len(cpdf) < PQ_K:
        raise ValueError(
            f"need {PQ_K} codebook vectors in [{PQ_C_BASE}, "
            f"{PQ_C_BASE + PQ_K}) — corpus too small for the demo "
            f"codebook range")
    V = _stack(cpdf["embedding"])                     # (PQ_K, DIM)
    return np.ascontiguousarray(
        V.reshape(PQ_K, PQ_M, PQ_SUB).transpose(1, 0, 2))


def _pq_sq_block(A_sub: np.ndarray, C_sub: np.ndarray) -> np.ndarray:
    """(n, PQ_K) squared-L2 block for ONE subspace, left-assoc
    PQ_SUB-step accumulation per lane — bit-identical to the oracle's
    `(a0-c0)*(a0-c0) + ...` expression."""
    d = A_sub[:, 0:1] - C_sub[None, :, 0]
    acc = d * d
    for j in range(1, PQ_SUB):
        d = A_sub[:, j:j + 1] - C_sub[None, :, j]
        acc = acc + d * d
    return acc


def ivfpq_topk(emb: DataFrame, k: int = TOP_K,
               n_queries: int = N_QUERIES,
               n_probe: int = N_PROBE) -> DataFrame:
    """IVF-PQ ANN: coarse nearest-centroid inverted lists (same
    assignment as ivf_topk), PQ encoding of every corpus vector into
    PQ_M 4-bit-alphabet codes in one map-only Arrow pass, then ADC
    scoring — each bounded query precomputes a (PQ_M, PQ_K) table of
    subspace distances to the codebooks, and a candidate's approximate
    squared L2 is PQ_M table lookups summed left-assoc. Top-k per query
    by (adc ASC, neighbor_id ASC).

    Scale shape: the corpus is touched by exactly two map-only Arrow
    passes (coarse assign + PQ encode, one projected scan), candidates
    come from the broadcast (q_id, list_id) probe table equi-join —
    shuffle bounded by the probed fraction, like ivf_topk — and the
    scoring pass reads ONLY the PQ_M-byte code column (the full
    embedding column is pruned from the candidate scan). Driver state
    is O(n_queries * PQ_M * PQ_K) ADC tables + O(PQ_M * PQ_K * PQ_SUB)
    codebooks, both corpus-size-independent. Ties in the per-subspace
    argmin encode break to the lowest code id (numpy argmin = first
    minimum; oracle row_number ORDER BY d ASC, code ASC)."""
    spark = emb.sparkSession
    c_ids, C, cn2 = _centroid_matrix(emb)
    CB = _pq_codebooks(emb)
    bc = spark.sparkContext.broadcast((c_ids, C, cn2, CB))

    @F.pandas_udf(LongType())
    def assign_udf(a: pd.Series) -> pd.Series:
        c_ids, C, cn2, _ = bc.value
        cos = _centroid_cos(_stack(a), C, cn2)
        # argmax takes the FIRST max; columns are c_id-ascending
        return pd.Series(c_ids[np.argmax(cos, axis=1)])

    # nondeterministic marker = "evaluate exactly once, in place": the
    # inner join's implied isnotnull(list_id) otherwise DUPLICATES the
    # assign Arrow stage (one eval for the filter, one for the project)
    # — a third full-corpus Python pass at 10^12 rows. The UDF is in
    # fact deterministic; the marker only pins evaluation count/order.
    assign_udf = assign_udf.asNondeterministic()

    @F.pandas_udf("array<int>")
    def encode_udf(a: pd.Series) -> pd.Series:
        _, _, _, CB = bc.value
        A = _stack(a)
        codes = np.empty((len(A), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            blk = _pq_sq_block(A[:, m * PQ_SUB:(m + 1) * PQ_SUB], CB[m])
            codes[:, m] = np.argmin(blk, axis=1)
        return pd.Series(list(codes))

    # bounded query set: collect once, build ADC tables + probed lists
    # driver-side (the FAISS shape — per-query tables are the point of
    # ADC; O(n_queries) driver state, never corpus-sized)
    qpdf = (emb.filter(F.col("vec_id") < n_queries)
            .select("vec_id", "embedding")
            .toPandas().sort_values("vec_id"))
    if len(qpdf) == 0:
        raise ValueError("no query vectors below n_queries")
    q_ids = qpdf["vec_id"].to_numpy()
    Q = _stack(qpdf["embedding"])
    T = np.empty((len(Q), PQ_M, PQ_K), dtype=np.float64)
    for m in range(PQ_M):
        T[:, m, :] = _pq_sq_block(Q[:, m * PQ_SUB:(m + 1) * PQ_SUB],
                                  CB[m])
    # probed lists per query: (cosine DESC, c_id ASC), same rule as
    # ivf_topk's probe_udf, evaluated on the identical numpy kernel
    cos_q = _centroid_cos(Q, C, cn2)
    order = np.lexsort(
        (np.broadcast_to(c_ids[None, :], cos_q.shape), -cos_q), axis=1)
    keep = order[:, :min(n_probe, cos_q.shape[1])]
    probe_df = spark.createDataFrame(
        [(int(q_ids[qi]), int(c_ids[ci]))
         for qi in range(len(q_ids)) for ci in keep[qi]],
        "q_id bigint, list_id bigint")
    bq = spark.sparkContext.broadcast((q_ids, T))

    @F.pandas_udf(DoubleType())
    def adc_udf(q: pd.Series, codes: pd.Series) -> pd.Series:
        q_ids, T = bq.value
        pos = {int(v): i for i, v in enumerate(q_ids)}
        qi = q.map(pos).to_numpy(dtype=np.int64)
        Cd = np.stack(codes.to_numpy()).astype(np.int64)
        acc = T[qi, 0, Cd[:, 0]]
        for m in range(1, PQ_M):
            acc = acc + T[qi, m, Cd[:, m]]
        return pd.Series(acc)

    assigned = emb.select(
        "vec_id",
        assign_udf("embedding").alias("list_id"),
        encode_udf("embedding").alias("codes"))
    cand = (assigned.join(F.broadcast(probe_df), "list_id")
            .filter(F.col("vec_id") != F.col("q_id")))
    scored = cand.select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        adc_udf("q_id", "codes").alias("adc"))
    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id",
                    F.round("adc", 6).alias("adc_dist"), "rank"))


# --- distributed covariance (second-moment) matrix --------------------------

_COV_PARTIAL_SCHEMA = StructType([
    StructField("i", IntegerType()),
    StructField("j", IntegerType()),
    StructField("s", DoubleType()),
])


def covariance_matrix(emb: DataFrame) -> DataFrame:
    """Distributed DIM x DIM covariance of the embedding column — the
    one-pass second-moment reduction behind PCA / whitening / Mahalanobis
    drift scoring. Emits (i, j, cov) for the upper triangle i <= j,
    cov = (S_xy - S_x * S_y / n) / n (population covariance).

    Scale shape (the 100-TB point): each Arrow batch is reduced ON THE
    EXECUTOR to one DIM*(DIM+1)/2-row partial second-moment block plus a
    DIM-row sum vector and a count — mapInPandas emits O(DIM^2) rows PER
    BATCH, never per input row, so the shuffle into the final (i, j)
    aggregate carries n_batches * ~2k rows regardless of corpus size.
    The naive alternative (posexplode the vector twice and groupBy) would
    shuffle DIM^2 rows per vector — 4096x the corpus. Final assembly
    joins the 2080-row moment frame against the 64-row sum vector twice
    (broadcast) and the 1-row count (broadcast cross join): all
    dimension-sized.

    Float note: partials accumulate in float64 via numpy matmul; the
    oracle sums doubles over unnested rows. Accumulation ORDERS differ,
    so agreement is at round(6) tolerance (error ~1e-13 on O(1)
    magnitudes), same contract as every summed-double oracle here —
    bit-parity is reserved for the per-row kernels above."""
    iu, ju = np.triu_indices(DIM)

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = _stack(pdf["embedding"])
            S = X.T @ X
            yield pd.concat([
                pd.DataFrame({"i": iu.astype(np.int32),
                              "j": ju.astype(np.int32),
                              "s": S[iu, ju]}),
                pd.DataFrame({"i": np.arange(DIM, dtype=np.int32),
                              "j": np.full(DIM, -1, dtype=np.int32),
                              "s": X.sum(axis=0)}),
                pd.DataFrame({"i": [-1], "j": [-1],
                              "s": [float(len(X))]}),
            ], ignore_index=True)

    parts = emb.select("embedding").mapInPandas(partial, _COV_PARTIAL_SCHEMA)
    moments = parts.groupBy("i", "j").agg(F.sum("s").alias("s"))
    sxy = moments.filter(F.col("j") >= 0)
    sx = moments.filter((F.col("j") == -1) & (F.col("i") >= 0))
    n1 = (moments.filter(F.col("i") == -1)
          .select(F.col("s").alias("n")))
    si = sx.select(F.col("i").alias("i"), F.col("s").alias("s_i"))
    sj = sx.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    return (sxy
            .join(F.broadcast(si), "i")
            .join(F.broadcast(sj), "j")
            .crossJoin(F.broadcast(n1))
            .select(F.col("i").cast("bigint").alias("i"),
                    F.col("j").cast("bigint").alias("j"),
                    F.round((F.col("s") - F.col("s_i") * F.col("s_j")
                             / F.col("n")) / F.col("n"), 6)
                    .alias("cov")))


def ann_recall_eval(emb: DataFrame, k: int = TOP_K,
                    n_queries: int = N_QUERIES) -> DataFrame:
    """Recall@k of the LSH ANN path measured against the exact
    brute-force baseline, per query — the accept/reject harness for
    any approximate index config (bands, bucket bits, probe counts):
    recall = |approx top-k ∩ exact top-k| / k. Also reports how many
    candidates the bucket restriction yielded (n_approx < k means the
    bucket was starved — grow buckets before blaming the metric).

    Scale shape: both legs are the already-scale-audited operators
    (bounded query set, broadcast query matrix / bucket equi-join);
    the eval adds one equi-join on (q_id, neighbor_id) and two
    dimension-sized aggregates — negligible next to either leg."""
    exact = brute_force_topk(emb, k, default_queries(emb, n_queries))
    approx = lsh_topk(emb, k, n_queries)
    hits = (exact.select("q_id", "neighbor_id")
            .join(approx.select("q_id", "neighbor_id",
                                F.lit(1).alias("hit")),
                  ["q_id", "neighbor_id"], "left"))
    per = hits.groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"))
    nap = approx.groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("n_approx"))
    return (per.join(nap, "q_id", "left")
            .na.fill({"n_approx": 0})
            .select("q_id", "n_exact", "n_approx", "n_hit",
                    F.round(F.col("n_hit") / F.col("n_exact"), 6)
                    .alias("recall")))


# --- margin-scored bitext mining -------------------------------------------

BITEXT_SRC_LANG = "en"
BITEXT_K = 4          # k-NN pool for the margin denominator
BITEXT_MARGIN_T = 1.05


def bitext_margin_mine(emb: DataFrame, docs: DataFrame,
                       src_lang: str = BITEXT_SRC_LANG,
                       k: int = BITEXT_K,
                       margin_t: float = BITEXT_MARGIN_T) -> DataFrame:
    """LASER/CCMatrix-style parallel-corpus mining: score cross-lingual
    candidate pairs by the MARGIN criterion (Artetxe & Schwenk 2019) —
    cosine divided by the mean of both sides' k-NN cosines — instead
    of raw cosine, which cannot separate "close because translated"
    from "close because that source is close to everything" (hubness).
    Emits the best target per source doc with margin >= margin_t.

    Candidates come from the hyperplane-LSH bucket equi-join (the
    embedding_neardup_pairs shape, cross-lingual version): scale-safe
    — no corpus cross join; the k-NN means are computed WITHIN the
    candidate set, the standard approximation every production miner
    (CCMatrix FAISS sharding included) makes. Per-pair work is one
    Arrow dot product; ranking windows partition by doc id."""
    v = (emb.join(docs.select(F.col("doc_id").alias("vec_id"), "lang"),
                  "vec_id")
         .select("vec_id", "lang", "embedding",
                 _norm2_udf("embedding").alias("n2"),
                 lsh_bucket_col("embedding").alias("bucket"))
         .localCheckpoint(eager=True))
    s = (v.filter(F.col("lang") == src_lang)
         .select(F.col("vec_id").alias("src_id"),
                 F.col("embedding").alias("emb_s"),
                 F.col("n2").alias("n2_s"), "bucket"))
    t = (v.filter(F.col("lang") != src_lang)
         .select(F.col("vec_id").alias("tgt_id"),
                 F.col("lang").alias("tgt_lang"),
                 F.col("embedding").alias("emb_t"),
                 F.col("n2").alias("n2_t"), "bucket"))
    p = (s.join(t, "bucket")
         .withColumn("cosine", _dot_udf("emb_s", "emb_t")
                     / F.sqrt(F.col("n2_s") * F.col("n2_t")))
         .select("src_id", "tgt_id", "tgt_lang", "cosine")
         .localCheckpoint(eager=True))
    ws = Window.partitionBy("src_id").orderBy(F.desc("cosine"),
                                              F.asc("tgt_id"))
    wt = Window.partitionBy("tgt_id").orderBy(F.desc("cosine"),
                                              F.asc("src_id"))
    ks = (p.withColumn("r", F.row_number().over(ws))
          .filter(F.col("r") <= k)
          .groupBy("src_id").agg(F.avg("cosine").alias("knn_s")))
    kt = (p.withColumn("r", F.row_number().over(wt))
          .filter(F.col("r") <= k)
          .groupBy("tgt_id").agg(F.avg("cosine").alias("knn_t")))
    m = (p.join(ks, "src_id").join(kt, "tgt_id")
         .withColumn("margin", F.col("cosine")
                     / ((F.col("knn_s") + F.col("knn_t")) / 2)))
    wb = Window.partitionBy("src_id").orderBy(F.desc("margin"),
                                              F.asc("tgt_id"))
    return (m.withColumn("rb", F.row_number().over(wb))
            .filter((F.col("rb") == 1) & (F.col("margin") >= margin_t))
            .select("src_id", "tgt_id", "tgt_lang",
                    F.round("cosine", 6).alias("cosine"),
                    F.round("margin", 6).alias("margin")))


# --- cosine range (radius) search ------------------------------------------

RANGE_TAU = 0.25


def brute_force_range(emb: DataFrame, tau: float = RANGE_TAU,
                      queries: DataFrame | None = None) -> DataFrame:
    """Exact cosine RANGE search: every corpus vector with
    cosine(query, v) >= tau, per bounded query — the radius-query
    sibling of brute_force_topk (recall-complete near-neighbor
    retrieval where top-k's fixed k under- or over-shoots; the dedup
    and contrastive-mining callers want *all* neighbors above a
    similarity bar, not the k nearest).

    Same scale shape as the top-k path: broadcast BOUNDED query
    matrix, one corpus pass through the Arrow Gram kernel with the
    64-step left-associated accumulation the SQL oracle mirrors
    bit-for-bit (so the >= tau cut selects identical pairs on both
    engines), threshold filter INSIDE the kernel — only qualifying
    pairs ever leave a batch."""
    spark = emb.sparkSession
    if queries is None:
        queries = default_queries(emb)
    qpdf = queries.select("vec_id", "embedding").toPandas()
    if len(qpdf) == 0:
        return spark.createDataFrame(
            [], "q_id bigint, neighbor_id bigint, score double")
    Q = _stack(qpdf["embedding"])
    qids = qpdf["vec_id"].to_numpy()
    qn2 = _np_norm2(Q)
    bq = _query_broadcast(spark, qids, Q, qn2)

    def gram_range(batches):
        qids, Q, qn2 = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack(pdf["embedding"])
            vids = pdf["vec_id"].to_numpy()
            acc = A[:, 0:1] * Q[None, :, 0]
            for i in range(1, DIM):
                acc = acc + A[:, i:i + 1] * Q[None, :, i]
            vn2 = _np_norm2(A)
            cos = acc / np.sqrt(qn2[None, :] * vn2[:, None])
            cos[vids[:, None] == qids[None, :]] = -np.inf  # drop self
            rows, qcol = np.nonzero(cos >= tau)
            yield pd.DataFrame({
                "q_id": qids[qcol],
                "neighbor_id": vids[rows],
                "dot": acc[rows, qcol],
                "qn2": qn2[qcol],
                "vn2": vn2[rows],
            })

    pairs = emb.select("vec_id", "embedding") \
        .mapInPandas(gram_range, _PAIR_SCHEMA)
    cosc = F.col("dot") / F.sqrt(F.col("qn2") * F.col("vn2"))
    return pairs.select("q_id", "neighbor_id",
                        F.round(cosc, 6).alias("score"))
