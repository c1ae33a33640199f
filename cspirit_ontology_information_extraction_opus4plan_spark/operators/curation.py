"""End-to-end corpus-curation compositions: near-duplicate RESOLUTION
(pair detection alone is not a dedup — someone must pick the survivors)
and the multi-stage curation funnel a training-data pipeline runs before
text reaches a model.

No single reference counterpart; these compose the engine's own
primitives (minhash LSH textops.py, connected components
canonicalize.py, quality/lang scoring textops.py, decontamination
pii.py) the way the reference composes its per-document utilities into
`process_document` pipelines (aim2_project pipeline drivers). First-class
members of the LLM-data-pipeline operator family (SURVEY §2 ledger).

Scale shapes:
* neardup_resolve — the CC loop runs ONLY over docs that appear in at
  least one near-dup pair (at web scale the dup fraction is a few
  percent; labels stay proportional to paired docs, never the corpus).
  Singletons re-enter via one left join + coalesce. Keeper election is
  an argmax groupBy (map-side combinable struct max), not a window over
  the corpus.
* curation_funnel — lang/quality verdicts are pure per-row codegen'd
  expressions in ONE scan; exact-dup lineage is a md5 groupBy + hash
  join (the only full shuffles); contamination is the broadcast shingle
  semi-join from pii.contaminated_docs. No window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .canonicalize import connected_components
from .pii import contaminated_docs
from .textops import (
    lang_pred_col,
    minhash_lsh_pairs,
    quality_score_col,
    quality_scores,
)

# minimum combined quality score a doc must reach to survive curation
QUALITY_MIN = 0.5


def neardup_resolve(docs: DataFrame) -> DataFrame:
    """Full near-dup resolution: MinHash-LSH pairs -> connected
    components over the pair graph -> keep the best doc per cluster
    (max quality score, tie -> min doc_id).

    Returns one row per input doc: (doc_id, cluster_id, cluster_size,
    quality_score, keep). Singleton docs are their own cluster and are
    always kept. `keep` is int 0/1 (the oracle gate hashes ints
    portably across engines; booleans are not guaranteed to)."""
    pairs = minhash_lsh_pairs(docs).localCheckpoint(eager=True)
    # CC state is bounded by the paired docs, not the corpus: nodes are
    # only the endpoints of near-dup edges
    nodes = (pairs.select(F.col("a").alias("id"))
             .unionByName(pairs.select(F.col("b").alias("id")))
             .distinct())
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(nodes, edges)  # (id, canonical_id)

    lab = (quality_scores(docs).select("doc_id", "quality_score")
           .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
           .select("doc_id",
                   F.coalesce("canonical_id", "doc_id").alias("cluster_id"),
                   "quality_score"))
    # keeper per cluster: argmax(quality, then min doc_id) via struct
    # max — map-side combinable, no window. Null quality (empty doc)
    # sorts below every real score.
    best = lab.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size"),
        F.max(F.struct(
            F.coalesce("quality_score", F.lit(-1.0)).alias("q"),
            (-F.col("doc_id")).alias("nid"))).alias("_b"))
    return (lab.join(best, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size", "quality_score",
                    (F.col("doc_id") == -F.col("_b.nid"))
                    .cast("int").alias("keep")))


def curation_funnel(corpus: DataFrame, benchmark: DataFrame,
                    quality_min: float = QUALITY_MIN) -> DataFrame:
    """Per-document curation verdict: language gate, quality gate,
    exact-dup lineage (md5 group, min-doc_id keeper), benchmark
    contamination (shared word 8-grams), and the combined `kept` flag.

    Returns (doc_id, lang_ok, quality_ok, dup_loser, contaminated,
    kept) with int 0/1 flags — the survival audit trail a curation job
    materializes next to the corpus."""
    flags = corpus.select(
        "doc_id",
        F.md5("text").alias("_h"),
        (lang_pred_col() == "en").alias("_lang"),
        F.coalesce(quality_score_col() >= F.lit(quality_min),
                   F.lit(False)).alias("_qual"))
    keepers = flags.groupBy("_h").agg(F.min("doc_id").alias("_keep"))
    hits = contaminated_docs(corpus, benchmark).select("doc_id", "n_hits")
    kept = (F.col("_lang") & F.col("_qual")
            & (F.col("doc_id") == F.col("_keep"))
            & F.col("n_hits").isNull())
    return (flags.join(keepers, "_h")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.col("_lang").cast("int").alias("lang_ok"),
                    F.col("_qual").cast("int").alias("quality_ok"),
                    (F.col("doc_id") != F.col("_keep"))
                    .cast("int").alias("dup_loser"),
                    F.col("n_hits").isNotNull().cast("int")
                    .alias("contaminated"),
                    kept.cast("int").alias("kept")))


def curation_stage_stats(funnel: DataFrame) -> DataFrame:
    """One-row survival summary over a curation_funnel frame — the
    counts a pipeline dashboard plots per snapshot."""
    return funnel.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("lang_ok").cast("bigint").alias("n_lang_ok"),
        F.sum("quality_ok").cast("bigint").alias("n_quality_ok"),
        F.sum("dup_loser").cast("bigint").alias("n_dup_losers"),
        F.sum("contaminated").cast("bigint").alias("n_contaminated"),
        F.sum("kept").cast("bigint").alias("n_kept"))


SPLIT_TRAIN_MAX_HEX = "c"  # md5(cluster) first hex < 'c' -> train (12/16)
SPLIT_VAL_MAX_HEX = "e"    # 'c'/'d' -> val (2/16); 'e'/'f' -> test


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Cluster-aware train/val/test assignment: a doc's split comes
    from md5 of its near-dup CLUSTER id, never its own id, so no
    near-duplicate pair can straddle train and eval — the leakage mode
    a plain hash-split-by-doc_id cannot rule out (a paraphrased copy
    of a training doc landing in the eval split silently inflates eval
    scores; the same failure decontamination guards against for
    external benchmarks, applied to the corpus's own held-out split).

    Composes neardup_resolve's cluster labels (CC state bounded by
    paired docs, never the corpus); the assignment itself is one
    per-row codegen'd hash on top — no further shuffle. Deterministic:
    the same corpus always produces the same split, and singleton docs
    hash on their own id (cluster_id = doc_id)."""
    r = neardup_resolve(docs)
    h = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1)
    split = (F.when(h < SPLIT_TRAIN_MAX_HEX, "train")
             .when(h < SPLIT_VAL_MAX_HEX, "val")
             .otherwise("test"))
    return r.select("doc_id", "cluster_id", "cluster_size",
                    split.alias("split"))


CONTRASTIVE_BUCKETS = 16


def contrastive_pairs(docs: DataFrame,
                      n_buckets: int = CONTRASTIVE_BUCKETS) -> DataFrame:
    """Contrastive training triplets (anchor, positive, negative) for
    embedding-model training: positives are the verified near-dup
    pairs (minhash_lsh_pairs — semantically equivalent documents),
    negatives are drawn deterministically from a hash-bucketed
    candidate dimension so both engines, and successive runs, pick
    the identical negative for every pair.

    Negative election: every doc hashes into one of n_buckets by
    md5; per bucket the 3 hash-smallest docs form the candidate
    dimension (n_buckets x 3 rows, broadcast). A pair targets bucket
    md5(a:b) % n_buckets and takes the first candidate that is
    neither a nor b — collision-proof because 3 > 2. Scale shape:
    the dimension build is the only per-corpus pass (top-3 per
    bucket; at 100 TB use a hash-threshold preprune as in
    kg_neighbor_sample so the rank sees ~fraction of the corpus);
    the triplet join is a broadcast of n_buckets rows."""
    from pyspark.sql import Window
    pairs = minhash_lsh_pairs(docs)
    hx = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.conv(F.substring(hx, 1, 8), 16, 10)
              .cast("bigint") % n_buckets)
    w = Window.partitionBy("bucket").orderBy("hx", "doc_id")
    cand = (docs.select(F.col("doc_id"), bucket.alias("bucket"),
                        hx.alias("hx"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .groupBy("bucket")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "doc_id"))),
                lambda x: x["doc_id"]).alias("cands")))
    tb = (F.conv(F.substring(
        F.md5(F.concat(F.col("a").cast("string"), F.lit(":"),
                       F.col("b").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % n_buckets)
    out = (pairs.withColumn("bucket", tb)
           .join(F.broadcast(cand), "bucket")
           .withColumn("negative",
                       F.filter("cands",
                                lambda x: (x != F.col("a"))
                                & (x != F.col("b")))[0]))
    return (out.filter(F.col("negative").isNotNull())
            .select(F.col("a").alias("anchor"),
                    F.col("b").alias("positive"),
                    "negative", "jaccard"))
