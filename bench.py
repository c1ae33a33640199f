#!/usr/bin/env python
"""Benchmark harness — headline KG-construction queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

The headline metric matches BASELINE.json: triples/sec end-to-end (NER ->
linking -> relation extraction -> 7-tuple dedup), measured by timing the
full pipeline at the bench scale factor and dividing emitted triples by
wall time.

`--scaling` mode runs the same end-to-end job at local[N] and local[4N]
(default N=2 -> 8; see BASELINE.md "Measured" for why not 8 -> 32 on
this host) on an identical compute-bound replicated input and reports
throughput at both plus efficiency = (T_4N / T_N) / 4 — the sandbox
proxy for the north rule's two-cluster-size criterion (no real cluster
here). The result is cached and attached to subsequent default runs
under the "scaling" key; prose methodology lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from cspirit_ontology_information_extraction_opus4plan_spark import api  # noqa: E402
from cspirit_ontology_information_extraction_opus4plan_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# durable, git-committed run ledger: .bench_scaled/ is gitignored and was
# wiped between sessions once, losing a 48-run history (summary preserved
# in BASELINE.md) — the ledger now lives at the repo root so each run is
# committed alongside the code it measured
SCALING_CACHE = os.path.join(REPO, "scaling_ledger.json")
_OLD_SCALING_CACHE = os.path.join(REPO, ".bench_scaled", "last_scaling.json")

# headline queries: the end-to-end pipeline plus its dominant stages
HEADLINE = [
    "triples_dedup",      # full pipeline incl. 7-tuple dedup (the metric query)
    "triples",            # pipeline without final dedup
    "entity_linking",     # NER + broadcast link + argmax window
    "ner_mentions",       # Arrow NER stage alone
    "predicate_counts",   # pipeline + final aggregate
    "canonical_entities", # connected-components canonicalization (if present)
    "doc_minhash_lsh",    # near-dup detection over documents (if present)
    "ann_topk",           # embedding brute-force cosine top-k (if present)
    "ann_ivf_topk",       # IVF probed-list ANN (if present)
    "doc_ngram_jaccard",  # exact inverted-index jaccard dedup (if present)
    "format_route",       # registry-dispatch multi-format parse (if present)
    "doc_curation_funnel",  # lang/quality/dup/contamination verdict (if present)
    "doc_repetition",     # Gopher repetition rules (if present)
    "entity_cooccurrence",  # doc-level PMI edges (if present)
    "kg_pagerank",        # fixed-iteration entity salience (if present)
    "kg_hits",            # hubs/authorities, one job per iteration (if present)
    "kg_random_walks",    # hash-seeded walk corpus for embeddings (if present)
    "doc_minhash_delta",  # semi-naive near-dup maintenance (if present)
    "kg_triangles",       # triangle/clustering stats (if present)
    "url_curation",       # crawl URL canonicalize+blocklist+dedup (if present)
    "ann_ivfpq_topk",     # IVF-PQ code-scan ADC ANN (if present)
    "doc_ngram_containment",  # asymmetric quote/aggregator dedup (if present)
    "doc_heavy_hitters",  # Space-Saving candidates + exact verify (if present)
    "doc_semdedup",       # k-means-confined semantic dedup (if present)
    "media_phash_neardup",  # perceptual-hash banded media near-dup (if present)
    "entity_disambiguation",  # coherence homonym resolution (if present)
    "doc_dup_spans",      # ExactSubstr span excision stats (if present)
    "doc_winnowing",      # MOSS winnowing fingerprint pairs (if present)
    "kg_ffl_motifs",      # labeled feed-forward-loop census (if present)
    "doc_rrf_search",     # BM25+dense reciprocal-rank fusion (if present)
    "sales_star_rollup",  # TPC-H Q5-family broadcast-dim star join (if present)
    "doc_cdc_chunks",     # content-defined chunk dedup (if present)
    "customer_scd2_incremental",  # IVM dimension maintenance (if present)
    "embedding_covariance",  # mapInPandas second-moment reduction (if present)
    "event_attribution",  # user-keyed stream-stream-shaped join (if present)
    "tpch_q1_pricing",    # TPC-H Q1 wide decimal aggregate (if present)
    "event_sequence_match",  # CEP journey-regex matching (if present)
    "er_em_weights",      # Splink-style EM over pattern counts (if present)
    "kg_property_path",   # SPARQL alternation closure BFS (if present)
    "turtle_full_parse",  # full-grammar Turtle parse round-trip (r4)
    "rdfxml_full_parse",  # general RDF/XML grammar parse (r4)
    "media_features",     # real PNG decode -> pixel stats (r4)
    "parse_recovery_reparse",  # REPLACE-lane corrected reparse (r4)
    "owl_validate",       # per-doc validate_owl report (r4)
    "kg_entailment",      # RDFS-style closure to fixpoint (r5)
    "kg_entailment_delta",  # semi-naive entailment maintenance (r5)
    "canonical_entities_delta",  # incremental CC canonicalization (r5)
    "kg_node2vec_walks",  # biased 2nd-order walk corpus (r5)
    "kg_closeness_centrality",  # multi-source BFS closeness (r5)
    "kg_diameter",        # double-sweep BFS eccentricity bound (r5)
    "doc_minhash_delta_store",  # bucketed-store delta near-dup (r5)
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_once(spark, sf_dir: str) -> tuple[dict, int]:
    qs = api.queries()
    times: dict[str, float] = {}
    n_triples = 0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        if name == "triples_dedup":
            n_triples = n
    return times, n_triples


def bench_at(master: str, sf_dir: str, shuffle_partitions: int) -> dict:
    spark = get_spark("kg_bench", master=master,
                      shuffle_partitions=shuffle_partitions)
    try:
        # warm the JVM + Arrow workers + codegen/JIT once at sf0.01 —
        # sf0.001 leaves the heavy expression classes (MinHash md5 x
        # translate, ANN kernels) below JIT thresholds and their first
        # sf0.1 run then pays several seconds of compilation. The
        # warm-up dir is derived from SF_DIR's parent (sibling sf0.01)
        # so the bench runs on hosts without /root/testdata.
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")),
                                "sf0.01")
        run_once(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir)
        t0 = time.time()
        times, n_triples = run_once(spark, sf_dir)
        total = time.time() - t0
        return {"times": times, "n_triples": n_triples,
                "wall_s": round(total, 3),
                "triples_per_sec": round(n_triples / max(times.get(
                    "triples_dedup", total), 1e-9), 1)}
    finally:
        spark.stop()


def make_scaled_input(sf_dir: str, mult: int,
                      text_mult: int = 1) -> str:
    """Replicate the documents table mult x with offset doc_ids (each
    replica gets distinct deterministic span content via the id-mod
    arithmetic) and optionally inflate each text text_mult x, so the
    scaling run is compute-bound, not overhead-bound — a 4-second job
    cannot evidence core scaling, and doc-count replication alone tops
    out at the DOC:%06d id space while per-core work stays too small
    against ~4 s of fixed stage-scheduling overhead. Cached on disk
    keyed by (sf, mult, text_mult)."""
    from pyspark.sql import functions as F
    tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(REPO, ".bench_scaled",
                           f"{tag}_x{mult}_t{text_mult}")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    spark = get_spark("kg_bench_scale", master="local[8]",
                      shuffle_partitions=8)
    try:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cols = d.columns
        # offset = next power of 10 above max id, so replica ids stay
        # disjoint AND total width stays within the corpus' 6-digit
        # DOC:%06d id space (Spark lpad TRUNCATES overlong strings —
        # a 10M offset silently collides every replica onto the same
        # 6-char prefix and the linking join explodes quadratically)
        max_id = d.agg(F.max("doc_id")).collect()[0][0]
        offset = 10 ** len(str(max_id))
        if mult * offset > 1_000_000:
            raise ValueError(
                f"mult={mult} x offset={offset} exceeds the DOC:%06d id "
                f"space; lower SPARK_GRAFT_MULT or use a smaller sf")
        reps = d.crossJoin(
            spark.range(mult).withColumnRenamed("id", "rep"))
        scaled = reps.select(
            (F.col("doc_id") + F.col("rep") * F.lit(offset))
            .alias("doc_id"),
            *[c for c in cols if c != "doc_id"])
        if text_mult > 1:
            scaled = (scaled
                      .withColumn("text", F.array_join(
                          F.array_repeat(F.col("text"), text_mult), " "))
                      .withColumn("n_chars", F.length("text")
                                  .cast(dict(d.dtypes)["n_chars"])))
        (scaled.repartition(64, "doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, "documents.parquet")))
        with open(marker, "w") as fh:
            fh.write("ok")
    finally:
        spark.stop()
    return out_dir


def _burn(dur: float) -> int:
    """Tight pure-Python loop for `dur` seconds; returns iterations."""
    t0 = time.time()
    n = 0
    x = 0
    while time.time() - t0 < dur:
        for i in range(10_000):
            x = (x * 1103515245 + i) & 0x7FFFFFFF
        n += 10_000
    return n


def cpu_probe(n_procs: int, dur: float = 1.5) -> float:
    """Aggregate host CPU delivery at n_procs processes (ops/s summed
    across workers). Run immediately before each timed leg: the sandbox
    hypervisor delivers cores burstily, and an efficiency ratio taken in
    a throttled window understates the ENGINE. Recording the probe with
    every run turns 'the host was slow' from an assertion into data —
    probe_ratio ~= 1 means the host really delivered 4x compute from
    2->8 procs in that window; a low probe_ratio caps ANY program's
    achievable scaling in the same window."""
    from multiprocessing import Pool
    with Pool(n_procs) as pool:
        counts = pool.map(_burn, [dur] * n_procs)
    return round(sum(counts) / dur, 0)


def pipeline_at(master: str, sf_dir: str, shuffle_partitions: int) -> dict:
    """Steady-state time of the end-to-end KG pipeline (the north-rule
    metric query) at the given parallelism. Warm-up runs the SAME input
    once untimed: a tiny-sf warm-up leaves most of the Python worker
    pool cold (too few tasks), and the ~10 s pandas-import storm of 32
    cold workers then lands inside the measured window — at real scale
    worker startup is O(1) against O(data) work, so steady-state is the
    honest number. Best of 2 timed runs."""
    spark = get_spark("kg_bench", master=master,
                      shuffle_partitions=shuffle_partitions)
    try:
        q = api.queries()["triples_dedup"]
        n = q(spark, sf_dir).count()  # warm JVM, Arrow + full worker pool
        # replica corpora saturate the (s,p,o) space, so the post-dedup
        # count under-states work done; throughput uses emitted triples
        n_emitted = api.queries()["triples"](spark, sf_dir).count()
        wall = min(_timed(q, spark, sf_dir) for _ in range(2))
        return {"n_triples": n, "n_emitted": n_emitted,
                "wall_s": round(wall, 3),
                "triples_per_sec": round(n_emitted / max(wall, 1e-9), 1)}
    finally:
        spark.stop()


def _timed(q, spark, sf_dir: str) -> float:
    t0 = time.time()
    q(spark, sf_dir).count()
    return time.time() - t0


def main() -> None:
    if "--scaling" in sys.argv:
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        mult = int(os.environ.get("SPARK_GRAFT_MULT", "32"))
        text_mult = int(os.environ.get("SPARK_GRAFT_TEXT_MULT", "8"))
        n_hi = 4 * n_lo
        scaled_dir = make_scaled_input(SF_DIR, mult, text_mult)
        probe_lo = cpu_probe(n_lo)
        lo = pipeline_at(f"local[{n_lo}]", scaled_dir, 2 * n_lo)
        probe_hi = cpu_probe(n_hi)
        hi = pipeline_at(f"local[{n_hi}]", scaled_dir, 2 * n_hi)
        eff = (hi["triples_per_sec"] / max(lo["triples_per_sec"], 1e-9)) / (
            n_hi / n_lo)
        # host CPU delivery in the same windows as the two legs:
        # 1.0 = the host really delivered n_hi/n_lo x compute
        probe_ratio = round((probe_hi / max(probe_lo, 1e-9))
                            / (n_hi / n_lo), 3)
        out = {
            "metric": "scaling_efficiency", "value": round(eff, 3),
            "unit": "ratio", "sf": _sf_from_dir(SF_DIR), "mult": mult, "text_mult": text_mult,
            "n_cores": [n_lo, n_hi],
            "n_triples": hi["n_triples"],
            "n_emitted": hi["n_emitted"],
            "triples_per_sec": [lo["triples_per_sec"], hi["triples_per_sec"]],
            "wall_s": [lo["wall_s"], hi["wall_s"]],
            "cpu_probe_ops": [probe_lo, probe_hi],
            "cpu_probe_ratio": probe_ratio,
        }
        print(json.dumps(out))
        history = []
        seed = (SCALING_CACHE if os.path.exists(SCALING_CACHE)
                else _OLD_SCALING_CACHE)
        if os.path.exists(seed):
            try:
                with open(seed) as fh:
                    prev = json.load(fh)
                history = prev.get("runs", [prev] if "value" in prev else [])
            except (OSError, ValueError):
                pass
        history.append(out)
        vals = sorted(r["value"] for r in history)
        n = len(vals)
        median = (vals[n // 2] if n % 2
                  else round((vals[n // 2 - 1] + vals[n // 2]) / 2, 3))
        summary = {
            "metric": "scaling_efficiency",
            "runs": history,
            "n_runs": n,
            "median_value": median,
            "best_value": vals[-1],
        }
        with open(SCALING_CACHE, "w") as fh:
            json.dump(summary, fh)
        return

    res = bench_at(f"local[{CPUS}]", SF_DIR, CPUS)
    out = {
        "metric": "triples_per_sec",
        "value": res["triples_per_sec"],
        "unit": "sec",
        "queries": res["times"],
        "sf": _sf_from_dir(SF_DIR),
        "n_triples": res["n_triples"],
        "wall_s": res["wall_s"],
    }
    # attach a compact scaling SUMMARY so the per-round BENCH record
    # carries the north-rule N-vs-4N evidence (BASELINE.md "Measured")
    # without overflowing the driver's single-line capture window —
    # the full run history lives in the committed scaling_ledger.json
    if os.path.exists(SCALING_CACHE):
        try:
            with open(SCALING_CACHE) as fh:
                sc = json.load(fh)
            runs = sc.get("runs", [])
            out["scaling"] = {
                "metric": "scaling_efficiency",
                "n_runs": sc.get("n_runs", len(runs)),
                "median_value": sc.get("median_value"),
                "best_value": sc.get("best_value"),
                "last_runs": [
                    {k: r.get(k) for k in
                     ("value", "n_cores", "triples_per_sec",
                      "cpu_probe_ratio")}
                    for r in runs[-3:]
                ],
            }
        except (OSError, ValueError):
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
