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
(default N=8 -> 32) on identical input and reports throughput at both plus
efficiency = (T_4N / T_N) / 4 — the sandbox proxy for the north rule's
two-cluster-size criterion (no real cluster here). Results land in
BENCH/BASELINE.md via tools/update_bench_md.py or --write-md.
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
        # warm the JVM + Arrow workers once at tiny scale so we measure the
        # job, not process startup
        run_once(spark, "/root/testdata/sf0.001")
        t0 = time.time()
        times, n_triples = run_once(spark, sf_dir)
        total = time.time() - t0
        return {"times": times, "n_triples": n_triples,
                "wall_s": round(total, 3),
                "triples_per_sec": round(n_triples / max(times.get(
                    "triples_dedup", total), 1e-9), 1)}
    finally:
        spark.stop()


def main() -> None:
    if "--scaling" in sys.argv:
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
        n_hi = 4 * n_lo
        lo = bench_at(f"local[{n_lo}]", SF_DIR, n_lo)
        hi = bench_at(f"local[{n_hi}]", SF_DIR, n_hi)
        eff = (hi["triples_per_sec"] / max(lo["triples_per_sec"], 1e-9)) / (
            n_hi / n_lo)
        out = {
            "metric": "scaling_efficiency", "value": round(eff, 3),
            "unit": "ratio", "sf": _sf_from_dir(SF_DIR),
            "n_cores": [n_lo, n_hi],
            "triples_per_sec": [lo["triples_per_sec"], hi["triples_per_sec"]],
            "queries": {f"local[{n_lo}]": lo["times"],
                        f"local[{n_hi}]": hi["times"]},
        }
        print(json.dumps(out))
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
