"""Semantic guarantees of the second round-3-continuation operator
tranche — properties the oracle hash-compare can't articulate:

  * MaxSim dominates single-vector cosine for the same query (sum of
    per-sub maxima >= the full-vector alignment only when normalized
    per-sub — instead we pin the exact numpy rederivation),
  * the dedup-recall eval re-derives from the planted closed form and
    the detector's own pair list,
  * license priority: cc-by-sa docs are never labeled cc-by,
  * Z-order keys de-interleave back to their exact buckets,
  * gap audit reports exactly the planted missing days,
  * VAD segments tile voiced frames exactly (no overlap, no gaps
    inside a segment, boundaries unvoiced),
  * prefix-cache savings re-derive from group sizes,
  * JSONL quarantine flags exactly the planted truncations,
  * mixture weights are a proper distribution biased toward
    harder-than-average sources,
  * the star rollup's decimal revenue matches an exact
    Fraction-arithmetic recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api


def test_maxsim_rederives_numpy(spark, sf_dir):
    import numpy as np
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.similarity import (
        MAXSIM_QUERY_VEC, MAXSIM_SUB, MAXSIM_SUBDIM, load_embeddings,
    )
    rows = api.q_ann_maxsim_topk(spark, sf_dir).collect()
    assert rows
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load_embeddings(spark, sf_dir).collect()}
    q = emb[MAXSIM_QUERY_VEC].reshape(MAXSIM_SUB, MAXSIM_SUBDIM)
    for r in rows:
        d = emb[r["vec_id"]].reshape(MAXSIM_SUB, MAXSIM_SUBDIM)
        sims = (q @ d.T) / (
            np.linalg.norm(q, axis=1)[:, None]
            * np.linalg.norm(d, axis=1)[None, :])
        assert abs(r["score"] - sims.max(axis=1).sum()) < 1e-5, r


def test_dedup_eval_rederives(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
        minhash_lsh_pairs,
    )
    row = api.q_doc_dedup_eval(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    truth = {(i, i + 1000000) for i in ids if i % 17 == 0} | {
        (i, i + 2000000) for i in ids if i % 10 == 5}
    pred = {(r["a"], r["b"]) for r in
            minhash_lsh_pairs(DE.augmented_docs(spark, sf_dir))
            .collect()}
    assert row["n_planted"] == len(truth)
    assert row["n_pred"] == len(pred)
    assert row["n_overlap"] == len(truth & pred)
    assert row["planted_recall"] == round(
        len(truth & pred) / len(truth), 6)


def test_license_priority_never_shadowed(spark, sf_dir):
    rows = {r["doc_id"]: r
            for r in api.q_doc_license_detect(spark, sf_dir).collect()}
    assert rows
    for d, r in rows.items():
        want = {0: "cc-by-sa", 1: "cc-by", 2: "mit",
                3: "apache-2.0"}.get(d % 9, "none")
        assert r["license"] == want, (d, r)
        assert r["copyleft"] == (want == "cc-by-sa")


def test_zorder_deinterleaves(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.olap import (
        ZORDER_BITS,
    )
    rows = api.q_event_zorder(spark, sf_dir).collect()
    assert rows
    for r in rows[:500]:
        u = v = 0
        for b in range(ZORDER_BITS):
            u |= ((r["zkey"] >> (2 * b)) & 1) << b
            v |= ((r["zkey"] >> (2 * b + 1)) & 1) << b
        assert (u, v) == (r["u_bucket"], r["v_bucket"]), r


def test_gap_audit_reports_planted_days(spark, sf_dir):
    rows = api.q_event_gap_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        day = int(r["missing_day"].split("-")[2])
        assert day % 11 == 5, r


def test_vad_segments_tile_voiced_frames(spark, sf_dir):
    import hashlib
    rows = api.q_media_vad_segments(spark, sf_dir).collect()
    assert rows
    by_clip = {}
    for r in rows:
        by_clip.setdefault((r["doc_id"], r["pos"], r["media_ref"]),
                           []).append(r)
    for (doc, pos, ref), rs in list(by_clip.items())[:50]:
        b = hashlib.md5(ref.encode()).digest()
        n = 20 + b[0] % 30
        voiced = [b[(i + 1) % 16] >= 128 for i in range(n)]
        covered = [False] * n
        rs.sort(key=lambda r: r["start_frame"])
        for idx, r in enumerate(rs, 1):
            assert r["seg_idx"] == idx
            assert r["n_frames"] == n
            for i in range(r["start_frame"], r["end_frame"]):
                assert voiced[i] and not covered[i], (ref, i)
                covered[i] = True
            # maximality: the frames flanking a segment are unvoiced
            if r["start_frame"] > 0:
                assert not voiced[r["start_frame"] - 1]
            if r["end_frame"] < n:
                assert not voiced[r["end_frame"]]
        assert covered == voiced, ref


def test_prefix_cache_rederives(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
        PREFIX_KS,
    )
    rows = {r["k"]: r for r in
            api.q_doc_prefix_cache(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(PREFIX_KS)
    docs = DE.augmented_docs(spark, sf_dir).collect()
    for k, r in rows.items():
        groups = {}
        for d in docs:
            toks = [t for t in d["text"].lower().strip().split() if t]
            if len(toks) >= k:
                groups.setdefault(tuple(toks[:k]), []).append(d["doc_id"])
        sizes = [len(v) for v in groups.values()]
        assert r["n_docs"] == sum(sizes)
        assert r["n_prefixes"] == len(sizes)
        assert r["n_shared_docs"] == sum(s for s in sizes if s > 1)
        assert r["est_saved_tokens"] == sum(s - 1 for s in sizes) * k
        assert r["n_shared_docs"] > 0  # the plant fires


def test_jsonl_quarantine_exactly_planted(spark, sf_dir):
    rows = api.q_jsonl_parse(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["doc_id"] % 7 == 3:
            assert not r["parse_ok"] and r["id"] is None, r
        else:
            assert r["parse_ok"] and r["id"] == r["doc_id"], r


def test_mixture_weights_distribution(spark, sf_dir):
    rows = api.q_doc_mixture_reweight(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # harder-than-average sources weigh more than easier ones
    hard = max(rows, key=lambda r: r["excess"])
    easy = min(rows, key=lambda r: r["excess"])
    assert hard["weight"] > easy["weight"]
    for r in rows:
        assert r["alloc_docs"] >= 0


def test_star_rollup_exact_decimal(spark, sf_dir):
    from decimal import ROUND_HALF_UP, Decimal
    rows = api.q_sales_star_rollup(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    od = {r["o_orderkey"]: r for r in
          spark.read.parquet(f"{sf_dir}/orders.parquet").collect()}
    cu = {r["c_custkey"]: r["c_nationkey"] for r in
          spark.read.parquet(f"{sf_dir}/customer.parquet").collect()}
    na = {r["n_nationkey"]: r["n_regionkey"] for r in
          spark.read.parquet(f"{sf_dir}/nation.parquet").collect()}
    re = {r["r_regionkey"]: r["r_name"] for r in
          spark.read.parquet(f"{sf_dir}/region.parquet").collect()}
    q4 = Decimal("0.0001")
    agg = {}
    for l in li:
        o = od[l["l_orderkey"]]
        key = (re[na[cu[o["o_custkey"]]]], o["o_orderdate"].year)
        rev = (Decimal(l["l_extendedprice"]).quantize(
                   q4, rounding=ROUND_HALF_UP)
               * (1 - Decimal(l["l_discount"]).quantize(
                   q4, rounding=ROUND_HALF_UP)))
        n, s = agg.get(key, (0, Decimal(0)))
        agg[key] = (n + 1, s + rev)
    for r in rows:
        n, s = agg[(r["r_name"], r["o_year"])]
        assert r["n_items"] == n
        assert r["revenue"] == float(
            s.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)), r
