"""Semantic guarantees of the round-3 continuation operators —
properties the oracle hash-compare can't articulate:

  * winnowing has PERFECT recall on planted exact copies (identical
    text -> identical fingerprint set -> the pair must surface), and
    n_shared never exceeds either member's fingerprint count,
  * the ordered funnel is monotone (step counts never grow down the
    funnel) and its conversion ratios re-derive exactly from the
    counts,
  * the FFL census equals a brute-force Python count over the same
    deduped edge set (exact, not statistical),
  * c-TF-IDF emits a dense 1..top_n rank per class with scores
    non-increasing in rank,
  * RRF scores re-derive exactly from the integer leg ranks and every
    fused doc cites at least one leg,
  * none of the five puts row-at-a-time Python on the hot path
    (no BatchEvalPython in any plan; the dense RRF leg's single
    mapInPandas is the sanctioned Arrow kernel).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api


def test_winnowing_recall_on_planted_exact_copies(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
        WINNOW_MIN_SHARED, winnowing_pairs,
    )

    docs = DE.augmented_docs(spark, sf_dir)
    pairs = {(r["a"], r["b"]): r["n_shared"]
             for r in winnowing_pairs(docs).collect()}
    exact_srcs = [r["doc_id"] for r in docs
                  .filter((F.col("doc_id") % 17 == 0)
                          & (F.col("doc_id") < 1000000)).collect()]
    assert exact_srcs, "decoration must plant exact copies"
    for src in exact_srcs:
        key = (src, src + 1000000)
        # identical text -> identical fingerprints; the pair must be
        # found unless the doc has fewer than MIN_SHARED kept prints
        if key in pairs:
            assert pairs[key] >= WINNOW_MIN_SHARED
    found = sum((s, s + 1000000) in pairs for s in exact_srcs)
    assert found == len(exact_srcs), (found, len(exact_srcs))


def test_funnel_monotone_and_ratios_rederive(spark, sf_dir):
    rows = {r["step_idx"]: r
            for r in api.q_event_funnel(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3]
    n = {i: rows[i]["n_users"] for i in rows}
    assert n[1] >= n[2] >= n[3]
    assert rows[1]["conv_from_prev"] == 1.0
    assert rows[1]["conv_from_first"] == 1.0
    for i in (2, 3):
        assert rows[i]["conv_from_prev"] == round(n[i] / n[i - 1], 6)
        assert rows[i]["conv_from_first"] == round(n[i] / n[1], 6)


def test_ffl_census_equals_bruteforce(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.api import (
        dedup_triples, triples_df,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.graphops import (
        ffl_motifs,
    )

    t = dedup_triples(triples_df(spark, sf_dir))
    edges = (t.filter((F.col("subject_type") == "uri")
                      & (F.col("object_type") == "uri")
                      & (F.col("subject") != F.col("object")))
             .select("subject", "predicate", "object")
             .distinct().collect())
    out = {(r["p_ab"], r["p_bc"], r["p_ac"]): r["n_motifs"]
           for r in ffl_motifs(t).collect()}
    from collections import Counter, defaultdict
    by_src = defaultdict(list)
    for s, p, o in edges:
        by_src[s].append((p, o))
    want = Counter()
    for a, outs in by_src.items():
        for p_ab, b in outs:
            for p_bc, c in by_src.get(b, ()):
                if c == a:
                    continue
                for p_ac, o2 in outs:
                    if o2 == c:
                        want[(p_ab, p_bc, p_ac)] += 1
    assert out == dict(want)


def test_ctfidf_dense_ranks_scores_monotone(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
        CTFIDF_TOP_N,
    )
    rows = api.q_doc_ctfidf_topics(spark, sf_dir).collect()
    by_cls = {}
    for r in rows:
        by_cls.setdefault(r["source"], []).append(r)
    assert by_cls
    for cls, rs in by_cls.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), cls
        assert len(rs) <= CTFIDF_TOP_N
        ordered = sorted(rs, key=lambda r: r["rank"])
        scores = [r["score"] for r in ordered]
        assert scores == sorted(scores, reverse=True), cls
        assert all(s > 0 for s in scores), cls


def test_rrf_scores_rederive_from_leg_ranks(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.similarity import (
        RRF_K,
    )
    rows = api.q_doc_rrf_search(spark, sf_dir).collect()
    assert rows
    prev = None
    for r in sorted(rows, key=lambda r: r["rank"]):
        assert r["bm25_rank"] > 0 or r["dense_rank"] > 0
        want = round(
            (1.0 / (RRF_K + r["bm25_rank"]) if r["bm25_rank"] else 0.0)
            + (1.0 / (RRF_K + r["dense_rank"]) if r["dense_rank"] else 0.0),
            6)
        assert r["rrf_score"] == want, r
        if prev is not None:
            assert r["rrf_score"] <= prev
        prev = r["rrf_score"]


def test_frontier_plan_politeness_invariants(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.urlops import (
        HOST_RATE, N_CRAWLERS,
    )
    rows = api.q_url_frontier_plan(spark, sf_dir).collect()
    assert rows
    by_host = {}
    for r in rows:
        assert 0 <= r["crawler_id"] < N_CRAWLERS
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        # one rate-limiting owner per host
        assert len({r["crawler_id"] for r in rs}) == 1, host
        # dense 1..n sequence, and never more than host_rate per slot
        assert sorted(r["seq_in_host"] for r in rs) == list(
            range(1, len(rs) + 1)), host
        from collections import Counter
        slots = Counter(r["fetch_slot"] for r in rs)
        assert all(v <= HOST_RATE for v in slots.values()), host


def test_robots_longest_prefix_precedence(spark, sf_dir):
    rows = api.q_url_robots(spark, sf_dir).collect()
    assert rows
    import re
    for r in rows:
        site = int(re.search(r"site(\d+)\.", r["host"]).group(1))
        path = r["canon_url"].split(r["host"], 1)[1]
        if site % 2 == 0 and path.startswith("/page/12"):
            # the more-specific allow overrides the /page/1 deny
            assert (r["verdict"], r["matched_prefix"]) == (
                "allow", "/page/12"), r
        elif site % 2 == 0 and path.startswith("/page/1"):
            assert (r["verdict"], r["matched_prefix"]) == (
                "deny", "/page/1"), r
        else:
            assert (r["verdict"], r["matched_prefix"]) == (
                "allow", "/"), r
    assert any(r["verdict"] == "deny" for r in rows)


def test_daily_anomaly_zscores_rederive(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        ANOM_TRAIL, ANOM_Z,
    )
    rows = api.q_event_anomaly_days(spark, sf_dir).collect()
    assert rows
    series = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        trail = series.setdefault(r["event_type"], [])
        base = trail[-ANOM_TRAIL:]
        if len(base) >= 2:
            s, ss, c = float(sum(base)), float(
                sum(x * x for x in base)), float(len(base))
            var = (ss - s * s / c) / (c - 1)
            sd = var ** 0.5 if var > 0 else None
            z = (r["n"] - s / c) / sd if sd else None
            assert r["base_mean"] == round(s / c, 6), r
            if z is None:
                assert r["z"] is None and not r["is_anomaly"], r
            else:
                assert r["z"] == round(z, 6), r
                assert r["is_anomaly"] == (abs(z) >= ANOM_Z), r
        else:
            assert r["z"] is None and not r["is_anomaly"], r
        trail.append(r["n"])
    assert any(r["is_anomaly"] for r in rows)


def test_novelty_zero_for_planted_exact_copies(spark, sf_dir):
    rows = {r["doc_id"]: r for r in
            api.q_doc_ngram_novelty(spark, sf_dir).collect()}
    copies = [d for d in rows if 1000000 <= d < 2000000]
    assert copies, "decoration must plant exact copies"
    for c in copies:
        # every shingle of an exact copy exists in its source too
        assert rows[c]["novelty"] == 0.0, c
        assert rows[c - 1000000]["novelty"] == 0.0, c
    assert any(r["novelty"] > 0.5 for r in rows.values())


def test_mrl_cos_matches_numpy(spark, sf_dir):
    import numpy as np
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.similarity import (
        MRL_COS_MIN, MRL_DIM, load_embeddings,
    )
    rows = {r["vec_id"]: r for r in
            api.q_embedding_mrl_error(spark, sf_dir).collect()}
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load_embeddings(spark, sf_dir).collect()}
    assert rows.keys() == emb.keys()
    for vid, v in emb.items():
        full = v / np.linalg.norm(v)
        trunc = np.zeros_like(v)
        trunc[:MRL_DIM] = v[:MRL_DIM]
        cos = float(trunc @ full / np.linalg.norm(trunc))
        assert abs(rows[vid]["cos_prefix"] - cos) < 1e-5, vid
        assert rows[vid]["ok"] == (
            rows[vid]["cos_prefix"] >= MRL_COS_MIN
            or abs(rows[vid]["cos_prefix"] - MRL_COS_MIN) < 1e-6), vid


def test_ab_srm_counts_partition_and_chi2_rederives(spark, sf_dir):
    rows = {r["event_type"]: r
            for r in api.q_event_ab_srm(spark, sf_dir).collect()}
    assert "(all)" in rows
    per_types = [k for k in rows if k != "(all)"]
    assert sum(rows[k]["n_a"] for k in per_types) == rows["(all)"]["n_a"]
    assert sum(rows[k]["n_b"] for k in per_types) == rows["(all)"]["n_b"]
    for k, r in rows.items():
        n = r["n_a"] + r["n_b"]
        exp = n / 2.0
        chi2 = ((r["n_a"] - exp) ** 2 + (r["n_b"] - exp) ** 2) / exp
        assert r["chi2"] == round(chi2, 6), k


def test_anchor_profile_indegree_and_rank(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations as DE,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.urlops import (
        ANCHOR_TOP_N,
    )
    rows = api.q_web_anchor_profile(spark, sf_dir).collect()
    assert rows
    edges = DE.link_edges(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")).collect()
    indeg = {}
    for e in edges:
        indeg.setdefault(e["dst"], set()).add(e["src"])
    by_dst = {}
    for r in rows:
        assert 1 <= r["rank"] <= ANCHOR_TOP_N
        assert r["in_degree"] == len(indeg[r["dst"]]), r
        by_dst.setdefault(r["dst"], []).append(r)
    # ranks dense per target, counts non-increasing in rank
    for dst, rs in by_dst.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        ns = [r["n"] for r in rs]
        assert ns == sorted(ns, reverse=True), dst


def test_transitions_mass_conservation(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.content_stats import (
        load_events,
    )
    rows = api.q_event_transitions(spark, sf_dir).collect()
    assert rows
    ev = load_events(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every user with k events contributes exactly k-1 transitions
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        total = sum(r["n"] for r in rs)
        for r in rs:
            assert r["p"] == round(r["n"] / total, 6), r
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, prev


def test_reading_ease_rederives(spark, sf_dir):
    import re
    rows = api.q_doc_reading_ease(spark, sf_dir).collect()
    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()}
    assert len(rows) == len(docs)
    for r in rows[:50]:
        text = docs[r["doc_id"]]
        words = len([t for t in re.split(r"\s+", text.lower().strip())
                     if t])
        sents = max(len(re.findall(r"[.!?]+", text)), 1)
        syll = len(re.findall(r"[aeiouy]+", text.lower()))
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            words, sents, syll), r
        ease = 206.835 - 1.015 * words / sents - 84.6 * syll / words
        assert r["ease"] == round(ease, 6), r


def test_new_ops_keep_python_off_the_hot_path(spark, sf_dir):
    plans = {
        name: api.queries()[name](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
        for name in ("kg_ffl_motifs", "event_funnel",
                     "doc_ctfidf_topics", "doc_winnowing",
                     "doc_rrf_search")
    }
    for extra in ("url_frontier_plan", "sales_star_rollup",
                  "fk_orphan_audit", "jsonl_parse",
                  "doc_mixture_reweight", "event_transitions",
                  "doc_reading_ease", "doc_ngram_novelty",
                  "event_ab_srm", "event_anomaly_days", "url_robots",
                  "web_anchor_profile", "embedding_mrl_error"):
        plans[extra] = (
            api.queries()[extra](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    # the star rollup must broadcast its bounded dims
    assert "BroadcastHashJoin" in plans["sales_star_rollup"]
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # pure-codegen ops: no Arrow crossing at all (the RRF dense leg and
    # nothing else among this session's ops may cross)
    for name in plans:
        if name == "doc_rrf_search":
            continue
        assert "MapInPandas" not in plans[name], name
    # the RRF dense leg is exactly one sanctioned Arrow kernel
    assert plans["doc_rrf_search"].count("MapInPandas") == 1
