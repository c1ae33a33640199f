"""Training-data ops: dedup recall on planted duplicates, ANN sanity,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark.corpus import (
    spans_exploded,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    multimodal,
    similarity,
    textops,
)


@pytest.fixture(scope="module")
def adocs(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations,
    )

    return decorations.augmented_docs(spark, sf_dir).persist()


def test_exact_dedup_finds_all_planted_copies(spark, sf_dir, adocs):
    n_planted = adocs.filter(F.col("doc_id") >= 1000000) \
                     .filter(F.col("doc_id") < 2000000).count()
    groups = textops.exact_dedup_groups(adocs).collect()
    assert len(groups) == n_planted  # source texts are all distinct
    assert all(g["n_docs"] == 2 for g in groups)
    # keeper is always the original (min doc_id)
    assert all(g["keep_doc_id"] < 1000000 for g in groups)


def test_minhash_recalls_planted_near_dups(spark, sf_dir, adocs):
    pairs = {(r["a"], r["b"])
             for r in textops.minhash_lsh_pairs(adocs).collect()}
    exact_ids = [r["doc_id"] for r in
                 adocs.filter((F.col("doc_id") % 17 == 0)
                              & (F.col("doc_id") < 1000000)).collect()]
    # exact copies have jaccard 1.0 and identical signatures -> always found
    for d in exact_ids:
        assert (d, d + 1000000) in pairs
    # near copies (3 appended words) must be mostly recalled
    near_ids = [r["doc_id"] for r in
                adocs.filter((F.col("doc_id") % 10 == 5)
                             & (F.col("doc_id") < 1000000)).collect()]
    hit = sum((d, d + 2000000) in pairs for d in near_ids)
    assert hit / len(near_ids) >= 0.8


def test_simhash_identical_for_exact_copies(spark, sf_dir, adocs):
    clusters = textops.simhash_clusters(adocs).collect()
    n_exact = adocs.filter(F.col("doc_id") >= 1000000) \
                   .filter(F.col("doc_id") < 2000000).count()
    assert len(clusters) >= n_exact


def test_ann_lsh_is_subset_of_brute_force_candidates(spark, sf_dir):
    emb = similarity.load_embeddings(spark, sf_dir)
    bf = similarity.brute_force_topk(emb).collect()
    # rank-1 by brute force has the highest score per query
    by_q = {}
    for r in bf:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)
    # LSH results agree with brute-force scores where both return a pair
    lsh = similarity.lsh_topk(emb).collect()
    bf_scores = {(r["q_id"], r["neighbor_id"]): r["score"] for r in bf}
    for r in lsh:
        k = (r["q_id"], r["neighbor_id"])
        if k in bf_scores:
            assert abs(bf_scores[k] - r["score"]) < 1e-9


def test_simhash64_neardup_recalls_exact_copies(spark, sf_dir, adocs):
    """Every planted exact copy must surface at hamming 0 (identical
    token set -> identical 64-bit signature -> all 4 bands equal)."""
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in textops.simhash_neardup_pairs(adocs).collect()}
    exact_ids = [r["doc_id"] for r in
                 adocs.filter((F.col("doc_id") % 17 == 0)
                              & (F.col("doc_id") < 1000000)).collect()]
    for d in exact_ids:
        assert pairs.get((d, d + 1000000)) == 0
    assert all(h <= textops.HAMMING_MAX for h in pairs.values())


def test_ann_query_side_is_bounded(spark, sf_dir):
    """The round-1 scale-killer regression gate: the query side must be a
    bounded table (fixed count), never a fixed fraction of the corpus —
    growing the corpus must NOT grow the driver-collected query set."""
    emb = similarity.load_embeddings(spark, sf_dir)
    big = emb.unionByName(
        emb.select((F.col("vec_id") + 10_000).alias("vec_id"),
                   "embedding", *[c for c in emb.columns
                                  if c not in ("vec_id", "embedding")]))
    q_small = similarity.default_queries(emb).count()
    q_big = similarity.default_queries(big).count()
    assert q_small == q_big == similarity.N_QUERIES


def test_ann_empty_query_set_returns_empty(spark, sf_dir):
    emb = similarity.load_embeddings(spark, sf_dir)
    none = emb.filter(F.col("vec_id") < 0).select("vec_id", "embedding")
    out = similarity.brute_force_topk(emb, queries=none)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "q_id", "neighbor_id", "score", "rank"]


def test_ann_broadcast_reused_across_calls(spark, sf_dir):
    """Repeated calls with the same query set must not leak one broadcast
    per call (ADVICE round 1)."""
    emb = similarity.load_embeddings(spark, sf_dir)
    similarity.brute_force_topk(emb).count()
    n_before = len(similarity._QUERY_BCAST)
    similarity.brute_force_topk(emb).count()
    assert len(similarity._QUERY_BCAST) == n_before


def test_media_decoder_gate(spark, sf_dir):
    spans = spans_exploded(spark, sf_dir)
    media = multimodal.synthesize_png(multimodal.media_spans(spans))
    with pytest.raises(NotImplementedError):
        multimodal.extract_media_features(media, decoder="pil")
    feats = multimodal.extract_media_features(media).limit(5).collect()
    assert all(16 <= r["width"] <= 32 and r["bit_depth"] == 8
               and r["raw_len"] == r["width"] * r["height"]
               and r["px_min"] <= r["mean_gray"] <= r["px_max"]
               for r in feats)


def test_token_pack_greedy_invariants(spark):
    """Hand-checkable packing: sequential docs in one bucket, budget 10.
    Token counts 4,5,3,6,2 -> offsets 0,4,9,12,18 -> packs 0,0,0,1,1."""
    docs = spark.createDataFrame(
        [(i * textops.PACK_BUCKETS, " ".join(["w"] * n))
         for i, n in enumerate([4, 5, 3, 6, 2])],
        "doc_id bigint, text string")
    got = {r["doc_id"] // textops.PACK_BUCKETS:
           (r["start_offset"], r["pack_id"])
           for r in textops.token_pack_assignments(docs, budget=10)
           .collect()}
    assert got == {0: (0, 0), 1: (4, 0), 2: (9, 0), 3: (12, 1),
                   4: (18, 1)}


def test_token_pack_no_global_sort(spark, sf_dir):
    """The only exchange is the bucket hash partition — packing must
    never sort the whole corpus on one stream."""
    plan = (textops.token_pack_assignments(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text"))
        ._jdf.queryExecution().executedPlan().toString())
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert exchanges == ["hashpartitioning"]
    assert "rangepartitioning" not in plan.lower()


def test_hash_sample_deterministic_and_rate_accurate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")
    s1 = textops.hash_stratified_sample(docs)
    s2 = textops.hash_stratified_sample(docs)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())
    # seed change draws a different (overlapping but not identical) set
    s3 = textops.hash_stratified_sample(docs, seed="other-seed")
    assert ids1 != sorted(r["doc_id"] for r in s3.collect())
    # per-stratum keep rate within binomial noise of the target
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = s1.filter(F.col("lang") == "en").count()
    assert abs(k_en / n_en - textops.SAMPLE_RATES["en"]) < 0.2


def test_hash_sample_rates_broadcast(spark, sf_dir):
    plan = (textops.hash_stratified_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- round-3 additions: repetition quality + mixture sampling ----------------


def test_repetition_flags_planted_docs(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import (
        decorations,
    )

    docs = decorations.repetitive_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text"))
    rep = textops.repetition_metrics(docs).collect()
    by_id = {r["doc_id"]: r for r in rep}
    phrase = [r for r in rep if r["doc_id"] % 11 == 3]
    filler = [r for r in rep if r["doc_id"] % 13 == 4]
    assert phrase and filler
    # repeated 5-word phrase saturates the 3-gram and top-2-gram rules
    assert all(r["verdict"] == "drop" for r in phrase)
    assert all(r["dup_3gram_frac"] > textops.REP_DUP_3GRAM_MAX
               for r in phrase)
    # repeated single filler word saturates the dup-word rule
    assert all(r["dup_word_frac"] > textops.REP_DUP_WORD_MAX
               or r["verdict"] == "drop" for r in filler)
    # undecorated docs keep unless organically repetitive
    clean = [r for r in rep
             if r["doc_id"] % 11 != 3 and r["doc_id"] % 13 != 4]
    assert sum(r["verdict"] == "keep" for r in clean) > len(clean) * 0.8
    # metrics are fractions
    for r in by_id.values():
        assert 0.0 <= r["dup_word_frac"] <= 1.0
        assert 0.0 <= r["dup_3gram_frac"] <= 1.0
        assert 0.0 < r["top_2gram_share"] <= 1.0


def test_mixture_sample_tempers_language_skew(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")
    n = docs.count()
    kept = textops.mixture_temperature_sample(docs)
    n_kept = kept.count()
    # totals ~target_frac of the corpus (md5 keep is Bernoulli-exact
    # per stratum; allow generous tolerance at small n)
    assert abs(n_kept / n - textops.MIX_TARGET_FRAC) < 0.12
    # tempering: the dominant language keeps at a LOWER rate than the
    # rarest one (sqrt weighting upsamples low-resource domains)
    by_lang = {r["lang"]: r["count"]
               for r in docs.groupBy("lang").count().collect()}
    kept_by = {r["lang"]: r["count"]
               for r in kept.groupBy("lang").count().collect()}
    hi = max(by_lang, key=by_lang.get)
    lo = min(by_lang, key=by_lang.get)
    assert kept_by[lo] / by_lang[lo] > kept_by[hi] / by_lang[hi]
    # deterministic: same rows on a re-run
    again = {r["doc_id"]
             for r in textops.mixture_temperature_sample(docs).collect()}
    assert again == {r["doc_id"] for r in kept.collect()}


def test_cooccurrence_edges_pmi_math(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    import math

    edges = api.q_entity_cooccurrence(spark, sf_dir).collect()
    assert edges
    linked = api._linked_mentions(spark, sf_dir) \
        .select("doc_id", "term_id").distinct()
    n_docs = linked.select("doc_id").distinct().count()
    marg = {r["term_id"]: r["n"] for r in
            linked.groupBy("term_id").agg(F.count("*").alias("n"))
            .collect()}
    for e in edges[:20]:
        assert e["term_a"] < e["term_b"]          # canonical pair order
        assert e["n_ab"] >= 2                     # min support
        assert e["n_a"] == marg[e["term_a"]]
        assert e["n_b"] == marg[e["term_b"]]
        want = round(math.log(e["n_ab"] * n_docs
                              / (e["n_a"] * e["n_b"])), 6)
        assert abs(e["pmi"] - want) < 1e-9


def test_skew_profile_finds_hub_subject(spark, sf_dir):
    from cspirit_ontology_information_extraction_opus4plan_spark import api

    rows = api.q_triple_subject_skew(spark, sf_dir).collect()
    assert len(rows) == 10
    top = max(rows, key=lambda r: r["n"])
    # the corpus plants CHEBI:10001 as the hub subject; the probe must
    # surface it with max_n == its count and a large skew ratio
    assert top["key_value"] == "CHEBI:10001"
    assert top["n"] == top["max_n"]
    assert top["skew_ratio"] > 10
    assert all(r["total_rows"] == rows[0]["total_rows"] for r in rows)
    assert abs(sum(r["share"] for r in rows)
               - sum(r["n"] for r in rows) / rows[0]["total_rows"]) < 1e-4


def test_lang_confusion_matrix_invariants(spark, sf_dir):
    # The driver corpus declares lang labels over English-ish synthetic
    # text, so the matrix is deliberately OFF-diagonal for non-en rows —
    # exactly the mislabeled-shard signal the probe exists to expose.
    # Assert the structural invariants, not corpus-specific agreement.
    from cspirit_ontology_information_extraction_opus4plan_spark import api
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
        textops)

    rows = api.q_lang_confusion(spark, sf_dir).collect()
    assert rows
    known = set(textops.LANG_WORDLISTS) | {"und"}
    assert all(r["lang_pred"] in known for r in rows)
    assert all(r["agree"] == (r["lang"] == r["lang_pred"]) for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    # cells are a partition of the corpus
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    # the detector does fire on the English-embedded text: en→en is the
    # largest agreeing cell and non-trivial
    en_en = sum(r["n"] for r in rows
                if r["lang"] == "en" and r["agree"])
    assert en_en > 0


def test_doc_chunking_lossless_windows(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (  # noqa: E501
        CHUNK_STRIDE,
        CHUNK_W,
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(150))  # 150 tokens
    docs = spark.createDataFrame([(1, text), (2, "one two"), (3, "  ")],
                                 "doc_id bigint, text string")
    rows = chunk_documents(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 3 has zero tokens -> no chunks
    assert 3 not in by_doc
    # doc 2: one short chunk holding everything
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["chunk_text"] == "one two"
    assert by_doc[2][0]["n_tokens"] == 2

    c = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # ceil(150/48) = 4 chunks at starts 0,48,96,144
    assert [r["start"] for r in c] == [0, 48, 96, 144]
    assert [r["chunk_idx"] for r in c] == [0, 1, 2, 3]
    # full-width until the tail, which keeps the remaining 6 tokens
    assert [r["n_tokens"] for r in c] == [CHUNK_W, CHUNK_W, 54, 6]
    # lossless: every token appears in some chunk; overlap is exact
    seen = set()
    for r in c:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"t{i}" for i in range(150)}
    assert c[1]["chunk_text"].split(" ")[0] == "t48"
    assert c[0]["chunk_text"].split(" ")[CHUNK_STRIDE] == "t48"


def test_doc_split_stable_and_partitioned(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    s1 = {r["doc_id"]: r["split"]
          for r in textops.train_val_test_split(docs).collect()}
    # every doc in exactly one split; shares near 80/10/10
    n = len(s1)
    from collections import Counter
    c = Counter(s1.values())
    assert set(c) <= {"train", "val", "test"}
    assert 0.7 < c["train"] / n < 0.9
    # growth stability: adding new docs never migrates an existing one
    grown = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id")))
    s2 = {r["doc_id"]: r["split"]
          for r in textops.train_val_test_split(grown).collect()}
    assert all(s2[d] == v for d, v in s1.items())
    # a different seed re-deals at least some assignments
    s3 = {r["doc_id"]: r["split"]
          for r in textops.train_val_test_split(docs, seed="v2").collect()}
    assert any(s3[d] != v for d, v in s1.items())


def test_bigram_collocations_exact_counts(spark):
    # 6x "new york" adjacent + scattered unigrams; min_n=5 keeps only it
    docs = spark.createDataFrame(
        [(i, "new york is in new york state not old york")
         for i in range(3)],
        "doc_id bigint, text string")
    rows = textops.bigram_collocations(docs, min_n=5).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert ("new", "york") in got
    r = got[("new", "york")]
    # 2 adjacent occurrences x 3 docs; marginals over the full stream
    assert r["n_ab"] == 6 and r["n_a"] == 6 and r["n_b"] == 9
    import math
    t = 30  # 10 tokens x 3 docs
    assert abs(r["pmi"] - round(math.log(6 * t / (6 * 9)), 6)) < 1e-9
    # "york state" occurs 3x < min_n -> dropped
    assert ("york", "state") not in got


def test_dup_ngram_coverage_known_corpus(spark):
    # d1/d2 identical (all shingles df=2), d3 disjoint (df=1):
    # 3 distinct shingles each side -> 6 distinct, 3 duplicated,
    # occ 9 total of which 6 in duplicated shingles
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t")],
        "doc_id bigint, text string")
    row = textops.dup_ngram_coverage(docs).collect()[0]
    assert row["n_shingles"] == 6 and row["n_dup_shingles"] == 3
    assert row["dup_shingle_frac"] == 0.5
    assert row["occ_total"] == 9 and row["occ_dup"] == 6
    assert abs(row["dup_occ_frac"] - round(6 / 9, 6)) < 1e-9


def test_minhash_calibration_identical_pair_zero_error(spark):
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"),
         (3, "x1 x2 x3 x4 x5 x6")],
        "doc_id bigint, text string")
    row = textops.minhash_calibration(docs).collect()[0]
    # only the identical pair collides in any band: est = true = 1
    assert row["n_pairs"] == 1
    assert row["mean_true"] == 1.0 and row["mean_est"] == 1.0
    assert row["mean_abs_err"] == 0.0 and row["within_2se_frac"] == 1.0


def test_minhash_delta_equals_full_restricted(spark, adocs):
    # incremental == full: the delta path must emit exactly the full
    # run's pairs that touch a delta doc -- no extras, none missing
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in textops.minhash_lsh_pairs(adocs).collect()}
    delta_ids = adocs.filter(F.col("doc_id") % 10 < 3).select("doc_id")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in textops.minhash_delta_pairs(adocs, delta_ids).collect()}
    want = {p: j for p, j in full.items()
            if p[0] % 10 < 3 or p[1] % 10 < 3}
    assert got == want
    # non-vacuous: the full run has pairs the delta must NOT recompute
    assert len(want) < len(full)


def test_triple_fusion_votes_and_tie_breaks(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (  # noqa: E501
        triple_fusion,
    )
    t = spark.createDataFrame(
        [  # s1: two weak mentions of 'b' outvote one strong 'a'
         ("d1", "s1", "p", "a", 1.0),
         ("d2", "s1", "p", "b", 0.9),
         ("d3", "s1", "p", "b", 0.9),
         # s2: exact tie on weight and doc count -> smallest object
         ("d1", "s2", "p", "b", 1.0),
         ("d2", "s2", "p", "a", 1.0),
         # s3: uncontested
         ("d1", "s3", "p", "c", 0.9)],
        "doc_id string, subject string, predicate string, "
        "object string, confidence double")
    rows = {(r["subject"], r["predicate"]): r
            for r in triple_fusion(t).collect()}
    w1 = rows[("s1", "p")]
    assert w1["object"] == "b" and w1["evidence_weight"] == 1.8
    assert w1["n_docs"] == 2 and w1["n_mentions"] == 2
    assert w1["n_alternatives"] == 2
    assert rows[("s2", "p")]["object"] == "a"
    assert rows[("s3", "p")]["n_alternatives"] == 1


def test_dedup_retract_reaggregates_only_affected_keys(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (  # noqa: E501
        dedup_retract,
        dedup_triples,
    )
    cols = ("doc_id string, subject string, predicate string, "
            "object string, subject_type string, object_type string, "
            "object_datatype string, object_language string, "
            "confidence double")
    pre = spark.createDataFrame(
        [  # key A: evidence in d1 (removed, conf 1.0) and d2 (kept, 0.8)
         ("d1", "s", "p", "a", "uri", "uri", None, None, 1.0),
         ("d2", "s", "p", "a", "uri", "uri", None, None, 0.8),
         # key B: only evidence is d1 -> disappears
         ("d1", "s", "p", "b", "uri", "uri", None, None, 0.9),
         # key C: untouched, passes through un-reaggregated
         ("d3", "s", "q", "c", "uri", "uri", None, None, 0.7),
         # key D: literal object with NULL datatype/lang exercising the
         # null-safe key join, evidence split across removed/kept docs
         ("d1", "s", "r", "5", "uri", "literal", "xsd:int", None, 1.0),
         ("d2", "s", "r", "5", "uri", "literal", "xsd:int", None, 1.0)],
        cols)
    removed = spark.createDataFrame([("d1",)], "doc_id string")
    got = {(r["subject"], r["predicate"], r["object"]):
           (r["confidence"], r["support"])
           for r in dedup_retract(pre, removed).collect()}
    assert got[("s", "p", "a")] == (0.8, 1)   # re-aggregated, conf drops
    assert ("s", "p", "b") not in got          # evidence vanished
    assert got[("s", "q", "c")] == (0.7, 1)   # untouched pass-through
    assert got[("s", "r", "5")] == (1.0, 1)   # null-safe key matched
    # parity with the full recompute on the filtered stream
    want = {(r["subject"], r["predicate"], r["object"]):
            (r["confidence"], r["support"])
            for r in dedup_triples(
                pre.filter(F.col("doc_id") != "d1")).collect()}
    assert got == want


def test_leakage_split_never_straddles_neardup_pairs(spark, sf_dir, adocs):
    """The split property the operator exists for: both endpoints of
    every MinHash near-dup pair land in the SAME split, and the split
    assignment covers every doc exactly once."""
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
        curation,
    )

    split = curation.leakage_safe_split(adocs).persist()
    assert split.count() == adocs.count()
    pairs = textops.minhash_lsh_pairs(adocs)
    assert pairs.count() > 0  # decorated corpus plants near-dups
    straddle = (pairs
                .join(split.selectExpr("doc_id AS a", "split AS sa"), "a")
                .join(split.selectExpr("doc_id AS b", "split AS sb"), "b")
                .filter(F.col("sa") != F.col("sb")))
    assert straddle.count() == 0
    # all three splits actually populated at this corpus size
    assert split.select("split").distinct().count() == 3
    split.unpersist()


def test_chat_template_lint_verdicts(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (
        chat_template_lint,
    )
    rows = [
        (1, '[{"role":"system","content":"s"},{"role":"user",'
            '"content":"q"},{"role":"assistant","content":"a"}]'),
        (2, '[{"role":"user","content":"q"},{"role":"assistant",'
            '"content":"a"},{"role":"user","content":"q2"},'
            '{"role":"assistant","content":"a2"}]'),
        (3, '[{"role":"assistant","content":"a"}]'),
        (4, '[{"role":"user","content":"q"},{"role":"assistant",'
            '"content":""}]'),
        (5, '[{"role":"user","content":'),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, chat string")
    out = {r.doc_id: r for r in chat_template_lint(df).collect()}
    assert out[1].status == "ok" and out[1].role_sig == "sua"
    assert out[2].status == "ok" and out[2].role_sig == "uaua"
    assert out[3].status == "bad_structure"
    assert out[4].status == "empty_content" and out[4].n_empty == 1
    assert out[5].status == "invalid_json" and out[5].n_turns == 0
