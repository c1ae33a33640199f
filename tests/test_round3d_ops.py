"""Semantic guarantees of the round-3 final tranche — properties the
oracle hash-compare can't articulate:

  * NegEx-lite scoping marks every PLANTED trigger site negated
    (including the one-intervening-word branch) and leaves the
    corpus-planted mentions of undecorated docs un-negated,
  * typo blocking recovers every planted keystroke variant as a
    dist-1 pair with its source term, and never emits dist 0 or
    dist > max pairs,
  * the DiD estimate equals a pandas recomputation of the four cell
    means on the same assignment,
  * the weighted reservoir sample is exactly-k per stratum, ranked
    consecutively, and INVARIANT to the physical partitioning (the
    two-phase top-k's correctness claim).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark import (
    decorations as DE,
)
from cspirit_ontology_information_extraction_opus4plan_spark.corpus import (
    spans_exploded,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators.textops import (  # noqa: E501
    WS_K,
    weighted_reservoir_sample,
)


def _seq(doc_id: str) -> int:
    return int(doc_id.split(":")[1])


def test_negation_planted_sites_are_negated(spark, sf_dir):
    rows = api.q_ner_negation(spark, sf_dir).collect()
    assert rows
    flags = {(r["doc_id"], r["surface"]): r["negated"] for r in rows}
    planted = {2: "alanine", 5: "caffeine", 7: "auxin", 8: "caffeine"}
    n_checked = 0
    for (doc_id, surface), negated in flags.items():
        m = _seq(doc_id) % 9
        if m in planted and surface == planted[m]:
            assert negated, (doc_id, surface)
            n_checked += 1
    # every planted slot appears somewhere in the corpus
    assert n_checked >= 4
    # positives are planted only: undecorated docs never negate
    for (doc_id, surface), negated in flags.items():
        if _seq(doc_id) % 9 not in planted:
            assert not negated, (doc_id, surface)


def test_negation_flags_cover_all_text_mentions(spark, sf_dir):
    out = api.q_ner_negation(spark, sf_dir)
    # the flag table is keyed by the distinct mention set of the same
    # decorated text frame — no mention is lost or invented
    texts = DE.negation_decorated_texts(spans_exploded(spark, sf_dir))
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.ner import (  # noqa: E501
        ner_pattern,
    )
    men = (texts.select("doc_id", F.explode(
               F.regexp_extract_all(F.lower("text"),
                                    F.lit(ner_pattern()), 1))
           .alias("surface")).distinct())
    assert out.count() == men.count()


def test_typo_pairs_recover_planted_variants(spark, sf_dir):
    rows = api.q_er_typo_candidates(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dist"] <= 2
        assert r["name_a"] < r["name_b"]
    # every planted ':t' id pairs with its source term (dist 1)
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (  # noqa: E501
        terms_df,
    )
    planted = (DE.typo_terms(terms_df(spark).select("id", "name"))
               .filter(F.col("id").endswith(":t")).collect())
    assert planted
    by_pair = {}
    for r in rows:
        by_pair[(r["id_a"], r["id_b"])] = r["dist"]
        by_pair[(r["id_b"], r["id_a"])] = r["dist"]
    for p in planted:
        src = p["id"][:-2]
        assert by_pair.get((src, p["id"])) == 1, p["id"]


def test_did_matches_pandas_recomputation(spark, sf_dir):
    row = api.q_event_did(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "ts", "value",
                (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                    1, 8), 16, 10)
                 .cast("bigint") % 2 == 0).alias("t"),
                (F.dayofmonth("ts") >= 16).alias("p")).toPandas()
    cells = ev.groupby(["t", "p"])["value"].mean()
    did = ((cells[(True, True)] - cells[(True, False)])
           - (cells[(False, True)] - cells[(False, False)]))
    assert abs(row["did"] - round(did, 6)) < 1e-6
    assert abs(row["ctrl_pre"] - round(cells[(False, False)], 6)) < 1e-6
    assert row["n_events"] == len(ev)


def test_weighted_sample_exact_k_and_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    out = weighted_reservoir_sample(docs).toPandas()
    sizes = out.groupby("lang").size()
    counts = docs.groupBy("lang").count().collect()
    for r in counts:
        assert sizes.get(r["lang"], 0) == min(WS_K, r["count"])
    for _, g in out.groupby("lang"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    # partitioning invariance: same rows under a different layout
    out2 = weighted_reservoir_sample(docs.repartition(7)).toPandas()
    a = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["lang", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_holt_matches_reference_recursion(spark, sf_dir):
    """The aggregate-fold Holt state equals an explicit Python
    recursion over the same daily series (alpha = beta = 1/2), and
    forecasts are level + h*trend."""
    rows = api.q_event_holt(spark, sf_dir).collect()
    assert rows
    daily = (spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .count().orderBy("event_type", "day").collect())
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(float(r["count"]))
    for r in rows:
        xs = series[r["event_type"]]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = (x + l + b) / 2.0
            nb = (nl - l + b) / 2.0
            l, b = nl, nb
        assert r["n_days"] == len(xs)
        assert abs(r["level"] - round(l, 6)) < 1e-9
        assert abs(r["trend"] - round(b, 6)) < 1e-9
        assert abs(r["fc_2"] - round(l + 2.0 * b, 6)) < 1e-6
