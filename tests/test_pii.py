"""PII redaction + decontamination edge semantics."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.pii import (
    contaminated_docs,
    redact_pii,
)


def test_redact_all_classes_one_row(spark):
    docs = spark.createDataFrame(
        [(1, "mail a.b+c@x.co.uk from 192.168.0.1 call 555-123-4567 end"),
         (2, "clean text no pii"),
         (3, "two mails a@b.io c@d.io")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["clean_text"] == "mail [EMAIL] from [IP] call [PHONE] end"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[2]["clean_text"] == "clean text no pii"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["clean_text"] == "two mails [EMAIL] [EMAIL]"
    assert out[3]["n_email"] == 2


def test_phone_not_matched_inside_longer_number(spark):
    docs = spark.createDataFrame(
        [(1, "id 9555-123-45678 is not a phone")], "doc_id int, text string")
    r = redact_pii(docs).collect()[0]
    assert r["n_phone"] == 0 and "[PHONE]" not in r["clean_text"]


def test_contamination_counts_shared_shingles(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id int, text string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),     # full overlap
         (2, "unrelated words entirely here"),
         (3, "x alpha beta gamma delta y")],  # contains the bench 4-gram
        "doc_id int, text string")
    out = {r["doc_id"]: r["n_hits"]
           for r in contaminated_docs(corpus, bench, w=4).collect()}
    assert out[1] == 1            # the single 4-gram matches
    assert 2 not in out           # zero-hit docs are absent, not 0-rows
    assert out[3] == 1


def test_contamination_plan_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(100, "a b c d")], "doc_id int, text string")
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    plan = (contaminated_docs(corpus, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_decontaminate_no_false_negatives(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.pii import (  # noqa: E501
        bloom_decontaminate,
    )

    words = " ".join(f"w{i}" for i in range(12))
    bench = spark.createDataFrame([(100, words)],
                                  "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, words),                                    # exact overlap
         (2, " ".join(f"x{i}" for i in range(12))),     # clean
         (3, " ".join(f"y{i}" for i in range(12)))],    # clean
        "doc_id bigint, text string")
    row = bloom_decontaminate(corpus, bench).collect()[0]
    assert row["n_docs"] == 3
    assert row["n_exact_contaminated"] == 1
    assert row["n_missed"] == 0 and row["caught_all"] is True
    assert row["fp_within_bound"] is True
