"""Streaming full-grammar RDF ingestion with in-batch recovery
(streaming/pipeline.stream_rdf_triples): batch parity, cure-in-batch,
dead-letter routing, idempotent re-drain."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def rdf_dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"))


def _docs(spark):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators import (  # noqa: E501
        gazetteer as GZ,
        recovery as RC,
    )
    return RC.recovery_demo_docs(GZ.terms_df(spark)).limit(40)


def test_stream_matches_batch_and_redrains_noop(spark, rdf_dirs):
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.rdf_full import (  # noqa: E501
        parse_turtle_full,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.recovery import (  # noqa: E501
        reparse_with_corrections,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.streaming.pipeline import (  # noqa: E501
        stream_rdf_triples,
    )
    in_dir, out_dir, ckpt = rdf_dirs
    # repartition(3) -> three part files -> three micro-batches under
    # maxFilesPerTrigger=1
    _docs(spark).repartition(3).write.mode("overwrite").parquet(in_dir)

    q = stream_rdf_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got_triples = spark.read.parquet(f"{out_dir}/triples")
    got_dead = spark.read.parquet(f"{out_dir}/quarantine")

    all_docs = spark.read.parquet(in_dir)
    parsed = parse_turtle_full(all_docs)
    second = reparse_with_corrections(all_docs, parsed)
    want_good = (parsed.filter(F.col("predicate") != "parse_error")
                 .unionByName(
                     second.filter(F.col("predicate") != "parse_error")))
    want_dead = second.filter(F.col("predicate") == "parse_error")

    cols = ["src_id", "subject", "predicate", "object"]
    assert ({tuple(r) for r in got_triples.select(cols).collect()}
            == {tuple(r) for r in want_good.select(cols).collect()})
    assert got_dead.count() == want_dead.count() > 0
    # cure-in-batch: curable classes (id % 4 in {0, 1}) produced
    # genuine triples despite failing the first parse
    cured = got_triples.filter(
        F.regexp_extract("src_id", r"(\d+)$", 1).cast("int") % 4 <= 1)
    assert cured.count() > 0

    # re-drain with the same checkpoint: no new data, output unchanged
    n_before = got_triples.count()
    q2 = stream_rdf_triples(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(f"{out_dir}/triples").count() == n_before


def test_fresh_checkpoint_over_existing_output_refused(spark, rdf_dirs):
    from cspirit_ontology_information_extraction_opus4plan_spark.streaming.pipeline import (  # noqa: E501
        stream_rdf_triples,
    )
    in_dir, out_dir, ckpt = rdf_dirs
    _docs(spark).write.mode("overwrite").parquet(in_dir)
    q = stream_rdf_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="reuse batch ids"):
        stream_rdf_triples(spark, in_dir, out_dir, ckpt + "_fresh")
