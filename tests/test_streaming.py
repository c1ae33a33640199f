"""Structured Streaming ingestion: two document files staged into a
directory, drained with availableNow via foreachBatch -> the appended
triples equal the batch pipeline's output over the union, and a second
drain with the same checkpoint reprocesses nothing (exactly-once on the
source)."""

from __future__ import annotations

import pandas as pd
import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.streaming.pipeline import (
    stream_triples,
    triples_from_docs,
)


@pytest.fixture()
def staged(tmp_path, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    pdf = docs.toPandas().sort_values("doc_id")
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(in_dir / "part0.parquet", index=False)
    pdf.iloc[half:].to_parquet(in_dir / "part1.parquet", index=False)
    return str(in_dir), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns)).reset_index(drop=True))


def test_stream_matches_batch_and_is_exactly_once(spark, sf_dir, staged):
    in_dir, out_dir, ckpt = staged
    q = stream_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # batch_id is a physical idempotency key (partition dir), not data
    got = spark.read.parquet(out_dir).drop("batch_id").toPandas()
    want = triples_from_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")).toPandas()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))

    # re-start on the same checkpoint: nothing new to process
    q2 = stream_triples(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out_dir).toPandas()
    assert len(again) == len(want)

    # a FRESH checkpoint over the existing out_dir would restart batch
    # ids at 0 and silently mix old/new batches — must refuse (ADVICE r1)
    with pytest.raises(ValueError, match="batch_id"):
        stream_triples(spark, in_dir, out_dir, str(ckpt) + "_fresh")
