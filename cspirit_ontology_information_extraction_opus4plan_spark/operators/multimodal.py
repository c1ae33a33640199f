"""Multimodal (figure/table media) plumbing — binary columns + Arrow
feature extraction.

The reference models figures/tables as typed metadata around an opaque
payload (FigureMetadata/TableMetadata, parsers/metadata_framework.py:124/
225); our `spans` rows carry the payload pointer as `media_ref`. This
module implements the Spark-side plumbing a real decode stage needs:

  * media span projection (column-pruned: text never crosses),
  * payload fetch producing a `content: binary` column — here a
    deterministic 16-byte stand-in (md5 of the ref) since the sandbox
    has no object store; the fetch boundary is where S3/HDFS reads go,
  * one `mapInPandas` feature-extraction pass over Arrow batches:
    binary in, typed feature struct out.

Image/audio decoder libraries are not in this container, so
`decoder='stub'` derives features deterministically from the payload
bytes (schema/batch plumbing identical to a real decoder), and any
other decoder name raises NotImplementedError at plan-build time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("figure", "table")

FEATURE_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                  "width int, height int, n_channels int, content_len int")


def media_spans(spans: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, media_ref) for media spans — caption text and
    offsets pruned before anything heavier runs."""
    return (spans
            .filter(F.col("kind").isin(*MEDIA_KINDS)
                    & (F.col("media_ref") != ""))
            .select("doc_id", "pos", "kind", "media_ref"))


def fetch_media(media: DataFrame) -> DataFrame:
    """Attach the payload as a binary column. Production: a storage-read
    stage (pandas UDF against the object store, batched). Sandbox: the
    deterministic 16-byte md5 digest of the ref — same column type,
    same Arrow transfer shape."""
    return media.withColumn("content", F.unhex(F.md5("media_ref")))


def _stub_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = {"width": [], "height": [], "n_channels": [],
                 "content_len": []}
        for content in pdf["content"]:
            b = bytes(content)
            feats["width"].append(64 + b[0])
            feats["height"].append(64 + b[1])
            feats["n_channels"].append(1 + b[2] % 4)
            feats["content_len"].append(len(b))
        out = pdf[["doc_id", "pos", "kind", "media_ref"]].copy()
        for k, v in feats.items():
            out[k] = pd.Series(v, index=pdf.index, dtype="int32")
        yield out


def extract_media_features(media_with_content: DataFrame,
                           decoder: str = "stub") -> DataFrame:
    """One Arrow crossing: (.., content binary) -> typed features.
    A real decoder (PIL image dims, audio frames, video keyframes) slots
    into the same mapInPandas; the libs are absent here, so only the
    deterministic stub is runnable."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: image/audio decode libraries are not "
            "available in this environment; only the deterministic 'stub' "
            "decoder runs here. The Spark plumbing (binary column, Arrow "
            "batch shape, output schema) is identical for real decoders.")
    return media_with_content.mapInPandas(
        _stub_features, schema=FEATURE_SCHEMA)


def media_inventory(spans: DataFrame) -> DataFrame:
    """Per-kind media counts (extraction summary analog,
    metadata_framework.py:695)."""
    return (media_spans(spans)
            .groupBy("kind")
            .agg(F.count("*").alias("n_media"),
                 F.countDistinct("doc_id").alias("n_docs")))
