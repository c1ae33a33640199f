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


RESIZE_MAX_DIM = 224

RESIZE_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                 "width int, height int, out_width int, out_height int")


def resize_media(media_with_content: DataFrame,
                 max_dim: int = RESIZE_MAX_DIM,
                 decoder: str = "stub") -> DataFrame:
    """Resize plumbing: decode dims, cap the longer edge at max_dim
    preserving aspect ratio, emit target dims. A real decoder does
    `PIL.Image.resize((out_w, out_h))` on the bytes in the same batch
    loop; the stub derives source dims from the payload exactly like
    _stub_features and computes the target box with INTEGER arithmetic
    ((w * max_dim) // longer_edge — no float rounding to disagree with
    the SQL oracle). One Arrow crossing, one output row per input row."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: image decode/resize libraries are not "
            "available in this environment; only the deterministic 'stub' "
            "decoder runs here (identical Spark plumbing).")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ow, oh, ws, hs = [], [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                w, h = 64 + b[0], 64 + b[1]
                longer = max(w, h)
                if longer > max_dim:
                    ow.append((w * max_dim) // longer)
                    oh.append((h * max_dim) // longer)
                else:
                    ow.append(w)
                    oh.append(h)
                ws.append(w)
                hs.append(h)
            out = pdf[["doc_id", "pos", "kind", "media_ref"]].copy()
            for k, v in (("width", ws), ("height", hs),
                         ("out_width", ow), ("out_height", oh)):
                out[k] = pd.Series(v, index=pdf.index, dtype="int32")
            yield out

    return media_with_content.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_MAX = 4
FRAME_MS = 40  # 25 fps stand-in

FRAME_SCHEMA = ("doc_id string, pos int, media_ref string, "
                "n_frames int, frame_idx int, ts_ms int")


def sample_frames(media_with_content: DataFrame,
                  max_frames: int = FRAME_SAMPLE_MAX,
                  decoder: str = "stub") -> DataFrame:
    """Frame-sampling plumbing (video payloads): decode the frame count,
    take evenly-strided frames capped at max_frames, emit ONE ROW PER
    SAMPLED FRAME — the row-exploding Arrow batch shape a real
    keyframe/fps sampler needs (input rows fan out; the output schema
    carries the frame index + timestamp, a real decoder adds the frame
    bytes column). Stub frame count = 8 + byte3(md5 payload) % 56, so
    8..63-frame 'videos'; stride = ceil(n / max_frames) keeps at most
    max_frames frames, always including frame 0."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: video decode libraries are not "
            "available in this environment; only the deterministic 'stub' "
            "decoder runs here (identical Spark plumbing).")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "pos": [], "media_ref": [],
                    "n_frames": [], "frame_idx": []}
            for doc_id, pos, ref, content in zip(
                    pdf["doc_id"], pdf["pos"], pdf["media_ref"],
                    pdf["content"]):
                b = bytes(content)
                n = 8 + b[3] % 56
                stride = -(-n // max_frames)  # ceil
                for idx in range(0, n, stride):
                    rows["doc_id"].append(doc_id)
                    rows["pos"].append(pos)
                    rows["media_ref"].append(ref)
                    rows["n_frames"].append(n)
                    rows["frame_idx"].append(idx)
            out = pd.DataFrame(rows)
            out["pos"] = out["pos"].astype("int32")
            for k in ("n_frames", "frame_idx"):
                out[k] = out[k].astype("int32")
            out["ts_ms"] = (out["frame_idx"] * FRAME_MS).astype("int32")
            yield out

    return media_with_content.mapInPandas(sample, schema=FRAME_SCHEMA)


PHASH_BITS = 32
PHASH_BANDS = 8          # 8 bands x 4 bits over the 32-bit stub hash
PHASH_HAMMING_MAX = 7    # pigeonhole: <=7 errors leave >=1 band intact

PHASH_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                "phash bigint")


def media_phash(media_with_content: DataFrame,
                decoder: str = "stub") -> DataFrame:
    """Perceptual average-hash (aHash) per media payload — the
    decode-stage fingerprint image-corpus dedup pipelines (LAION-style)
    compute: decoded pixels -> global-mean threshold -> one bit per
    pixel. A real decoder grayscales + 8x8-downsamples the image and
    emits 64 bits in this same Arrow pass; the stub treats the
    payload's 32 nibbles (hex-order, high nibble first) as the pixels
    and emits a 32-bit hash. The threshold is INTEGER-exact — bit i set
    iff 32 * p_i > sum(p) — so the oracle reproduces every bit from the
    hex text with no float mean. One Arrow crossing, numpy-vectorized,
    O(1) output bytes per payload: downstream dedup never touches the
    blob again (the media_content_dedup digest principle, but
    perturbation-tolerant)."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: image decode libraries are not "
            "available in this environment; only the deterministic 'stub' "
            "decoder runs here (identical Spark plumbing).")
    import numpy as np

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(PHASH_BITS, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack([np.frombuffer(bytes(c), dtype=np.uint8)
                          for c in pdf["content"]]).astype(np.int64)
            nib = np.empty((len(B), PHASH_BITS), dtype=np.int64)
            nib[:, 0::2] = B >> 4
            nib[:, 1::2] = B & 15
            s = nib.sum(axis=1, keepdims=True)
            bits = PHASH_BITS * nib > s
            out = pdf[["doc_id", "pos", "kind", "media_ref"]].copy()
            out["phash"] = (bits * weights).sum(axis=1)
            yield out

    return media_with_content.mapInPandas(hasher, schema=PHASH_SCHEMA)


def media_phash_neardup(hashed: DataFrame,
                        hamming_max: int = PHASH_HAMMING_MAX) -> DataFrame:
    """Near-duplicate media pairs from perceptual hashes: banded-LSH
    equi-join (PHASH_BANDS bands of PHASH_BITS/PHASH_BANDS bits —
    pigeonhole: any pair within hamming_max differs in at most
    hamming_max bands, so with bands > hamming_max at least one band
    matches exactly and the equi-join finds the pair with NO recall
    loss), then a true hamming verify via bit_count(xor). The
    doc_simhash_neardup machinery applied to the multimodal store —
    catches re-encoded/resized/cropped-by-a-pixel images that the
    exact content digest (media_content_dedup) misses.

    Scale shape: the only corpus-sized shuffle is the (band_idx,
    band_value) equi-join; candidates are distinct-ed on the pair key
    before the verify expression. At 10^12 payloads use a 64/256-bit
    hash with proportionally more bands so band-collision rates stay
    flat; the plumbing is width-agnostic."""
    w = PHASH_BITS // PHASH_BANDS
    bands = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.shiftright("phash", w * j).bitwiseAND(
                     F.lit((1 << w) - 1)).alias("band"))
        for j in range(PHASH_BANDS)])
    # localCheckpoint: both self-join sides read the hashed frame — the
    # Arrow decode+hash pass must run once, not once per side (the
    # embedding_neardup_pairs precedent)
    side = (hashed.localCheckpoint(eager=True)
            .select("media_ref", "phash",
                    F.explode(bands).alias("bx"))
            .select("media_ref", "phash", "bx.j", "bx.band"))
    a = side.select(F.col("media_ref").alias("a"),
                    F.col("phash").alias("pa"), "j", "band")
    b = side.select(F.col("media_ref").alias("b"),
                    F.col("phash").alias("pb"), "j", "band")
    cand = (a.join(b, ["j", "band"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "pa", "pb").distinct())
    return (cand
            .withColumn("hamming",
                        F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                        .cast("int"))
            .filter(F.col("hamming") <= hamming_max)
            .select("a", "b", "hamming"))


AUDIO_FRAME_MS = 30   # VAD analysis frame (the webrtcvad default)
VAD_SCHEMA = ("doc_id string, pos int, media_ref string, n_frames int, "
              "seg_idx int, start_frame int, end_frame int, "
              "start_ms int, dur_ms int")


def vad_segments(media_with_content: DataFrame,
                 decoder: str = "stub") -> DataFrame:
    """Voice-activity segmentation plumbing (audio payloads): decode
    per-frame energies, threshold, and emit one row per maximal voiced
    run — the segmentation stage an ASR/caption pipeline runs before
    transcription, and the second row-exploding Arrow batch shape next
    to sample_frames (a clip fans out to a variable number of
    segments). A real VAD computes energies/GMM posteriors inside the
    same kernel; the stub derives them from the payload bytes: clip
    length = 20 + byte0 % 30 frames, frame i is voiced iff
    byte[(i+1) % 16] >= 128 (i.e. its high nibble >= 8) — replayed
    nibble-for-nibble by the DuckDB oracle, like the pHash/frame
    stubs. Segment state is bounded by clip length, never the corpus."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: audio decode libraries are not "
            "available in this environment; only the deterministic "
            "'stub' decoder runs here (identical Spark plumbing).")

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "pos", "media_ref",
                                    "n_frames", "seg_idx",
                                    "start_frame", "end_frame")}
            for doc_id, pos, ref, content in zip(
                    pdf["doc_id"], pdf["pos"], pdf["media_ref"],
                    pdf["content"]):
                b = bytes(content)
                n = 20 + b[0] % 30
                seg = 0
                start = None
                for i in range(n + 1):
                    voiced = i < n and b[(i + 1) % 16] >= 128
                    if voiced and start is None:
                        start = i
                    elif not voiced and start is not None:
                        seg += 1
                        rows["doc_id"].append(doc_id)
                        rows["pos"].append(pos)
                        rows["media_ref"].append(ref)
                        rows["n_frames"].append(n)
                        rows["seg_idx"].append(seg)
                        rows["start_frame"].append(start)
                        rows["end_frame"].append(i)
                        start = None
            out = pd.DataFrame(rows)
            for k in ("pos", "n_frames", "seg_idx", "start_frame",
                      "end_frame"):
                out[k] = out[k].astype("int32")
            out["start_ms"] = (out["start_frame"]
                               * AUDIO_FRAME_MS).astype("int32")
            out["dur_ms"] = ((out["end_frame"] - out["start_frame"])
                             * AUDIO_FRAME_MS).astype("int32")
            yield out

    return media_with_content.mapInPandas(segs, schema=VAD_SCHEMA)


def media_inventory(spans: DataFrame) -> DataFrame:
    """Per-kind media counts (extraction summary analog,
    metadata_framework.py:695)."""
    return (media_spans(spans)
            .groupBy("kind")
            .agg(F.count("*").alias("n_media"),
                 F.countDistinct("doc_id").alias("n_docs")))


def media_content_dedup(media: DataFrame) -> DataFrame:
    """Binary-payload dedup for the multimodal store: group media rows
    by a content digest of the BLOB itself -> (content_hash, n_refs,
    n_docs, keeper_ref). The storage-dedup step of an image/audio
    pipeline (the same bytes crawled under many refs should be stored
    once and refcounted); the keeper is the min media_ref, the same
    deterministic election rule as the doc near-dup resolver.

    The digest is md5 over the payload's base64 text — one fixed
    canonical byte->text encoding shared with the DuckDB oracle (whose
    md5 is VARCHAR-only), computed map-side; the groupBy on the digest
    is the only shuffle and combines map-side. At 100 TB the digest
    stands in for the payload everywhere downstream (the blob never
    shuffles)."""
    return (media
            .withColumn("content_hash",
                        F.md5(F.encode(F.base64("content"), "utf-8")))
            .groupBy("content_hash")
            .agg(F.count("*").cast("bigint").alias("n_refs"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                 F.min("media_ref").alias("keeper_ref")))
