"""Multimodal (figure/table media) plumbing — binary columns + Arrow
feature extraction over REAL codec bytes.

The reference models figures/tables as typed metadata around an opaque
payload (FigureMetadata/TableMetadata, parsers/metadata_framework.py:124/
225); our `spans` rows carry the payload pointer as `media_ref`. This
module implements the full Spark shape of a media pipeline:

  * media span projection (column-pruned: text never crosses),
  * payload fetch producing a `content: binary` column — in the
    sandbox, REAL deterministically-synthesized payloads: an actual
    zlib-compressed 8-bit grayscale PNG per image ref
    (synthesize_png) and an actual RIFF/WAVE 16-bit PCM clip per
    audio ref (synthesize_wav), each seeded by the ref's md5 so the
    DuckDB oracle can replay the pixel/sample math in closed form; in
    production this stage is the object-store read,
  * one `mapInPandas` decode pass per modality over Arrow batches:
    binary in, typed feature struct out — and the decode is REAL: the
    PNG kernel parses chunks, inflates IDAT and un-filters scanlines
    (all 5 PNG filter types); the WAV kernel parses RIFF chunks and
    computes per-frame PCM energies. stdlib-only (zlib + struct), no
    external image/audio libraries.

Image synthesis plants perceptual twins: refs in the same canonical
group share geometry and differ only by a constant brightness offset,
so their decoded BYTES differ (exact digest dedup misses them) while
the mean-relative aHash is provably invariant — the re-encoded-twin
case perceptual dedup exists for.

Video frame sampling (sample_frames) decodes REAL multi-frame GIF87a
payloads through a pure-stdlib LZW decoder (gif_decode — variable-width
codes, dictionary growth to the 12-bit cap, CLEAR resets, sub-block
reassembly), synthesized per ref by gif_encode; per-frame stats come
from the decoded pixels. True container codecs (mp4/webm) remain
unavailable in this environment and raise NotImplementedError at
plan-build time.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from hashlib import md5 as _hashlib_md5

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("figure", "table")

FEATURE_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                  "width int, height int, n_channels int, bit_depth int, "
                  "raw_len int, px_sum bigint, px_min int, px_max int, "
                  "mean_gray int")


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


# --------------------------------------------------------------------------
# PNG codec (stdlib zlib; 8-bit grayscale)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(rows: list[bytes], filter_type: int = 0) -> bytes:
    """Encode 8-bit grayscale scanlines as a real PNG (signature,
    IHDR, one IDAT, IEND; zlib-compressed filtered scanlines). The
    corpus encoder always writes filter 0; other filter types exist so
    tests can prove the DECODER un-filters all five."""
    h, w = len(rows), len(rows[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w)
    for r in rows:
        raw.append(filter_type)
        if filter_type == 0:
            raw += r
        elif filter_type == 1:    # Sub
            raw += bytes((r[x] - (r[x - 1] if x else 0)) & 255
                         for x in range(w))
        elif filter_type == 2:    # Up
            raw += bytes((r[x] - prev[x]) & 255 for x in range(w))
        elif filter_type == 3:    # Average
            raw += bytes((r[x] - ((r[x - 1] if x else 0)
                                  + prev[x]) // 2) & 255
                         for x in range(w))
        elif filter_type == 4:    # Paeth
            raw += bytes((r[x] - _paeth(r[x - 1] if x else 0, prev[x],
                                        prev[x - 1] if x else 0)) & 255
                         for x in range(w))
        else:
            raise ValueError(f"bad filter {filter_type}")
        prev = r
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse a real PNG: validate the signature, walk chunks, inflate
    the IDAT stream, and un-filter every scanline (all 5 PNG filter
    types). Returns (width, height, bit_depth, color_type, rows).
    Supports the 8-bit grayscale profile the corpus uses (1 byte per
    pixel); rejects anything else loudly."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile depth={depth} color={color}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    rows: list[bytes] = []
    prev = bytes(w)
    stride = w + 1
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        ft, f = line[0], bytearray(line[1:])
        if ft == 1:
            for x in range(w):
                f[x] = (f[x] + (f[x - 1] if x else 0)) & 255
        elif ft == 2:
            for x in range(w):
                f[x] = (f[x] + prev[x]) & 255
        elif ft == 3:
            for x in range(w):
                f[x] = (f[x] + ((f[x - 1] if x else 0)
                                + prev[x]) // 2) & 255
        elif ft == 4:
            for x in range(w):
                f[x] = (f[x] + _paeth(f[x - 1] if x else 0, prev[x],
                                      prev[x - 1] if x else 0)) & 255
        elif ft != 0:
            raise ValueError(f"bad PNG filter byte {ft}")
        prev = bytes(f)
        rows.append(prev)
    return w, h, 8, 0, rows


# --------------------------------------------------------------------------
# deterministic image model (what the synthesizer paints)
# --------------------------------------------------------------------------

# canonical grouping: refs in the same group render the same geometry
# with a per-doc constant brightness offset — perceptual twins whose
# bytes differ (delta < 256 - GRAY_MOD, so no wrap: aHash invariance
# is exact, not approximate)
FIG_GROUP = 15
TAB_GROUP = 16
GRAY_MOD = 200


def _image_params(media_ref: str) -> tuple[int, int, int, int, int, int]:
    """(width, height, a, b, c0, delta) for a ref. Geometry/coeffs come
    from the md5 of the CANONICAL group ref; delta is the per-doc
    brightness offset within the group. Pixel value:
    g(x, y) = (a*x^2 + b*y^2 + 3*x*y + c0) % GRAY_MOD + delta — the
    quadratic texture matters: pure linear gradients aHash into a few
    half-plane patterns and EVERY image pairs with every other within
    the hamming radius (measured: 33k pairs vs the 1.5k planted twins
    on the 1.4k-doc corpus); the textured field leaves exactly the
    planted brightness twins."""
    doc = int(media_ref.split("DOC", 1)[1].split("/", 1)[0])
    if media_ref.endswith("fig1.png"):
        group, suffix = FIG_GROUP, "fig1.png"
    else:
        group, suffix = TAB_GROUP, "tab1.parquet"
    delta = doc % group
    canon = f"media/DOC{doc - delta}/{suffix}"
    m = _hashlib_md5(canon.encode()).digest()
    w = 16 + m[0] % 17
    h = 16 + m[1] % 17
    a = 1 + m[2] % 7
    b = 1 + m[3] % 5
    c0 = m[4]
    return w, h, a, b, c0, delta


def _render_rows(media_ref: str) -> list[bytes]:
    w, h, a, b, c0, delta = _image_params(media_ref)
    return [bytes((a * x * x + b * y * y + 3 * x * y + c0)
                  % GRAY_MOD + delta
                  for x in range(w)) for y in range(h)]


def synthesize_png(media: DataFrame) -> DataFrame:
    """Attach a REAL PNG payload per media ref (the sandbox stand-in
    for the object-store read): render the deterministic pixel model
    and run it through the actual encoder (filter 0 + zlib). One Arrow
    crossing; payloads are KB-sized and never shuffle — every
    downstream consumer reduces them to features in its own kernel."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [png_encode(_render_rows(ref))
                              for ref in pdf["media_ref"]]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in media.schema.fields) + ", content binary"
    return media.mapInPandas(enc, schema=schema)


def extract_media_features(media_with_content: DataFrame,
                           decoder: str = "png") -> DataFrame:
    """One Arrow crossing: (.., content binary) -> typed features from
    a REAL decode — png_decode parses chunks, inflates IDAT and
    un-filters scanlines, then integer pixel statistics (sum/min/max
    and mean_gray = px_sum // raw_len: integer division, so the DuckDB
    oracle replays every value exactly). Unknown decoders raise at
    plan-build time."""
    if decoder != "png":
        raise NotImplementedError(
            f"decoder={decoder!r}: only the stdlib PNG decoder is "
            "available in this environment. The Spark plumbing (binary "
            "column, Arrow batch shape, output schema) is identical for "
            "other codecs.")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"width": [], "height": [], "n_channels": [],
                    "bit_depth": [], "raw_len": [], "px_sum": [],
                    "px_min": [], "px_max": [], "mean_gray": []}
            for content in pdf["content"]:
                w, h, depth, color, rows = png_decode(bytes(content))
                px = [v for r in rows for v in r]
                s = sum(px)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_channels"].append(1 if color == 0 else 3)
                cols["bit_depth"].append(depth)
                cols["raw_len"].append(len(px))
                cols["px_sum"].append(s)
                cols["px_min"].append(min(px))
                cols["px_max"].append(max(px))
                cols["mean_gray"].append(s // len(px))
            out = pdf[["doc_id", "pos", "kind", "media_ref"]].copy()
            for k, v in cols.items():
                dtype = "int64" if k == "px_sum" else "int32"
                out[k] = pd.Series(v, index=pdf.index, dtype=dtype)
            yield out

    return media_with_content.mapInPandas(feats, schema=FEATURE_SCHEMA)


RESIZE_MAX_DIM = 224   # production default (ViT-style input box)
RESIZE_DEMO_DIM = 24   # demo cap sized to the synthesized 16..32px corpus

RESIZE_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                 "width int, height int, out_width int, out_height int")


def resize_media(media_with_content: DataFrame,
                 max_dim: int = RESIZE_MAX_DIM,
                 decoder: str = "png") -> DataFrame:
    """Resize plumbing: REAL decode of the source dims (png_decode on
    the actual bytes), cap the longer edge at max_dim preserving
    aspect ratio with INTEGER arithmetic ((w * max_dim) //
    longer_edge — no float rounding to disagree with the SQL oracle).
    A production kernel resamples the pixel rows in the same batch
    loop; the target-box math is the part consumers key on. One Arrow
    crossing, one output row per input row."""
    if decoder != "png":
        raise NotImplementedError(
            f"decoder={decoder!r}: only the stdlib PNG decoder is "
            "available in this environment (identical Spark plumbing "
            "for other codecs).")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ow, oh, ws, hs = [], [], [], []
            for content in pdf["content"]:
                w, h, _, _, _ = png_decode(bytes(content))
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
                "n_frames int, frame_idx int, ts_ms int, "
                "mean_gray double")

# --------------------------------------------------------------------------
# GIF codec (stdlib-only LZW; 8-bit grayscale global palette)
# --------------------------------------------------------------------------

GIF_W, GIF_H = 16, 12      # synthesized frame geometry
GIF_SEED_MOD = 240         # base + x stays < 256 for x < GIF_W
GIF_FRAME_STEP = 7         # per-frame brightness step


def _lzw_encode(indices: list[int], min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: variable-width codes starting min+1 bits,
    dictionary growth to 4096 then CLEAR, LSB-first bit packing."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(1 << min_code_size)}
    width, nxt = min_code_size + 1, eoi + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prev = bytes([indices[0]])
    for k in indices[1:]:
        cand = prev + bytes([k])
        if cand in table:
            prev = cand
            continue
        emit(table[prev], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            width, nxt = min_code_size + 1, eoi + 1
        prev = bytes([k])
    emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of _lzw_encode, spec-pinned by the 1x1 GIF89a fixture in
    tests/test_codecs.py (the canonical tracking-pixel bytes). The
    table list is indexed by code (clear/eoi hold placeholders), so
    len(table) IS the next free code — the same quantity the encoder
    tracks, which keeps the width-growth points aligned. Handles the
    KwKwK case (code == next free) per the spec."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return list(out)  # missing EOI: tolerate truncation
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width, prev = min_code_size + 1, None
            continue
        if code == eoi:
            return list(out)
        if code < len(table):
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]      # KwKwK
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # the decoder's table lags the encoder's by exactly one entry
        # (its add for code j happens while processing code j+1), so it
        # must widen one entry EARLY to read the next code at the width
        # the encoder wrote it
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return list(out)


def gif_encode(frames: list[list[int]], w: int, h: int) -> bytes:
    """Real GIF87a container: logical screen descriptor, 256-entry
    grayscale global color table (index i -> gray i), one full-size
    image block per frame (LZW min code size 8), trailer."""
    head = (b"GIF87a" + struct.pack("<HH", w, h)
            + bytes([0xF7, 0, 0]))  # GCT flag, 8-bit, 256 entries
    gct = bytes(v for i in range(256) for v in (i, i, i))
    body = bytearray()
    for px in frames:
        body += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        body.append(8)  # LZW min code size
        stream = _lzw_encode(px, 8)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            body.append(len(chunk))
            body += chunk
        body.append(0)  # block terminator
    return head + gct + bytes(body) + b"\x3B"


def gif_decode(data: bytes) -> tuple[int, int, list[list[int]]]:
    """Parse a GIF87a/89a stream: screen descriptor, global/local color
    tables, extension blocks (skipped), one decoded frame per image
    block — pixels mapped to gray via the palette's red channel.
    Interlaced images are refused loudly (the synthesizer never emits
    them; silent de-interlacing would fake data)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    frames: list[list[int]] = []
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:          # trailer
            break
        if b0 == 0x21:          # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        fw, fh = struct.unpack("<HH", data[pos + 4:pos + 8])
        iflags = data[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:       # local color table
            n = 2 << (iflags & 0x07)
            pal = data[pos:pos + 3 * n]
            pos += 3 * n
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        min_code = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos]:
            ln = data[pos]
            stream += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code)
        if len(idx) < fw * fh:
            raise ValueError("short LZW stream")
        frames.append([pal[3 * i] for i in idx[:fw * fh]])
    return w, h, frames


def _gif_plan(ref: str) -> tuple[int, int]:
    """(n_frames, base) from the ref digest — n_frames keeps the stub
    era's 8 + byte3 % 56 contract so the oracle's nibble replay is
    unchanged; base seeds the per-frame brightness."""
    d = _hashlib_md5(ref.encode()).digest()
    return 8 + d[3] % 56, d[4] % GIF_SEED_MOD


def synthesize_gif(media: DataFrame) -> DataFrame:
    """Attach a REAL multi-frame GIF87a payload per media ref: frame f
    is a constant raster at brightness base + 7f (mod GIF_SEED_MOD)
    with a +x gradient across row 0 — every pixel is closed-form in
    (ref, f, x, y), so the DuckDB oracle replays the decoded frame
    means without a decoder. One Arrow crossing."""
    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ref in pdf["media_ref"]:
                n, base = _gif_plan(ref)
                frames = []
                for f in range(n):
                    v = (base + GIF_FRAME_STEP * f) % GIF_SEED_MOD
                    px = [(v + x) if y == 0 else v
                          for y in range(GIF_H) for x in range(GIF_W)]
                    frames.append(px)
                payloads.append(gif_encode(frames, GIF_W, GIF_H))
            out = pdf.copy()
            out["content"] = payloads
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in media.schema.fields) + ", content binary"
    return media.mapInPandas(enc, schema=schema)


def sample_frames(media_with_content: DataFrame,
                  max_frames: int = FRAME_SAMPLE_MAX,
                  decoder: str = "gif") -> DataFrame:
    """Frame sampling over REAL video-ish payloads: gif_decode the
    multi-frame stream, take evenly-strided frames capped at
    max_frames (stride = ceil(n / max), frame 0 always kept), emit ONE
    ROW PER SAMPLED FRAME with its timestamp and the mean gray of the
    DECODED pixels — the row-exploding Arrow shape a keyframe/fps
    sampler needs. The round-4 stub decoder is retired: frame counts
    and stats now come from actual decoded frames. True container
    codecs stay unavailable here and raise at plan-build time."""
    if decoder != "gif":
        raise NotImplementedError(
            f"decoder={decoder!r}: only the stdlib GIF decoder is "
            "available in this environment (identical Spark plumbing "
            "for mp4/webm).")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "pos": [], "media_ref": [],
                    "n_frames": [], "frame_idx": [], "mean_gray": []}
            for doc_id, pos, ref, content in zip(
                    pdf["doc_id"], pdf["pos"], pdf["media_ref"],
                    pdf["content"]):
                w, h, frames = gif_decode(bytes(content))
                n = len(frames)
                stride = -(-n // max_frames)  # ceil
                for idx in range(0, n, stride):
                    rows["doc_id"].append(doc_id)
                    rows["pos"].append(pos)
                    rows["media_ref"].append(ref)
                    rows["n_frames"].append(n)
                    rows["frame_idx"].append(idx)
                    rows["mean_gray"].append(
                        round(sum(frames[idx]) / (w * h), 6))
            out = pd.DataFrame(rows)
            out["pos"] = out["pos"].astype("int32")
            for k in ("n_frames", "frame_idx"):
                out[k] = out[k].astype("int32")
            out["ts_ms"] = (out["frame_idx"] * FRAME_MS).astype("int32")
            out["mean_gray"] = out["mean_gray"].astype("float64")
            yield out[["doc_id", "pos", "media_ref", "n_frames",
                       "frame_idx", "ts_ms", "mean_gray"]]

    return media_with_content.mapInPandas(sample, schema=FRAME_SCHEMA)


PHASH_BITS = 64          # 8x8 aHash over real decoded pixels
PHASH_BANDS = 8          # 8 bands x 8 bits
PHASH_HAMMING_MAX = 7    # pigeonhole: <=7 errors leave >=1 band intact

PHASH_SCHEMA = ("doc_id string, pos int, kind string, media_ref string, "
                "phash bigint")


def media_phash(media_with_content: DataFrame,
                decoder: str = "png") -> DataFrame:
    """Perceptual average-hash (aHash) per media payload — the
    decode-stage fingerprint image-corpus dedup pipelines (LAION-style)
    compute — from a REAL decode: png_decode the bytes, sample an 8x8
    grid (point x_i = i*w // 8, y_j = j*h // 8 — integer arithmetic,
    so the oracle replays every coordinate), threshold each sample
    against the 64-sample sum. The threshold is INTEGER-exact — bit
    k = j*8 + i set iff 64 * g(x_i, y_j) > sum — which also makes the
    hash provably invariant to a constant brightness shift (both sides
    gain 64*delta), the exact perturbation the synthesizer plants:
    perceptual twins whose exact content digests differ. Bit 63 lands
    in a signed bigint via two's complement; band extraction below
    masks after the shift, so the sign bit never leaks. One Arrow
    crossing, O(1) output bytes per payload: downstream dedup never
    touches the blob again."""
    if decoder != "png":
        raise NotImplementedError(
            f"decoder={decoder!r}: only the stdlib PNG decoder is "
            "available in this environment (identical Spark plumbing "
            "for other codecs).")

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for content in pdf["content"]:
                w, h, _, _, rows = png_decode(bytes(content))
                samples = [rows[j * h // 8][i * w // 8]
                           for j in range(8) for i in range(8)]
                s = sum(samples)
                hv = 0
                for k, g in enumerate(samples):
                    if 64 * g > s:
                        hv |= 1 << k
                if hv >= 1 << 63:       # two's complement into BIGINT
                    hv -= 1 << 64
                hashes.append(hv)
            out = pdf[["doc_id", "pos", "kind", "media_ref"]].copy()
            out["phash"] = pd.Series(hashes, index=pdf.index,
                                     dtype="int64")
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
AUDIO_RATE = 8000     # Hz; 30 ms -> 240 samples/frame
AUDIO_VOICED_AMP = 6000   # peak amplitude of voiced frames
AUDIO_NOISE_AMP = 40      # noise floor of unvoiced frames
VAD_ENERGY_THRESHOLD = 1000   # mean |sample| gate

VAD_SCHEMA = ("doc_id string, pos int, media_ref string, n_frames int, "
              "seg_idx int, start_frame int, end_frame int, "
              "start_ms int, dur_ms int")


def wav_encode(samples: list[int], rate: int = AUDIO_RATE) -> bytes:
    """Real RIFF/WAVE container: 16-bit little-endian PCM mono."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, list[int]]:
    """Parse a real WAV: validate RIFF/WAVE, walk chunks, return
    (sample_rate, samples) for 16-bit PCM mono; rejects other profiles
    loudly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            codec, channels, rate, _, _, depth = struct.unpack(
                "<HHIIHH", body[:16])
            if (codec, channels, depth) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV profile codec={codec} "
                    f"channels={channels} depth={depth}")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def _clip_plan(media_ref: str) -> tuple[int, list[bool]]:
    """(n_frames, per-frame voiced flags) — the deterministic envelope
    the synthesizer renders: clip length = 20 + byte0 % 30 frames,
    frame i voiced iff md5(ref) byte[(i+1) % 16] >= 128 (the rule the
    DuckDB oracle replays nibble-for-nibble)."""
    b = _hashlib_md5(media_ref.encode()).digest()
    n = 20 + b[0] % 30
    return n, [b[(i + 1) % 16] >= 128 for i in range(n)]


def synthesize_wav(media: DataFrame) -> DataFrame:
    """Attach a REAL WAV payload per media ref: render the
    deterministic amplitude envelope as 16-bit PCM (voiced frames get
    a +/-AUDIO_VOICED_AMP triangle wave, unvoiced a noise-floor
    ripple) through the actual encoder. One Arrow crossing."""
    spf = AUDIO_RATE * AUDIO_FRAME_MS // 1000

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ref in pdf["media_ref"]:
                _, voiced = _clip_plan(ref)
                samples: list[int] = []
                for v in voiced:
                    amp = AUDIO_VOICED_AMP if v else AUDIO_NOISE_AMP
                    samples.extend(amp * ((t % 16) - 8) // 8
                                   for t in range(spf))
                payloads.append(wav_encode(samples))
            out = pdf.copy()
            out["content"] = payloads
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in media.schema.fields) + ", content binary"
    return media.mapInPandas(enc, schema=schema)


def vad_segments(media_with_content: DataFrame,
                 decoder: str = "wav") -> DataFrame:
    """Voice-activity segmentation plumbing (audio payloads): decode
    per-frame energies, threshold, and emit one row per maximal voiced
    run — the segmentation stage an ASR/caption pipeline runs before
    transcription, and the second row-exploding Arrow batch shape next
    to sample_frames (a clip fans out to a variable number of
    segments). The decode is REAL: wav_decode parses the RIFF/PCM
    payload and the kernel computes mean-|sample| energy per
    AUDIO_FRAME_MS frame, gated at VAD_ENERGY_THRESHOLD. The
    synthesized envelope puts frame energies at AUDIO_VOICED_AMP/2 vs
    AUDIO_NOISE_AMP/2, so the energy gate reproduces the md5 voicing
    plan exactly and the DuckDB oracle replays the segmentation
    nibble-for-nibble without decoding audio. Segment state is bounded
    by clip length, never the corpus."""
    if decoder != "wav":
        raise NotImplementedError(
            f"decoder={decoder!r}: only the stdlib WAV/PCM decoder is "
            "available in this environment (identical Spark plumbing "
            "for other codecs).")

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "pos", "media_ref",
                                    "n_frames", "seg_idx",
                                    "start_frame", "end_frame")}
            for doc_id, pos, ref, content in zip(
                    pdf["doc_id"], pdf["pos"], pdf["media_ref"],
                    pdf["content"]):
                rate, samples = wav_decode(bytes(content))
                fl = rate * AUDIO_FRAME_MS // 1000
                n = len(samples) // fl
                seg = 0
                start = None
                for i in range(n + 1):
                    voiced = False
                    if i < n:
                        frame = samples[i * fl:(i + 1) * fl]
                        energy = sum(abs(s) for s in frame) // fl
                        voiced = energy > VAD_ENERGY_THRESHOLD
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
