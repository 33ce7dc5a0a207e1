"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode step is REAL for two modalities, pure stdlib (no PIL/ffmpeg
in this container):

* image/png  — PNG signature + IHDR chunk parse (width, height, bit
  depth, color type) with CRC verification; IDAT is not rasterized.
* audio/wav  — RIFF/WAVE parse via stdlib ``wave`` (channels, sample
  rate, sample width, frame count → duration).
* video/mp4  — container-level only: the ftyp box (major brand) is
  parsed, but frame decode needs a codec stack this container lacks,
  so ``decode_ok`` is False for video by design (documented stub).

Spark-side design is the real point at 100 TB: binary payloads stay in
one Arrow-batched pass, the feature output prunes the payload column so
downstream stages never shuffle the heavy bytes, and media blobs being
large/size-skewed reuse the same salted-repartition story as HTML
extraction (operators/extract.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = "media_id bigint, media_type string, payload binary"
FEATURES_DDL = (
    "media_id bigint, media_type string, n_bytes bigint, sha1 string, "
    "decode_ok boolean, width int, height int, bit_depth int, "
    "color_type int, sample_rate int, n_channels int, n_samples bigint, "
    "duration_s double, container_brand string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_EMPTY = {
    "width": None, "height": None, "bit_depth": None, "color_type": None,
    "sample_rate": None, "n_channels": None, "n_samples": None,
    "duration_s": None, "container_brand": None,
}


def decode_png(payload: bytes) -> dict | None:
    """Parse PNG signature + IHDR (the spec's first chunk): returns
    width/height/bit_depth/color_type, or None if not a valid PNG.
    CRC of the IHDR chunk is verified (zlib.crc32 per the PNG spec)."""
    if len(payload) < 33 or not payload.startswith(_PNG_SIG):
        return None
    (length,) = struct.unpack(">I", payload[8:12])
    if payload[12:16] != b"IHDR" or length != 13:
        return None
    ihdr = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF != crc:
        return None
    width, height, bit_depth, color_type = struct.unpack(">IIBB", ihdr[:10])
    if width == 0 or height == 0:
        return None
    out = dict(_EMPTY)
    out.update(width=width, height=height, bit_depth=bit_depth,
               color_type=color_type)
    return out


def decode_wav(payload: bytes) -> dict | None:
    """Parse a RIFF/WAVE header with stdlib ``wave``: sample rate,
    channels, frame count, duration. Returns None on malformed input."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            out = dict(_EMPTY)
            out.update(
                sample_rate=rate,
                n_channels=w.getnchannels(),
                n_samples=n,
                duration_s=round(n / rate, 6) if rate else None,
            )
            return out
    except (wave.Error, EOFError, struct.error):
        return None


def parse_mp4_ftyp(payload: bytes) -> dict | None:
    """Container-level MP4 parse: the leading ftyp box's major brand.
    Frame/codec decode is intentionally NOT implemented (no codec stack
    in this container) — callers get decode_ok=False for video."""
    if len(payload) < 12:
        return None
    (size,) = struct.unpack(">I", payload[0:4])
    if payload[4:8] != b"ftyp" or size < 12 or size > len(payload):
        return None
    out = dict(_EMPTY)
    out["container_brand"] = payload[8:12].decode("ascii", "replace")
    return out


def decode_media(media_type: str, payload: bytes) -> tuple[bool, dict]:
    """(decode_ok, features) for one blob. Video is container-parse
    only → decode_ok False even when the ftyp box is readable."""
    if media_type == "image/png":
        f = decode_png(payload)
        return (True, f) if f else (False, dict(_EMPTY))
    if media_type == "audio/wav":
        f = decode_wav(payload)
        return (True, f) if f else (False, dict(_EMPTY))
    f = parse_mp4_ftyp(payload)
    return False, (f if f else dict(_EMPTY))


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for mid, mtype, payload in zip(
            pdf["media_id"], pdf["media_type"], pdf["payload"]
        ):
            payload = bytes(payload or b"")
            ok, feats = decode_media(mtype, payload)
            rows.append({
                "media_id": mid,
                "media_type": mtype,
                "n_bytes": len(payload),
                "sha1": hashlib.sha1(payload).hexdigest(),
                "decode_ok": ok,
                **feats,
            })
        yield pd.DataFrame(rows)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_id, media_type, payload) → fixed-width features.

    Arrow-batched mapInPandas; the payload column is pruned out of the
    result, so downstream stages never re-shuffle the heavy bytes.
    """
    return media.select("media_id", "media_type", "payload").mapInPandas(
        _feature_batches, FEATURES_DDL
    )


# ---- deterministic synthesis (test fixture; real, decodable bytes) ----
#
# Sized so every decoded feature is an analytic function of doc_id and
# therefore DuckDB-oracle-checkable:
#   png: width = 1 + id%64, height = 1 + id%48, 8-bit grayscale,
#        IDAT stored (zlib level 0) → n_bytes = 68 + height*(1+width)
#   wav: mono 16-bit, rate = 8000 + (id%5)*1000, frames = 400 + id%100
#        → n_bytes = 44 + 2*frames (stdlib wave header is 44 bytes)
#   mp4: 16-byte ftyp('isom') box + utf-8 text → n_bytes = 16 + len(text)

def synth_png(doc_id: int) -> bytes:
    width = 1 + doc_id % 64
    height = 1 + doc_id % 48
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    raw = b"".join(
        b"\x00" + bytes((doc_id + x + y) % 256 for x in range(width))
        for y in range(height)
    )
    idat = zlib.compress(raw, 0)  # stored blocks → size is analytic
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def synth_wav(doc_id: int) -> bytes:
    rate = 8000 + (doc_id % 5) * 1000
    n_frames = 400 + doc_id % 100
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", ((doc_id * 131 + i * 17) % 2048) - 1024)
                for i in range(n_frames)
            )
        )
    return buf.getvalue()


def synth_mp4(doc_id: int, text: str) -> bytes:
    body = text.encode("utf-8")
    return struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", doc_id & 0xFFFFFFFF) + body


def _synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            kind = doc_id % 3
            if kind == 0:
                mtype, payload = "image/png", synth_png(doc_id)
            elif kind == 1:
                mtype, payload = "audio/wav", synth_wav(doc_id)
            else:
                mtype, payload = "video/mp4", synth_mp4(doc_id, text)
            rows.append(
                {"media_id": doc_id, "media_type": mtype, "payload": payload}
            )
        yield pd.DataFrame(rows)


def synth_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic REAL media blobs from documents: valid PNG (IHDR +
    stored-IDAT), valid WAV (stdlib wave), and an ftyp-prefixed opaque
    video blob — every decoded feature is an analytic function of
    doc_id, so the end-to-end decode is oracle-checkable."""
    return documents.select("doc_id", "text").mapInPandas(
        _synth_batches, MEDIA_DDL
    )


# ---- resize / frame-sample stages (brief: multimodal transform ops) ----

def decode_png_pixels(payload: bytes) -> tuple[int, int, list[bytes]] | None:
    """Decode an 8-bit grayscale PNG with filter-0 scanlines (the shape
    this module synthesizes) to (width, height, rows). Returns None for
    other color types / filters — honestly partial, the way a pure-
    stdlib decoder must be."""
    meta = decode_png(payload)
    if not meta or meta["bit_depth"] != 8 or meta["color_type"] != 0:
        return None
    w, h = meta["width"], meta["height"]
    # concatenate IDAT chunks
    pos, idat = 33, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8:pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = 1 + w
    if len(raw) != stride * h:
        return None
    rows = []
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        if line[0] != 0:  # only filter type 0 supported
            return None
        rows.append(line[1:])
    return w, h, rows


def resize_png(payload: bytes, max_side: int) -> bytes | None:
    """REAL nearest-neighbor downscale of a decodable grayscale PNG so
    max(width, height) <= max_side; re-encoded with stored-IDAT (same
    analytic size law as synth_png). Returns None if undecodable."""
    decoded = decode_png_pixels(payload)
    if decoded is None:
        return None
    w, h, rows = decoded
    m = max(w, h)
    if m <= max_side:
        nw, nh = w, h
        out_rows = rows
    else:
        nw = max(1, w * max_side // m)
        nh = max(1, h * max_side // m)
        out_rows = [
            bytes(rows[y * h // nh][x * w // nw] for x in range(nw))
            for y in range(nh)
        ]
    ihdr = struct.pack(">IIBBBBB", nw, nh, 8, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + r for r in out_rows)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 0)) + chunk(b"IEND", b""))


RESIZE_DDL = (
    "media_id bigint, resize_ok boolean, width int, height int, "
    "new_width int, new_height int, n_bytes bigint"
)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """image/png rows → real nearest-neighbor downscale; output keeps
    only metadata + resized size (payload pruned from the result, same
    heavy-bytes policy as feature extraction)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                meta = decode_png(payload)
                resized = resize_png(payload, max_side)
                if meta is None or resized is None:
                    rows.append({
                        "media_id": mid, "resize_ok": False, "width": None,
                        "height": None, "new_width": None,
                        "new_height": None, "n_bytes": None,
                    })
                    continue
                new_meta = decode_png(resized)
                rows.append({
                    "media_id": mid, "resize_ok": True,
                    "width": meta["width"], "height": meta["height"],
                    "new_width": new_meta["width"],
                    "new_height": new_meta["height"],
                    "n_bytes": len(resized),
                })
            yield pd.DataFrame(rows)

    return (
        media.where(F.col("media_type") == "image/png")
        .select("media_id", "payload")
        .mapInPandas(batches, RESIZE_DDL)
    )


FRAMES_DDL = (
    "media_id bigint, media_type string, frames_ok boolean, "
    "n_frames int, frame_bytes bigint"
)


def sample_frames(media: DataFrame, every_n: int = 100) -> DataFrame:
    """Frame/sample extraction stage.

    * audio/wav — REAL: every ``every_n``-th PCM sample re-packed
      (stdlib wave), n_frames = ceil(samples / every_n).
    * image/png — the image is its own single frame.
    * video/mp4 — STUB: real frame decode needs a codec stack this
      container lacks; clearly marked, frames_ok=False.
    The Spark plumbing (Arrow batches, payload pruned from output,
    typed schema) is real for all three.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(payload or b"")
                ok, n, fb = False, 0, 0
                if mtype == "audio/wav":
                    feats = decode_wav(payload)
                    if feats is not None:
                        n = -(-feats["n_samples"] // every_n)
                        fb = n * 2  # 16-bit mono samples
                        ok = True
                elif mtype == "image/png":
                    if decode_png(payload) is not None:
                        n, fb, ok = 1, len(payload), True
                else:
                    # video frame decode: intentionally unimplemented
                    # (no codec stack); plumbing verified, compute stub
                    ok = False
                rows.append({
                    "media_id": mid, "media_type": mtype, "frames_ok": ok,
                    "n_frames": n, "frame_bytes": fb,
                })
            yield pd.DataFrame(rows)

    return media.select("media_id", "media_type", "payload").mapInPandas(
        batches, FRAMES_DDL
    )


# ---- fused media audit (one pass over the synthesized assets) ----

MEDIA_AUDIT_DDL = (
    "media_id bigint, media_type string, n_bytes bigint, decode_ok boolean, "
    "width int, height int, sample_rate int, n_samples bigint, "
    "duration_s double, resize_ok boolean, new_width int, new_height int, "
    "resized_bytes bigint, frames_ok boolean, n_frames int, "
    "frame_bytes bigint, pdf_ok boolean, n_pdf_pages int, pdf_text_len int, "
    "pdf_text_md5 string"
)


def media_audit(
    documents: DataFrame, max_side: int = 32, every_n: int = 100
) -> DataFrame:
    """ONE-pass media audit: synthesize each doc's asset and run the
    feature / resize / frame-sample / PDF-text stages on it inside a
    single ``mapInArrow`` batch loop — row-for-row identical (values,
    column order, null pattern) to the 4-stage composition

        extract_media_features(synth) LEFT JOIN resize_images(synth)
        LEFT JOIN sample_frames(synth) LEFT JOIN extract_pdf_text(pdfs)

    on media_id (pinned by tests/test_operators.py::
    test_media_audit_matches_stage_joins). The per-stage operators
    above remain the public API; this is the audit-query plan shape:
    the staged form synthesized the asset table FOUR times (one
    mapInPandas per stage) and paid three media_id shuffles just to
    re-pack per-asset rows the map pass already had — the fused pass is
    zero-shuffle, zero-join, one Python crossing (guide §4.1/§2.4), and
    at 100 TB it is the same "every decision is per-asset → never
    shuffle the bytes" layout the module docstring already mandates.
    Non-png rows carry NULL resize columns exactly like the left-join
    miss; the pdf text md5 is hashlib.md5 over UTF-8 bytes — the same
    function as the JVM ``md5(text)``.
    """
    import pyarrow as pa

    from .pdftext import extract_text_from_pdf

    def audit_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..sources.pdfgen import synth_pdf, synth_pdf_objstm

        schema = pa.schema([
            pa.field("media_id", pa.int64()),
            pa.field("media_type", pa.string()),
            pa.field("n_bytes", pa.int64()),
            pa.field("decode_ok", pa.bool_()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("sample_rate", pa.int32()),
            pa.field("n_samples", pa.int64()),
            pa.field("duration_s", pa.float64()),
            pa.field("resize_ok", pa.bool_()),
            pa.field("new_width", pa.int32()),
            pa.field("new_height", pa.int32()),
            pa.field("resized_bytes", pa.int64()),
            pa.field("frames_ok", pa.bool_()),
            pa.field("n_frames", pa.int32()),
            pa.field("frame_bytes", pa.int64()),
            pa.field("pdf_ok", pa.bool_()),
            pa.field("n_pdf_pages", pa.int32()),
            pa.field("pdf_text_len", pa.int32()),
            pa.field("pdf_text_md5", pa.string()),
        ])
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            cols: dict[str, list] = {f.name: [] for f in schema}
            for doc_id, text in zip(ids, texts):
                doc_id = int(doc_id)
                kind = doc_id % 3
                if kind == 0:
                    mtype, payload = "image/png", synth_png(doc_id)
                elif kind == 1:
                    mtype, payload = "audio/wav", synth_wav(doc_id)
                else:
                    mtype, payload = "video/mp4", synth_mp4(doc_id, text)
                ok, feats = decode_media(mtype, payload)
                cols["media_id"].append(doc_id)
                cols["media_type"].append(mtype)
                cols["n_bytes"].append(len(payload))
                cols["decode_ok"].append(ok)
                cols["width"].append(feats["width"])
                cols["height"].append(feats["height"])
                cols["sample_rate"].append(feats["sample_rate"])
                cols["n_samples"].append(feats["n_samples"])
                cols["duration_s"].append(feats["duration_s"])
                # resize stage: png rows only (left-join miss -> NULLs)
                if mtype == "image/png":
                    meta = decode_png(payload)
                    resized = resize_png(payload, max_side)
                    if meta is None or resized is None:
                        cols["resize_ok"].append(False)
                        cols["new_width"].append(None)
                        cols["new_height"].append(None)
                        cols["resized_bytes"].append(None)
                    else:
                        new_meta = decode_png(resized)
                        cols["resize_ok"].append(True)
                        cols["new_width"].append(new_meta["width"])
                        cols["new_height"].append(new_meta["height"])
                        cols["resized_bytes"].append(len(resized))
                else:
                    cols["resize_ok"].append(None)
                    cols["new_width"].append(None)
                    cols["new_height"].append(None)
                    cols["resized_bytes"].append(None)
                # frame/sample stage (sample_frames semantics verbatim)
                f_ok, n, fb = False, 0, 0
                if mtype == "audio/wav":
                    wfeats = decode_wav(payload)
                    if wfeats is not None:
                        n = -(-wfeats["n_samples"] // every_n)
                        fb = n * 2
                        f_ok = True
                elif mtype == "image/png":
                    if decode_png(payload) is not None:
                        n, fb, f_ok = 1, len(payload), True
                cols["frames_ok"].append(f_ok)
                cols["n_frames"].append(n)
                cols["frame_bytes"].append(fb)
                # PDF stage (synthesize_pdfs producer rotation verbatim)
                if doc_id % 4 == 3:
                    pdf = synth_pdf_objstm(doc_id, text)
                else:
                    pdf = synth_pdf(
                        doc_id, text,
                        columns=2 if doc_id % 4 == 2 else 1,
                        cid=doc_id % 4 == 1,
                    )
                try:
                    pdf_text, np_ = extract_text_from_pdf(pdf)
                    p_ok = True
                except Exception:
                    pdf_text, np_, p_ok = "", 0, False
                cols["pdf_ok"].append(p_ok)
                cols["n_pdf_pages"].append(np_)
                cols["pdf_text_len"].append(len(pdf_text))
                cols["pdf_text_md5"].append(
                    hashlib.md5(pdf_text.encode("utf-8")).hexdigest()
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], f.type) for f in schema], schema=schema
            )

    return documents.select("doc_id", "text").mapInArrow(
        audit_batches, MEDIA_AUDIT_DDL
    )
