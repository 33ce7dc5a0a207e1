"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The image/audio codec libraries are not available in this container,
so the *decode* step is stubbed behind ``decode_enabled()`` with a
clearly-marked deterministic fake — but everything Spark-side is real
and tested: the binary schema, the batch shapes, the UDF signatures,
and the partitioning story (media blobs are large and size-skewed, so
the same salted repartition as HTML extraction applies).

Production swap-in: replace ``_fake_decode`` with PIL/ffmpeg calls;
nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = "media_id bigint, media_type string, payload binary, width int, height int"
FEATURES_DDL = (
    "media_id bigint, media_type string, n_bytes bigint, sha1 string, "
    "feat_dim int, feature_0 double, feature_1 double, decode_ok boolean"
)


def decode_enabled() -> bool:
    """True when a real codec stack (PIL / ffmpeg) is importable."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """DETERMINISTIC FAKE decode: stands in for pixel decoding.

    Real implementation raises the bar, not the plumbing:
        raise NotImplementedError("image decode requires PIL/ffmpeg")
    The fake derives two stable 'features' from the payload digest so
    the pipeline shape (binary → fixed-width features) is testable.
    """
    digest = hashlib.sha1(payload).digest()
    return (
        int.from_bytes(digest[:4], "big") / 2**32,
        int.from_bytes(digest[4:8], "big") / 2**32,
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
            "sha1": pdf["payload"].map(
                lambda b: hashlib.sha1(b or b"").hexdigest()
            ),
        }
        feats = pdf["payload"].map(lambda b: _fake_decode(b or b""))
        out["feat_dim"] = 2
        out["feature_0"] = feats.map(lambda t: t[0])
        out["feature_1"] = feats.map(lambda t: t[1])
        out["decode_ok"] = True
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_id, media_type, payload, ...) → fixed-width features.

    Arrow-batched mapInPandas; the payload column is pruned out of the
    result, so downstream stages never re-shuffle the heavy bytes.
    """
    return media.select("media_id", "media_type", "payload").mapInPandas(
        _feature_batches, FEATURES_DDL
    )


def synth_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic opaque media blobs from documents (test fixture):
    payload = utf-8 text bytes prefixed with a fake magic header."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.concat(
            F.lit(b"\x89FAKE"), F.encode(F.col("text"), "utf-8")
        ).alias("payload"),
        (F.col("doc_id") % 1920).cast("int").alias("width"),
        (F.col("doc_id") % 1080).cast("int").alias("height"),
    )
