"""Multimodal (image/audio/video) column operators — Spark-side plumbing
for binary payloads with typed metadata (beyond-reference surface;
BASELINE.json north star).

Design: media are opaque ``binary`` columns inside a struct-typed
envelope; decode / feature-extract run as Arrow-batched ``mapInPandas``
operators so bytes stream through in columnar batches without JVM<->
Python per-row overhead.  Codecs: PNG and WAV decode/encode are REAL,
implemented on the stdlib alone (``operators.multimodal_codecs`` —
zlib/struct/wave), and baseline-sequential JPEG is REAL via the
pure-numpy codec (``operators.multimodal_jpeg`` — T.81 SOF0 both
directions), so decode -> feature-extract -> resize round-trips
genuinely execute here for PNG and JPEG alike; ``decode_stub=True``
remains available for payloads in formats the container can't decode
(progressive JPEG, WebP, video frames — the swap point for real codec
libs is ``_decode_image_bytes``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata envelope for a media asset
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_byte double, feature array<float>"
)


def _decode_image_bytes(payload: bytes) -> dict:
    """Real decode: PNG via the stdlib codec, baseline-sequential JPEG
    via the pure-numpy codec (``multimodal_jpeg``); remaining formats
    (and non-baseline JPEG modes — progressive, arithmetic, 12-bit)
    raise so callers can quarantine."""
    from bi_etl_and_integration_spark.operators import multimodal_codecs as mc
    from bi_etl_and_integration_spark.operators import multimodal_jpeg as mj
    if mc.is_png(payload or b""):
        img = mc.decode_png(payload)
        mean, feat = mc.image_feature_vector(img)
        return {"width": img.shape[1], "height": img.shape[0],
                "mean_byte": mean, "feature": feat}
    if mj.is_jpeg(payload or b""):
        img = mj.decode_jpeg(payload)   # NotImplementedError on SOF2 etc.
        mean, feat = mc.image_feature_vector(img)
        return {"width": img.shape[1], "height": img.shape[0],
                "mean_byte": mean, "feature": feat}
    raise NotImplementedError(
        "undecodable image format (PNG and baseline JPEG are the "
        "in-container codecs); use decode_stub=True for synthetic "
        "payloads or bring Pillow for the rest")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives stable pseudo-features from
    the raw bytes so tests exercise the full Arrow path."""
    n = len(payload or b"")
    mean = (sum(payload) / n) if n else 0.0
    return {"width": (n % 64) + 1, "height": ((n // 64) % 64) + 1,
            "mean_byte": float(mean),
            "feature": [float((b % 17)) / 16.0 for b in (payload or b"")[:8]]}


def image_features(df: DataFrame, *, payload_col: str = "payload",
                   id_col: str = "media_id",
                   decode_stub: bool = False,
                   batch_hint: int = 1024) -> DataFrame:
    """Decode images and emit per-image features via ``mapInPandas``.

    The iterator contract keeps memory bounded: one Arrow batch of
    payloads in, one pandas frame of features out; Spark handles batch
    sizing (``spark.sql.execution.arrow.maxRecordsPerBatch``)."""
    decode = _fake_decode if decode_stub else _decode_image_bytes

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].values,
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_bytes": [len(p or b"") for p in pdf[payload_col]],
                "mean_byte": [f["mean_byte"] for f in feats],
                "feature": [f["feature"] for f in feats],
            })

    return (df.select(id_col, payload_col)
            .mapInPandas(op, IMAGE_FEATURES_SCHEMA))


def resize_images(df: DataFrame, width: int, height: int, *,
                  payload_col: str = "payload",
                  decode_stub: bool = False) -> DataFrame:
    """Resize: the real path sniffs the container (PNG or baseline
    JPEG), decodes, nearest-neighbor resizes and re-encodes in the
    SAME format, rewriting width/height metadata to match;
    ``decode_stub=True`` passes payloads through and only rewrites
    metadata (for synthetic/undecodable fixtures)."""
    out_schema = df.schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bi_etl_and_integration_spark.operators import (
            multimodal_codecs as mc)
        from bi_etl_and_integration_spark.operators import (
            multimodal_jpeg as mj)

        def one(p: bytes) -> bytes:
            if mc.is_png(p or b""):
                return mc.encode_png(mc.resize_nearest(
                    mc.decode_png(p), width, height))
            if mj.is_jpeg(p or b""):
                return mj.encode_jpeg(mc.resize_nearest(
                    mj.decode_jpeg(p), width, height))
            raise NotImplementedError(
                "undecodable image format (PNG and baseline JPEG are "
                "the in-container codecs)")

        for pdf in batches:
            pdf = pdf.copy()
            if not decode_stub:
                pdf[payload_col] = [one(p) for p in pdf[payload_col]]
            if "width" in pdf:
                pdf["width"] = width
            if "height" in pdf:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(op, out_schema)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, duration_ms long, "
    "rms double, zero_cross_rate double, feature array<float>"
)


def audio_features(df: DataFrame, *, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Decode WAV payloads (stdlib codec — real, not stubbed) and emit
    per-clip features: rms, zero-crossing rate, |amplitude| histogram.
    Same bounded-memory Arrow iterator contract as image_features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bi_etl_and_integration_spark.operators import (
            multimodal_codecs as mc)
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                d = mc.decode_wav(p)
                f = mc.audio_feature_vector(d["samples"])
                rows.append((mid, d["sample_rate"], d["n_channels"],
                             d["duration_ms"], f["rms"],
                             f["zero_cross_rate"], f["feature"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_channels", "duration_ms",
                "rms", "zero_cross_rate", "feature"])

    return (df.select(id_col, payload_col)
            .mapInPandas(op, AUDIO_FEATURES_SCHEMA))


def frame_sample(df: DataFrame, every_ms: int, *,
                 duration_col: str = "duration_ms",
                 id_col: str = "media_id") -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    Pure JVM (sequence + explode) — the downstream frame DECODE is the
    stubbed step, the fan-out itself is real and partition-friendly."""
    return (df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.col(duration_col) - 1, F.lit(0)),
                             F.lit(every_ms))))
        .select(id_col, "frame_ts_ms"))
