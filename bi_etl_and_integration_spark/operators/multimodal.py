"""Multimodal (image/audio/video) column operators — Spark-side plumbing
for binary payloads with typed metadata (beyond-reference surface;
BASELINE.json north star).

Design: media are opaque ``binary`` columns inside a struct-typed
envelope; decode / feature-extract run as Arrow-batched ``mapInPandas``
operators so bytes stream through in columnar batches without JVM<->
Python per-row overhead.  The actual codec calls are STUBBED (image and
audio libraries are not in this container): ``decode_stub=True`` swaps
in a deterministic fake decoder so schema, batching, partitioning and
tests are real end-to-end; a deployment replaces ``_decode_image_bytes``
with Pillow/torchvision and deletes the stub flag.
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
    """REAL decode goes here (Pillow etc.).  Not available in-container."""
    raise NotImplementedError(
        "image codecs not installed in this environment; "
        "use decode_stub=True or install Pillow and replace this function")


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
    """Resize stub: at deploy time the pandas op calls the codec; here
    the stub passes payloads through and rewrites metadata — the plan
    (projection + mapInPandas + schema) is the tested artifact."""
    if not decode_stub:
        raise NotImplementedError("image codecs not installed; "
                                  "decode_stub=True exercises the plumbing")
    out_schema = df.schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if "width" in pdf:
                pdf["width"] = width
            if "height" in pdf:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(op, out_schema)


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
