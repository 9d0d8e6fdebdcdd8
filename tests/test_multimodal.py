"""Unit tests: multimodal plumbing (Arrow/mapInPandas path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import multimodal as mm


def _media(rows):
    return rows([(1, b"abcdef"), (2, b""), (3, None)],
                "media_id long, payload binary")


def test_image_features_stub_is_deterministic(rows):
    out = mm.image_features(_media(rows), decode_stub=True)
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["n_bytes"] == 6
    assert got[2]["n_bytes"] == 0
    assert got[3]["n_bytes"] == 0
    assert got[1]["width"] == 7  # 6 % 64 + 1 — stable fake
    assert len(got[1]["feature"]) == 6
    # determinism: second run identical
    again = {r["media_id"]: r for r in
             mm.image_features(_media(rows), decode_stub=True).collect()}
    assert got[1]["mean_byte"] == again[1]["mean_byte"]


def test_image_features_without_stub_raises(rows):
    # the NotImplementedError surfaces wrapped in Spark's PythonException
    with pytest.raises(Exception, match="image codecs not installed"):
        mm.image_features(_media(rows)).collect()


def test_resize_images_stub(rows):
    df = rows([(1, b"x", 640, 480)],
              "media_id long, payload binary, width int, height int")
    out = mm.resize_images(df, 64, 64, decode_stub=True).collect()[0]
    assert (out["width"], out["height"]) == (64, 64)
    with pytest.raises(NotImplementedError):
        mm.resize_images(df, 64, 64)


def test_frame_sample(rows):
    df = rows([(1, 2500), (2, 0)], "media_id long, duration_ms long")
    out = mm.frame_sample(df, every_ms=1000)
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in out.collect())
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]
