"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shapes, UDF signatures. The actual media decode is STUBBED: the
image/audio libraries are not in this container, so ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (byte-stats pseudo-pixels) exercises the same
plumbing with the same shapes.

Schema convention:
    media struct<data: binary, meta: struct<kind: string, format: string,
                                            width: int, height: int,
                                            duration_ms: int>>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])
MEDIA_SCHEMA = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic binary media column derived from the id — payload is
    sha256-keyed bytes; metadata typed. Used to test the plumbing."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.when(F.col(id_col) % 2 == 0, "png").otherwise("jpeg").alias("format"),
        (F.col(id_col) % 64 + 16).cast("int").alias("width"),
        (F.col(id_col) % 48 + 16).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return df.withColumn("media", F.struct(payload.alias("data"),
                                           meta.alias("meta")))


def _fake_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: tile the payload digest into an
    (h, w, 3) uint8 array — stands in for a real codec with identical
    downstream shapes."""
    seed = hashlib.sha256(data or b"").digest()
    raw = np.frombuffer(
        (seed * (width * height * 3 // len(seed) + 1))[: width * height * 3],
        dtype=np.uint8)
    return raw.reshape(height, width, 3)


def decode_and_featurize(df: DataFrame, media_col: str = "media",
                         id_col: str = "id", fake: bool = False,
                         resize_to: int = 8) -> DataFrame:
    """Decode -> resize -> feature-extract over ``mapInPandas``.

    Output: (id, width, height, mean_r/g/b double, thumb array<int> of
    resize_to*resize_to grayscale). Arrow-batched; per-image numpy work.
    With fake=False this raises NotImplementedError at executor time —
    the real decoder (PIL/ffmpeg) slots into ``_decode``.
    """

    def _decode(data, w, h):
        if not fake:
            raise NotImplementedError(
                "media codecs not available in this container; "
                "pass fake=True for the deterministic test decoder")
        return _fake_decode(data, w, h)

    out_schema = (f"id bigint, width int, height int, "
                  f"mean_r double, mean_g double, mean_b double, "
                  f"thumb array<int>")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, media in zip(pdf[id_col], pdf[media_col]):
                data, meta = media["data"], media["meta"]
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode(data, w, h)
                # resize: block-mean to resize_to x resize_to (vectorized)
                ys = np.linspace(0, h, resize_to + 1).astype(int)
                xs = np.linspace(0, w, resize_to + 1).astype(int)
                gray = img.mean(axis=2)
                thumb = [
                    int(gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean())
                    for i in range(resize_to) for j in range(resize_to)
                ]
                rows.append((int(rid), w, h,
                             float(img[:, :, 0].mean()),
                             float(img[:, :, 1].mean()),
                             float(img[:, :, 2].mean()),
                             thumb))
            yield pd.DataFrame(rows, columns=["id", "width", "height",
                                              "mean_r", "mean_g", "mean_b",
                                              "thumb"])

    return df.select(id_col, media_col).mapInPandas(fn, out_schema)


def frame_sample_plan(df: DataFrame, media_col: str = "media",
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into the frame
    timestamps that a decoder would extract — JVM-native sequence over
    duration metadata (decode itself is the stub above)."""
    dur = F.col(f"{media_col}.meta.duration_ms")
    return (df.where(F.col(f"{media_col}.meta.kind") == "video")
            .withColumn("frame_ms",
                        F.explode(F.sequence(F.lit(0),
                                             F.greatest(dur - 1, F.lit(0)),
                                             F.lit(every_ms)))))
