"""Multimodal (image/audio/video) column operators — Spark plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` passes.  The decode kernels themselves are STUBBED
(``decoder="fake"`` is a deterministic stand-in; ``decoder="real"``
raises ``NotImplementedError``) because no image/audio library ships
in this container — the Spark-side contract (schemas, batch shape,
partitioning) is real and tested.

Scale notes: media rows are large → keep ``spark.sql.files.
maxPartitionBytes`` small for these tables, never ``collect`` them,
and push metadata-only predicates (width/duration/mime) BEFORE the
decode pass so pruning happens at the parquet level.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = bytes
    derived from the id; no media libs involved)."""
    rows = [
        (
            i,
            ["image/png", "image/jpeg", "audio/wav"][i % 3],
            32 + (i % 8) * 16,
            32 + (i % 5) * 16,
            1000 * (1 + i % 7),
            bytes([(i * 7 + j) % 256 for j in range(128)]),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_acc(payload: bytes, dim: int) -> list[int]:
    # Deterministic stand-in for a real decoder: the raw integer
    # accumulator stream (0..996).  Stable across runs/executors, and
    # integer-exact so downstream features can be arranged to have
    # bit-reproducible SQL twins.
    acc, out = 0, []
    for i in range(dim):
        acc = (acc * 31 + payload[i % len(payload)]) % 997
        out.append(acc)
    return out


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    return [a / 997.0 for a in _fake_decode_acc(payload, dim)]


def extract_image_features(
    df: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + featurize image payloads via Arrow-batched mapInPandas.

    ``decoder="real"`` is the integration point for PIL/libvips — not
    available in this container, so it raises ``NotImplementedError``.
    The batch loop below is the real production shape: columnar in,
    columnar out, no per-row Python calls outside the decode kernel.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding requires an image library (PIL/opencv) "
            "not present in this environment; use decoder='fake'"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": feats,
                    "decode_ok": [True] * len(pdf),
                }
            )

    images = df.filter(F.col("mime").startswith("image/"))
    return images.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_id", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    window_samples: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """Windowed audio features (RMS energy + zero-crossing rate per
    fixed sample window) via Arrow-batched ``mapInPandas`` — the
    1-row-in → N-windows-out batch shape of real audio featurization
    (VAD, loudness normalization, silence trimming all start here).

    ``decoder="real"`` is the libsndfile/ffmpeg integration point —
    absent in this container, so it raises ``NotImplementedError``;
    the fake decoder derives a deterministic waveform from the payload
    bytes (centered to [-0.5, 0.5] so zero crossings exist).  The
    window loop is numpy-vectorized per Arrow batch: one reshape +
    one reduction per feature, no per-sample Python.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real audio decoding requires an audio library "
            "(soundfile/ffmpeg) not present in this environment; "
            "use decoder='fake'"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")
    if window_samples < 2:
        raise ValueError("window_samples must be >= 2")

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_win, out_rms, out_zcr = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # fake decode: duration-scaled sample count, ≥1 window.
                # The wave is kept INTEGER-centered (c = 2*acc - 997,
                # odd so never 0, c/1994 == acc/997 - 0.5): the sum of
                # squares is then exact int64 — order-free — and rms
                # needs exactly two IEEE roundings (sqrt, divide) in a
                # fixed order, so any SQL engine reproduces the doubles
                # bit-for-bit.  Float-accumulated variants differ by
                # summation order (numpy pairwise vs SQL fold).
                n = max(window_samples, int(dur) // 50)
                c = (
                    2
                    * np.array(
                        _fake_decode_acc(payload, n), dtype=np.int64
                    )
                    - 997
                )
                n_win = len(c) // window_samples
                w = c[: n_win * window_samples].reshape(
                    n_win, window_samples
                )
                ssq = (w * w).sum(axis=1)  # exact int64
                rms = np.sqrt(ssq / window_samples) / 1994.0
                zcr = (np.diff(np.sign(w), axis=1) != 0).mean(axis=1)
                out_id.extend([mid] * n_win)
                out_win.extend(range(n_win))
                out_rms.extend(np.round(rms, 6))
                out_zcr.extend(np.round(zcr, 6))
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "window_id": out_win,
                    "rms": out_rms,
                    "zcr": out_zcr,
                    "decode_ok": [True] * len(out_id),
                }
            )

    audio = df.filter(F.col("mime").startswith("audio/"))
    return audio.select("media_id", "payload", "duration_ms").mapInPandas(
        batches, AUDIO_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video/audio rows: explode one row per
    sampled timestamp (decode stubbed; the timestamps and row shape are
    the real contract).  Pure Catalyst — sequence + explode."""
    n_frames = F.least(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1, F.lit(max_frames)
    )
    return df.select(
        "media_id",
        "mime",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )
