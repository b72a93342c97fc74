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


# ------------------------------------------------- real decoders (stdlib)
#
# No PIL/opencv/libsndfile ships in this container, but two formats
# are parseable with nothing beyond the standard library: binary PPM
# (P6) images and PCM WAV audio.  ``decoder="ppm"`` / ``decoder="wav"``
# are REAL decoders — header parse, raster/sample extraction, feature
# math over actual pixel/sample values — so the mapInPandas plumbing is
# exercised end-to-end on genuine media bytes, while ``decoder="real"``
# remains the integration point for full-format libraries.


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6): returns (width, height, rgb_raster).
    Raises ValueError on malformed input — no library involved."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace/comment
    # separated, then a single whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = payload[pos : pos + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    return w, h, raster


def ppm_features(payload: bytes, dim: int) -> list[float]:
    """Features from REAL pixels: per-channel mean/min/max (9 values)
    then mean luma over ``dim - 9`` equal row bands — a deterministic,
    resolution-independent signature of the image content."""
    w, h, raster = decode_ppm(payload)
    n = w * h
    out = []
    for ch in range(3):
        vals = raster[ch::3]
        out += [sum(vals) / (255.0 * n), min(vals) / 255.0, max(vals) / 255.0]
    bands = max(dim - len(out), 1)
    for b in range(bands):
        r0, r1 = h * b // bands, max(h * (b + 1) // bands, h * b // bands + 1)
        seg = raster[3 * w * r0 : 3 * w * r1]
        out.append(sum(seg) / (255.0 * len(seg)))
    return out[:dim] + [0.0] * max(dim - len(out), 0)


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a PCM WAV (RIFF, 16-bit mono/stereo): returns
    (sample_rate, mono_samples).  stdlib ``struct`` only."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    raw = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
    if channels == 2:  # downmix: average L/R (truncating, deterministic)
        raw = [(raw[i] + raw[i + 1]) // 2 for i in range(0, len(raw) - 1, 2)]
    return rate, list(raw)


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
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; "
            "decoder='ppm' is a REAL stdlib decoder for binary PPM, "
            "decoder='fake' a deterministic stand-in"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")

    def one(payload: bytes) -> tuple[list[float], bool]:
        if decoder == "fake":
            return _fake_decode(payload, dim), True
        try:
            return ppm_features(payload, dim), True
        except (ValueError, IndexError):
            return [], False  # malformed media: flagged, never fatal

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": [d[0] for d in decoded],
                    "decode_ok": [d[1] for d in decoded],
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
            "full-format audio decoding requires an audio library "
            "(soundfile/ffmpeg) not present in this environment; "
            "decoder='wav' is a REAL stdlib decoder for 16-bit PCM "
            "WAV, decoder='fake' a deterministic stand-in"
        )
    if decoder not in ("fake", "wav"):
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
                if decoder == "wav":
                    try:
                        _, samples = decode_wav(payload)
                    except (ValueError, IndexError):
                        continue  # malformed media: skipped, never fatal
                    c = np.array(samples, dtype=np.int64)
                    norm = 32768.0
                else:
                    n = max(window_samples, int(dur) // 50)
                    c = (
                        2
                        * np.array(
                            _fake_decode_acc(payload, n), dtype=np.int64
                        )
                        - 997
                    )
                    norm = 1994.0
                n_win = len(c) // window_samples
                w = c[: n_win * window_samples].reshape(
                    n_win, window_samples
                )
                ssq = (w * w).sum(axis=1)  # exact int64
                rms = np.sqrt(ssq / window_samples) / norm
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


def image_average_hash(
    df: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Perceptual average-hash per image → ``(media_id, ahash,
    decode_ok)``: decode, reduce to ``dim`` intensity cells, set bit
    ``k`` iff cell ``k`` is above the mean cell — the classic aHash
    near-duplicate signature (identical hash ⇒ near-dup candidate;
    band the bits for Hamming-tolerant matching, exactly like SimHash
    banding in ``operators/dedup.py``).

    ``decoder='fake'`` thresholds the deterministic integer
    accumulator stream with EXACT integer arithmetic
    (``dim·acc_k > Σacc`` avoids a float mean entirely), so the hash
    is engine-reproducible and the gate query carries a full SQL
    oracle.  ``decoder='ppm'`` thresholds real per-band pixel means
    from the stdlib PPM decoder.  Arrow-batched mapInPandas, map-only;
    the downstream bucket group-by is one hash-keyed shuffle.
    """
    if decoder == "real":
        raise NotImplementedError(
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; use "
            "decoder='ppm' (real stdlib PPM decode) or 'fake'"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")
    if not 1 <= dim <= 63:
        raise ValueError("dim must be in [1, 63] (hash packs into a long)")

    def one(payload: bytes) -> tuple[int, bool]:
        if decoder == "fake":
            acc = _fake_decode_acc(payload, dim)
            total = sum(acc)
            h = 0
            for k, a in enumerate(acc):
                if dim * a > total:
                    h |= 1 << k
            return h, True
        try:
            feats = ppm_features(payload, dim)
        except (ValueError, IndexError):
            return 0, False
        mean = sum(feats) / len(feats)
        h = 0
        for k, v in enumerate(feats):
            if v > mean:
                h |= 1 << k
        return h, True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashed = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [h for h, _ in hashed],
                    "decode_ok": [ok for _, ok in hashed],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def image_difference_hash(
    df: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Perceptual difference-hash per image → ``(media_id, dhash,
    decode_ok)``: decode, reduce to ``dim + 1`` intensity cells, set
    bit ``k`` iff cell ``k+1`` > cell ``k`` — the gradient-direction
    signature (dHash) that survives global brightness/contrast shifts
    aHash's mean threshold is sensitive to; running BOTH and
    intersecting buckets is the standard high-precision image-dedup
    recipe (cites ``image_average_hash``; same banding story as
    SimHash).

    ``decoder='fake'`` compares the deterministic integer accumulator
    stream directly — adjacent-cell comparisons need no mean at all,
    so the hash is pure integer arithmetic and the gate query carries
    a full SQL oracle.  ``decoder='ppm'`` compares real per-band
    pixel means from the stdlib PPM decoder.  Arrow-batched
    mapInPandas, map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; use "
            "decoder='ppm' (real stdlib PPM decode) or 'fake'"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")
    if not 1 <= dim <= 63:
        raise ValueError("dim must be in [1, 63] (hash packs into a long)")

    def one(payload: bytes) -> tuple[int, bool]:
        if decoder == "fake":
            acc = _fake_decode_acc(payload, dim + 1)
            h = 0
            for k in range(dim):
                if acc[k + 1] > acc[k]:
                    h |= 1 << k
            return h, True
        try:
            feats = ppm_features(payload, dim + 1)
        except (ValueError, IndexError):
            return 0, False
        h = 0
        for k in range(dim):
            if feats[k + 1] > feats[k]:
                h |= 1 << k
        return h, True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashed = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [h for h, _ in hashed],
                    "decode_ok": [ok for _, ok in hashed],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def resize_image(
    df: DataFrame, out_w: int, out_h: int, decoder: str = "ppm"
) -> DataFrame:
    """REAL image resize (nearest-neighbor) over binary PPM payloads →
    ``(media_id, width, height, payload, decode_ok)`` where payload is
    the re-encoded resized PPM — the normalization step every
    multimodal training pipeline runs before feature extraction.

    Nearest-neighbor with the standard floor mapping
    ``src = (dst·in_dim) div out_dim`` on actual decoded pixels —
    stdlib only, so the kernel is REAL (not stubbed) and, because the
    mapping is pure integer arithmetic over payload bytes, the gate
    query's SQL oracle can replay it byte-for-byte.  ``decoder='real'``
    stays the PIL/libvips integration point for compressed formats.
    Arrow-batched mapInPandas, map-only; malformed payloads flag
    ``decode_ok=false`` with an empty payload.
    """
    if decoder == "real":
        raise NotImplementedError(
            "compressed-format resize requires an image library "
            "(PIL/opencv) not present in this environment; "
            "decoder='ppm' resizes real binary-PPM pixels"
        )
    if decoder != "ppm":
        raise ValueError(f"unknown decoder: {decoder}")
    if out_w < 1 or out_h < 1:
        raise ValueError("output dimensions must be >= 1")

    def one(payload: bytes) -> tuple[bytes, bool]:
        try:
            w, h, raster = decode_ppm(payload)
        except (ValueError, IndexError):
            return b"", False
        out = bytearray()
        for y in range(out_h):
            sy = y * h // out_h
            for x in range(out_w):
                sx = x * w // out_w
                base = 3 * (sy * w + sx)
                out += raster[base : base + 3]
        return b"P6\n%d %d\n255\n" % (out_w, out_h) + bytes(out), True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "payload": [p for p, _ in resized],
                    "decode_ok": [ok for _, ok in resized],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def ppm_channel_sums(df: DataFrame) -> DataFrame:
    """Exact integer per-channel byte sums of PPM payloads →
    ``(media_id, r_sum, g_sum, b_sum, n_pixels)`` — the integer-exact
    verification signal for resize/decode round-trips (sums of actual
    raster bytes, no floats anywhere)."""

    def one(payload: bytes):
        try:
            w, h, raster = decode_ppm(payload)
        except (ValueError, IndexError):
            return 0, 0, 0, 0
        return (
            sum(raster[0::3]),
            sum(raster[1::3]),
            sum(raster[2::3]),
            w * h,
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sums = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "r_sum": [s[0] for s in sums],
                    "g_sum": [s[1] for s in sums],
                    "b_sum": [s[2] for s in sums],
                    "n_pixels": [s[3] for s in sums],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def encode_wav(rate: int, samples: list, channels: int = 1) -> bytes:
    """Encode 16-bit PCM mono WAV bytes — the stdlib inverse of
    ``decode_wav`` (struct only)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_audio(
    df: DataFrame, out_rate: int, decoder: str = "wav"
) -> DataFrame:
    """REAL audio resample (nearest-neighbor sample pick) over 16-bit
    PCM WAV payloads → ``(media_id, rate, payload, decode_ok)`` with
    payload re-encoded at ``out_rate`` — the normalization step before
    any audio featurization (ASR pipelines standardize to 16 kHz the
    same way; production uses windowed-sinc, this is the exact-
    arithmetic baseline).

    Output sample ``i`` picks input sample ``i·in_rate div out_rate``
    (``n_out = n·out_rate div in_rate``) — pure integer arithmetic
    over real decoded samples, so the gate query's SQL oracle replays
    it exactly.  ``decoder='real'`` remains the ffmpeg/soundfile
    integration point.  Arrow-batched mapInPandas, map-only.
    """
    if decoder == "real":
        raise NotImplementedError(
            "compressed-format resampling requires an audio library "
            "(soundfile/ffmpeg) not present in this environment; "
            "decoder='wav' resamples real 16-bit PCM samples"
        )
    if decoder != "wav":
        raise ValueError(f"unknown decoder: {decoder}")
    if out_rate < 1:
        raise ValueError("out_rate must be >= 1")

    def one(payload: bytes) -> tuple[int, bytes, bool]:
        try:
            rate, samples = decode_wav(payload)
        except (ValueError, IndexError, KeyError):
            return 0, b"", False
        if rate == out_rate:
            resampled = samples
        else:
            n_out = len(samples) * out_rate // rate
            resampled = [
                samples[i * rate // out_rate] for i in range(n_out)
            ]
        return out_rate, encode_wav(out_rate, resampled), True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("rate", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rate": [r for r, _, _ in rs],
                    "payload": [p for _, p, _ in rs],
                    "decode_ok": [ok for _, _, ok in rs],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def wav_sample_stats(df: DataFrame) -> DataFrame:
    """Integer-exact WAV verification signal → ``(media_id, rate,
    n_samples, sample_sum)``: sums of actual decoded int16 samples,
    no floats — the audio twin of ``ppm_channel_sums``."""

    def one(payload: bytes):
        try:
            rate, samples = decode_wav(payload)
        except (ValueError, IndexError, KeyError):
            return 0, 0, 0
        return rate, len(samples), sum(samples)

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rate": [r for r, _, _ in rs],
                    "n_samples": [n for _, n, _ in rs],
                    "sample_sum": [s for _, _, s in rs],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def text_to_wav_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic gate-media builder: a mono 8 kHz WAV whose 96
    samples are the little-endian char pairs of repeat(md5(text), 6)
    — ASCII-only, so the oracle can recompute every sample as
    ``ascii(c_lo) + 256·ascii(c_hi)`` without parsing RIFF."""
    import hashlib
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf[text_col]:
                m = (hashlib.md5(t.encode()).hexdigest() * 6).encode()
                samples = struct.unpack(f"<{len(m) // 2}h", m)
                payloads.append(encode_wav(8000, list(samples)))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(
        batches, schema=out_schema
    )


def _phash_weights(grid: int = 8, block: int = 4) -> list[tuple[int, int, list[float]]]:
    """Literal DCT-II weight vectors for the low-frequency ``block``×
    ``block`` corner (DC excluded), index order i = grid*y + x.  Both
    the Python kernel and the generated SQL twin consume THESE floats
    in THIS order, so the multiply-add chains are bit-identical."""
    import math

    out = []
    for u in range(block):
        for v in range(block):
            if u == 0 and v == 0:
                continue
            w = [
                math.cos(math.pi * (2 * x + 1) * u / (2 * grid))
                * math.cos(math.pi * (2 * y + 1) * v / (2 * grid))
                for y in range(grid)
                for x in range(grid)
            ]
            out.append((u, v, w))
    return out


def image_perceptual_hash(
    df: DataFrame, grid: int = 8, decoder: str = "fake"
) -> DataFrame:
    """Perceptual DCT hash (pHash) per image → ``(media_id, phash,
    decode_ok)``: decode to a ``grid``×``grid`` intensity raster, take
    the 2-D DCT-II, keep the low-frequency 4×4 corner minus DC (15
    coefficients — the spectrum's shape, not its pixels), set bit k
    iff coefficient k exceeds the median of the 15.  pHash survives
    resize/blur/compression that flip aHash/dHash bits, because those
    operations perturb high frequencies the block discards; together
    the three hashes are the standard image-dedup precision ladder.

    ``decoder='fake'`` rasterizes the deterministic accumulator
    stream; every multiply-add runs in index order over the SAME
    literal cosine weights the generated SQL twin embeds, so the gate
    replays bit-for-bit.  ``decoder='ppm'`` rasterizes real pixels
    (stdlib PPM) into grid-band lumas.  ``decoder='real'`` stays the
    PIL/opencv integration point.  Arrow-batched mapInPandas,
    map-only — the 100 TB shape is a scan."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; use "
            "decoder='ppm' (real stdlib PPM decode) or 'fake'"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")
    weights = _phash_weights(grid)

    def _cells_ppm(payload: bytes) -> list[float]:
        w, h, raster = decode_ppm(payload)
        cells = []
        for gy in range(grid):
            r0, r1 = h * gy // grid, max(h * (gy + 1) // grid, h * gy // grid + 1)
            for gx in range(grid):
                c0, c1 = w * gx // grid, max(w * (gx + 1) // grid, w * gx // grid + 1)
                tot = cnt = 0
                for y in range(r0, min(r1, h)):
                    row = raster[3 * w * y : 3 * w * (y + 1)]
                    seg = row[3 * c0 : 3 * c1]
                    tot += sum(seg)
                    cnt += len(seg)
                cells.append(tot / (255.0 * cnt))
        return cells

    def one(payload: bytes) -> tuple[int, bool]:
        if decoder == "fake":
            cells = [float(a) for a in _fake_decode_acc(payload, grid * grid)]
            ok = True
        else:
            try:
                cells = _cells_ppm(payload)
                ok = True
            except (ValueError, IndexError, ZeroDivisionError):
                return 0, False
        coeffs = []
        for _, _, w in weights:
            acc = 0.0
            for i in range(grid * grid):  # index order = the SQL chain
                acc += cells[i] * w[i]
            coeffs.append(acc)
        med = sorted(coeffs)[len(coeffs) // 2]
        h = 0
        for k, c in enumerate(coeffs):
            if c > med:
                h |= 1 << k
        return h, ok

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("phash", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashed = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [h for h, _ in hashed],
                    "decode_ok": [ok for _, ok in hashed],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def _dft_weights(window: int = 32, n_bins: int = 8) -> list[tuple[int, list[float], list[float]]]:
    """Literal DFT cos/sin weight vectors per frequency bin (k =
    1..n_bins) over one window — shared verbatim by the Python kernel
    and the generated SQL twin (same floats, same summation order)."""
    import math

    out = []
    for k in range(1, n_bins + 1):
        cosw = [math.cos(-2 * math.pi * k * t / window) for t in range(window)]
        sinw = [math.sin(-2 * math.pi * k * t / window) for t in range(window)]
        out.append((k, cosw, sinw))
    return out


def audio_spectral_centroid(
    df: DataFrame,
    window_samples: int = 32,
    n_bins: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Windowed spectral centroid + spread per audio payload →
    ``(media_id, window_id, centroid, spread, decode_ok)``: per
    ``window_samples`` frame, an exact DFT over ``n_bins`` bins
    (literal cos/sin weights, summed in sample order), power
    P_k = A_k² + B_k², centroid = Σk·P/ΣP (the "brightness" feature
    every audio classifier starts from), spread = √(Σ(k−c)²·P/ΣP).

    ``decoder='fake'`` derives samples from the deterministic
    accumulator stream (c = 2·acc − 997, the audio-gate convention);
    ``decoder='wav'`` decodes real PCM via the stdlib parser;
    ``decoder='real'`` remains the ffmpeg/libsndfile integration
    point.  mapInPandas, 1-row-in → N-windows-out, map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format audio decoding requires ffmpeg/libsndfile, "
            "not present in this environment; use decoder='wav' "
            "(real stdlib PCM WAV decode) or 'fake'"
        )
    if decoder not in ("fake", "wav"):
        raise ValueError(f"unknown decoder: {decoder}")
    weights = _dft_weights(window_samples, n_bins)

    def windows_of(payload: bytes, duration_ms) -> list[list[float]]:
        if decoder == "fake":
            n = max(
                window_samples,
                (int(duration_ms) // 50) if duration_ms is not None else 64,
            )
            acc = _fake_decode_acc(payload, n)
            samples = [float(2 * a - 997) for a in acc]
        else:
            _, raw = decode_wav(payload)
            samples = [float(s) for s in raw]
        return [
            samples[s : s + window_samples]
            for s in range(0, len(samples) - window_samples + 1, window_samples)
        ]

    def one(payload: bytes, duration_ms):
        rows = []
        try:
            wins = windows_of(payload, duration_ms)
        except (ValueError, IndexError):
            return [(0, 0.0, 0.0, False)]
        for wid, w in enumerate(wins):
            ps = []
            for k, cosw, sinw in weights:
                a = 0.0
                b = 0.0
                for t in range(window_samples):  # sample order = SQL chain
                    a += w[t] * cosw[t]
                    b += w[t] * sinw[t]
                ps.append((k, a * a + b * b))
            ptot = 0.0
            for _, p in ps:
                ptot += p
            if ptot <= 0.0:
                rows.append((wid, 0.0, 0.0, True))
                continue
            cen = 0.0
            for k, p in ps:
                cen += k * p
            cen /= ptot
            var = 0.0
            for k, p in ps:
                var += (k - cen) * (k - cen) * p
            rows.append((wid, cen, (var / ptot) ** 0.5, True))
        return rows

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("window_id", T.IntegerType()),
            T.StructField("centroid", T.DoubleType()),
            T.StructField("spread", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, wids, cens, sprs, oks = [], [], [], [], []
            durs = (
                pdf["duration_ms"]
                if "duration_ms" in pdf.columns
                else [None] * len(pdf)
            )
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], durs):
                for wid, cen, spr, ok in one(payload, dur):
                    mids.append(mid)
                    wids.append(wid)
                    cens.append(cen)
                    sprs.append(spr)
                    oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int32"),
                    "centroid": pd.Series(cens, dtype="float64"),
                    "spread": pd.Series(sprs, dtype="float64"),
                    "decode_ok": pd.Series(oks, dtype="bool"),
                }
            )

    cols = ["media_id", "payload"] + (
        ["duration_ms"] if "duration_ms" in df.columns else []
    )
    return df.select(*cols).mapInPandas(batches, schema=out_schema)


def audio_zcr_rms(
    df: DataFrame,
    window_samples: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """Windowed zero-crossing rate + RMS energy per audio payload →
    ``(media_id, window_id, n_crossings, rms, decode_ok)``: per
    ``window_samples`` frame, ZCR counts strict sign changes
    (sₜ·sₜ₋₁ < 0) and RMS = √(Σs²/w) — the two cheapest features in
    every voice-activity / silence-trim / speech-vs-music front-end
    (ZCR tracks spectral brightness without a DFT; RMS is loudness).
    Exact integer sums into one final sqrt.

    Decoder contract matches :func:`audio_spectral_centroid`:
    ``'fake'`` = the deterministic accumulator stream (c = 2·acc −
    997, the audio-gate convention), ``'wav'`` = the stdlib PCM
    parser, ``'real'`` = the documented ffmpeg/libsndfile
    integration point.  mapInPandas, map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format audio decoding requires ffmpeg/libsndfile, "
            "not present in this environment; use decoder='wav' "
            "(real stdlib PCM WAV decode) or 'fake'"
        )
    if decoder not in ("fake", "wav"):
        raise ValueError(f"unknown decoder: {decoder}")

    def windows_of(payload: bytes, duration_ms) -> list[list[int]]:
        if decoder == "fake":
            n = max(
                window_samples,
                (int(duration_ms) // 50) if duration_ms is not None else 64,
            )
            acc = _fake_decode_acc(payload, n)
            samples = [2 * a - 997 for a in acc]
        else:
            _, raw = decode_wav(payload)
            samples = list(raw)
        return [
            samples[s : s + window_samples]
            for s in range(0, len(samples) - window_samples + 1, window_samples)
        ]

    def one(payload: bytes, duration_ms):
        try:
            wins = windows_of(payload, duration_ms)
        except (ValueError, IndexError):
            return [(0, 0, 0.0, False)]
        rows = []
        for wid, w in enumerate(wins):
            zc = 0
            ss = 0
            for t in range(window_samples):
                ss += w[t] * w[t]
                if t > 0 and w[t] * w[t - 1] < 0:
                    zc += 1
            rows.append((wid, zc, (ss / float(window_samples)) ** 0.5, True))
        return rows

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("window_id", T.IntegerType()),
            T.StructField("n_crossings", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, wids, zcs, rmss, oks = [], [], [], [], []
            durs = (
                pdf["duration_ms"]
                if "duration_ms" in pdf.columns
                else [None] * len(pdf)
            )
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], durs):
                for wid, zc, rms, ok in one(payload, dur):
                    mids.append(mid)
                    wids.append(wid)
                    zcs.append(zc)
                    rmss.append(rms)
                    oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int32"),
                    "n_crossings": pd.Series(zcs, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "decode_ok": pd.Series(oks, dtype="bool"),
                }
            )

    cols = ["media_id", "payload"] + (
        ["duration_ms"] if "duration_ms" in df.columns else []
    )
    return df.select(*cols).mapInPandas(batches, schema=out_schema)


def image_edge_stats(
    df: DataFrame,
    grid: int = 8,
    threshold: int = 250_000,
    decoder: str = "fake",
) -> DataFrame:
    """Sobel edge statistics per image → ``(media_id, n_edge_pixels,
    mean_gradient, decode_ok)``: decode to a ``grid``×``grid``
    intensity raster, apply the 3×3 Sobel pair at every interior
    pixel (gx = right column minus left, centers doubled; gy
    transposed), count pixels whose squared magnitude exceeds
    ``threshold`` and average the magnitude — the blur/blank/
    synthetic-image detector every image-quality filter starts from
    (near-zero edge density = flat or heavily blurred payload).

    Decoder contract matches the hash family: ``'fake'`` rasterizes
    the deterministic accumulator stream (integer cells → gx/gy and
    their squares are EXACT integers; the only floating step is one
    sqrt per pixel, summed in row-major order — the generated SQL
    twin replays the identical chain), ``'ppm'`` rasterizes real
    pixels via the stdlib parser, ``'real'`` stays the PIL/opencv
    integration point.  mapInPandas, map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; use "
            "decoder='ppm' (real stdlib PPM decode) or 'fake'"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")

    def _cells_ppm(payload: bytes) -> list[float]:
        w, h, raster = decode_ppm(payload)
        cells = []
        for gy_ in range(grid):
            r0 = h * gy_ // grid
            r1 = max(h * (gy_ + 1) // grid, r0 + 1)
            for gx_ in range(grid):
                c0 = w * gx_ // grid
                c1 = max(w * (gx_ + 1) // grid, c0 + 1)
                tot = cnt = 0
                for y in range(r0, min(r1, h)):
                    seg = raster[3 * w * y : 3 * w * (y + 1)][3 * c0 : 3 * c1]
                    tot += sum(seg)
                    cnt += len(seg)
                cells.append(tot / (255.0 * cnt))
        return cells

    def one(payload: bytes) -> tuple[int, float, bool]:
        if decoder == "fake":
            cells = list(_fake_decode_acc(payload, grid * grid))
        else:
            try:
                cells = _cells_ppm(payload)
            except (ValueError, IndexError, ZeroDivisionError):
                return 0, 0.0, False
        c = lambda y, x: cells[y * grid + x]
        n_edge = 0
        tot = 0.0
        n_int = (grid - 2) * (grid - 2)
        for y in range(1, grid - 1):  # row-major = the SQL chain order
            for x in range(1, grid - 1):
                gx = (
                    c(y - 1, x + 1) + 2 * c(y, x + 1) + c(y + 1, x + 1)
                ) - (c(y - 1, x - 1) + 2 * c(y, x - 1) + c(y + 1, x - 1))
                gy = (
                    c(y + 1, x - 1) + 2 * c(y + 1, x) + c(y + 1, x + 1)
                ) - (c(y - 1, x - 1) + 2 * c(y - 1, x) + c(y - 1, x + 1))
                m2 = gx * gx + gy * gy
                if m2 > threshold:
                    n_edge += 1
                tot += m2 ** 0.5
        return n_edge, tot / n_int, True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_edge_pixels", T.IntegerType()),
            T.StructField("mean_gradient", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_edge_pixels": pd.Series(
                        [r[0] for r in res], dtype="int32"
                    ),
                    "mean_gradient": pd.Series(
                        [r[1] for r in res], dtype="float64"
                    ),
                    "decode_ok": pd.Series(
                        [r[2] for r in res], dtype="bool"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def image_contrast_stats(
    df: DataFrame,
    grid: int = 8,
    bins: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """RMS contrast + intensity-histogram entropy per image →
    ``(media_id, rms_contrast, hist_entropy, decode_ok)``: decode to
    a ``grid``×``grid`` intensity raster, RMS contrast =
    √(Σ(cᵢ−c̄)²/n) (the flat/washed-out detector — near-zero means a
    blank or single-tone payload) and Shannon entropy of the
    ``bins``-bucket intensity histogram (low = posterized/synthetic,
    high = natural tonal range).  Together with edge density they
    triage decode junk before any perceptual hash is trusted.

    Decoder contract matches the hash family: ``'fake'`` rasterizes
    the deterministic accumulator stream (integer cells 0..996 —
    the bin index (c·bins)//997 and the cell sum are EXACT integers;
    mean, squared deviations, and entropy terms accumulate in
    index/bin order so the generated SQL twin is bit-identical
    before the final ROUND), ``'ppm'`` rasterizes real pixels via
    the stdlib parser, ``'real'`` stays the PIL/opencv integration
    point.  mapInPandas, map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format image decoding requires an image library "
            "(PIL/opencv) not present in this environment; use "
            "decoder='ppm' (real stdlib PPM decode) or 'fake'"
        )
    if decoder not in ("fake", "ppm"):
        raise ValueError(f"unknown decoder: {decoder}")
    import math

    n = grid * grid

    def _cells_ppm(payload: bytes) -> list[float]:
        w, h, raster = decode_ppm(payload)
        cells = []
        for gy_ in range(grid):
            r0 = h * gy_ // grid
            r1 = max(h * (gy_ + 1) // grid, r0 + 1)
            for gx_ in range(grid):
                c0 = w * gx_ // grid
                c1 = max(w * (gx_ + 1) // grid, c0 + 1)
                tot = cnt = 0
                for y in range(r0, min(r1, h)):
                    seg = raster[3 * w * y : 3 * w * (y + 1)][3 * c0 : 3 * c1]
                    tot += sum(seg)
                    cnt += len(seg)
                cells.append(tot / (255.0 * cnt))
        return cells

    def one(payload: bytes) -> tuple[float, float, bool]:
        if decoder == "fake":
            cells = _fake_decode_acc(payload, n)
            hist = [0] * bins
            s = 0
            for c in cells:  # index order = the SQL chain order
                s += c
                hist[(c * bins) // 997] += 1
        else:
            try:
                cells = _cells_ppm(payload)
            except (ValueError, IndexError, ZeroDivisionError):
                return 0.0, 0.0, False
            hist = [0] * bins
            s = 0.0
            for c in cells:
                s += c
                hist[min(bins - 1, int(c * bins))] += 1
        mean = s / n
        ssd = 0.0
        for c in cells:  # index order = the SQL chain order
            ssd += (c - mean) * (c - mean)
        ent = 0.0
        for cnt in hist:  # bin order = the SQL chain order
            if cnt > 0:
                p = cnt / n
                ent -= p * math.log(p)
        return (ssd / n) ** 0.5, ent, True

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("rms_contrast", T.DoubleType()),
            T.StructField("hist_entropy", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rms_contrast": pd.Series(
                        [r[0] for r in res], dtype="float64"
                    ),
                    "hist_entropy": pd.Series(
                        [r[1] for r in res], dtype="float64"
                    ),
                    "decode_ok": pd.Series(
                        [r[2] for r in res], dtype="bool"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def audio_spectral_flatness(
    df: DataFrame,
    window_samples: int = 32,
    n_bins: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Windowed spectral flatness (Wiener entropy) per audio payload
    → ``(media_id, window_id, flatness, total_power, decode_ok)``:
    per frame the same exact literal-weight DFT as the centroid gate,
    then flatness = geometric mean / arithmetic mean of the bin
    powers — →1 for noise-like frames, →0 for tonal ones (the
    noise/music/speech triage feature; centroid says WHERE the energy
    sits, flatness says how PEAKED it is).  Log/exp/power sums
    accumulate in bin order so the generated SQL twin matches
    bit-for-bit before the final ROUND.  Decoder contract matches the
    centroid gate (``'fake'`` accumulator samples, ``'wav'`` stdlib
    PCM, ``'real'`` the ffmpeg integration point).  mapInPandas,
    map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "full-format audio decoding requires ffmpeg/libsndfile, "
            "not present in this environment; use decoder='wav' "
            "(real stdlib PCM WAV decode) or 'fake'"
        )
    if decoder not in ("fake", "wav"):
        raise ValueError(f"unknown decoder: {decoder}")
    import math

    weights = _dft_weights(window_samples, n_bins)

    def windows_of(payload: bytes, duration_ms) -> list[list[float]]:
        if decoder == "fake":
            n = max(
                window_samples,
                (int(duration_ms) // 50) if duration_ms is not None else 64,
            )
            acc = _fake_decode_acc(payload, n)
            samples = [float(2 * a - 997) for a in acc]
        else:
            _, raw = decode_wav(payload)
            samples = [float(s) for s in raw]
        return [
            samples[s : s + window_samples]
            for s in range(0, len(samples) - window_samples + 1, window_samples)
        ]

    def one(payload: bytes, duration_ms):
        rows = []
        try:
            wins = windows_of(payload, duration_ms)
        except (ValueError, IndexError):
            return [(0, 0.0, 0.0, False)]
        if not wins:
            # Successfully-decoded audio shorter than one window
            # (ADVICE r9 #4): emit a sentinel so the media_id is not
            # silently absent — decode_ok=True + NULL flatness
            # distinguishes short-but-valid from decode failure.
            return [(0, None, 0.0, True)]
        for wid, w in enumerate(wins):
            ps = []
            for k, cosw, sinw in weights:
                a = 0.0
                b = 0.0
                for t in range(window_samples):  # sample order = SQL
                    a += w[t] * cosw[t]
                    b += w[t] * sinw[t]
                ps.append(a * a + b * b)
            ptot = 0.0
            for p in ps:  # bin order = the SQL chain order
                ptot += p
            if any(p <= 0.0 for p in ps):
                rows.append((wid, 0.0, ptot, True))
                continue
            lg = 0.0
            for p in ps:  # bin order = the SQL chain order
                lg += math.log(p)
            rows.append(
                (wid, math.exp(lg / n_bins) / (ptot / n_bins), ptot, True)
            )
        return rows

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("window_id", T.IntegerType()),
            T.StructField("flatness", T.DoubleType()),
            T.StructField("total_power", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, wids, fls, pws, oks = [], [], [], [], []
            durs = (
                pdf["duration_ms"]
                if "duration_ms" in pdf.columns
                else [None] * len(pdf)
            )
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], durs):
                for wid, fl, pw, ok in one(payload, dur):
                    mids.append(mid)
                    wids.append(wid)
                    fls.append(fl)
                    pws.append(pw)
                    oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int32"),
                    # nullable Float64: the short-audio sentinel's
                    # None must arrive as SQL NULL, not NaN
                    "flatness": pd.array(fls, dtype="Float64"),
                    "total_power": pd.Series(pws, dtype="float64"),
                    "decode_ok": pd.Series(oks, dtype="bool"),
                }
            )

    cols = ["media_id", "payload"] + (
        ["duration_ms"] if "duration_ms" in df.columns else []
    )
    return df.select(*cols).mapInPandas(batches, schema=out_schema)


def video_shot_boundaries(
    df: DataFrame,
    n_frames: int = 8,
    grid: int = 4,
    threshold: int = 2_650_000,
    decoder: str = "fake",
) -> DataFrame:
    """Shot-boundary detection per video payload → ``(media_id,
    frame_idx, diff_energy, is_boundary, decode_ok)``: decode
    ``n_frames`` consecutive ``grid``×``grid`` intensity rasters and
    score each transition by its frame-difference energy
    Σ(cellₜ − cellₜ₋₁)² — the first feature of every shot/scene
    segmenter (a cut spikes the energy, a hold keeps it near the
    sensor-noise floor).  ``threshold`` defaults to the expected
    energy of two INDEPENDENT uniform rasters (16·2σ², σ² ≈ 997²/12)
    — transitions above it look like cuts, below like continuity.

    Decoder contract matches the image family: ``'fake'`` slices one
    deterministic accumulator stream into frames (all-integer cells →
    the energies are EXACT integers and the generated SQL twin
    replays them bit-for-bit), ``'real'`` stays the ffmpeg
    integration point (frame extraction + real rasters feed the same
    per-transition fold).  mapInPandas, 1-row-in → (n_frames−1)-out,
    map-only."""
    if decoder == "real":
        raise NotImplementedError(
            "video frame decoding requires ffmpeg, not present in "
            "this environment; use decoder='fake'"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")
    cells_per_frame = grid * grid

    def one(payload: bytes):
        cells = _fake_decode_acc(payload, n_frames * cells_per_frame)
        rows = []
        for t in range(1, n_frames):
            prev = cells[(t - 1) * cells_per_frame : t * cells_per_frame]
            cur = cells[t * cells_per_frame : (t + 1) * cells_per_frame]
            e = 0
            for a, b in zip(prev, cur):  # cell order = SQL chain order
                e += (b - a) * (b - a)
            rows.append((t, e, e > threshold))
        return rows

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("diff_energy", T.LongType()),
            T.StructField("is_boundary", T.BooleanType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, idxs, es, bs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, e, b in one(payload):
                    mids.append(mid)
                    idxs.append(idx)
                    es.append(e)
                    bs.append(b)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "diff_energy": pd.Series(es, dtype="int64"),
                    "is_boundary": pd.Series(bs, dtype="bool"),
                    "decode_ok": pd.Series([True] * len(mids), dtype="bool"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )
