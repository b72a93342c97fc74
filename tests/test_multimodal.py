"""Multimodal plumbing tests: binary payload columns through
Arrow-batched mapInPandas feature extraction and Catalyst frame
sampling (SURVEY.md §2.11)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
    extract_image_features,
    make_fake_media,
    sample_frames,
)


def test_fake_media_shape(spark):
    media = make_fake_media(spark, n=30)
    assert media.count() == 30
    row = media.first()
    assert isinstance(row.payload, bytearray | bytes)
    assert len(row.payload) == 128


def test_extract_image_features_deterministic(spark):
    media = make_fake_media(spark, n=30)
    f1 = extract_image_features(media, dim=8)
    rows = {r.media_id: r for r in f1.collect()}
    # only image/* rows pass the metadata pre-filter (no decode wasted)
    assert set(rows) == {i for i in range(30) if i % 3 != 2}
    assert all(len(r.feature) == 8 and r.decode_ok for r in rows.values())
    # deterministic across runs (stable for cluster-wide retries)
    rows2 = {r.media_id: r.feature for r in extract_image_features(media, dim=8).collect()}
    assert {k: list(v) for k, v in rows2.items()} == {
        k: list(r.feature) for k, r in rows.items()
    }


def test_extract_real_decoder_is_explicit_stub(spark):
    media = make_fake_media(spark, n=3)
    with pytest.raises(NotImplementedError):
        extract_image_features(media, decoder="real")
    with pytest.raises(ValueError):
        extract_image_features(media, decoder="libvips")


def test_feature_plan_is_arrow_not_row_python(spark):
    media = make_fake_media(spark, n=6)
    plan = (
        extract_image_features(media, dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_sample_frames_timestamps(spark):
    media = make_fake_media(spark, n=12).filter(F.col("mime") == "audio/wav")
    frames = sample_frames(media, every_ms=500, max_frames=4)
    got = {}
    for r in frames.collect():
        got.setdefault(r.media_id, []).append(r.frame_ts_ms)
    durations = {r.media_id: r.duration_ms for r in media.collect()}
    for mid, ts in got.items():
        expect_n = min(durations[mid] // 500 + 1, 4)
        assert sorted(ts) == [i * 500 for i in range(expect_n)]


def test_extract_audio_features_windows_and_determinism(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        extract_audio_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=12)
    out = extract_audio_features(media, window_samples=32)
    rows = out.collect()
    assert rows, "audio rows expected from every-3rd fake media row"
    # only audio/* rows contribute
    audio_ids = {r.media_id for r in media.filter("mime LIKE 'audio/%'").collect()}
    assert {r.media_id for r in rows} == audio_ids
    # duration-scaled window counts: duration_ms//50 samples / 32 per window
    durs = {r.media_id: r.duration_ms for r in media.collect()}
    import collections
    per = collections.Counter(r.media_id for r in rows)
    for mid, cnt in per.items():
        n = max(32, durs[mid] // 50)
        assert cnt == n // 32
    # deterministic across runs
    again = {(r.media_id, r.window_id): (r.rms, r.zcr) for r in out.collect()}
    first = {(r.media_id, r.window_id): (r.rms, r.zcr) for r in rows}
    assert first == again
    # zcr is a rate in [0, 1]; rms positive for the fake waveform
    assert all(0.0 <= r.zcr <= 1.0 and r.rms > 0 for r in rows)


def test_audio_real_decoder_is_explicit_stub(spark):
    import pytest as _pytest

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        extract_audio_features,
        make_fake_media,
    )

    with _pytest.raises(NotImplementedError):
        extract_audio_features(make_fake_media(spark, 3), decoder="real")


def _ppm_bytes(w, h, pix):
    # binary P6 with a comment line (exercises header comment skip)
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + bytes(pix)


def _wav_bytes(samples, rate=8000, channels=1):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ppm_real_decoder_features(spark):
    """decoder='ppm' parses REAL pixels: a solid-red 2x2 image yields
    exact per-channel means, and a malformed payload is flagged
    decode_ok=False instead of failing the job."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        extract_image_features,
    )

    red = _ppm_bytes(2, 2, [255, 0, 0] * 4)
    rows = [(1, "image/ppm", red), (2, "image/ppm", b"garbage")]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )
    got = {r.media_id: r for r in
           extract_image_features(df, dim=12, decoder="ppm").collect()}
    assert got[1].decode_ok and not got[2].decode_ok
    f = got[1].feature
    assert abs(f[0] - 1.0) < 1e-6      # R mean
    assert abs(f[3] - 0.0) < 1e-6      # G mean
    assert f[1] == 1.0 and f[2] == 1.0  # R min/max
    assert len(f) == 12 and got[2].feature == []


def test_wav_real_decoder_windows(spark):
    """decoder='wav' parses real 16-bit PCM: a +A/-A square wave has
    rms = A/32768 per window and maximal zcr; stereo downmixes."""
    import math

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        extract_audio_features,
    )

    a = 16384
    square = [a if i % 2 == 0 else -a for i in range(8)]
    rows = [(1, "audio/wav", _wav_bytes(square), 0)]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, duration_ms long"
    )
    out = extract_audio_features(df, window_samples=4, decoder="wav").collect()
    assert len(out) == 2  # 8 samples / 4 per window
    for r in out:
        assert abs(r.rms - a / 32768.0) < 1e-6
        assert r.zcr == 1.0  # every adjacent pair flips sign

    # stereo downmix: (L+R)//2
    stereo = [v for s in square for v in (s, s)]
    df2 = spark.createDataFrame(
        [(2, "audio/wav", _wav_bytes(stereo, channels=2), 0)],
        "media_id long, mime string, payload binary, duration_ms long",
    )
    out2 = extract_audio_features(df2, window_samples=4, decoder="wav").collect()
    assert len(out2) == 2
    assert abs(out2[0].rms - a / 32768.0) < 1e-6


def test_image_ahash_fake_integer_threshold(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        _fake_decode_acc,
        image_average_hash,
        make_fake_media,
    )

    media = make_fake_media(spark, n=20)
    rows = {r["media_id"]: r for r in image_average_hash(media, dim=16).collect()}
    assert len(rows) == 20 and all(r["decode_ok"] for r in rows.values())
    # replay the kernel driver-side for one payload
    payload = media.filter("media_id = 7").collect()[0]["payload"]
    acc = _fake_decode_acc(bytes(payload), 16)
    expect = sum(1 << k for k, a in enumerate(acc) if 16 * a > sum(acc))
    assert rows[7]["ahash"] == expect
    assert 0 <= rows[7]["ahash"] < (1 << 16)


def test_image_ahash_identical_payloads_collide(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_average_hash,
    )

    rows = [(1, b"same-bytes-here"), (2, b"same-bytes-here"), (3, b"different!")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["ahash"] for r in image_average_hash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_image_ahash_ppm_decoder_and_malformed(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_average_hash,
    )

    # top half bright, bottom half dark → band bits split; garbage flags
    pix = [255, 255, 255] * 4 + [0, 0, 0] * 4
    rows = [(1, _ppm_bytes(2, 4, pix)), (2, b"garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in image_average_hash(df, dim=12, decoder="ppm").collect()}
    assert out[1]["decode_ok"] and out[1]["ahash"] > 0
    assert not out[2]["decode_ok"] and out[2]["ahash"] == 0


def test_image_ahash_rejects_bad_args(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_average_hash,
        make_fake_media,
    )

    media = make_fake_media(spark, n=2)
    with pytest.raises(NotImplementedError):
        image_average_hash(media, decoder="real")
    with pytest.raises(ValueError):
        image_average_hash(media, decoder="png")
    with pytest.raises(ValueError):
        image_average_hash(media, dim=64)


def test_resize_image_exact_pixels(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        decode_ppm,
        resize_image,
    )

    # 4x2 image with distinct pixels; resize to 2x1 picks columns 0,2
    # of row 0 under the floor mapping src = dst*in//out.
    pix = list(range(4 * 2 * 3))
    df = spark.createDataFrame(
        [(1, _ppm_bytes(4, 2, pix)), (2, b"junk")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_image(df, 2, 1).collect()}
    assert out[1]["decode_ok"] and out[1]["width"] == 2 and out[1]["height"] == 1
    w, h, raster = decode_ppm(bytes(out[1]["payload"]))
    assert (w, h) == (2, 1)
    assert list(raster) == pix[0:3] + pix[6:9]  # pixels (0,0) and (0,2)
    assert not out[2]["decode_ok"] and bytes(out[2]["payload"]) == b""


def test_resize_upscale_repeats_pixels(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        decode_ppm,
        resize_image,
    )

    # 1x1 red pixel upscaled to 2x2 = four red pixels
    df = spark.createDataFrame(
        [(1, _ppm_bytes(1, 1, [200, 10, 30]))], "media_id long, payload binary"
    )
    row = resize_image(df, 2, 2).collect()[0]
    _, _, raster = decode_ppm(bytes(row["payload"]))
    assert list(raster) == [200, 10, 30] * 4


def test_resize_rejects_bad_args(spark):
    import pytest
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        resize_image,
    )

    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        resize_image(df, 2, 2, decoder="real")
    with pytest.raises(ValueError):
        resize_image(df, 0, 2)


def test_resample_audio_exact_samples(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        decode_wav,
        resample_audio,
    )

    # 8 samples at 8000 Hz → 4000 Hz keeps samples 0,2,4,6
    samples = [100, -200, 300, -400, 500, -600, 700, -800]
    df = spark.createDataFrame(
        [(1, _wav_bytes(samples, rate=8000)), (2, b"noise")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resample_audio(df, 4000).collect()}
    assert out[1]["decode_ok"] and out[1]["rate"] == 4000
    rate, got = decode_wav(bytes(out[1]["payload"]))
    assert rate == 4000 and got == [100, 300, 500, 700]
    assert not out[2]["decode_ok"]


def test_resample_audio_upsample_and_identity(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        decode_wav,
        resample_audio,
    )

    samples = [10, 20]
    df = spark.createDataFrame(
        [(1, _wav_bytes(samples, rate=4000))], "media_id long, payload binary"
    )
    # upsample 4000 → 8000: each sample repeats (nearest-neighbor)
    _, up = decode_wav(
        bytes(resample_audio(df, 8000).collect()[0]["payload"])
    )
    assert up == [10, 10, 20, 20]
    # identity rate: samples pass through untouched
    _, same = decode_wav(
        bytes(resample_audio(df, 4000).collect()[0]["payload"])
    )
    assert same == samples


def test_image_dhash_fake_adjacent_compare(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        _fake_decode_acc,
        image_difference_hash,
        make_fake_media,
    )

    media = make_fake_media(spark, n=20)
    rows = {
        r["media_id"]: r
        for r in image_difference_hash(media, dim=16).collect()
    }
    assert len(rows) == 20 and all(r["decode_ok"] for r in rows.values())
    payload = media.filter("media_id = 7").collect()[0]["payload"]
    acc = _fake_decode_acc(bytes(payload), 17)
    expect = sum(1 << k for k in range(16) if acc[k + 1] > acc[k])
    assert rows[7]["dhash"] == expect
    assert 0 <= rows[7]["dhash"] < (1 << 16)


def test_image_dhash_ppm_decoder_and_malformed(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_difference_hash,
    )

    # intensity gradient down the raster -> alternating-free rising bits
    pix = sum(([v, v, v] * 2 for v in (0, 64, 128, 255)), [])
    rows = [(1, _ppm_bytes(2, 4, pix)), (2, b"garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in image_difference_hash(df, dim=6, decoder="ppm").collect()
    }
    assert out[1]["decode_ok"] and out[1]["dhash"] > 0
    assert not out[2]["decode_ok"] and out[2]["dhash"] == 0


def test_image_dhash_brightness_invariance_vs_ahash(spark):
    """dHash's selling point, pinned: a global brightness shift
    changes every cell by the same amount, so adjacent-cell
    COMPARISONS (dHash) are unchanged while the mean THRESHOLD
    (aHash) flips bits for cells near the old mean."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_difference_hash,
    )

    pix = sum(([v, v, v] * 2 for v in (10, 60, 110, 200)), [])
    shifted = [min(255, p + 40) for p in pix]
    rows = [(1, _ppm_bytes(2, 4, pix)), (2, _ppm_bytes(2, 4, shifted))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r["dhash"]
        for r in image_difference_hash(df, dim=6, decoder="ppm").collect()
    }
    assert out[1] == out[2]


def test_phash_brightness_invariant_ppm(spark):
    """pHash bits compare non-DC DCT coefficients to their median —
    both a uniform brightness SHIFT (changes DC only) and a contrast
    SCALE (scales coeffs and median together) must leave the hash
    unchanged, while a structurally different image must differ."""
    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_perceptual_hash,
    )

    w = h = 16
    # generic (pseudo-random) luminance: no symmetric structure, so no
    # DCT coefficient ties at the median — the shift perturbation is
    # ~1e-12 while coefficient-median gaps are O(1)
    base = [((x * 37 + y * 101 + x * y * 13) % 149) % 176 for y in range(h) for x in range(w)]
    shifted = [v + 40 for v in base]  # uniform, never clips (max 215)
    checker = [255 if (x + y) % 2 == 0 else 0 for y in range(h) for x in range(w)]

    def rgb(lum):
        return [c for v in lum for c in (v, v, v)]

    rows = [
        (0, bytes(_ppm_bytes(w, h, rgb(base)))),
        (1, bytes(_ppm_bytes(w, h, rgb(shifted)))),
        (2, bytes(_ppm_bytes(w, h, rgb(checker)))),
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r.media_id: (r.phash, r.decode_ok)
        for r in image_perceptual_hash(df, grid=8, decoder="ppm").collect()
    }
    assert all(ok for _, ok in got.values())
    assert got[0][0] == got[1][0]  # brightness shift: same hash
    assert got[0][0] != got[2][0]  # different structure: different hash

    # fake path is deterministic and integer-driven
    f2 = image_perceptual_hash(df, grid=8, decoder="fake")
    a = {r.media_id: r.phash for r in f2.collect()}
    b = {r.media_id: r.phash for r in f2.collect()}
    assert a == b

    with pytest.raises(NotImplementedError):
        image_perceptual_hash(df, decoder="real")


def test_audio_spectral_centroid_pure_tone(spark):
    """A pure cosine at DFT bin k must put (nearly) all power in bin
    k: centroid == k exactly, spread == 0."""
    import math

    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        audio_spectral_centroid,
    )

    ws = 32
    tone_k = 4
    samples = [
        int(round(10000 * math.cos(2 * math.pi * tone_k * t / ws)))
        for t in range(ws * 2)
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(1, _wav_bytes(samples))], schema)
    rows = audio_spectral_centroid(
        df, window_samples=ws, n_bins=8, decoder="wav"
    ).collect()
    assert len(rows) == 2  # two full windows
    for r in rows:
        assert r.decode_ok
        assert abs(r.centroid - tone_k) < 1e-6
        assert r.spread < 1e-3

    with pytest.raises(NotImplementedError):
        audio_spectral_centroid(df, decoder="real")


def test_audio_zcr_rms_known_waveforms(spark):
    """Hand-checkable waveforms through the REAL WAV decode path: a
    constant signal has zero crossings and RMS = |c|; a strict
    alternating ±A signal crosses on every adjacent pair (31 per
    32-sample window) with RMS = A; a square wave at bin 4 crosses
    8 times per window.  decoder='real' stays an explicit stub."""
    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        audio_zcr_rms,
    )

    ws = 32
    const = [500] * ws
    alt = [700 if t % 2 == 0 else -700 for t in range(ws)]
    square = [300 if (t // 4) % 2 == 0 else -300 for t in range(ws)]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, _wav_bytes(const)),
            (2, _wav_bytes(alt)),
            (3, _wav_bytes(square)),
        ],
        schema,
    )
    got = {
        r.media_id: r
        for r in audio_zcr_rms(df, window_samples=ws, decoder="wav").collect()
    }
    assert got[1].n_crossings == 0 and abs(got[1].rms - 500.0) < 1e-9
    assert got[2].n_crossings == ws - 1 and abs(got[2].rms - 700.0) < 1e-9
    # square wave flips sign at t = 4, 8, ..., 28 -> 7 crossings
    assert got[3].n_crossings == 7 and abs(got[3].rms - 300.0) < 1e-9
    assert all(r.decode_ok for r in got.values())

    with pytest.raises(NotImplementedError):
        audio_zcr_rms(df, decoder="real")


def test_image_edge_stats_step_edge_and_flat(spark):
    """Hand-checkable rasters through the REAL PPM decode path: a
    constant image has zero Sobel response everywhere (0 edge pixels,
    mean gradient 0); a hard vertical black→white step at the image
    center lights up exactly the two interior columns adjacent to the
    step (12 of 36 interior pixels at |g| = 4 — full Sobel weight):
    gx there is ±4 in normalized-luma units, everywhere else 0."""
    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_edge_stats,
    )

    g = 8
    flat = _ppm_bytes(g, g, [128, 128, 128] * (g * g))
    step_pix = []
    for y in range(g):
        for x in range(g):
            v = 0 if x < g // 2 else 255
            step_pix += [v, v, v]
    step = _ppm_bytes(g, g, step_pix)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(1, flat), (2, step)], schema)
    # threshold in normalized-luma units: gx at the step is ±4.0
    got = {
        r.media_id: r
        for r in image_edge_stats(df, grid=g, threshold=1, decoder="ppm").collect()
    }
    assert got[1].n_edge_pixels == 0
    assert abs(got[1].mean_gradient) < 1e-12
    # columns x=3 and x=4 of the 6 interior columns, all 6 interior
    # rows -> 12 edge pixels; |g| = 4 at each -> mean = 12*4/36
    assert got[2].n_edge_pixels == 12
    assert abs(got[2].mean_gradient - 12 * 4.0 / 36) < 1e-9
    assert all(r.decode_ok for r in got.values())

    import pytest as _p

    with _p.raises(NotImplementedError):
        image_edge_stats(df, decoder="real")


def test_image_contrast_entropy_known_rasters(spark):
    """Hand-checkable rasters through the REAL PPM decode path: a
    solid image has zero RMS contrast and zero histogram entropy
    (one occupied bin); a half-black/half-white image has RMS
    contrast 0.5 and entropy ln 2 (two equal bins).  decoder='real'
    stays an explicit stub."""
    import math

    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        image_contrast_stats,
    )

    w = h = 8
    solid = [128, 128, 128] * (w * h)
    # left half black, right half white -> cells 0.0 and 1.0
    half = [
        c
        for y in range(h)
        for x in range(w)
        for c in ((0, 0, 0) if x < w // 2 else (255, 255, 255))
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, _ppm_bytes(w, h, solid)),
            (2, _ppm_bytes(w, h, half)),
            (3, b"garbage"),
        ],
        schema,
    )
    got = {
        r.media_id: r
        for r in image_contrast_stats(df, grid=8, decoder="ppm").collect()
    }
    assert got[1].decode_ok and got[2].decode_ok
    assert abs(got[1].rms_contrast) < 1e-12
    assert abs(got[1].hist_entropy) < 1e-12
    assert abs(got[2].rms_contrast - 0.5) < 1e-12
    assert abs(got[2].hist_entropy - math.log(2)) < 1e-12
    assert not got[3].decode_ok

    import pytest

    with pytest.raises(NotImplementedError):
        image_contrast_stats(df, decoder="real")


def test_audio_spectral_flatness_tone_vs_noise(spark):
    """A pure cosine at DFT bin k concentrates power in one bin →
    flatness near 0; an equal-power mix of all 8 bins spreads power
    evenly → flatness near 1.  Real WAV decode path; decoder='real'
    stays an explicit stub."""
    import math

    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        audio_spectral_flatness,
    )

    ws = 32
    tone = [
        int(round(10000 * math.cos(2 * math.pi * 4 * t / ws)))
        for t in range(ws)
    ]
    mix = [
        int(
            round(
                sum(
                    1200 * math.cos(2 * math.pi * k * t / ws)
                    for k in range(1, 9)
                )
            )
        )
        for t in range(ws)
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, _wav_bytes(tone)), (2, _wav_bytes(mix))], schema
    )
    got = {
        r.media_id: r
        for r in audio_spectral_flatness(
            df, window_samples=ws, n_bins=8, decoder="wav"
        ).collect()
    }
    assert got[1].decode_ok and got[2].decode_ok
    assert got[1].flatness < 0.01  # tonal: one dominant bin
    assert got[2].flatness > 0.95  # equal-power mix: flat spectrum
    assert got[1].total_power > 0 and got[2].total_power > 0

    import pytest

    with pytest.raises(NotImplementedError):
        audio_spectral_flatness(df, decoder="real")


def test_video_shot_boundaries_shape_and_determinism(spark):
    """Each payload yields exactly n_frames−1 transitions with exact
    integer energies, bit-identical across runs; an all-identical
    frame stream is impossible for the accumulator decoder, so the
    pin checks the hold/cut split is a function of the threshold;
    decoder='real' stays an explicit ffmpeg stub."""
    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        video_shot_boundaries,
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, b"first clip payload"), (2, b"second, longer clip payload")],
        schema,
    )
    out = video_shot_boundaries(df, n_frames=8, grid=4)
    rows = out.collect()
    assert len(rows) == 2 * 7
    assert all(r.decode_ok for r in rows)
    assert all(r.diff_energy >= 0 for r in rows)
    # deterministic across executions
    again = out.collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # the cut flag is exactly energy > threshold
    hi = video_shot_boundaries(df, n_frames=8, grid=4, threshold=0)
    assert all(r.is_boundary for r in hi.collect())

    import pytest

    with pytest.raises(NotImplementedError):
        video_shot_boundaries(df, decoder="real")


def test_audio_spectral_flatness_short_audio_sentinel(spark):
    """ADVICE r9 #4: a successfully-decoded payload shorter than one
    window must emit a sentinel row (decode_ok=True, NULL flatness),
    not silently vanish — distinguishable from both decode failure
    (decode_ok=False) and a real all-zero window (flatness 0.0)."""
    import pyspark.sql.types as T

    from aws_glue_jobs_incremental_database_etl_spark.operators.multimodal import (
        audio_spectral_flatness,
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, _wav_bytes([100, -100, 50, -50])),  # 4 samples < 32
            (2, b"not a wav at all"),  # decode failure
        ],
        schema,
    )
    got = {
        r.media_id: r
        for r in audio_spectral_flatness(
            df, window_samples=32, n_bins=8, decoder="wav"
        ).collect()
    }
    assert set(got) == {1, 2}  # the short payload is NOT dropped
    assert got[1].decode_ok is True and got[1].flatness is None
    assert got[1].window_id == 0 and got[1].total_power == 0.0
    assert got[2].decode_ok is False and got[2].flatness == 0.0
