"""Sketch mergeability: per-slice Bloom/CMS filters fold into exactly
the filter a single whole-corpus build produces — the property that
makes them distributed- and incremental-native — plus round-trip
persistence, the incremental-decontamination patterns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.functions.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)
from aws_glue_jobs_incremental_database_etl_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _bits(bloom):
    return {(r["word"], r["bits"]) for r in bloom.collect()}


def test_bloom_merge_equals_whole_build(spark):
    all_keys = [f"k{i}" for i in range(300)]
    a = spark.createDataFrame([(s,) for s in all_keys[:120]], "s string")
    b = spark.createDataFrame([(s,) for s in all_keys[120:]], "s string")
    whole = bloom_build(
        spark.createDataFrame([(s,) for s in all_keys], "s string"), "s", m=512, k=4
    )
    merged = bloom_merge(
        bloom_build(a, "s", m=512, k=4), bloom_build(b, "s", m=512, k=4)
    )
    assert _bits(whole) == _bits(merged)


def test_cms_merge_equals_whole_build(spark):
    rows = [(f"k{i % 13}",) for i in range(400)]
    whole = cms_build(
        spark.createDataFrame(rows, "s string"), "s", d=3, w=64
    )
    merged = cms_merge(
        cms_build(spark.createDataFrame(rows[:150], "s string"), "s", d=3, w=64),
        cms_build(spark.createDataFrame(rows[150:], "s string"), "s", d=3, w=64),
    )
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_incremental_bloom_roundtrip(spark, tmp_path):
    """The incremental-decontamination pattern: run 1 persists its
    filter; run 2 merges new keys in and probes without ever
    rescanning run 1's corpus."""
    loc = str(tmp_path / "bloom")
    day1 = spark.createDataFrame([("bad1",), ("bad2",)], "s string")
    bloom_build(day1, "s", m=1024, k=5).write.parquet(loc)

    day2 = spark.createDataFrame([("bad3",)], "s string")
    merged = bloom_merge(
        spark.read.parquet(loc), bloom_build(day2, "s", m=1024, k=5)
    )
    probe = spark.createDataFrame(
        [("bad1",), ("bad3",), ("clean",)], "s string"
    )
    got = {
        r["s"]: r["bloom_hit"]
        for r in bloom_probe(probe, "s", merged, m=1024, k=5).collect()
    }
    assert got["bad1"] and got["bad3"] and not got["clean"]


def test_merge_empty_args_raise(spark):
    with pytest.raises(ValueError):
        bloom_merge()
    with pytest.raises(ValueError):
        cms_merge()


def test_cms_merged_estimates_still_upper_bound(spark):
    rows_a = [("x",)] * 10 + [("y",)] * 3
    rows_b = [("x",)] * 5 + [("z",)] * 7
    merged = cms_merge(
        cms_build(spark.createDataFrame(rows_a, "s string"), "s", d=3, w=32),
        cms_build(spark.createDataFrame(rows_b, "s string"), "s", d=3, w=32),
    )
    est = {
        r["s"]: r["est"]
        for r in cms_estimate(
            spark.createDataFrame([("x",), ("y",), ("z",)], "s string"),
            "s",
            merged,
            d=3,
            w=32,
        ).collect()
    }
    assert est["x"] >= 15 and est["y"] >= 3 and est["z"] >= 7
