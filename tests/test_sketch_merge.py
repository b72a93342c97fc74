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


def test_histogram_sketch_merge_equals_whole(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        histogram_sketch,
        sketch_merge,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    whole = histogram_sketch(o, "o_totalprice", 0.0, 600000.0, bins=32)
    slices = [
        histogram_sketch(
            o.filter(F.col("o_orderkey") % 3 == i),
            "o_totalprice",
            0.0,
            600000.0,
            bins=32,
        )
        for i in range(3)
    ]
    merged = sketch_merge(*slices)
    a = {r["bin"]: r["cnt"] for r in whole.collect()}
    b = {r["bin"]: r["cnt"] for r in merged.collect()}
    assert a == b


def test_sketch_quantile_error_bounded_by_bin_width(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        histogram_sketch,
        sketch_quantiles,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi, bins = 0.0, 600000.0, 64
    sk = histogram_sketch(o, "o_totalprice", lo, hi, bins)
    est = {
        r["prob"]: r["quantile"]
        for r in sketch_quantiles(sk, [0.5, 0.95], lo, hi, bins).collect()
    }
    exact = o.stat.approxQuantile("o_totalprice", [0.5, 0.95], 0.0)
    width = (hi - lo) / bins
    assert abs(est[0.5] - exact[0]) <= width
    assert abs(est[0.95] - exact[1]) <= width


def test_sketch_clamps_out_of_range_and_rejects_bad_args(spark):
    import pytest
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        histogram_sketch,
        sketch_quantiles,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (9.5,), (99.0,), (None,)], "v double"
    )
    sk = {r["bin"]: r["cnt"] for r in histogram_sketch(df, "v", 0.0, 10.0, 10).collect()}
    assert sk == {0: 2, 9: 2}  # -5 clamps into bin 0; 99 into bin 9; NULL dropped
    with pytest.raises(ValueError):
        histogram_sketch(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        sketch_quantiles(df, [1.5], 0.0, 10.0, 10)


def test_grouped_sketch_merge_and_quantiles(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        grouped_histogram_sketch,
        grouped_sketch_quantiles,
        sketch_merge,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    whole = grouped_histogram_sketch(e, "event_type", "value", 0.0, 400.0, 32)
    # grouped sketches merge exactly like global ones: (group, bin)
    # cells sum — reuse sketch_merge by treating (group, bin) as key
    slices = [
        grouped_histogram_sketch(
            e.filter(F.col("event_id") % 2 == i),
            "event_type", "value", 0.0, 400.0, 32,
        )
        for i in range(2)
    ]
    merged = (
        slices[0].unionByName(slices[1])
        .groupBy("group", "bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }
    qs = grouped_sketch_quantiles(whole, [0.5], 0.0, 400.0, 32).collect()
    groups = {r["group"] for r in qs}
    assert len(groups) == 5 and all(0.0 <= r["quantile"] <= 400.0 for r in qs)


def test_grouped_sketch_no_single_partition_exchange(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark import registry
    from tests.test_plans import plan_of

    p = plan_of(
        registry.Q["grouped_sketch_quantiles_events"](spark, sf_dir)
    )
    assert "Exchange SinglePartition" not in p
    assert "BroadcastNestedLoopJoin" not in p
