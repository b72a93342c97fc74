"""Incremental aggregate maintenance tests (aggregates.py)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.aggregates import (
    IncrementalAggregate,
)


def test_incremental_matches_full_recompute(spark, sf_dir, tmp_path):
    """Folding N batches equals aggregating the whole table once —
    for every mergeable kind, including keys absent from later
    batches and keys first seen in later batches."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = IncrementalAggregate(
        str(tmp_path / "summary"),
        ["o_custkey"],
        {"o_totalprice": "sum", "o_orderkey": "count", "o_orderdate": "min"},
    )
    # three bookmark-style slices
    for lo, hi in [(0, 500), (500, 1100), (1100, 10**9)]:
        agg.apply_batch(
            orders.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        )

    got = {r["o_custkey"]: r for r in agg.read(spark).collect()}
    want = {
        r["o_custkey"]: r
        for r in orders.groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("o_totalprice_sum"),
            F.count("o_orderkey").alias("o_orderkey_count"),
            F.min("o_orderdate").alias("o_orderdate_min"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["o_orderkey_count"] == want[k]["o_orderkey_count"]
        assert got[k]["o_totalprice_sum"] == pytest.approx(
            want[k]["o_totalprice_sum"], rel=1e-9
        )
        assert got[k]["o_orderdate_min"] == want[k]["o_orderdate_min"]


def test_non_mergeable_aggregate_rejected(tmp_path):
    with pytest.raises(ValueError, match="not mergeable"):
        IncrementalAggregate(str(tmp_path / "x"), ["k"], {"v": "median"})


def test_hll_distinct_folds_across_batches(spark, sf_dir, tmp_path):
    """approx_distinct maintains a mergeable HLL sketch: folding
    batches then estimating equals the exact distinct count (HLL is
    exact at these cardinalities)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = IncrementalAggregate(
        str(tmp_path / "hll"),
        ["l_returnflag"],
        {"l_partkey": "approx_distinct", "l_quantity": "sum"},
    )
    for lo, hi in [(0, 500), (500, 10**9)]:
        agg.apply_batch(
            li.filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi))
        )
    got = {
        r["l_returnflag"]: r["l_partkey_approx_distinct"]
        for r in agg.read(spark).collect()
    }
    want = {
        r["l_returnflag"]: r["exact"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:  # HLL default lgK=12: ≈exact below ~2k, ≤2% above
        assert abs(got[k] - want[k]) <= max(1, int(0.02 * want[k]))
    # raw sketches still retrievable for further union downstream
    raw = agg.read(spark, estimate_sketches=False)
    assert dict(raw.dtypes)["l_partkey_approx_distinct"] == "binary"
