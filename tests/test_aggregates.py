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
