"""Plan pins for the bucketed co-located join: the write-time
shuffle must actually buy shuffle-free joins, and the saving must be
visible against the unbucketed baseline plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed_table,
)
from aws_glue_jobs_incremental_database_etl_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """orders ⋈ customer on custkey, both bucketed by it with the
    same count: the executed plan must contain ZERO Exchange nodes
    (the write-time shuffle replaced both), while the identical
    unbucketed join must shuffle both sides — the saving this
    operator exists for.  Broadcast is disabled for the pin so the
    sort-merge path (the 100 TB fact⋈fact shape) is what's tested;
    results must match the unbucketed join exactly."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(orders, "b_orders", "o_custkey", 8)
        write_bucketed_table(cust, "b_customer", "o_custkey", 8)

        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        baseline = orders.join(cust, "o_custkey")
        bplan = _plan(baseline)
        assert len(re.findall(r"Exchange hashpartitioning", bplan)) == 2

        # same answer, cheaper plan
        a = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        ).collect()[0]
        b = baseline.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        ).collect()[0]
        assert (a.n, a.s) == (b.n, b.s) and a.n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_aggregation_skips_shuffle(spark, sf_dir):
    """A groupBy on the bucket key over a bucketed table must also
    plan without an Exchange — bucketing pre-partitions for EVERY
    key-equi operation, not just joins."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    try:
        write_bucketed_table(orders, "b_orders_agg", "o_custkey", 8)
        agg = (
            spark.table("b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")
