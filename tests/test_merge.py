"""CDC merge/upsert tests (merge.py)."""

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.merge import (
    collapse_latest,
    merge_upsert,
)


def _target(spark, sf_dir, tmp_path, partitioned=True):
    loc = str(tmp_path / "orders_tgt")
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderkey <= 700")
        .withColumn("v", F.lit(1).cast("bigint"))
    )
    w = base.write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("o_orderstatus")
    w.parquet(loc)
    return loc, base


def test_collapse_latest_ties_resolve_deterministically(spark):
    df = spark.createDataFrame(
        [(1, 2, "b"), (1, 2, "a"), (1, 1, "z"), (2, 5, "q")], "k long, v long, p string"
    )
    out = {r["k"]: (r["v"], r["p"]) for r in collapse_latest(df, ["k"], "v").collect()}
    assert out == {1: (2, "b"), 2: (5, "q")}  # max version, then max payload


def test_merge_upsert_update_insert_delete(spark, sf_dir, tmp_path):
    loc, base = _target(spark, sf_dir, tmp_path)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    upserts = (
        orders.filter("o_orderkey between 601 and 800")
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("v", F.lit(2).cast("bigint"))
        .withColumn("deleted", F.lit(False))
    )
    # a later version of key 601 that must win over the v=2 row
    newest = (
        orders.filter("o_orderkey = 601")
        .withColumn("o_totalprice", F.lit(99.0))
        .withColumn("v", F.lit(3).cast("bigint"))
        .withColumn("deleted", F.lit(False))
    )
    tombstones = (
        orders.filter("o_orderkey <= 50")
        .withColumn("v", F.lit(2).cast("bigint"))
        .withColumn("deleted", F.lit(True))
    )
    stats = merge_upsert(
        spark,
        loc,
        upserts.unionByName(newest).unionByName(tombstones),
        ["o_orderkey"],
        partition_spec=["o_orderstatus"],
        version_col="v",
        delete_col="deleted",
    )

    out = spark.read.parquet(loc)
    assert "deleted" not in out.columns
    # 701 original (keys 0..700) - 51 deleted (0..50) + 100 inserted (701..800)
    assert out.count() == 750 == stats["rows_written"]
    assert stats["rows_deleted"] == 51
    assert out.filter("o_orderkey <= 50").count() == 0
    assert out.filter("o_orderkey = 601").select("o_totalprice").first()[0] == 99.0
    # updated row carries the new version; untouched row keeps v=1
    assert out.filter("o_orderkey = 700").select("v").first()[0] == 2
    assert out.filter("o_orderkey = 100").select("v").first()[0] == 1
    # updated price really landed (+1000 vs source)
    src700 = orders.filter("o_orderkey = 700").select("o_totalprice").first()[0]
    assert out.filter("o_orderkey = 700").select("o_totalprice").first()[0] == pytest.approx(src700 + 1000.0)


def test_merge_untouched_partitions_not_rewritten(spark, sf_dir, tmp_path):
    loc, base = _target(spark, sf_dir, tmp_path)
    statuses = [r[0] for r in base.select("o_orderstatus").distinct().collect()]
    touched = statuses[0]
    untouched = [s for s in statuses if s != touched]
    mtimes = {
        s: os.path.getmtime(os.path.join(loc, f"o_orderstatus={s}"))
        for s in untouched
    }

    upd = (
        base.filter(F.col("o_orderstatus") == touched)
        .limit(5)
        .withColumn("o_totalprice", F.lit(1.0))
        .withColumn("v", F.lit(2).cast("bigint"))
    )
    stats = merge_upsert(
        spark, loc, upd, ["o_orderkey"],
        partition_spec=["o_orderstatus"], version_col="v",
    )
    assert stats["partitions_rewritten"] == 1
    for s in untouched:  # directory inodes untouched
        assert os.path.getmtime(os.path.join(loc, f"o_orderstatus={s}")) == mtimes[s]
    out = spark.read.parquet(loc)
    assert out.count() == 701
    assert out.filter("o_totalprice = 1.0").count() == 5


def test_merge_creates_missing_target_and_unpartitioned_path(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "fresh")
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").filter("o_orderkey <= 100")
    stats = merge_upsert(spark, loc, base, ["o_orderkey"])
    assert stats == {"rows_written": 101, "rows_deleted": 0, "partitions_rewritten": 0}

    upd = base.limit(3).withColumn("o_totalprice", F.lit(7.0))
    stats = merge_upsert(spark, loc, upd, ["o_orderkey"])
    assert stats["rows_written"] == 101 and stats["partitions_rewritten"] == 1
    assert spark.read.parquet(loc).filter("o_totalprice = 7.0").count() == 3


def test_merge_duplicate_keys_without_version_rejected(spark, sf_dir, tmp_path):
    loc, base = _target(spark, sf_dir, tmp_path, partitioned=False)
    dup = base.limit(1).unionByName(base.limit(1))
    with pytest.raises(ValueError, match="version_col"):
        merge_upsert(spark, loc, dup, ["o_orderkey"])


def test_merge_schema_evolution_union_by_name(spark, sf_dir, tmp_path):
    loc, base = _target(spark, sf_dir, tmp_path)
    upd = (
        base.filter("o_orderkey = 1")
        .withColumn("v", F.lit(2).cast("bigint"))
        .withColumn("source_region", F.lit("eu-1"))
    )
    merge_upsert(
        spark, loc, upd, ["o_orderkey"],
        partition_spec=["o_orderstatus"], version_col="v",
    )
    out = spark.read.option("mergeSchema", "true").parquet(loc)
    assert "source_region" in out.columns
    assert out.filter("o_orderkey = 1").select("source_region").first()[0] == "eu-1"
    # old rows in the SAME rewritten partition read back null for the new col
    part = out.filter("o_orderkey <> 1").filter("source_region is not null")
    assert part.count() == 0


def test_table_diff_derives_change_feed_and_roundtrips(spark, sf_dir, tmp_path):
    from aws_glue_jobs_incremental_database_etl_spark.merge import (
        merge_upsert,
        table_diff,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter("o_orderkey <= 500")
    new = (
        orders.filter("o_orderkey between 101 and 600")  # 0..100 deleted
        .withColumn(  # 200..210 price change
            "o_totalprice",
            F.when(F.col("o_orderkey").between(200, 210), F.lit(9.99)).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    feed = table_diff(old, new, ["o_orderkey"])
    ops = {r["op"]: 0 for r in feed.select("op").distinct().collect()}
    for r in feed.groupBy("op").count().collect():
        ops[r["op"]] = r["count"]
    assert ops == {"insert": 100, "update": 11, "delete": 101}

    # round-trip: applying the feed to old reproduces new exactly
    loc = str(tmp_path / "rt")
    old.write.parquet(loc)
    merge_upsert(
        spark,
        loc,
        feed.withColumn("deleted", F.col("op") == "delete").drop("op"),
        ["o_orderkey"],
        delete_col="deleted",
    )
    got = spark.read.parquet(loc)
    assert got.count() == new.count()
    assert (
        got.exceptAll(new).count() == 0 and new.exceptAll(got).count() == 0
    )


def test_scd2_apply_histories_changes(spark, tmp_path):
    from aws_glue_jobs_incremental_database_etl_spark.merge import scd2_apply

    loc = str(tmp_path / "dim")
    b1 = spark.createDataFrame(
        [(1, "alice", "NY", 10, False), (2, "bob", "LA", 10, False)],
        "id long, name string, city string, v long, deleted boolean",
    )
    s = scd2_apply(spark, loc, b1, ["id"], version_col="v", delete_col="deleted")
    assert s == {"rows_total": 2, "rows_closed": 0, "rows_appended": 2}

    # v20: alice moves; bob unchanged (must NOT version-bump); carol new
    b2 = spark.createDataFrame(
        [(1, "alice", "SF", 20, False), (2, "bob", "LA", 20, False),
         (3, "carol", "TX", 20, False)],
        "id long, name string, city string, v long, deleted boolean",
    )
    s = scd2_apply(spark, loc, b2, ["id"], version_col="v", delete_col="deleted")
    assert s == {"rows_total": 4, "rows_closed": 1, "rows_appended": 2}

    # v30: delete bob (close-only)
    b3 = spark.createDataFrame(
        [(2, "bob", "LA", 30, True)],
        "id long, name string, city string, v long, deleted boolean",
    )
    s = scd2_apply(spark, loc, b3, ["id"], version_col="v", delete_col="deleted")
    assert s == {"rows_total": 4, "rows_closed": 1, "rows_appended": 0}

    rows = {
        (r["id"], r["city"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(loc).collect()
    }
    assert rows == {
        (1, "NY", 10, 20),    # alice's first version, closed at 20
        (1, "SF", 20, None),  # alice current
        (2, "LA", 10, 30),    # bob closed by the delete
        (3, "TX", 20, None),  # carol current
    }

    # point-in-time query at v=15 sees the original state
    asof = spark.read.parquet(loc).filter(
        "valid_from <= 15 AND (valid_to IS NULL OR valid_to > 15)"
    )
    assert {(r["id"], r["city"]) for r in asof.collect()} == {(1, "NY"), (2, "LA")}
