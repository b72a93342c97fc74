"""Small-file compaction tests (maintenance.py)."""

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.maintenance import (
    compact_partitioned_table,
)


def _files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [
            os.path.join(root, f)
            for f in files
            if not f.startswith((".", "_")) and not f.endswith(".crc")
        ]
    return out


def test_compaction_shrinks_file_count_preserving_rows(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    loc = str(tmp_path / "orders_many_files")
    # simulate many append runs: 40 shards × 3 partition values
    src.repartition(40).write.partitionBy("o_orderstatus").parquet(loc)
    before = len(_files(loc))
    assert before > 40  # many small files across partition dirs

    stats = compact_partitioned_table(
        spark, loc, partition_spec=["o_orderstatus"], target_file_bytes=10**9
    )
    assert stats["files_before"] == before
    after = len(_files(loc))
    assert stats["files_after"] == after
    assert after < before / 4

    out = spark.read.parquet(loc)
    assert out.count() == src.count()
    # hive layout intact and readable with the partition column
    assert set(r.o_orderstatus for r in out.select("o_orderstatus").distinct().collect()) \
        == set(r.o_orderstatus for r in src.select("o_orderstatus").distinct().collect())
    # values survive (sum over a money column)
    assert abs(
        out.agg(F.sum("o_totalprice")).first()[0]
        - src.agg(F.sum("o_totalprice")).first()[0]
    ) < 1e-6
    # no leftover temp/trash dirs
    assert not [d for d in os.listdir(tmp_path) if "__compact" in d or "__trash" in d]


def test_compaction_unpartitioned_and_target_sizing(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    loc = str(tmp_path / "lineitem_flat")
    src.repartition(32).write.parquet(loc)
    total = sum(os.path.getsize(f) for f in _files(loc))
    # target = half the data → expect ~2 files
    stats = compact_partitioned_table(spark, loc, target_file_bytes=total // 2 + 1)
    assert stats["files_after"] <= 3
    assert spark.read.parquet(loc).count() == src.count()


def test_compaction_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_partitioned_table(spark, str(tmp_path), fmt="avro")


def test_clustered_compaction_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """cluster_by range-partitions the rewrite: each output file's
    parquet footer covers a narrow o_custkey range, so a selective
    scan skips whole files on min/max stats."""
    import pyarrow.parquet as pq

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    loc = str(tmp_path / "orders_clustered")
    src.repartition(20).write.parquet(loc)  # shuffled: every file spans the domain

    compact_partitioned_table(
        spark, loc, target_file_bytes=8_000, cluster_by=["o_custkey"]
    )
    ranges = []
    for f in _files(loc):
        meta = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        stats = [meta.row_group(g).column(idx).statistics for g in range(meta.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    assert len(ranges) >= 3
    domain = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
    # every file covers a small slice, and slices barely overlap
    assert all((hi - lo) <= domain / (len(ranges) - 1) * 1.5 for lo, hi in ranges)
    ranges.sort()
    overlaps = sum(1 for (a, b), (c, d) in zip(ranges, ranges[1:]) if c < b)
    assert overlaps <= len(ranges) // 3

    # rows and values intact
    out = spark.read.parquet(loc)
    assert out.count() == src.count()


def test_vacuum_removes_only_old_orphan_trees(spark, sf_dir, tmp_path):
    import time as _time

    from aws_glue_jobs_incremental_database_etl_spark.maintenance import (
        vacuum_temp_trees,
    )

    loc = str(tmp_path / "orders")
    spark.range(5).write.parquet(loc)
    old = f"{loc}.__merge_trash_123"
    fresh = f"{loc}.__compact_456"
    unrelated = str(tmp_path / "other_table")
    for d in (old, fresh, unrelated):
        os.makedirs(d)
        with open(os.path.join(d, "f"), "w") as fh:
            fh.write("x")
    past = _time.time() - 100_000
    os.utime(old, (past, past))

    removed = vacuum_temp_trees(loc, older_than_seconds=3600)
    assert removed == [old]
    assert not os.path.exists(old)
    assert os.path.exists(fresh)       # too young — a job may be mid-swap
    assert os.path.exists(unrelated)   # different table untouched
    assert spark.read.parquet(loc).count() == 5


def test_zorder_interleave_matches_python_reference(spark):
    """Bit-exact Morton check against an independent Python morton
    encoder over a small grid."""
    from aws_glue_jobs_incremental_database_etl_spark.functions.zorder import (
        interleave_bits,
        z_value,
    )

    def morton2(x, y, bits=4):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    assert all(got[(x, y)] == morton2(x, y) for x, y in rows)

    # z_value normalizes to the full cell domain: a [0,15]² grid at
    # bits=4 maps value v to cell v (min/max scaling is identity here)
    zv = {
        (r.x, r.y): r._z
        for r in z_value(df, ["x", "y"], bits=4).collect()
    }
    assert zv == got


def test_zorder_compaction_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """zorder_by=(custkey, totalprice): output files cover small
    hyper-rectangles, so footer min/max prunes files for a predicate
    on EITHER column — the multi-column skipping single-column
    clustering cannot give."""
    import pyarrow.parquet as pq

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    loc = str(tmp_path / "orders_z")
    src.repartition(20).write.parquet(loc)

    stats = compact_partitioned_table(
        spark, loc, target_file_bytes=8_000,
        zorder_by=["o_custkey", "o_totalprice"],
    )
    assert stats["files_after"] >= 4

    def col_ranges(col):
        out = []
        for f in _files(loc):
            meta = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == col
            )
            ss = [meta.row_group(g).column(idx).statistics
                  for g in range(meta.num_row_groups)]
            out.append((min(s.min for s in ss), max(s.max for s in ss)))
        return out

    # a 10%-wide low-corner box on each dimension must skip files
    # (a box straddling the mid-domain major-bit boundary is the
    # z-curve's known worst case and may touch most quadrants)
    for col in ("o_custkey", "o_totalprice"):
        rs = col_ranges(col)
        lo = min(a for a, _ in rs); hi = max(b for _, b in rs)
        qlo = lo + 0.05 * (hi - lo); qhi = lo + 0.15 * (hi - lo)
        hit = sum(1 for a, b in rs if not (b < qlo or a > qhi))
        assert hit < len(rs), f"no pruning on {col}"

    # schema unchanged (no _z leak) and rows intact
    out = spark.read.parquet(loc)
    assert out.columns == src.columns
    assert out.count() == src.count()


def test_zorder_and_cluster_by_mutually_exclusive(spark, tmp_path):
    df = spark.range(10)
    loc = str(tmp_path / "t")
    df.write.parquet(loc)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_partitioned_table(
            spark, loc, cluster_by=["id"], zorder_by=["id", "id"]
        )
