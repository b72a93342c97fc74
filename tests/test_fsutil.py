"""Filesystem-backend contract tests (VERDICT r8 Next-round #7).

The metadata plumbing (dedup-index snapshots, staged-commit txn log)
must behave identically whether it runs on the ``os``/``shutil`` fast
path (plain paths), the Hadoop FileSystem API with an empty-authority
URI (``file://`` — where Hadoop's Path normalization drops two
slashes), or a scheme WITH an authority (``viewfs://mount/`` — a real
second Hadoop scheme, mounted onto a tmp dir, no MiniDFS needed).
One parametrized sweep pins every operation the callers use; an
end-to-end exactly-once publish over viewfs:// pins that partition
directory names survive the non-file scheme too (the r8 ADVICE bug
class: rel-path slicing corrupted ``o_orderstatus=F`` →
``_orderstatus=F`` on file://).
"""

from __future__ import annotations

import os

import pytest

from aws_glue_jobs_incremental_database_etl_spark.fsutil import fs_for


def _mount_viewfs(spark, name: str, local_dir: str) -> str:
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{name}.link./lake", "file://" + local_dir
    )
    return f"viewfs://{name}/lake"


@pytest.fixture(
    params=["local", "hadoop-file", "hadoop-viewfs"], ids=str
)
def backend(request, spark, tmp_path):
    """(fs, root, local_mirror): the same tmp dir reachable through
    each backend; local_mirror is the plain-os path for independent
    verification of what actually landed on disk."""
    local = str(tmp_path / "data")
    os.makedirs(local)
    if request.param == "local":
        root = local
    elif request.param == "hadoop-file":
        root = "file://" + local
    else:
        # unique mount name per test invocation — FileSystem caches
        # by (scheme, authority), so a reused name would pin a stale
        # mount table
        root = _mount_viewfs(
            spark, f"m{abs(hash(str(tmp_path))) % 10**9}", local
        )
    return fs_for(root, spark), root, local


def test_backend_contract(backend):
    """Every operation the txn/index callers rely on, with the
    observable result checked through BOTH the backend and the plain
    local mirror: exists/isdir/mkdirs, write/read round-trip,
    root-RELATIVE walk_files (sorted, nested), rename, overwriting
    replace, listdir names, getsize, delete, rmdir_if_empty."""
    fs, root, local = backend
    assert not fs.exists(f"{root}/x")
    fs.mkdirs(f"{root}/d1/d2")
    assert fs.isdir(f"{root}/d1/d2") and os.path.isdir(f"{local}/d1/d2")
    fs.write_text(f"{root}/d1/d2/a.txt", "alpha")
    fs.write_text(f"{root}/d1/b.txt", "bb")
    assert fs.read_text(f"{root}/d1/d2/a.txt") == "alpha"
    assert fs.getsize(f"{root}/d1/b.txt") == 2
    # the contract the r8 ADVICE bug was about: walk_files yields
    # paths RELATIVE to the walked root, whatever the backend's URI
    # normalization does (file:///x -> file:/x, viewfs authority)
    assert list(fs.walk_files(f"{root}/d1")) == ["b.txt", "d2/a.txt"]
    assert fs.listdir(f"{root}/d1") == ["b.txt", "d2"]
    # rename: moves, source gone, content preserved
    fs.rename(f"{root}/d1/d2/a.txt", f"{root}/d1/d2/a2.txt")
    assert not fs.exists(f"{root}/d1/d2/a.txt")
    assert fs.read_text(f"{root}/d1/d2/a2.txt") == "alpha"
    # replace: overwrites an existing destination
    fs.write_text(f"{root}/d1/d2/a3.txt", "new")
    fs.replace(f"{root}/d1/d2/a3.txt", f"{root}/d1/d2/a2.txt")
    assert fs.read_text(f"{root}/d1/d2/a2.txt") == "new"
    assert not fs.exists(f"{root}/d1/d2/a3.txt")
    # partition-style directory names round-trip verbatim
    fs.mkdirs(f"{root}/tbl/o_orderstatus=F")
    fs.write_text(f"{root}/tbl/o_orderstatus=F/part-0.parquet", "p")
    assert list(fs.walk_files(f"{root}/tbl")) == [
        "o_orderstatus=F/part-0.parquet"
    ]
    assert os.path.isdir(f"{local}/tbl/o_orderstatus=F")
    # delete is recursive; rmdir_if_empty only drops empty dirs
    fs.delete(f"{root}/d1/d2")
    assert not fs.exists(f"{root}/d1/d2")
    fs.rmdir_if_empty(f"{root}/d1")  # b.txt still there -> kept
    assert fs.isdir(f"{root}/d1")
    fs.delete(f"{root}/d1/b.txt")
    fs.rmdir_if_empty(f"{root}/d1")
    assert not fs.exists(f"{root}/d1")


def test_exactly_once_publish_over_viewfs(spark, tmp_path, sf_dir):
    """Full staged-commit publish against a viewfs:// target — a
    Hadoop scheme WITH an authority, whose Path normalization differs
    from both plain paths and file:// — then assert the partition
    directories and partition VALUES round-trip (the assertions that
    would have caught the r8 rel-slicing corruption on any backend)."""
    from pyspark.sql import functions as F

    from aws_glue_jobs_incremental_database_etl_spark.bookmarks import BookmarkStore
    from aws_glue_jobs_incremental_database_etl_spark.catalog import FileCatalog
    from aws_glue_jobs_incremental_database_etl_spark.config import TableConfig
    from aws_glue_jobs_incremental_database_etl_spark.pipeline import (
        IncrementalPipeline,
    )

    lake_local = str(tmp_path / "lake")
    os.makedirs(lake_local)
    lake = _mount_viewfs(spark, "e2e%d" % (abs(hash(str(tmp_path))) % 10**9), lake_local)
    cfg = TableConfig("orders", ["o_orderkey"], "ASC", ["o_orderstatus"])
    full = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = str(tmp_path / "src_orders")
    full.write.parquet(src)
    p = IncrementalPipeline(
        spark,
        FileCatalog(str(tmp_path / "catalog")),
        BookmarkStore(str(tmp_path / "bookmarks.json")),
        target_location=lake,
        target_prefix="tgt_",
        job_run_id="v1",
        exactly_once=True,
    )
    (res,) = p.run([cfg], {"orders": src})
    assert res.rows_written == full.count()
    part_dirs = [d for d in os.listdir(f"{lake_local}/tgt_orders") if "=" in d]
    assert part_dirs and all(
        d.startswith("o_orderstatus=") for d in part_dirs
    ), part_dirs
    tgt = p.read_target("orders")
    src_counts = {
        r["o_orderstatus"]: r["n"]
        for r in full.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tgt_counts = {
        r["o_orderstatus"]: r["n"]
        for r in tgt.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert tgt_counts == src_counts
    # housekeeping went through the viewfs backend: staging gone
    assert not os.path.exists(f"{lake_local}/_staging")
    assert os.path.isdir(f"{lake_local}/_txn/applied")


def test_time_travel_and_expiry_over_viewfs(spark, tmp_path, sf_dir):
    """Snapshot reads + history expiry composed over viewfs:// (VERDICT
    r10 Next-round #4 / r9 ask #7): three exactly-once publishes into a
    mounted viewfs target, then (a) read_table_asof at the FIRST commit
    returns exactly the first batch, (b) expire_history(keep_last=1)
    rolls the old manifests into a base through the viewfs backend,
    (c) the expired snapshot REFUSES time travel, and (d) the current
    snapshot still reads complete.  This closes the last txn surface
    that was only ever exercised on local paths — manifest parsing,
    move-path reconstruction, and the rollup rewrite all traverse the
    authority-bearing scheme here."""
    import pytest as _pytest

    from aws_glue_jobs_incremental_database_etl_spark.bookmarks import BookmarkStore
    from aws_glue_jobs_incremental_database_etl_spark.catalog import FileCatalog
    from aws_glue_jobs_incremental_database_etl_spark.config import TableConfig
    from aws_glue_jobs_incremental_database_etl_spark.pipeline import (
        IncrementalPipeline,
    )
    from aws_glue_jobs_incremental_database_etl_spark.txn import (
        expire_history,
        published_history,
        read_table_asof,
    )

    lake_local = str(tmp_path / "lake")
    os.makedirs(lake_local)
    lake = _mount_viewfs(
        spark, "tt%d" % (abs(hash(str(tmp_path))) % 10**9), lake_local
    )
    cfg = TableConfig("orders", ["o_orderkey"], "ASC", ["o_orderstatus"])
    full = spark.read.parquet(f"{sf_dir}/orders.parquet")
    maxk = full.agg({"o_orderkey": "max"}).first()[0]
    cuts = (maxk // 3, 2 * (maxk // 3), maxk)
    src = str(tmp_path / "src_orders")
    for i, cut in enumerate(cuts):
        full.filter(f"o_orderkey <= {cut}").write.mode("overwrite").parquet(src)
        IncrementalPipeline(
            spark,
            FileCatalog(str(tmp_path / "catalog")),
            BookmarkStore(str(tmp_path / "bookmarks.json")),
            target_location=lake,
            target_prefix="tgt_",
            job_run_id=f"tt-{i + 1}",
            exactly_once=True,
        ).run([cfg], {"orders": src})
    hist = published_history(lake)
    assert [h["run_id"] for h in hist] == ["tt-1", "tt-2", "tt-3"]
    first_seq, last_seq = hist[0]["seq"], hist[-1]["seq"]
    snap1 = read_table_asof(spark, lake, "tgt_orders", first_seq)
    assert snap1.count() == full.filter(f"o_orderkey <= {cuts[0]}").count()
    # partition values recovered through the viewfs basePath
    assert set(
        r["o_orderstatus"] for r in snap1.select("o_orderstatus").distinct().collect()
    ) == set(
        r["o_orderstatus"]
        for r in full.filter(f"o_orderkey <= {cuts[0]}")
        .select("o_orderstatus")
        .distinct()
        .collect()
    )
    expired = expire_history(lake, keep_last=1)
    assert set(expired) == {"tt-1", "tt-2"}
    # the rollup rewrote the applied log on the REAL disk behind the mount
    applied_local = os.listdir(f"{lake_local}/_txn/applied")
    assert any(n.startswith("manifest-base-") for n in applied_local)
    with _pytest.raises(ValueError, match="compacted|no longer available"):
        read_table_asof(spark, lake, "tgt_orders", first_seq)
    cur = read_table_asof(spark, lake, "tgt_orders", last_seq)
    assert cur.count() == full.count()
