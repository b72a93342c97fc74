"""Bookmark store tests (SURVEY.md S1/P4/O1/E7; FIXTURES.md scenarios 1-2)."""

import datetime as dt

from aws_glue_jobs_incremental_database_etl_spark.bookmarks import BookmarkStore
from aws_glue_jobs_incremental_database_etl_spark.tables import load_table


def test_first_run_reads_everything(tmp_path, spark, sf_dir):
    bs = BookmarkStore(str(tmp_path / "bm.json"))
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert bs.filter_new(df, "ctx", ["o_orderkey"]).count() == df.count()


def test_strictly_greater_and_commit(tmp_path, spark, sf_dir):
    path = str(tmp_path / "bm.json")
    bs = BookmarkStore(path)
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    half = df.filter("o_orderkey <= 750")
    wm = bs.compute_next(half, ["o_orderkey"])
    assert wm == {"o_orderkey": half.agg({"o_orderkey": "max"}).first()[0]}
    bs.stage("ctx", wm)
    bs.commit()

    # reload from disk — state survives process restart
    bs2 = BookmarkStore(path)
    delta = bs2.filter_new(df, "ctx", ["o_orderkey"])
    assert delta.count() == df.filter(f"o_orderkey > {wm['o_orderkey']}").count()
    # strictly greater: the watermark row itself is excluded
    assert delta.filter(f"o_orderkey = {wm['o_orderkey']}").count() == 0


def test_composite_keys_conjunction(tmp_path, spark, sf_dir):
    bs = BookmarkStore(str(tmp_path / "bm.json"))
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wm = bs.compute_next(df.limit(100), ["l_orderkey", "l_linenumber"])
    bs.stage("ctx", wm)
    bs.commit()
    delta = bs.filter_new(df, "ctx", ["l_orderkey", "l_linenumber"])
    expected = df.filter(
        f"l_orderkey > {wm['l_orderkey']} AND l_linenumber > {wm['l_linenumber']}"
    ).count()
    assert delta.count() == expected


def test_desc_order_tracks_min(tmp_path, spark, sf_dir):
    bs = BookmarkStore(str(tmp_path / "bm.json"))
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    wm = bs.compute_next(df, ["o_orderkey"], sort_order="DESC")
    assert wm == {"o_orderkey": df.agg({"o_orderkey": "min"}).first()[0]}
    bs.stage("ctx", wm)
    bs.commit()
    # DESC: next run reads strictly below the committed min
    assert bs.filter_new(df, "ctx", ["o_orderkey"], "DESC").count() == 0


def test_timestamp_watermark_roundtrip(tmp_path, spark, sf_dir):
    path = str(tmp_path / "bm.json")
    bs = BookmarkStore(path)
    df = load_table(spark, sf_dir, "events")
    wm = bs.compute_next(df, ["ts"])
    assert isinstance(wm["ts"], dt.datetime)
    bs.stage("ctx", wm)
    bs.commit()
    bs2 = BookmarkStore(path)
    assert bs2.get("ctx")["ts"] == wm["ts"]
    assert bs2.filter_new(df, "ctx", ["ts"]).count() == 0


def test_decimal_watermark_roundtrip(tmp_path):
    import decimal

    path = str(tmp_path / "bm.json")
    bs = BookmarkStore(path)
    bs.stage("ctx", {"amount": decimal.Decimal("123.450")})
    bs.commit()
    v = BookmarkStore(path).get("ctx")["amount"]
    assert isinstance(v, decimal.Decimal) and v == decimal.Decimal("123.450")


def test_sharded_commits_merge_not_clobber(tmp_path):
    """Two shard instances sharing one bookmark path: the second
    commit must preserve the first shard's contexts (last-writer-wins
    would silently drop them → full re-read + duplicate appends)."""
    path = str(tmp_path / "bm.json")
    a = BookmarkStore(path)
    b = BookmarkStore(path)  # opened before a commits — sees nothing
    a.stage("table_a", {"k": 10})
    a.commit()
    b.stage("table_b", {"k": 20})
    b.commit()
    final = BookmarkStore(path)
    assert final.get("table_a") == {"k": 10}
    assert final.get("table_b") == {"k": 20}


def test_staged_not_visible_until_commit(tmp_path, spark, sf_dir):
    path = str(tmp_path / "bm.json")
    bs = BookmarkStore(path)
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bs.stage("ctx", {"o_orderkey": 10})
    # a new store (≈ failed-run restart) sees nothing committed
    assert BookmarkStore(path).get("ctx") is None
    bs.commit()
    assert BookmarkStore(path).get("ctx") == {"o_orderkey": 10}
    assert bs.filter_new(df, "ctx", ["o_orderkey"]).count() == df.filter(
        "o_orderkey > 10"
    ).count()


def test_concurrent_shard_commits_merge_under_lock(tmp_path):
    """Two stores sharing a path, committing 'simultaneously': both
    shards' contexts survive (merge + flock close the clobber race)."""
    import threading

    from aws_glue_jobs_incremental_database_etl_spark.bookmarks import BookmarkStore

    path = str(tmp_path / "bm.json")
    a = BookmarkStore(path, job_name="job")
    b = BookmarkStore(path, job_name="job")
    a.stage("t_a", {"k": 10})
    b.stage("t_b", {"k": 20})

    ts = [threading.Thread(target=s.commit) for s in (a, b)]
    for t in ts: t.start()
    for t in ts: t.join()

    fresh = BookmarkStore(path, job_name="job")
    assert fresh.get("t_a") == {"k": 10}
    assert fresh.get("t_b") == {"k": 20}
