"""Index compaction + config-metadata guards for the persistent
MinHash/winnowing dedup indexes (VERDICT r6 #4 + advisor items).

Contract under test: compaction folds per-batch part files into one
``compact-<n>`` dir without changing ANY dedup result — before/after,
and across a crash window between the compaction commit and its GC —
and an index reopened under a different fingerprint-domain config
fails loudly instead of silently matching nothing.
"""

import os
import shutil

import pytest

from aws_glue_jobs_incremental_database_etl_spark.operators.incremental_dedup import (
    MinHashIndex,
    WinnowIndex,
    _load_snapshot,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely different content about spark incremental processing pipelines"
THIRD = "yet another unrelated document describing parquet file compaction jobs"
FOURTH = "structured streaming watermarks bound state for late arriving events"


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _loose_parquet(path):
    return [
        e
        for e in os.listdir(path)
        if e.endswith(".parquet") and not e.startswith(("_", "."))
    ]


@pytest.mark.parametrize("cls", [WinnowIndex, MinHashIndex])
def test_compaction_preserves_dedup_results(spark, tmp_path, cls):
    """N batches → compact → next batch dedups identically to an
    uncompacted twin; loose file count drops to zero."""
    kw = {"shingle_k": 2} if cls is MinHashIndex else {}
    a = cls(str(tmp_path / "a"), threshold=0.7, **kw)
    b = cls(str(tmp_path / "b"), threshold=0.7, **kw)
    batches = [
        [(1, BASE), (2, OTHER)],
        [(10, THIRD)],
        [(20, FOURTH)],
    ]
    for rows in batches:
        a.dedup_batch(_df(spark, rows), "doc_id", "text").collect()
        b.dedup_batch(_df(spark, rows), "doc_id", "text").collect()

    assert len(_loose_parquet(a.path)) >= 3  # one+ file per batch
    n = a.compact(spark)
    assert n >= 3
    assert _loose_parquet(a.path) == []  # all folded
    assert os.path.isdir(os.path.join(a.path, "compact-1"))

    probe = [(30, NEAR), (31, "fresh text unseen anywhere else at all")]
    got = {
        r.doc_id
        for r in a.dedup_batch(_df(spark, probe), "doc_id", "text").collect()
    }
    want = {
        r.doc_id
        for r in b.dedup_batch(_df(spark, probe), "doc_id", "text").collect()
    }
    assert got == want == {31}  # 30 is a near-dup of indexed doc 1
    assert {r.id for r in a.indexed_ids(spark).collect()} == {
        r.id for r in b.indexed_ids(spark).collect()
    }

    # second compaction folds the old compact dir + the new batch's
    # file(s) — the per-batch part-file count is a distribution detail
    # (it tracks the session's shuffle parallelism, e.g. AQE
    # initialPartitionNum), so assert the fold happened, not the count
    assert a.compact(spark) >= 2
    assert os.path.isdir(os.path.join(a.path, "compact-2"))
    assert not os.path.isdir(os.path.join(a.path, "compact-1"))


def test_compaction_crash_window_heals(spark, tmp_path):
    """Crash between the compaction commit and its victim GC: both the
    compact dir AND the superseded files are on disk — the next
    snapshot read must heal (delete victims) and NOT double-count."""
    idx = WinnowIndex(str(tmp_path / "i"), threshold=0.7)
    idx.dedup_batch(_df(spark, [(1, BASE), (2, OTHER)]), "doc_id", "text").collect()
    idx.dedup_batch(_df(spark, [(10, THIRD)]), "doc_id", "text").collect()

    # stash the victims, compact, then restore them = the crash window
    stash = tmp_path / "stash"
    stash.mkdir()
    victims = _loose_parquet(idx.path)
    for f in victims:
        shutil.copy2(os.path.join(idx.path, f), stash / f)
    assert idx.compact(spark) == len(victims)
    for f in victims:
        shutil.copy2(stash / f, os.path.join(idx.path, f))
    assert _loose_parquet(idx.path) == victims  # crash state rebuilt

    # heal happens inside the snapshot read: no duplicate fingerprints
    fps = _load_snapshot(spark, idx.path)
    # the snapshot read heals first, so loose victims are gone again
    assert _loose_parquet(idx.path) == []
    pairs = fps.groupBy("id", "fp_hash").count().filter("count > 1").count()
    assert pairs == 0

    out = idx.dedup_batch(_df(spark, [(30, NEAR)]), "doc_id", "text")
    assert out.collect() == []  # still deduped exactly once


def test_meta_mismatch_raises(spark, tmp_path):
    """An index built under one fingerprint config and reopened under
    another must fail loudly — a silent hash-domain switch would let
    every historical near-dup survive with shared=0."""
    p = str(tmp_path / "w")
    WinnowIndex(p, k=5, window=4).dedup_batch(
        _df(spark, [(1, BASE)]), "doc_id", "text"
    ).collect()
    with pytest.raises(ValueError, match="diverge"):
        WinnowIndex(p, k=4, window=4).dedup_batch(
            _df(spark, [(2, OTHER)]), "doc_id", "text"
        )
    with pytest.raises(ValueError, match="diverge"):
        WinnowIndex(p, k=5, window=4, hash_fn="md5_60").dedup_batch(
            _df(spark, [(2, OTHER)]), "doc_id", "text"
        )
    # same config reopens fine
    WinnowIndex(p, k=5, window=4).dedup_batch(
        _df(spark, [(2, OTHER)]), "doc_id", "text"
    ).collect()

    m = str(tmp_path / "m")
    MinHashIndex(m, shingle_k=2).dedup_batch(
        _df(spark, [(1, BASE)]), "doc_id", "text"
    ).collect()
    with pytest.raises(ValueError, match="diverge"):
        MinHashIndex(m, shingle_k=3).dedup_batch(
            _df(spark, [(2, OTHER)]), "doc_id", "text"
        )


def test_pre_metadata_index_raises(spark, tmp_path):
    """Data without _META.json (a pre-metadata index) is ambiguous —
    adopt-or-rebuild, never silently fingerprint in a guessed domain."""
    p = str(tmp_path / "legacy")
    idx = WinnowIndex(p)
    idx.dedup_batch(_df(spark, [(1, BASE)]), "doc_id", "text").collect()
    os.remove(os.path.join(p, "_META.json"))
    with pytest.raises(ValueError, match="_META.json"):
        idx.dedup_batch(_df(spark, [(2, OTHER)]), "doc_id", "text")


def test_unsupported_scheme_raises(spark):
    """An index path whose scheme has no Hadoop FileSystem on the
    classpath must raise, not be read as an EMPTY index (which would
    silently skip all history dedup)."""
    idx = WinnowIndex("s3://bucket/prefix/index")
    with pytest.raises(NotImplementedError, match="non-local"):
        idx.dedup_batch(_df(spark, [(1, BASE)]), "doc_id", "text")


def test_index_over_hadoop_fs_file_scheme(spark, tmp_path):
    """A ``file://`` URI routes every metadata operation (listing,
    manifest read/write, rename commit, GC) through the Hadoop
    FileSystem backend — the hermetic stand-in for hdfs:// / s3a://
    object storage (VERDICT r7 #3).  Full lifecycle: multi-batch
    dedup vs history, compaction, crash-window heal, and the _META
    config guard, all behaving exactly like the local-path index."""
    local_dir = str(tmp_path / "remote_idx")
    uri = "file://" + local_dir
    idx = WinnowIndex(uri, threshold=0.7)
    tw = WinnowIndex(str(tmp_path / "twin"), threshold=0.7)
    for rows in [[(1, BASE), (2, OTHER)], [(10, THIRD)], [(20, FOURTH)]]:
        got = {r.doc_id for r in idx.dedup_batch(_df(spark, rows), "doc_id", "text").collect()}
        want = {r.doc_id for r in tw.dedup_batch(_df(spark, rows), "doc_id", "text").collect()}
        assert got == want
    assert os.path.exists(os.path.join(local_dir, "_META.json"))
    assert len(_loose_parquet(local_dir)) >= 3

    # crash window: stash victims, compact (through Hadoop FS), restore
    stash = tmp_path / "stash2"
    stash.mkdir()
    victims = _loose_parquet(local_dir)
    for f in victims:
        shutil.copy2(os.path.join(local_dir, f), stash / f)
    assert idx.compact(spark) == len(victims)
    assert _loose_parquet(local_dir) == []
    assert os.path.isdir(os.path.join(local_dir, "compact-1"))
    for f in victims:
        shutil.copy2(stash / f, os.path.join(local_dir, f))

    # next batch heals the crash window and dedups identically
    probe = [(30, NEAR), (31, "fresh text unseen anywhere else at all")]
    got = {r.doc_id for r in idx.dedup_batch(_df(spark, probe), "doc_id", "text").collect()}
    want = {r.doc_id for r in tw.dedup_batch(_df(spark, probe), "doc_id", "text").collect()}
    assert got == want == {31}
    assert _loose_parquet(local_dir) != victims  # heal ran
    assert {r.id for r in idx.indexed_ids(spark).collect()} == {
        r.id for r in tw.indexed_ids(spark).collect()
    }

    # the _META config guard works through the Hadoop backend too
    with pytest.raises(ValueError, match="diverge"):
        WinnowIndex(uri, threshold=0.7, k=4).dedup_batch(
            _df(spark, [(99, OTHER)]), "doc_id", "text"
        )


def test_compact_safe_while_survivors_lazy(spark, tmp_path):
    """compact()'s GC deletes the snapshot files the batch pinned —
    the survivors frame must still re-evaluate correctly afterwards
    (its losers side is localCheckpoint-severed from those files)."""
    idx = WinnowIndex(str(tmp_path / "lz"), threshold=0.7)
    idx.dedup_batch(_df(spark, [(1, BASE), (2, OTHER)]), "doc_id", "text").collect()
    out = idx.dedup_batch(_df(spark, [(10, NEAR), (11, THIRD)]), "doc_id", "text")
    # survivors NOT collected yet; compaction GCs the pinned files
    assert idx.compact(spark) >= 2
    spark.catalog.clearCache()
    assert {r.doc_id for r in out.collect()} == {11}
