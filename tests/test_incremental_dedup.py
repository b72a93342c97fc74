"""Incremental dedup against the persistent MinHash index."""

import pytest

from aws_glue_jobs_incremental_database_etl_spark.operators.incremental_dedup import (
    MinHashIndex,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely different content about spark incremental processing pipelines"
THIRD = "yet another unrelated document describing parquet file compaction jobs"


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def index(tmp_path):
    return MinHashIndex(str(tmp_path / "mh_index"), threshold=0.7, shingle_k=2)


def test_first_batch_all_survive_and_are_indexed(spark, index):
    out = index.dedup_batch(_df(spark, [(1, BASE), (2, OTHER)]), "doc_id", "text")
    assert {r.doc_id for r in out.collect()} == {1, 2}
    assert {r.id for r in index.indexed_ids(spark).collect()} == {1, 2}


def test_second_batch_dedups_against_history_without_text_rescan(spark, index):
    index.dedup_batch(_df(spark, [(1, BASE), (2, OTHER)]), "doc_id", "text")
    # batch 2: near-dup of doc 1, plus a genuinely new doc
    out = index.dedup_batch(_df(spark, [(10, NEAR), (11, THIRD)]), "doc_id", "text")
    assert {r.doc_id for r in out.collect()} == {11}
    # index grew by the survivor only
    assert {r.id for r in index.indexed_ids(spark).collect()} == {1, 2, 11}


def test_within_batch_smaller_id_wins(spark, index):
    out = index.dedup_batch(
        _df(spark, [(5, NEAR), (3, BASE), (7, OTHER)]), "doc_id", "text"
    )
    assert {r.doc_id for r in out.collect()} == {3, 7}
    assert {r.id for r in index.indexed_ids(spark).collect()} == {3, 7}


def test_replayed_batch_never_reappends_ids(spark, index):
    b = _df(spark, [(1, BASE), (2, OTHER)])
    index.dedup_batch(b, "doc_id", "text")
    index.dedup_batch(b, "doc_id", "text")  # at-least-once upstream replay
    ids = [r.id for r in index.indexed_ids(spark).collect()]
    assert sorted(ids) == [1, 2]  # no duplicate index rows


def test_bad_band_config_rejected(tmp_path):
    with pytest.raises(ValueError):
        MinHashIndex(str(tmp_path / "x"), num_hashes=32, bands=7)
