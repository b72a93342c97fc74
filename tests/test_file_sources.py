"""File-format source readers (sources/files.py)."""

import pytest

from aws_glue_jobs_incremental_database_etl_spark.sources.files import read_table, read_text


def test_read_text_line_mode_one_row_per_line(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first line\nsecond line\n")
    (d / "b.txt").write_text("third line\n")
    out = read_text(spark, str(d))
    assert out.columns == ["value"]
    assert sorted(r.value for r in out.collect()) == [
        "first line",
        "second line",
        "third line",
    ]


def test_read_text_whole_file_mode_one_row_per_doc(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "x.txt").write_text("alpha\nbeta")
    (d / "y.txt").write_text("gamma")
    out = read_text(spark, str(d), whole_file=True)
    assert out.columns == ["doc_path", "text"]
    rows = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in out.collect()}
    assert rows == {"x.txt": "alpha\nbeta", "y.txt": "gamma"}


def test_read_text_custom_line_sep(spark, tmp_path):
    d = tmp_path / "nul"
    d.mkdir()
    (d / "r.txt").write_text("one\x00two\x00three")
    out = read_text(spark, str(d), line_sep="\x00")
    assert sorted(r.value for r in out.collect()) == ["one", "three", "two"]


def test_read_table_dispatches_text(spark, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "f.txt").write_text("hello\n")
    assert read_table(spark, str(d), fmt="text").count() == 1
    with pytest.raises(ValueError, match="Unknown source format"):
        read_table(spark, str(d), fmt="avro")


def test_binary_file_source_reads_blobs_and_prunes(spark, tmp_path):
    """binaryFile rows carry (path, length, content); glob and
    max_bytes prune; a length-only projection never reads content."""
    from aws_glue_jobs_incremental_database_etl_spark.sources.files import (
        read_binary_files,
    )

    (tmp_path / "a.png").write_bytes(b"\x89PNG" + b"x" * 10)
    (tmp_path / "b.png").write_bytes(b"\x89PNG" + b"y" * 5000)
    (tmp_path / "c.txt").write_text("not a blob")

    df = read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert bytes(rows["a.png"].content).startswith(b"\x89PNG")
    assert rows["b.png"].length == 5004

    small = read_binary_files(spark, str(tmp_path), glob="*.png", max_bytes=100)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.png"]
