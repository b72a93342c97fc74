"""File-format source readers (parquet / csv / json).

The driver testdata is one parquet file per table
(``/root/testdata/sf*/{name}.parquet``); production layouts are
directories, possibly Hive-partitioned — ``spark.read`` handles both.
Filters composed on top of these reads are pushed into the scan by
Catalyst (parquet row-group min/max skipping, partition pruning), which
is what makes the bookmark filter cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Parquet scan; ``merge_schema=True`` on evolved-schema tables so
    files written before a column was appended still union cleanly
    (read-side of schema evolution, SURVEY.md E2)."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with header handling.

    Mirrors the reference's CSV wiring: LazySimpleSerDe with
    ``field.delim=','`` and ``skip.header.line.count=1``
    (``jdbc_incremental.py:142-152, 411-412``) — i.e. comma-delimited
    with a header row that readers must skip.  An explicit schema
    avoids the inference pre-scan (a full extra read at scale).
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan (the reference's catalog accepts a ``json``
    target format as a stub, ``jdbc_incremental.py:346-349``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """ORC scan — the other columnar lake format Glue catalogs commonly
    carry; same pushdown story as parquet (stripe-level min/max skip,
    Hive partition pruning), handled natively by Spark."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw-text corpus ingestion — the entry format of an LLM training
    pipeline before any structure exists.

    ``whole_file=False`` (default): one row per line (``value``
    string), splittable — a 100 TB corpus of large files parallelizes
    across executors on block boundaries.  ``whole_file=True``: one
    row per FILE plus a ``doc_path`` column (the per-document layout
    of crawled/scraped corpora); files are NOT splittable in this mode
    so document size, not file count, bounds task memory — shard
    oversized documents upstream.  ``line_sep`` overrides the record
    delimiter (e.g. ``"\\0"`` for NUL-delimited dumps).
    """
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    df = reader.text(path, wholetext=whole_file)
    if whole_file:
        from pyspark.sql import functions as F

        df = df.select(
            F.input_file_name().alias("doc_path"), F.col("value").alias("text")
        )
    return df


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Opaque-blob ingestion via Spark's ``binaryFile`` source — how
    image/audio/video corpora enter the lake before
    ``operators/multimodal`` decodes them: one row per file with
    ``(path, modificationTime, length, content binary)``.

    ``glob`` filters by pathname pattern (``"*.png"``); ``max_bytes``
    pre-filters on the FILE METADATA column, so oversized blobs are
    skipped without reading their bytes (the binaryFile reader is
    columnar about it: a length-only query never loads content).
    Files are not splittable — per-task memory is bounded by the
    largest file, which is why the multimodal operators keep blobs in
    bounded Arrow batches downstream.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", **kwargs
) -> DataFrame:
    """Format-dispatched read with the same format validation as the
    writer factory (SURVEY.md S9).

    ``fmt="jdbc"`` treats ``path`` as ``<jdbc-url>::<table>`` and
    forwards the reference's parallel-read options (hashfield /
    hashpartitions / partition_column bounds) to ``sources.jdbc`` —
    the actual JDBC→lake shape of the reference job.
    """
    fmt = fmt.lower()
    if fmt == "parquet":
        return read_parquet(spark, path, **kwargs)
    if fmt == "csv":
        return read_csv(spark, path, **kwargs)
    if fmt == "json":
        return read_json(spark, path, **kwargs)
    if fmt == "orc":
        return read_orc(spark, path, **kwargs)
    if fmt == "text":
        return read_text(spark, path, **kwargs)
    if fmt == "jdbc":
        from .jdbc import read_jdbc

        url, _, table = path.rpartition("::")
        if not url:
            raise ValueError(
                "jdbc source path must be '<jdbc-url>::<table>', got " + path
            )
        return read_jdbc(spark, url, table, **kwargs)
    raise ValueError(f"Unknown source format: {fmt}")
