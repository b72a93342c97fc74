"""Partitioned multi-format append sink.

Parity with the reference's catalog sink
(``write_dynamic_frame.from_catalog`` with ``partitionKeys``,
``jdbc_incremental.py:222-229``): Hive-style ``k=v`` directory layout,
append mode (each incremental run adds files), formats parquet / csv
(with header) / json, and rejection of unknown formats
(``jdbc_incremental.py:350-353``).

Scale notes: ``partitionBy`` writes are executed by the distributed
file committer — no driver round-trips per partition (unlike the
reference's one boto3 ``create_partition`` call per distinct tuple,
flagged as a hazard in SURVEY.md §3.3).  For very high-cardinality
partition columns, repartition by the partition keys first so each
task writes few files (avoids the small-files explosion).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_spec: Sequence[str] | None = None,
    mode: str = "append",
    cluster_by_partitions: bool = False,
    compression: str | None = None,
) -> None:
    """Append ``df`` under ``path`` Hive-partitioned by ``partition_spec``.

    ``cluster_by_partitions=True`` repartitions on the partition keys
    before writing — one shuffle that collapses the output to one file
    per (task, partition-value) instead of (#input-tasks ×
    #partition-values) small files; worth it once either side is big.

    ``compression`` overrides the codec (e.g. ``"zstd"`` — better
    ratio than the snappy default at similar scan speed; at 100 TB the
    codec choice is multiple PB of storage and scan IO).
    """
    fmt = fmt.lower()
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"Unknown format: {fmt}")

    spec = list(partition_spec or [])
    if cluster_by_partitions and spec:
        df = df.repartition(*spec)

    writer = df.write.mode(mode)
    if spec:
        writer = writer.partitionBy(*spec)
    if fmt == "csv":
        # Reference CSV tables carry skip.header.line.count=1
        # (jdbc_incremental.py:411-412) → write the header.
        writer = writer.option("header", "true")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    fmt: str = "parquet",
    mode: str = "overwrite",
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) so
    subsequent equi joins / aggregations on those columns skip the
    shuffle entirely (both sides bucketed the same way → zipped
    scan-side join).

    The pre-paid shuffle at write time is the whole point: at 100 TB a
    fact table joined repeatedly on one key should be stored bucketed
    on it.  Bucketing requires ``saveAsTable`` (bucket metadata lives
    in the session catalog, not the directory layout).
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
