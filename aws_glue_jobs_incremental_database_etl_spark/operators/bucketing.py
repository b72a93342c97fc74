"""Bucketed co-located joins: pre-shuffle ONCE at write time, join
forever without an Exchange.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of
both sides on the join key.  Hive-style bucketing moves that shuffle
to WRITE time: ``bucketBy(n, key)`` hash-partitions rows into ``n``
files per partition and records the layout in the catalog, so a join
of two tables bucketed by the same key with compatible counts reads
co-located buckets directly — Catalyst plans a SortMergeJoin with NO
``Exchange hashpartitioning`` on either bucketed side (sortBy at
write also removes the Sort for same-count buckets).  One write-time
shuffle is amortized over every subsequent join, aggregation, or
incremental merge keyed on the same column — exactly the repeated
access pattern of an incremental-ETL target table (the reference job
re-reads its published tables every run; see SURVEY.md §2 S5).

``tests/test_bucketing.py`` pins the plan shape: the bucketed join
must show zero shuffles, and the same join unbucketed must show the
two it saves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Publish ``df`` as a catalog table hash-bucketed (and
    optionally sorted) by ``bucket_col`` — the write-time shuffle
    that every later key-equi join on ``bucket_col`` skips.

    ``num_buckets`` sizes the per-partition file fan-out AND the
    downstream join parallelism: pick it so a single bucket of the
    LARGEST table fits an executor's memory at the target scale
    (rows/`num_buckets` ≈ one task's working set), and keep it
    IDENTICAL across the tables that join — mismatched counts fall
    back to shuffling the smaller side."""
    w = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key.  The
    plan contract (pinned by test_bucketing): when both tables are
    bucketed by ``on`` with the same count, the executed plan
    contains NO ``Exchange`` — the join runs bucket-to-bucket.  The
    broadcast path is left enabled; if one side is small enough to
    broadcast, that is still the better plan and the contract is
    vacuously met (broadcast has no shuffle either)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=on, how=how
    )
