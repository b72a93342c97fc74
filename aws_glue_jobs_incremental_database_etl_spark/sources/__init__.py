"""Source readers: parquet / csv / json files and JDBC.

Covers the reference's scan surface (SURVEY.md §2.1 S1–S4): the
incremental catalog scan becomes ``read`` + a pushed-down watermark
filter (applied by the pipeline), and the hash-partitioned parallel
JDBC read (``hashfield``/``hashpartitions``,
``jdbc_incremental.py:181-184``) becomes ``spark.read.jdbc`` with
generated hash predicates.
"""

from .files import read_table, read_csv, read_json, read_parquet
from .jdbc import hash_partition_predicates, read_jdbc

__all__ = [
    "read_table",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_jdbc",
    "hash_partition_predicates",
]
