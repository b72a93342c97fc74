import hashlib
import json

import pytest

from aws_glue_jobs_incremental_database_etl_spark.config import (
    TableConfig,
    parse_table_config,
    resolve_table_name,
)
from aws_glue_jobs_incremental_database_etl_spark.sharding import (
    belongs_to_job,
    select_tables,
    shard_of,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_parse_table_config_roundtrip():
    raw = json.dumps(
        [
            {
                "tableName": "orders",
                "bookmarkKeys": ["o_orderkey"],
                "sortOrder": "ASC",
                "partitionSpec": "o_orderstatus",
            },
            {
                "tableName": "lineitem",
                "bookmarkKeys": ["l_orderkey", "l_linenumber"],
                "sortOrder": "desc",
            },
        ]
    )
    cfgs = parse_table_config(raw)
    assert cfgs[0] == TableConfig("orders", ["o_orderkey"], "ASC", ["o_orderstatus"])
    assert cfgs[1].sort_order == "DESC"
    assert cfgs[1].partition_spec == []


def test_partition_spec_slash_split():
    cfgs = parse_table_config(
        [
            {
                "tableName": "t",
                "bookmarkKeys": ["k"],
                "sortOrder": "ASC",
                "partitionSpec": "year/month",
            }
        ]
    )
    assert cfgs[0].partition_spec == ["year", "month"]


def test_missing_bookmark_keys_raises():
    # parity: jdbc_incremental.py:541-549
    with pytest.raises(ValueError, match="Bookmark keys and sort order"):
        parse_table_config([{"tableName": "t", "sortOrder": "ASC"}])


def test_bad_sort_order_raises():
    with pytest.raises(ValueError):
        TableConfig("t", ["k"], "SIDEWAYS")


def test_resolve_table_name_suffix_match():
    # parity: jdbc_incremental.py:529-539 (endswith schema_table, exactly one)
    cands = ["src_mydb_orders", "src_mydb_lineitem"]
    assert resolve_table_name(cands, "mydb", "orders") == "src_mydb_orders"
    with pytest.raises(ValueError):
        resolve_table_name(cands, "mydb", "nation")
    with pytest.raises(ValueError):
        resolve_table_name(["a_mydb_orders", "b_mydb_orders"], "mydb", "orders")


def test_md5_shard_parity_with_hashlib():
    # parity: jdbc_incremental.py:319-325
    for t in TABLES:
        for n in (1, 2, 3, 7):
            expected = int(hashlib.md5(t.encode()).hexdigest(), 16) % n
            assert shard_of(t, n) == expected


@pytest.mark.parametrize("num_jobs", [1, 2, 3])
def test_sharding_is_exact_partition(num_jobs):
    # FIXTURES.md scenario 6: shards partition the table set exactly.
    shards = [select_tables(TABLES, i, num_jobs) for i in range(num_jobs)]
    flat = [t for s in shards for t in s]
    assert sorted(flat) == sorted(TABLES)
    for i, s in enumerate(shards):
        assert all(belongs_to_job(t, i, num_jobs) for t in s)
