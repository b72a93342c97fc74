"""Schema-evolution merge tests (SURVEY.md E2; FIXTURES.md scenario 4).

The merge must replicate jdbc_incremental.py:441-460 decision for
decision: target order stable, dropped columns retained, in-place
retype, new columns appended, partition columns excluded from "new".
"""

import random

from aws_glue_jobs_incremental_database_etl_spark.evolution import merge_schemas

V1 = [
    {"Name": "p_partkey", "Type": "bigint"},
    {"Name": "p_name", "Type": "string"},
    {"Name": "p_brand", "Type": "string"},
    {"Name": "p_type", "Type": "string"},
    {"Name": "p_size", "Type": "int"},
    {"Name": "p_retailprice", "Type": "double"},
]


def test_identity_merge():
    assert merge_schemas(V1, V1) == V1


def test_drop_retype_add():
    # v2: drops p_brand, retypes p_size int->bigint, appends p_comment
    v2 = [
        {"Name": "p_partkey", "Type": "bigint"},
        {"Name": "p_name", "Type": "string"},
        {"Name": "p_type", "Type": "string"},
        {"Name": "p_size", "Type": "bigint"},
        {"Name": "p_retailprice", "Type": "double"},
        {"Name": "p_comment", "Type": "string"},
    ]
    merged = merge_schemas(v2, V1)
    assert [c["Name"] for c in merged] == [
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice", "p_comment",
    ]
    # dropped column retained with its old type
    assert {"Name": "p_brand", "Type": "string"} in merged
    # retype in place
    assert merged[4] == {"Name": "p_size", "Type": "bigint"}


def test_source_reorder_does_not_change_target_order():
    v3 = list(reversed(V1))
    merged = merge_schemas(v3, V1)
    assert [c["Name"] for c in merged] == [c["Name"] for c in V1]


def test_new_partition_column_not_appended():
    v2 = V1 + [{"Name": "year", "Type": "int"}]
    merged = merge_schemas(v2, V1, partition_spec=["year"])
    assert all(c["Name"] != "year" for c in merged)


def test_merge_is_idempotent_and_order_stable_random():
    # property-style: random deltas never reorder surviving target cols
    rng = random.Random(42)
    names = [f"c{i}" for i in range(12)]
    for _ in range(200):
        target = [{"Name": n, "Type": "int"} for n in names]
        src_names = [n for n in names if rng.random() > 0.3]
        rng.shuffle(src_names)
        src = [
            {"Name": n, "Type": rng.choice(["int", "bigint", "string"])}
            for n in src_names
        ]
        src += [{"Name": f"n{rng.randrange(100)}", "Type": "string"}]
        merged = merge_schemas(src, target)
        # prefix preserves full target order
        assert [c["Name"] for c in merged[: len(target)]] == names
        # idempotent on re-merge
        assert merge_schemas(src, merged) == merged
