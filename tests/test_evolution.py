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


# ---------------------------------------------------------------------------
# Property-based: random schema deltas never violate the E2 invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TYPES = ["int", "bigint", "double", "string", "timestamp", "boolean"]
_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=0,
    max_size=8, unique=True,
)


@st.composite
def _delta(draw):
    """A target schema and a randomly-evolved source schema."""
    tgt_names = draw(_names)
    target = [
        {"Name": n, "Type": draw(st.sampled_from(_TYPES))} for n in tgt_names
    ]
    kept = [n for n in tgt_names if draw(st.booleans())]       # others dropped
    added = [n for n in draw(_names) if n not in tgt_names]
    source = [
        {"Name": n, "Type": draw(st.sampled_from(_TYPES))} for n in kept + added
    ]
    partition = [n for n in added if draw(st.booleans())]
    return source, target, partition


@given(_delta())
@settings(max_examples=200, deadline=None)
def test_merge_invariants(delta):
    source, target, partition = delta
    merged = merge_schemas(source, target, partition)
    src = {c["Name"]: c["Type"] for c in source}
    tgt_names = [c["Name"] for c in target]
    merged_names = [c["Name"] for c in merged]

    # 1. target order is a stable prefix
    assert merged_names[: len(tgt_names)] == tgt_names
    # 2. dropped source columns retained with their old types
    for c in target:
        if c["Name"] not in src:
            assert {"Name": c["Name"], "Type": c["Type"]} in merged
    # 3. retypes happen in place
    for c in target:
        if c["Name"] in src:
            i = tgt_names.index(c["Name"])
            assert merged[i]["Type"] == src[c["Name"]]
    # 4. new columns appended at the end, minus partition keys
    new = [n for n in merged_names[len(tgt_names):]]
    expected_new = [
        c["Name"] for c in source
        if c["Name"] not in tgt_names and c["Name"] not in partition
    ]
    assert new == expected_new
    # 5. no duplicates, idempotent re-merge
    assert len(set(merged_names)) == len(merged_names)
    assert merge_schemas(source, merged, partition) == merged
