"""Portable SQL Bloom filter: no false negatives, engine-independent
bit layout (Python md5 reimplementation agrees), map-only probe plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.functions.bloom import (
    bloom_build,
    bloom_probe,
    bloom_position,
)


def _py_positions(key: str, m: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def test_position_matches_python_md5(spark):
    keys = ["alpha", "bravo", "charlie", ""]
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    got = df.select(
        "s", *[bloom_position(F.col("s"), i, 4096).alias(f"p{i}") for i in range(3)]
    ).collect()
    for r in got:
        assert [r[f"p{i}"] for i in range(3)] == _py_positions(r["s"], 4096, 3)


def test_members_always_hit(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], "s string")
    bloom = bloom_build(keys, "s", m=1024, k=5)
    probed = bloom_probe(keys, "s", bloom, m=1024, k=5)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_false_positives_match_python_model(spark):
    m, k = 128, 5
    members = [f"m{i}" for i in range(30)]
    others = [f"x{i}" for i in range(100)]
    bloom = bloom_build(
        spark.createDataFrame([(s,) for s in members], "s string"), "s", m=m, k=k
    )
    probed = {
        r["s"]: r["bloom_hit"]
        for r in bloom_probe(
            spark.createDataFrame([(s,) for s in others], "s string"),
            "s",
            bloom,
            m=m,
            k=k,
        ).collect()
    }
    bits = set()
    for s in members:
        bits.update(_py_positions(s, m, k))
    for s in others:
        expect = all(p in bits for p in _py_positions(s, m, k))
        assert probed[s] == expect, s
    assert any(probed.values())  # the tiny filter must actually FP


def test_probe_plan_is_map_only(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "s string")
    bloom = bloom_build(keys, "s", m=1024, k=5)
    probed = bloom_probe(keys, "s", bloom, m=1024, k=5)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan
    # all shuffles belong to the bounded build side (one m/32-group
    # bit_or aggregate + one ≤m/32-row pack); the probe itself is
    # map-only, so exactly those two exchanges may appear
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_m_must_be_word_multiple(spark):
    keys = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError):
        bloom_build(keys, "s", m=100)
