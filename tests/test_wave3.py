"""Wave-3 surfaces: Count-Min Sketch properties, Python Data Source
partition planning, SQL UDF inlining, TABLE-arg UDTF."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.functions.cms import (
    cms_build,
    cms_estimate,
)


def test_cms_never_undercounts_and_matches_python(spark):
    d, w = 3, 16
    keys = [f"k{i % 7}" for i in range(100)] + ["rare"]
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    truec = df.groupBy("s").agg(F.count(F.lit(1)).alias("true_cnt"))
    sketch = cms_build(df, "s", d=d, w=w)
    est = {
        r["s"]: (r["true_cnt"], r["est"])
        for r in cms_estimate(truec, "s", sketch, d=d, w=w).collect()
    }
    # python model of the same grid
    def pos(s, i):
        return int(hashlib.md5(f"{s}@{i}".encode()).hexdigest()[:15], 16) % w

    grid: dict[tuple[int, int], int] = {}
    from collections import Counter

    cnt = Counter(keys)
    for s, c in cnt.items():
        for i in range(d):
            cell = (i, pos(s, i))
            grid[cell] = grid.get(cell, 0) + c
    for s, (true_cnt, e) in est.items():
        assert e >= true_cnt  # CMS upper bound
        assert e == min(grid[(i, pos(s, i))] for i in range(d))


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 1)], "s string, wt int")
    sketch = cms_build(df, "s", d=2, w=64, weight_col="wt")
    est = cms_estimate(
        spark.createDataFrame([("a",), ("b",)], "s string"), "s", sketch, d=2, w=64
    )
    got = {r["s"]: r["est"] for r in est.collect()}
    assert got["a"] >= 7 and got["b"] >= 1


def test_cms_sketch_size_capped(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(5000)], "s string")
    sketch = cms_build(df, "s", d=4, w=32)
    assert sketch.count() <= 4 * 32


def test_python_datasource_partitions_and_determinism(spark):
    from aws_glue_jobs_incremental_database_etl_spark.sources.python_datasource import (
        _det_value,
        register,
    )

    register(spark)
    df = (
        spark.read.format("deterministic_numbers")
        .option("n", "50")
        .option("numPartitions", "4")
        .load()
    )
    rows = {r["i"]: r for r in df.collect()}
    assert len(rows) == 50
    for i in (0, 17, 49):
        assert rows[i]["value"] == _det_value(i)
        assert rows[i]["bucket"] == _det_value(i) % 5
    # partition planning is respected
    assert df.rdd.getNumPartitions() == 4


def test_python_datasource_streaming_reader_with_resume(spark, tmp_path):
    """The streaming half of the Python Data Source surface: rows
    arrive as offset-tracked micro-batches, the drained total equals
    the batch read, and a SECOND query from the same checkpoint with a
    grown `n` reads only the delta (offset = the engine-checkpointed
    bookmark)."""
    from aws_glue_jobs_incremental_database_etl_spark.sources.python_datasource import (
        _det_value,
        register,
    )

    register(spark)
    out = str(tmp_path / "out"); ckpt = str(tmp_path / "ck")

    def drain(n):
        q = (
            spark.readStream.format("deterministic_numbers")
            .option("n", str(n))
            .option("batchRows", "13")
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain(40)
    rows = {r["i"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == set(range(40))
    assert rows[39]["value"] == _det_value(39)

    drain(65)  # source grew; checkpointed offset resumes at 40
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) == 65  # no duplicates from re-reading [0, 40)
    assert {r["i"] for r in rows2} == set(range(65))


def test_sql_udf_inlines_no_python_boundary(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark import registry

    out = registry.Q["sql_udf_revenue_orders"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_udtf_table_arg_matches_builtin(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark import registry

    out = registry.Q["udtf_table_arg_docs"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = docs.select(
        "doc_id",
        F.size(
            F.array_distinct(
                F.split(F.lower(F.trim("text")), r"\s+")
            )
        ).alias("n_unique"),
    )
    merged = out.join(expect.withColumnRenamed("n_unique", "exp"), "doc_id")
    # empty-text edge: split('') yields [''] (size 1) builtin-side, the
    # UDTF says 0 — align by comparing only non-empty docs
    nonempty = merged.join(
        docs.filter(F.trim("text") != "").select("doc_id"), "doc_id"
    )
    assert nonempty.filter(F.col("n_unique") != F.col("exp")).count() == 0


def test_python_datasource_jsonl_writer_two_phase_commit(spark, tmp_path):
    """The Python Data Source WRITER surface: per-task staged part
    files published by the driver-side commit (rename + _MANIFEST) —
    only committed files are visible, the manifest row count matches,
    and the written data round-trips through spark.read.json."""
    import json
    import os

    from aws_glue_jobs_incremental_database_etl_spark.sources.python_datasource import (
        register_writer,
    )

    register_writer(spark)
    out = str(tmp_path / "out")
    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "id * 2 AS doubled", "concat('u', id % 7) AS tag"
    )
    df.write.format("jsonl_lines").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert sum(f["rows"] for f in manifest["files"]) == 1000
    assert len(manifest["files"]) == 4  # one part per partition
    # no staging leftovers; every manifest file exists
    names = set(os.listdir(out))
    assert not any(n.startswith(".staging-") for n in names)
    assert all(f["file"] in names for f in manifest["files"])
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == 1000
    got = {r.id: (r.doubled, r.tag) for r in back.collect()}
    assert got[7] == (14, "u0")

    # ADVICE r4: mode("overwrite") must TRUNCATE — stale part files
    # from the previous commit must not surface through the documented
    # spark.read.json read-back path as mixed old+new rows
    df2 = spark.range(0, 50, 1, 2).selectExpr(
        "id + 10000 AS id", "id AS doubled", "'v2' AS tag"
    )
    df2.write.format("jsonl_lines").option("path", out).mode(
        "overwrite"
    ).save()
    manifest2 = json.load(open(os.path.join(out, "_MANIFEST")))
    assert sum(f["rows"] for f in manifest2["files"]) == 50
    back2 = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back2.count() == 50  # old 1000 rows gone
    assert back2.filter("id < 10000").count() == 0
