"""Deterministic hash sampling / split tests (operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
)


def _py_bucket(key, buckets=10_000):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


def test_bucket_matches_hashlib_contract(spark):
    df = spark.range(200).select(F.col("id"))
    got = {r["id"]: r["b"] for r in df.withColumn("b", hash_bucket("id")).collect()}
    assert got == {i: _py_bucket(i) for i in range(200)}


def test_split_stable_under_growth_and_repartition(spark):
    small = spark.range(500)
    big = spark.range(2000).repartition(13)
    s1 = {r["id"]: r["split"] for r in hash_split(small, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    s2 = {r["id"]: r["split"] for r in hash_split(big, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(s2[k] == v for k, v in s1.items())  # growth never reassigns
    counts = {}
    for v in s2.values():
        counts[v] = counts.get(v, 0) + 1
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert counts["train"] + counts["val"] + counts["test"] == 2000


def test_sample_monotone_in_fraction(spark):
    df = spark.range(1000)
    s10 = {r["id"] for r in deterministic_sample(df, "id", 0.10).collect()}
    s01 = {r["id"] for r in deterministic_sample(df, "id", 0.01).collect()}
    assert s01 <= s10  # smaller sample is a subset of the larger
    assert 60 <= len(s10) <= 140


def test_split_fraction_validation(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(df, "id", 1.5)


def test_split_is_pure_projection_no_shuffle(spark):
    df = spark.range(100)
    plan = hash_split(df, "id", {"a": 0.5, "b": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_exact_k_per_group(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        stratified_sample_k,
    )

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(60)] + [(100, "tiny")],
        "id long, g string",
    )
    out = stratified_sample_k(df, ["g"], "id", 4)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}  # min(k, |stratum|)
    # deterministic: same selection on a reshuffled frame
    again = stratified_sample_k(df.repartition(7), ["g"], "id", 4)
    assert {r["id"] for r in out.collect()} == {r["id"] for r in again.collect()}


def test_mixture_resample_hits_target_ratios(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        mixture_resample,
    )

    rows = [(g * 10_000 + i, f"g{g}") for g in range(3) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = mixture_resample(df, "grp", "id", {"g0": 0.6, "g1": 0.3, "g2": 0.1})
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    # binding group is g0 (1000/0.6): it keeps everything; ratios ~60/30/10
    assert counts["g0"] == 1000
    assert abs(counts["g1"] / total - 0.3) < 0.03
    assert abs(counts["g2"] / total - 0.1) < 0.03


def test_mixture_resample_deterministic_and_growth_stable(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        mixture_resample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    shares = {"a": 0.8, "b": 0.2}
    picked1 = {r.id for r in mixture_resample(df, "grp", "id", shares).collect()}
    picked2 = {r.id for r in mixture_resample(df, "grp", "id", shares).collect()}
    assert picked1 == picked2
    # groups not in the target mixture are dropped entirely
    df2 = df.union(spark.createDataFrame([(99999, "c")], "id long, grp string"))
    out2 = mixture_resample(df2, "grp", "id", shares)
    assert out2.filter("grp = 'c'").count() == 0


def test_temperature_resample_flattens_toward_uniform(spark):
    """alpha=0.5 must shrink big sources more than small ones: the
    surviving mixture sits strictly between the raw distribution and
    uniform; the smallest source (binding) keeps everything; the
    selection is deterministic and matches a python replica of the
    sqrt-share solve."""
    import math

    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        temperature_resample,
    )

    sizes = {"big": 4000, "mid": 1000, "small": 250}
    rows = []
    nxt = 0
    for g, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((nxt, g))
            nxt += 1
    df = spark.createDataFrame(rows, "id long, grp string")
    out = temperature_resample(df, "grp", "id", alpha=0.5)
    got = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    total = sum(sizes.values())
    # replica of the solve
    share = {g: math.sqrt(n / total) for g, n in sizes.items()}
    binding = min(n / share[g] for g, n in sizes.items())
    keep = {g: min(1.0, binding * share[g] / n) for g, n in sizes.items()}
    assert keep["small"] == 1.0 and got["small"] == sizes["small"]
    for g in sizes:
        assert abs(got[g] - keep[g] * sizes[g]) < 0.05 * sizes[g] + 5
    # flattened: surviving big-share strictly below raw big-share,
    # strictly above uniform
    surv = got["big"] / sum(got.values())
    assert 1 / 3 < surv < sizes["big"] / total
    # deterministic
    again = {r.id for r in temperature_resample(df, "grp", "id", 0.5).collect()}
    assert again == {r.id for r in out.collect()}
    with pytest.raises(ValueError):
        temperature_resample(df, "grp", "id", alpha=0.0)


def test_mixture_resample_validates_shares(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        mixture_resample,
    )

    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    with pytest.raises(ValueError):
        mixture_resample(df, "grp", "id", {})
    with pytest.raises(ValueError):
        mixture_resample(df, "grp", "id", {"a": -0.5})


def test_weighted_sample_matches_python_replica(spark):
    """A-ES selection ≡ an exact hashlib replica, and the plan is
    TakeOrderedAndProject (no global sort, no shuffle)."""
    import math

    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        DEFAULT_BUCKETS,
        weighted_sample_k,
    )

    rows = [(i, float((i * 37) % 100 + 1)) for i in range(500)]
    rows += [(900, 0.0), (901, -5.0), (902, None)]  # zero-mass rows
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample_k(df, 50, "w", "id").collect()]

    def aes(i, w):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % DEFAULT_BUCKETS
        return math.log((b + 1) / (DEFAULT_BUCKETS + 1)) / w

    want = [i for i, w in sorted(
        ((i, w) for i, w in rows if w and w > 0),
        key=lambda t: (-aes(t[0], t[1]), t[0]),
    )[:50]]
    assert sorted(got) == sorted(want)
    assert 900 not in got and 901 not in got and 902 not in got

    plan = weighted_sample_k(df, 50, "w", "id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_weighted_sample_prefers_heavy_rows(spark):
    """Rows with 100x the weight should dominate the sample."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1100)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample_k(df, 100, "w", "id").collect()]
    heavy = sum(1 for i in got if i < 100)
    # 100 heavy of 1100 rows hold 100*100/(100*100+1000*1) ≈ 91% of
    # the mass; the A-ES sample should be mostly heavy rows
    assert heavy >= 70


def test_weighted_sample_per_group_quota_and_determinism(spark, sf_dir):
    """min(k, |group|) rows per group, stable across repartition."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        weighted_sample_k_per_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_sample_k_per_group(docs, "source", 3, "n_chars", "doc_id")
    sizes = {r.source: r.c for r in
             out.groupBy("source").count().withColumnRenamed("count", "c").collect()}
    n_sources = docs.select("source").distinct().count()
    assert len(sizes) == n_sources and all(c == 3 for c in sizes.values())

    again = weighted_sample_k_per_group(
        docs.repartition(7), "source", 3, "n_chars", "doc_id"
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_epoch_shuffle_deterministic_and_balanced(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        epoch_shuffle,
    )
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = epoch_shuffle(d, "doc_id", seed=1, n_shards=8).select("doc_id", "shard")
    b = epoch_shuffle(d, "doc_id", seed=1, n_shards=8).select("doc_id", "shard")
    assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()
    sizes = [r["c"] for r in a.groupBy("shard").agg(F.count("*").alias("c")).collect()]
    assert max(sizes) - min(sizes) <= 1  # equal shards
    # a different seed is a different permutation
    c = epoch_shuffle(d, "doc_id", seed=2, n_shards=8).select("doc_id", "shard")
    joined = a.withColumnRenamed("shard", "s1").join(c, "doc_id")
    assert joined.filter(F.col("s1") != F.col("shard")).count() > 0
    # no single-partition sort anywhere in the plan
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_pareto_frontier_matches_brute_force(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        pareto_frontier_2d,
    )
    import itertools
    import random

    rng = random.Random(7)
    rows = [(float(rng.randint(0, 30)), rng.randint(0, 30)) for _ in range(200)]
    df = spark.createDataFrame(rows, "mx double, mn int")
    got = {
        (r["mx"], r["mn"], r["n_rows"])
        for r in pareto_frontier_2d(df, "mx", "mn").collect()
    }

    def dominated(r, others):
        return any(
            (o[0] >= r[0] and o[1] <= r[1] and (o[0] > r[0] or o[1] < r[1]))
            for o in others
        )

    surv = [r for r in rows if not dominated(r, rows)]
    from collections import Counter

    expect = {(mx, mn, c) for (mx, mn), c in Counter(surv).items()}
    assert got == expect and got


def test_pareto_frontier_no_single_partition_sort(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        pareto_frontier_2d,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = pareto_frontier_2d(o, "o_totalprice", "o_orderdate")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_token_budget_greedy_prefix(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(1, 9.0, 40), (2, 8.0, 40), (3, 7.0, 40), (4, 6.0, 40)],
        "id long, score double, tokens int",
    )
    out = select_token_budget(df, "id", "score", "tokens", budget=100)
    rows = sorted((r["id"], r["cum_tokens"]) for r in out.collect())
    # greedy by score desc: 40, 80, then 120 > 100 stops
    assert rows == [(1, 40), (2, 80)]
    # zero budget selects nothing; negative raises
    assert select_token_budget(df, "id", "score", "tokens", 0).count() == 0
    import pytest

    with pytest.raises(ValueError):
        select_token_budget(df, "id", "score", "tokens", -1)


def test_token_budget_no_single_partition_sort(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        select_token_budget,
    )
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("s"),
        F.lit(10).cast("long").alias("t"),
    )
    out = select_token_budget(d, "doc_id", "s", "t", budget=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_leakage_safe_split_keeps_pairs_together(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        leakage_safe_split,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 101)], "doc_id long"
    )
    # chain 1-2-3 plus pair 10-11; everything else singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(
        docs, "doc_id", pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    rows = {r["id"]: (r["split_key"], r["split"]) for r in out.collect()}
    assert rows[1] == rows[2] == rows[3]      # whole chain shares key+split
    assert rows[10] == rows[11]
    assert rows[50][0] == 50                  # singleton keys to itself
    # every split is populated on 100 docs at these fractions
    assert {s for _, s in rows.values()} == {"train", "val", "test"}


def test_kfold_assign_is_stable_partition_of_keys(spark):
    """Every key lands in exactly one of k folds, the assignment is
    the md5 contract (engine-portable, verified against a pure-python
    replay), and k < 2 is rejected."""
    import hashlib

    import pytest

    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        kfold_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = {r.doc_id: r.fold for r in kfold_assign(df, "doc_id", k=5).collect()}
    assert len(out) == 200
    for i in range(200):
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5
        assert out[i] == want
    assert set(out.values()) == {0, 1, 2, 3, 4}
    with pytest.raises(ValueError, match="k must be"):
        kfold_assign(df, "doc_id", k=1)


def test_domain_cap_keeps_top_per_domain(spark):
    """Top-cap per domain by score desc with id tie-break; a domain
    under the cap survives whole; cap < 1 rejected."""
    import pyspark.sql.functions as F
    import pytest

    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        domain_cap,
    )

    rows = [("a", i, i % 7) for i in range(10)] + [("b", 100, 5), ("b", 101, 5)]
    df = spark.createDataFrame(rows, "dom string, id long, score long")
    out = domain_cap(df, "dom", cap=3, score=F.col("score"), id_col="id")
    got = {(r.dom, r.id): r.domain_rank for r in out.collect()}
    # domain a: scores i%7 -> top are ids 6 (score 6), 5 (5), 4 (4)...
    # ties: score 6 only id 6; score 5 ids 5 and... i%7==5 -> i=5; 6->6
    a_kept = sorted(id for d, id in got if d == "a")
    assert len(a_kept) == 3
    assert a_kept == [4, 5, 6]
    # domain b under the cap: both rows kept, tie broken by id asc
    assert got[("b", 100)] == 1 and got[("b", 101)] == 2
    with pytest.raises(ValueError, match="cap must be"):
        domain_cap(df, "dom", cap=0, score=F.col("score"), id_col="id")
