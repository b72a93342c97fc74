"""Arrow-path quantization parity, blocked edit-distance join,
rolling z-score leakage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.joins import (
    edit_distance_join,
)
from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
    quantize_embeddings,
    quantize_embeddings_arrow,
)


def test_arrow_quantize_bit_identical_to_expressions(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = quantize_embeddings(emb).orderBy("id").collect()
    b = quantize_embeddings_arrow(emb).orderBy("id").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["id"] == rb["id"]
        assert ra["scale"] == rb["scale"]  # bit-exact, no rounding
        assert ra["q"] == rb["q"]


def test_arrow_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["id"]: r for r in quantize_embeddings_arrow(df).collect()}
    assert out[1]["scale"] == 1.0 and out[1]["q"] == [0, 0]
    assert out[2]["q"] == [64, -127]  # floor(1*63.5+0.5), floor(-2*63.5+0.5)


def test_edit_distance_join_small_case(spark):
    df = spark.createDataFrame(
        [
            (1, "red bolt", "A"),
            (2, "red bolt", "A"),   # dist 0
            (3, "red bolts", "A"),  # dist 1 to both
            (4, "red bolt", "B"),   # other block: never paired with A
            (5, "completely different", "A"),
        ],
        "id long, name string, blk string",
    )
    out = edit_distance_join(df, "id", "name", "blk", max_dist=2)
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert pairs == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_edit_distance_plan_is_equi_join(spark):
    df = spark.createDataFrame(
        [(i, f"name {i}", str(i % 3)) for i in range(100)],
        "id long, name string, blk string",
    )
    plan = (
        edit_distance_join(df, "id", "name", "blk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan  # blocking key must drive an equi-join


def test_rolling_zscore_excludes_self(spark):
    import datetime as dt

    # constant history then one spike: z defined by history only
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), 7, 10.0 + (i % 3), "c", "{}")
        for i in range(10)
    ] + [(10, dt.datetime(2024, 1, 1, 1, 0), 7, 999.0, "c", "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double, "
        "event_type string, props string",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    sd = F.stddev_samp("value").over(w)
    res = {
        r["event_id"]: r
        for r in df.select(
            "event_id",
            F.count("value").over(w).alias("n_window"),
            F.round((F.col("value") - F.avg("value").over(w)) / F.when(sd != 0, sd), 4).alias("z"),
        ).collect()
    }
    assert res[0]["n_window"] == 0 and res[0]["z"] is None
    assert res[10]["n_window"] == 10
    assert res[10]["z"] > 100  # spike scored against pre-spike stats only


def test_asof_cogroup_matches_window_path(spark, sf_dir):
    """The cogrouped-pandas as-of and the window-union as-of must
    produce identical matches on real data."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.joins import (
        asof_join,
        asof_join_cogroup,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    a = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="click_ts",
        value_cols=["click_ts"], strict=False, tolerance="30 minutes",
    ).orderBy("event_id").collect()
    b = asof_join_cogroup(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="click_ts",
        value_cols=["click_ts"], tolerance_us=30 * 60 * 1_000_000,
    ).orderBy("event_id").collect()
    assert a == b and len(a) > 0


def test_arrow_centroid_assignment_bit_identical(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        assign_nearest_centroid,
        assign_nearest_centroid_arrow,
        fixed_centroids,
    )

    cents = fixed_centroids(64, 8, seed=7)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    a = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid(emb, cents).select("vec_id", "cluster").collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_arrow(emb, cents).select("vec_id", "cluster").collect()
    }
    assert a == b and len(a) > 0


def test_pca_top_component_matches_numpy(spark):
    import numpy as np
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        top_principal_component,
    )

    rng = np.random.RandomState(7)
    # dominant direction along (3, 1, 0, 0) + small isotropic noise
    base = rng.randn(200, 1) @ np.array([[3.0, 1.0, 0.0, 0.0]])
    data = base + 0.05 * rng.randn(200, 4)
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        r["dim_index"]: r["loading"]
        for r in top_principal_component(df, iterations=8).collect()
    }
    v = np.array([got[i] for i in range(4)])
    c = np.cov(data.T, bias=True)
    evals, evecs = np.linalg.eigh(c)
    ref = evecs[:, -1]
    if np.dot(ref, v) < 0:
        ref = -ref
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert np.abs(v - ref).max() < 1e-3  # 8 iterations on a dominant gap


def test_pca_rejects_zero_iterations(spark):
    import pytest
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        top_principal_component,
    )

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        top_principal_component(df, iterations=0)


def test_lloyd_kmeans_separates_obvious_clusters(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        lloyd_kmeans,
    )

    # two tight blobs far apart in 2-D: whatever the seeded init,
    # two rounds of Lloyd must put each blob's members together and
    # land the used centroids on the blob means (to the 1e-6 quantum)
    blob_a = [(i, [10.0 + 0.01 * i, 10.0]) for i in range(5)]
    blob_b = [(10 + i, [-10.0 - 0.01 * i, -10.0]) for i in range(5)]
    df = spark.createDataFrame(
        blob_a + blob_b, "vec_id long, embedding array<double>"
    )
    out = lloyd_kmeans(df, k=2, iterations=3).collect()
    sizes = sorted(
        {r["cluster"]: r["n_members"] for r in out}.values()
    )
    assert sizes == [5, 5]
    cx = {
        (r["cluster"], r["dim_index"]): r["centroid"] for r in out
    }
    xs = sorted(cx[(c, 0)] for c in {r["cluster"] for r in out})
    assert abs(xs[0] - (-10.02)) < 1e-6 and abs(xs[1] - 10.02) < 1e-6


def test_lloyd_kmeans_empty_cluster_keeps_previous_centroid(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        fixed_centroids,
        lloyd_kmeans,
    )

    # one point, k=2: the unused cluster must keep its (rounded)
    # seeded centroid instead of going NULL/zero
    df = spark.createDataFrame(
        [(1, [5.0, 5.0])], "vec_id long, embedding array<double>"
    )
    out = lloyd_kmeans(df, k=2, iterations=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], {})[r["dim_index"]] = r
    used = [c for c, d in by_cluster.items() if d[0]["n_members"] == 1]
    empty = [c for c, d in by_cluster.items() if d[0]["n_members"] == 0]
    assert len(used) == 1 and len(empty) == 1
    assert by_cluster[used[0]][0]["centroid"] == 5.0
    init = fixed_centroids(2, 2, 7)
    assert by_cluster[empty[0]][0]["centroid"] == round(
        float(init[empty[0]][0]), 6
    )


def test_principal_components_top2_matches_numpy(spark):
    import numpy as np
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        principal_components,
    )

    rng = np.random.RandomState(11)
    # strong first axis, clear second axis, tiny residual noise
    data = (
        rng.randn(300, 1) @ np.array([[4.0, 0.0, 0.0, 0.0]])
        + rng.randn(300, 1) @ np.array([[0.0, 2.0, 0.0, 0.0]])
        + 0.03 * rng.randn(300, 4)
    )
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = principal_components(df, k=2, iterations=10).collect()
    v = {c: np.zeros(4) for c in (0, 1)}
    lam = {}
    for r in out:
        v[r["component"]][r["dim_index"]] = r["loading"]
        lam[r["component"]] = r["eigenvalue"]
    c = np.cov(data.T, bias=True)
    evals, evecs = np.linalg.eigh(c)
    for comp, ref_idx in ((0, -1), (1, -2)):
        ref = evecs[:, ref_idx]
        if np.dot(ref, v[comp]) < 0:
            ref = -ref
        assert np.abs(v[comp] - ref).max() < 2e-3, comp
        assert abs(lam[comp] - evals[ref_idx]) < 2e-3, comp
    assert lam[0] > lam[1] > 0
    assert abs(np.dot(v[0], v[1])) < 1e-3  # orthogonal after deflation
