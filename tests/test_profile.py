"""Column profiler tests (operators/profile.py)."""

from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.profile import profile


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 0.25)],
        "id long, s string, x double",
    )
    out = {r["col_name"]: r.asDict() for r in profile(df).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_val"] == "a" and out["s"]["max_val"] == "b"
    # numeric min/max on the native type, not lexicographic
    assert out["x"]["min_val"] == "0.25" and out["x"]["max_val"] == "2.5"
    assert out["x"]["n_nulls"] == 1


def test_profile_two_passes_no_sort(spark):
    """The profile is exactly TWO single-row aggregates (stats pass +
    distinct pass), not one per column — and neither sorts: the string
    min/max (immutable buffer → SortAggregate) is kept away from the
    COUNT-DISTINCT Expand so the expanded rows stay in HashAggregate
    and the global stats fold needs no Sort node at all."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.col("id").cast("string").alias("s")
    )
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 2  # two column-pruned passes, not 3 per column
    assert "+- Sort " not in plan  # the expensive shape this design avoids
    assert "HashAggregate" in plan  # distinct pass stays hash-based


def test_profile_approx_distinct_skips_expand(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 13).alias("m"))
    exact_plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile(df, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # multiple COUNT(DISTINCT) expands input
    assert "Expand" not in approx_plan  # HLL path stays single-pass
    row = {r["col_name"]: r for r in profile(df, exact_distinct=False).collect()}
    assert abs(row["id"]["n_distinct"] - 1000) / 1000 < 0.1


def test_histogram_bins_and_bounds(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        histogram,
    )

    df = spark.createDataFrame([(float(x),) for x in range(101)], "x double")
    out = {r["bin"]: r for r in histogram(df, "x", bins=10, lo=0.0, hi=100.0).collect()}
    assert len(out) == 10
    assert out[0]["n"] == 10 and out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 10.0
    assert out[9]["n"] == 11  # value at hi folds into the last bin
    # auto-bounds path (min/max pre-pass) agrees
    auto = {r["bin"]: r["n"] for r in histogram(df, "x", bins=10).collect()}
    assert auto == {b: r["n"] for b, r in out.items()}


def test_column_checksums_invariant_under_layout(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        column_checksums,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, s string"
    )
    a = {r["col_name"]: r["checksum"] for r in column_checksums(df).collect()}
    b = {r["col_name"]: r["checksum"] for r in column_checksums(df.repartition(7)).collect()}
    assert a == b  # order/partitioning never change the digest
    # any value change changes the digest
    df2 = spark.createDataFrame([(1, "a"), (2, None), (3, "X")], "id long, s string")
    c = {r["col_name"]: r["checksum"] for r in column_checksums(df2).collect()}
    assert c["id"] == a["id"] and c["s"] != a["s"]


def test_zscore_outliers_flags_extremes_only(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        zscore_outliers,
    )

    vals = [float(x) for x in range(100)] + [10_000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = zscore_outliers(df, "x", threshold=3.0).collect()
    assert [r["x"] for r in out] == [10_000.0]
    assert out[0]["zscore"] > 3.0


def test_quantile_buckets_sizes_and_value_semantics(spark, sf_dir):
    """Near-equal tercile sizes on a continuous column; equal values
    share a bucket; NULLs get NULL; plan has no global sort."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        quantile_buckets,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = quantile_buckets(orders, "o_totalprice", 3, relative_error=1e-6)
    sizes = {r.bucket: r.c for r in
             out.groupBy("bucket").count().withColumnRenamed("count", "c").collect()}
    n = orders.count()
    assert set(sizes) == {1, 2, 3}
    for b in (1, 2, 3):
        assert abs(sizes[b] - n / 3) < n * 0.02  # within 2%

    # equal values share a bucket
    same = spark.createDataFrame(
        [(float(v),) for v in [1, 1, 1, 1, 2, 3, 4, 5]] + [(None,)],
        "x double",
    )
    got = quantile_buckets(same, "x", 2, relative_error=0.0).collect()
    ones = {r.bucket for r in got if r.x == 1.0}
    assert len(ones) == 1
    assert [r.bucket for r in got if r.x is None] == [None]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.replace("SortMergeJoin", "")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_buckets(orders, "o_totalprice", 1)


def test_exact_ntile_matches_native_ntile(spark):
    """exact_ntile == NTILE(n) OVER (ORDER BY value, id) bit-for-bit,
    including tie-splitting and the uneven-remainder tiles — on data
    engineered with heavy value ties across tile boundaries."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import exact_ntile

    rows = [(i, float(i % 7)) for i in range(101)]  # 101 % 3 != 0
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        (r.id): r.bucket
        for r in exact_ntile(df, 3, "v", "id", coarse_buckets=4).collect()
    }
    want = {
        (r.id): r.nt
        for r in df.withColumn(
            "nt",
            F.ntile(3).over(Window.orderBy(F.col("v").asc(), F.col("id").asc())),
        ).collect()
    }
    assert got == want

    # n_tiles > row count degenerates to rank
    small = spark.createDataFrame([(1, 5.0), (2, 1.0)], "id long, v double")
    got2 = {r.id: r.bucket for r in exact_ntile(small, 5, "v", "id").collect()}
    assert got2 == {2: 1, 1: 2}


def test_weighted_median_small_case(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1, 1), ("a", 2.0, 1, 2), ("a", 3.0, 2, 3),
         ("b", 10.0, 9, 4), ("b", 99.0, 1, 5)],
        "g string, v double, wt int, tb int",
    )
    out = {r["g"]: r for r in weighted_median(df, "g", "v", "wt", "tb").collect()}
    # a: weights 1,1,2 (tot 4); cum at v=2.0 is 2, 2*2>=4 -> median 2.0
    assert out["a"]["w_median"] == 2.0 and out["a"]["total_weight"] == 4
    # b: weight 9 at 10.0 dominates
    assert out["b"]["w_median"] == 10.0 and out["b"]["total_weight"] == 10


def test_deterministic_mode_tie_break(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        deterministic_mode,
    )

    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "z")],
        "g string, v string",
    )
    row = deterministic_mode(df, "g", "v").collect()[0]
    # counts: a=2, b=2, z=1 -> tie broken by smallest value
    assert row["mode_value"] == "a" and row["mode_count"] == 2


def test_winsorized_mean_clips_outliers(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        winsorized_mean,
    )

    rows = [("g", float(v)) for v in range(1, 20)] + [("g", 10000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorized_mean(df, "g", "v", lo=0.0, hi=0.9).collect()[0]
    # the 10000 outlier is clipped to the p90 cut, not dropped
    assert out["n"] == 20
    assert out["w_mean"] < 30
    import pytest

    with pytest.raises(ValueError):
        winsorized_mean(df, "g", "v", lo=0.5, hi=0.5)


def test_minmax_normalize_bounds_and_degenerate(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        minmax_normalize,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 15.0), ("b", 7.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["v_norm"] for r in minmax_normalize(df, "g", "v").collect()}
    assert out[("a", 10.0)] == 0.0 and out[("a", 20.0)] == 1.0
    assert out[("a", 15.0)] == 0.5
    assert out[("b", 7.0)] == 0.5  # single-value group


def test_srm_report_densifies_missing_arm(spark):
    """ADVICE r9 #1: with every user in one arm, the missing arm's
    (0 - t/2)^2/(t/2) expected-count term must still contribute —
    chi2 = t/2 + t/2 = t exactly in the all-one-arm extreme (here 4),
    not t/2.  And the t=0 degenerate yields NULL, not NaN."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        srm_report,
    )

    arms = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "A")], "user_id long, arm string"
    )
    r = srm_report(arms).collect()[0]
    assert (r.n_a, r.n_b, r.df) == (4, 0, 1)
    assert r.srm_chi2 == 4.0
    empty = spark.createDataFrame([], "user_id long, arm string")
    r0 = srm_report(empty).collect()[0]
    assert (r0.n_a, r0.n_b) == (0, 0) and r0.srm_chi2 is None
