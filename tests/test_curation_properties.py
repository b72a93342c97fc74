"""Property tests for the round-3 curation operators: each example
runs a real Spark job, so max_examples stays small — the value is in
the weird shapes hypothesis finds (ties, empties, degenerate groups),
not volume."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


_vals = st.lists(
    st.tuples(
        st.floats(min_value=0, max_value=20, allow_nan=False).map(
            lambda x: float(round(x, 1))
        ),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=40,
)


@given(_vals)
@settings(max_examples=10, deadline=None)
def test_pareto_frontier_property(spark, rows):
    from aws_glue_jobs_incremental_database_etl_spark.operators.sampling import (
        pareto_frontier_2d,
    )

    df = spark.createDataFrame(rows, "mx double, mn int")
    got = {
        (r["mx"], r["mn"], r["n_rows"])
        for r in pareto_frontier_2d(df, "mx", "mn").collect()
    }
    surv = [
        r
        for r in rows
        if not any(
            o[0] >= r[0] and o[1] <= r[1] and (o[0] > r[0] or o[1] < r[1])
            for o in rows
        )
    ]
    expect = {(mx, mn, c) for (mx, mn), c in Counter(surv).items()}
    assert got == expect


_wrows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(
            lambda x: float(round(x, 2))
        ),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=30,
)


@given(_wrows)
@settings(max_examples=10, deadline=None)
def test_weighted_median_property(spark, rows):
    from aws_glue_jobs_incremental_database_etl_spark.operators.profile import (
        weighted_median,
    )

    data = [(g, v, w, i) for i, (g, v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, v double, wt int, tb int")
    got = {
        r["g"]: (r["w_median"], r["total_weight"])
        for r in weighted_median(df, "g", "v", "wt", "tb").collect()
    }
    for g in {r[0] for r in rows}:
        items = sorted(
            [(v, w) for (gg, v, w) in rows if gg == g]
        )
        tot = sum(w for _, w in items)
        cum = 0
        med = None
        for v, w in items:
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        assert got[g] == (med, tot)


@given(st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_cms_upper_bound_property(spark, keys):
    from aws_glue_jobs_incremental_database_etl_spark.functions.cms import (
        cms_build,
        cms_estimate,
    )

    d, w = 3, 16
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    truec = df.groupBy("s").agg(F.count(F.lit(1)).alias("tc"))
    est = cms_estimate(truec, "s", cms_build(df, "s", d=d, w=w), d=d, w=w)
    for r in est.collect():
        assert r["est"] >= r["tc"]  # never undercounts, any input
