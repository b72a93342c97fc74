"""Property-based checks for the round-4 operators: the portable HLL
against a pure-python register model on weird key multisets, and the
incremental join view against the one-shot join under random batch
interleavings.

Few examples × real SparkSession jobs — max_examples stays small; the
value is the corner cases hypothesis finds (duplicate-heavy inputs,
empty batches, keys landing on one side only), not volume."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _hll_model(keys, b=8):
    m = 1 << b
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        s = h // m
        rho = (60 - b) + 1 if s == 0 else (60 - b) - s.bit_length() + 1
        regs[h % m] = max(regs.get(h % m, 0), rho)
    return regs


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    )
)
def test_hll_registers_match_python_model_on_random_multisets(spark, keys):
    from aws_glue_jobs_incremental_database_etl_spark.functions.hll import (
        hll_build,
    )

    df = spark.createDataFrame([(str(k),) for k in keys], "k string")
    got = {r.bucket: r.reg for r in hll_build(df, "k").collect()}
    assert got == _hll_model(keys)


@settings(max_examples=6, deadline=None)
@given(st.permutations(["L0", "L1", "L2", "R0", "R1", "B"]))
def test_incremental_join_view_any_interleaving(
    spark, tmp_path_factory, order
):
    """Whatever order the disjoint left/right slices arrive in
    (including a batch carrying both sides at once), the maintained
    view equals the one-shot join."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.incremental_join import (
        IncrementalJoinView,
    )

    left = spark.createDataFrame(
        [(i % 7, i) for i in range(40)], "k long, v long"
    )
    right = spark.createDataFrame(
        [(i % 7, i, i * 10) for i in range(12)], "k long, ridx long, w long"
    )
    lslice = lambda j: left.filter(F.col("v") % 4 == j)
    rslice = lambda j: right.filter(F.col("ridx") % 3 == j)
    v = IncrementalJoinView(str(tmp_path_factory.mktemp("ij")), on="k")
    for step, tag in enumerate(order):
        if tag == "B":  # both sides in one batch: left slice 3 + right slice 2
            v.apply_batch(
                spark,
                left_delta=lslice(3),
                right_delta=rslice(2),
                batch_id=step,
            )
        elif tag.startswith("L"):
            v.apply_batch(spark, left_delta=lslice(int(tag[1])), batch_id=step)
        else:
            v.apply_batch(spark, right_delta=rslice(int(tag[1])), batch_id=step)
    got = v.read_view(spark).drop("ridx")
    want = left.join(right, "k").drop("ridx")
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-3, max_value=3,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=64, max_size=64,
        ),
        min_size=1, max_size=6,
    )
)
def test_pq_arrow_equals_expression_on_random_vectors(spark, vecs):
    """On arbitrary float vectors the Arrow PQ encoder and the
    Catalyst literal-chain encoder must agree code-for-code — the
    bit-identical contract that lets one oracle validate both."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_encode_arrow,
    )

    cb = pq_codebooks(64, 4, 16, seed=11)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    slow = {
        r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
        for r in pq_encode(df, cb).collect()
    }
    fast = {
        r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
        for r in pq_encode_arrow(df, cb).collect()
    }
    assert slow == fast
