"""Property-based checks for the CDC operators: random workloads of
upserts/deletes applied through merge_upsert / scd2_apply /
table_diff must agree with a plain Python dictionary model.

Few examples × real Spark jobs (each example writes and merges real
parquet); the value is hypothesis finding the weird workloads —
version ties, delete-then-reinsert, batches touching no existing
keys, empty batches after collapse."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.merge import (
    merge_upsert,
    scd2_apply,
    table_diff,
)

# a workload: list of batches; each batch: list of (key, value, version, deleted)
_OP = st.tuples(
    st.integers(0, 5),            # key
    st.integers(-100, 100),       # payload value
    st.booleans(),                # deleted?
)
_BATCH = st.lists(_OP, min_size=0, max_size=6)
_WORKLOAD = st.lists(_BATCH, min_size=1, max_size=3)


def _model_merge(workload):
    """Reference: latest-per-(batch,key) wins by (version, payload
    struct order) — versions are assigned per batch index, unique per
    batch+op index so collapse order is total."""
    state = {}
    for bi, batch in enumerate(workload):
        best = {}
        for oi, (k, v, d) in enumerate(batch):
            ver = bi * 100 + oi
            if k not in best or ver > best[k][0]:
                best[k] = (ver, v, d)
        for k, (ver, v, d) in best.items():
            if d:
                state.pop(k, None)
            else:
                state[k] = (v, ver)
    return state


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload=_WORKLOAD)
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, workload):
    loc = str(tmp_path_factory.mktemp("prop") / "tgt")
    for bi, batch in enumerate(workload):
        rows = [
            (k, v, bi * 100 + oi, d) for oi, (k, v, d) in enumerate(batch)
        ]
        if not rows:
            continue
        df = spark.createDataFrame(rows, "k long, val long, v long, deleted boolean")
        merge_upsert(
            spark, loc, df, ["k"], version_col="v", delete_col="deleted"
        )
    import os

    want = _model_merge(workload)
    if not os.path.exists(loc):
        assert not want
        return
    got = {
        r["k"]: (r["val"], r["v"]) for r in spark.read.parquet(loc).collect()
    }
    assert got == want


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload=_WORKLOAD)
def test_scd2_current_state_matches_merge_model(spark, tmp_path_factory, workload):
    """Whatever history SCD2 lays down, its CURRENT rows must equal
    the Type-1 model state, and closed intervals must nest sanely
    (valid_from < valid_to, one open row per live key)."""
    loc = str(tmp_path_factory.mktemp("prop") / "dim")
    applied_any = False
    for bi, batch in enumerate(workload):
        rows = [
            (k, v, bi * 100 + oi, d) for oi, (k, v, d) in enumerate(batch)
        ]
        if not rows:
            continue
        df = spark.createDataFrame(rows, "k long, val long, v long, deleted boolean")
        scd2_apply(spark, loc, df, ["k"], version_col="v", delete_col="deleted")
        applied_any = True

    want = _model_merge(workload)
    if not applied_any:
        assert not want
        return
    hist = spark.read.parquet(loc).collect()
    current = {r["k"]: r["val"] for r in hist if r["valid_to"] is None}
    assert current == {k: v for k, (v, _ver) in want.items()}
    # interval sanity: every closed row ends after it starts; at most
    # one open row per key
    opens = {}
    for r in hist:
        if r["valid_to"] is not None:
            assert r["valid_to"] > r["valid_from"]
        else:
            assert r["k"] not in opens
            opens[r["k"]] = True


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old_rows=st.dictionaries(st.integers(0, 8), st.integers(-50, 50), max_size=8),
    new_rows=st.dictionaries(st.integers(0, 8), st.integers(-50, 50), max_size=8),
)
def test_table_diff_roundtrip_law(spark, tmp_path_factory, old_rows, new_rows):
    """merge_upsert(old, table_diff(old, new)) == new, for ANY pair of
    snapshots."""
    old = spark.createDataFrame(
        [(k, v) for k, v in old_rows.items()] or [(None, None)], "k long, val long"
    ).filter("k IS NOT NULL")
    new = spark.createDataFrame(
        [(k, v) for k, v in new_rows.items()] or [(None, None)], "k long, val long"
    ).filter("k IS NOT NULL")

    feed = table_diff(old, new, ["k"])
    loc = str(tmp_path_factory.mktemp("prop") / "rt")
    old.write.parquet(loc)
    if feed.isEmpty():
        got = {r["k"]: r["val"] for r in spark.read.parquet(loc).collect()}
        assert got == old_rows == new_rows or got == new_rows
        return
    merge_upsert(
        spark,
        loc,
        feed.withColumn("deleted", F.col("op") == "delete").drop("op"),
        ["k"],
        delete_col="deleted",
    )
    got = {r["k"]: r["val"] for r in spark.read.parquet(loc).collect()}
    assert got == new_rows
