"""Data-quality constraint checking (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.quality import check_constraints


def _by_name(df):
    return {r.check_name: (r.passed, r.observed) for r in df.collect()}


def test_violations_counted_per_rule(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (1, "ok", -2.0),      # dup id, below min
            (None, "bad", 7.0),   # null id, out-of-set status
            (3, None, 150.0),     # null status not an accepted_values violation
        ],
        "id long, status string, amount double",
    )
    rep = _by_name(
        check_constraints(
            df,
            not_null=["id", "status"],
            unique=["id"],
            accepted_values={"status": ["ok", "warn"]},
            min_value={"amount": 0.0},
            max_value={"amount": 100.0},
        )
    )
    assert rep["not_null_id"] == (0, 1.0)
    assert rep["not_null_status"] == (0, 1.0)
    assert rep["unique_id"] == (0, 1.0)         # 3 non-null ids, 2 distinct
    assert rep["accepted_values_status"] == (0, 1.0)  # NULL excluded
    assert rep["min_value_amount"] == (0, 1.0)
    assert rep["max_value_amount"] == (0, 1.0)


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame([(i, "ok", float(i)) for i in range(10)],
                               "id long, status string, amount double")
    rep = _by_name(
        check_constraints(
            df, not_null=["id"], unique=["id"],
            accepted_values={"status": ["ok"]}, min_value={"amount": 0.0},
        )
    )
    assert all(passed == 1 and obs == 0.0 for passed, obs in rep.values())


def test_foreign_key_orphans_and_null_exemption(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, dim_id long"
    )
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    rep = _by_name(check_constraints(facts, foreign_keys=[("dim_id", dim, "k")]))
    assert rep["fk_dim_id"] == (0, 1.0)  # only id=3 is an orphan; NULL exempt


def test_empty_input_and_no_rules(spark):
    empty = spark.createDataFrame([], "id long")
    rep = _by_name(check_constraints(empty, not_null=["id"], unique=["id"]))
    assert rep["not_null_id"] == (1, 0.0)
    assert rep["unique_id"] == (1, 0.0)
    with pytest.raises(ValueError, match="no constraints"):
        check_constraints(empty)


def test_single_pass_plan_for_row_local_rules(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    rep = check_constraints(
        df, not_null=["id", "s"], unique=["id"],
        accepted_values={"s": ["a"]}, min_value={"id": 0},
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1  # all row-local rules share one scan


def test_psi_drift_identical_and_shifted(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.quality import (
        psi_drift,
    )

    rows = [("base", float(v % 10)) for v in range(200)]
    rows += [("same", float(v % 10)) for v in range(200)]
    rows += [("shifted", float(v % 10) + 50.0) for v in range(200)]
    df = spark.createDataFrame(rows, "s string, v double")
    out = {
        r["s"]: r["psi"]
        for r in psi_drift(df, "s", "v", "base", [2.0, 5.0, 8.0]).collect()
    }
    assert out["base"] == 0.0          # baseline vs itself
    assert out["same"] == 0.0          # identical distribution
    assert out["shifted"] > 0.25       # gross drift crosses the gate
    import pytest

    with pytest.raises(ValueError):
        psi_drift(df, "s", "v", "base", [])


def test_quarantine_splits_and_null_fails(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.quality import (
        quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, None, "B"), (4, 99.0, None)],
        "id long, amount double, grade string",
    )
    clean, bad = quarantine(
        df,
        {"pos_amount": "amount > 0", "known_grade": "grade IN ('A', 'B')"},
    )
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1]
    assert "_violations" not in clean.columns
    got = {r["id"]: list(r["_violations"]) for r in bad.collect()}
    # NULL amount and NULL grade are VIOLATIONS, not passes
    assert got == {
        2: ["pos_amount"],
        3: ["pos_amount"],
        4: ["known_grade"],
    }


def test_quarantine_rejects_empty_rules(spark):
    import pytest
    from aws_glue_jobs_incremental_database_etl_spark.operators.quality import (
        quarantine,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        quarantine(df, {})
