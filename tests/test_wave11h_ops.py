"""Hand-computed semantic pins for the round-11 wave H.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand (Fmax/C on two groups with 4:1 variance, a planted
three-source boilerplate gram, DM on a perfectly weekly series,
BY's harmonic inflation over BH, planted zero-norm and NaN
vectors)."""

from __future__ import annotations

import datetime as dt
import math

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )
    return str(tmp_path)


def _ev(eid, day, typ, val, uid=1):
    return (eid, dt.datetime(2024, 1, day, 12, 0), uid, typ, val, "{}")


def test_variance_screen_four_to_one(spark, tmp_path):
    """Urgent {10, 20, 30} (s² = 100² cents²·[...]) vs medium
    {14, 15, 16}: sample variances 100:1 in dollar² → Fmax = 100,
    C = 100/101, max_var_group = 1-URGENT."""
    day = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 10.0, day, "1-URGENT"),
        (2, 1, "O", 20.0, day, "1-URGENT"),
        (3, 1, "O", 30.0, day, "1-URGENT"),
        (4, 1, "O", 14.0, day, "3-MEDIUM"),
        (5, 1, "O", 15.0, day, "3-MEDIUM"),
        (6, 1, "O", 16.0, day, "3-MEDIUM"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["variance_homogeneity_screen_orders"](spark, sf).collect()[0]
    assert r.k == 2 and r.n_min == 3 and r.n_max == 3
    assert r.max_var_group == "1-URGENT"
    assert abs(r.hartley_fmax - 100.0) < 5e-6
    assert abs(r.cochran_c - 100.0 / 101.0) < 5e-7


def test_boilerplate_planted_gram(spark, tmp_path):
    """'all rights reserved by us' planted in 3 sources (one doc
    twice) surfaces with n_sources=3, n_docs=3, n_occ=4; a 2-source
    gram stays below the spread threshold."""
    boil = "all rights reserved by us"
    rows = [
        (1, f"{boil} alpha beta gamma delta", "en", "s1", 40),
        (2, f"{boil} {boil}", "en", "s2", 51),
        (3, f"other words here {boil}", "en", "s3", 42),
        (4, "two source gram here now", "en", "s1", 24),
        (5, "two source gram here now", "en", "s2", 24),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = Q["boilerplate_ngrams_docs"](spark, sf).collect()
    grams = {r.gram: r for r in out}
    assert boil in grams
    g = grams[boil]
    assert g.n_sources == 3 and g.n_docs == 3 and g.n_occ == 4
    assert "two source gram here now" not in grams


def test_diebold_mariano_weekly_series(spark, tmp_path):
    """A perfectly 7-periodic series: the seasonal-naive error is 0
    every day while naive errs whenever adjacent days differ → the
    loss differential is positive and DM is large positive."""
    pattern = [10.0, 20.0, 30.0, 10.0, 20.0, 30.0, 15.0]
    rows = [
        _ev(i + 1, i + 1, "t", pattern[i % 7]) for i in range(28)
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = [
        r
        for r in Q["diebold_mariano_daily_events"](spark, sf).collect()
        if r.event_type == "t"
    ]
    r = out[0]
    assert r.n_days == 21
    assert abs(r.mse_seasonal_naive - 0.0) < 1e-9
    assert r.mse_naive > 0
    assert r.dm_stat > 2.0


def test_by_dominates_bh(spark, tmp_path):
    """BY's m·H_m factor can only raise adjusted p's: on any grid,
    p_adj_by >= p_adj_bh cell-by-cell, both clamped at 1."""
    rows, eid = [], 0
    for day in range(1, 15):
        for typ, val in [("a", 10.0), ("b", 20.0 + day)]:
            eid += 1
            rows.append(_ev(eid, day, typ, val, uid=eid))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = Q["benjamini_yekutieli_dow_events"](spark, sf).collect()
    assert len(out) > 0
    for r in out:
        assert r.p_adj_by >= r.p_adj_bh - 1e-9
        assert r.p_adj_by <= 1.0 and r.p_adj_bh <= 1.0


def test_norm_audit_planted_defects(spark, tmp_path):
    """4 vectors: a unit vector, a 3-4-5 vector (norm 5), a zero
    vector, and a NaN-poisoned vector → n_nonfinite=1, n_zero_norm=1,
    min 0, max 5 over the finite ones."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [0.0, 0.0], 0),
        (4, [float("nan"), 1.0], 0),
    ]
    sf = _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    r = Q["embedding_norm_audit"](spark, sf).collect()[0]
    assert r.n_vectors == 4
    assert r.n_nonfinite == 1
    assert r.n_zero_norm == 1
    assert abs(r.norm_min - 0.0) < 1e-9
    assert abs(r.norm_max - 5.0) < 1e-6
    assert abs(r.norm_p50 - 1.0) < 1e-6
