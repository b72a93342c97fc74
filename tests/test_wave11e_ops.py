"""Hand-computed semantic pins for the round-11 wave E.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand (LTV triangle censoring on two cohorts, elasticity on an
exact log-log line, the sign-flip null on a planted one-sided
effect, τ-b on enumerable concordances, GK τ on independent vs
determined grids, Dunn on separated literal clusters)."""

from __future__ import annotations

import datetime as dt
import math

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )
    return str(tmp_path)


def test_cohort_ltv_triangle_censoring(spark, tmp_path):
    """User 1 joins week 0 and spends 10 then 20; user 2 joins the
    LAST week and spends 5.  At age 0 both are eligible (mean 7.5);
    at age 1 only user 1 is old enough (cum 30) — the immature cohort
    must NOT drag the age-1 average."""
    # weeks are Mondays: 2024-01-01 and 2024-01-08
    w0, w1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    rows = [
        (1, w0, 1, "purchase", 10.0, "{}"),
        (2, w1, 1, "purchase", 20.0, "{}"),
        (3, w1, 2, "purchase", 5.0, "{}"),
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.age_weeks: r
        for r in Q["cohort_ltv_curve_events"](spark, sf).collect()
    }
    assert out[0].n_users == 2
    assert abs(out[0].ltv_per_user - 7.5) < 1e-6
    assert out[1].n_users == 1
    assert abs(out[1].ltv_per_user - 30.0) < 1e-6
    # ages 2..7 exist on the grid but no cohort is old enough
    assert all(a not in out for a in range(2, 8))


def test_price_elasticity_exact_loglog_line(spark, tmp_path):
    """One part type, 12 (part, month) cells lying EXACTLY on
    ln q = 3 − 2·ln p → elasticity = −2."""
    rows = []
    k = 0
    for part in range(12):
        p = 1.0 + 0.5 * part
        q = math.exp(3.0 - 2.0 * math.log(p))
        k += 1
        rows.append(
            (k, part, 1, 1, q, p * q, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1 + part % 12, 5))
        )
    parts = [(i, f"part {i}", "Brand#1", "WIDGET", 1, 1.0)
             for i in range(12)]
    sf = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(spark, tmp_path, "part", parts, PART_SCHEMA)
    out = Q["price_elasticity_lineitem"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.p_type == "WIDGET" and r.n_obs == 12
    assert abs(r.elasticity - (-2.0)) < 1e-6


def test_sign_flip_null_and_effect(spark, tmp_path):
    """Planted strong weekend effect across 8 complete weeks: every
    paired diff is +70 (weekend days carry value 20, weekdays 10), so
    NO sign assignment except all-positive can reach |T_obs| — the
    p-value is the count of all-|T_r|>=|T_obs| flips over 65; with 64
    md5 draws of 8 coins the all-heads draw is rare, so p must be
    small, and the observed lift is exactly +10."""
    rows, eid = [], 0
    for wk in range(8):
        mon = dt.datetime(2024, 1, 1) + dt.timedelta(days=7 * wk)
        for d in range(7):
            day = mon + dt.timedelta(days=d)
            v = 20.0 if d >= 5 else 10.0
            eid += 1
            rows.append((eid, day, 1, "view", v, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["sign_flip_test_weekend_events"](spark, sf).collect()[0]
    assert r.n_weeks == 8
    assert abs(r.mean_weekend_lift - 10.0) < 1e-6
    # every d = +10, so |T_r| = |T_obs| only when all 8 coins agree
    # in sign; p = (1 + n_extreme)/65 stays well below 0.5
    assert r.p_value <= 0.2
    assert r.n_extreme == round(r.p_value * 65) - 1


def test_kendall_taub_enumerable(spark, tmp_path):
    """30 days in one year: counts x = 1..30 ordered, y = 7.5·x →
    perfectly concordant, no ties → τ-b = 1."""
    rows, eid = [], 0
    for i in range(30):
        day = dt.datetime(2024, 3, 1) + dt.timedelta(days=i)
        for _ in range(i + 1):
            eid += 1
            rows.append((eid, day, 1, "view", 7.5, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["kendall_taub_daily_events"](spark, sf).collect()[0]
    n = 30
    assert r.n_days == n
    assert r.concordant == n * (n - 1) // 2 and r.discordant == 0
    assert abs(r.tau_b - 1.0) < 1e-6


def test_gk_tau_independent_and_determined(spark, tmp_path):
    """Independent grid (every source has the same lang mix) → τ = 0;
    fully determined grid (each source speaks one lang) → τ = 1."""
    rows = []
    i = 0
    for src in ["s1", "s2"]:
        for lang in ["en", "fr"]:
            for _ in range(5):
                i += 1
                rows.append((i, "text", lang, src, 4))
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["gk_tau_lang_source_docs"](spark, sf).collect()[0]
    assert r.n_docs == 20
    assert abs(r.gk_tau - 0.0) < 1e-6

    rows = [(1, "t", "en", "s1", 1), (2, "t", "en", "s1", 1),
            (3, "t", "fr", "s2", 1), (4, "t", "fr", "s2", 1)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["gk_tau_lang_source_docs"](spark, sf).collect()[0]
    assert abs(r.gk_tau - 1.0) < 1e-6


def test_dunn_index_separated_literal_clusters(spark, tmp_path):
    """Two clusters on a line: {(0,0),(2,0)} and {(10,0),(14,0)} →
    centroids (1,0), (12,0): min inter = 11, diameters 2·1 and 2·2 →
    max diam 4, Dunn = 2.75."""
    rows = [
        (1, [0.0, 0.0], 0),
        (2, [2.0, 0.0], 0),
        (3, [10.0, 0.0], 1),
        (4, [14.0, 0.0], 1),
    ]
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    r = Q["dunn_index_labels_embeddings"](spark, sf).collect()[0]
    assert r.k == 2
    assert abs(r.min_intercentroid - 11.0) < 1e-6
    assert abs(r.max_diameter - 4.0) < 1e-6
    assert abs(r.dunn_index - 2.75) < 1e-6


def test_jaccard_yield_curve_hand_computed(spark, tmp_path):
    """Three disjoint-alphabet near-dup pairs with exact 3-gram
    Jaccard 0.75, 1.0 and 0.5 → the τ sweep must read
    n_pairs = 3,2,2,1,1 with means 0.75, 0.875, 0.875, 1.0, 1.0
    (densified grid, every τ present even when nothing clears it)."""
    rows = [
        (1, "a b c d e f", "en", "s", 11),
        (2, "a b c d e", "en", "s", 9),     # jac(1,2) = 3/4
        (3, "p q r s", "en", "s", 7),
        (4, "p q r s", "en", "s", 7),       # jac(3,4) = 1
        (5, "x y z w t", "en", "s", 9),
        (6, "x y z w u", "en", "s", 9),     # jac(5,6) = 2/4
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = Q["jaccard_yield_curve_docs"](spark, sf).collect()
    got = [(r.tau, r.n_pairs, r.mean_jaccard) for r in out]
    want = [
        (0.5, 3, 0.75),
        (0.6, 2, 0.875),
        (0.7, 2, 0.875),
        (0.8, 1, 1.0),
        (0.9, 1, 1.0),
    ]
    assert len(got) == 5
    for (gt, gn, gm), (wt, wn, wm) in zip(got, want):
        assert abs(gt - wt) < 1e-9
        assert gn == wn
        assert abs(gm - wm) < 5e-7
