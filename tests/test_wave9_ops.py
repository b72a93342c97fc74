"""Hand-computed semantic pins for the round-9 statistics wave — the
cross-engine oracle proves Spark ≡ DuckDB; these prove the formulas
themselves on inputs where the answer is known by hand (Welch 1951,
Jonckheere 1954 with Hollander–Wolfe tie moments, Friedman 1937,
Mantel–Haenszel 1959, Armitage 1955, the grouped-data Gini, and the
Mantel 1966 log-rank)."""

from __future__ import annotations

import datetime as dt
import math

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    return str(tmp_path)


def _write_orders(spark, tmp_path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    return str(tmp_path)


def test_welch_anova_equal_variance_case(spark, tmp_path):
    """Groups (10,20,30), (20,30,40), (50,60,70): every sᵢ² = 100 so
    all wᵢ equal, x̄w = mean of means, A/(k−1) = 13, H = 3·(2/9)·…
    → W* = 13/(7/6) = 11.142857 and df₂ = (k²−1)/(3H) = 4 exactly."""
    rows = []
    k = 0
    for g, vals in (
        ("1-A", (10.0, 20.0, 30.0)),
        ("2-B", (20.0, 30.0, 40.0)),
        ("3-C", (50.0, 60.0, 70.0)),
    ):
        for v in vals:
            k += 1
            rows.append((k, g, v))
    sf = _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["welch_anova_priority_orders"](spark, sf).collect()[0]
    assert r.n_groups == 3 and r.df1 == 2
    assert abs(r.w_stat - 13.0 / (7.0 / 6.0)) < 1e-6
    assert abs(r.df2 - 4.0) < 1e-9


def test_jonckheere_tiny_enumerable(spark, tmp_path):
    """G1={1,2}, G2={2,3}, G3={4}: the 8 cross-group pairs give
    JT = 3.5 + 2 + 2 = 7.5 (one tie at value 2 → ½); E = (25−9)/4 =
    4; tie-corrected variance = 246/72 + 0 + 8/160 = 3.466667 →
    z = 3.5/√3.466667.  Hand-enumerated, so a dropped tie half or a
    wrong variance term fails."""
    rows = []
    k = 0
    for g, vals in (("1-A", (1.0, 2.0)), ("2-B", (2.0, 3.0)), ("3-C", (4.0,))):
        for v in vals:
            k += 1
            rows.append((k, g, v))
    sf = _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["jonckheere_priority_totalprice_orders"](spark, sf).collect()[0]
    assert r.n_orders == 5
    assert abs(r.jt_stat - 7.5) < 1e-9
    assert abs(r.e_jt - 4.0) < 1e-9
    assert abs(r.z_jt - 3.5 / math.sqrt(246.0 / 72.0 + 8.0 / 160.0)) < 1e-6


def test_friedman_no_ties_reduces_to_classic(spark, tmp_path):
    """Two complete weeks whose daily counts rank 1..7 identically:
    R_j = 2j, so the classic statistic is 12/(2·7·8)·4·Σj² − 3·2·8 =
    60 − 48 = 12; with no ties Conover's form must land exactly
    there."""
    rows = []
    eid = 0
    for wk_start in (dt.date(2024, 3, 4), dt.date(2024, 3, 11)):
        for d in range(7):  # Mon..Sun, counts 10,20,...,70
            day = wk_start + dt.timedelta(days=d)
            for i in range((d + 1) * 10):
                eid += 1
                rows.append(
                    (
                        eid,
                        dt.datetime.combine(day, dt.time(10, 0))
                        + dt.timedelta(minutes=i),
                        i,
                        "view",
                        0.0,
                        "",
                    )
                )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["friedman_dow_weeks_events"](spark, sf).collect()[0]
    assert r.n_blocks == 2 and r.n_treatments == 7
    assert abs(r.chi2_friedman - 12.0) < 1e-9


def test_mantel_haenszel_two_strata_hand_2x2s(spark, tmp_path):
    """Stratum 1 (null 10/10/10/10) contributes ad/n = bc/n = 2.5;
    stratum 2 (8,2,4,6) contributes 2.4 / 0.4 → ORₘₕ = 4.9/2.9.
    χ²ₘₕ = (|18−16|−0.5)²/(2.564103+1.263158) = 2.25/3.827261 —
    the continuity −0.5 and the hypergeometric variance are both
    load-bearing."""
    rows = []
    eid = 0

    def add(day, n_purch, n_view):
        nonlocal eid
        t0 = dt.datetime.combine(day, dt.time(9, 0))
        for i in range(n_purch):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(minutes=i), eid, "purchase", 0.0, ""))
        for i in range(n_view):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(minutes=60 + i), eid, "view", 0.0, ""))

    # week of 2024-03-04: weekend = Sat 03-09, weekday = Wed 03-06
    add(dt.date(2024, 3, 9), 10, 10)   # a=10, b=10
    add(dt.date(2024, 3, 6), 10, 10)   # c=10, d=10
    # week of 2024-03-11: Sat 03-16 and Wed 03-13
    add(dt.date(2024, 3, 16), 8, 2)    # a=8, b=2
    add(dt.date(2024, 3, 13), 4, 6)    # c=4, d=6
    sf = _write_events(spark, tmp_path, rows)
    r = Q["mantel_haenszel_weekend_purchase_events"](spark, sf).collect()[0]
    assert r.n_strata == 2
    assert abs(r.or_mh - 4.9 / 2.9) < 1e-6
    v = 20 * 20 * 20 * 20 / (1600.0 * 39) + 10 * 10 * 12 * 8 / (400.0 * 19)
    assert abs(r.chi2_mh - 2.25 / v) < 1e-6


def test_cochran_armitage_linear_dose_response(spark, tmp_path):
    """10 lines per priority with 1,2,3,4,5 returns: p̄ = 0.3,
    T = 55 − 45 = 10, Var = 0.21·(550 − 450) = 21 →
    z = 10/√21, χ² = 100/21."""
    orders, lines = [], []
    ok = 0
    for s in range(1, 6):
        for i in range(10):
            ok += 1
            orders.append((ok, f"{s}-P"))
            lines.append((ok, "R" if i < s else "N"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines, "l_orderkey long, l_returnflag string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = Q["cochran_armitage_priority_returns"](spark, str(tmp_path)).collect()[0]
    assert r.n_lines == 50
    assert abs(r.pooled_rate - 0.3) < 1e-9
    assert abs(r.z_trend - 10.0 / math.sqrt(21.0)) < 1e-6
    assert abs(r.chi2_trend - 100.0 / 21.0) < 1e-6


def test_lorenz_gini_arithmetic_ladder(spark, tmp_path):
    """Customer totals 10,20,…,100 dollars: L(q) = Σ_{i≤q} i·10/550,
    Gini = 2·3850/(10·550) − 11/10 = 0.3 exactly."""
    rows = [(i, i, float(i * 10)) for i in range(1, 11)]
    sf = _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    out = {r.decile: r for r in Q["lorenz_curve_customers"](spark, sf).collect()}
    assert len(out) == 10
    for q in (1, 5, 9, 10):
        exp = sum(range(1, q + 1)) * 10.0 / 550.0
        assert abs(out[q].cum_value_share - round(exp, 6)) < 1e-9, q
        assert abs(out[q].cum_pop_share - q / 10.0) < 1e-9
    assert abs(out[10].gini - 0.3) < 1e-9


def test_logrank_hand_risk_table(spark, tmp_path):
    """Three users' purchase gaps: weekend-start gaps {1†, 2c},
    weekday-start {1†, 3†, 4c, 5c} (†=observed repurchase,
    c=censored at the 03-12 window end).  Death times: t=1 (n1=2,
    nt=6, d=2, d1=1), t=3 (n1=0, nt=3, d=1) → O=1, E=2/3,
    V = 2·(1/3)(2/3)(4/5) = 16/45; z = (1/3)/√(16/45),
    χ² = (1/9)/(16/45) = 0.3125."""
    rows = []
    eid = 0

    def p(day, uid):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, dt.datetime.combine(day, dt.time(12, 0)), uid, "purchase", 0.0, "")
        )

    p(dt.date(2024, 3, 9), 1)   # Sat
    p(dt.date(2024, 3, 10), 1)  # Sun (censored tail to 03-12: life 2)
    p(dt.date(2024, 3, 6), 2)   # Wed
    p(dt.date(2024, 3, 7), 2)   # Thu (censored tail: life 5)
    p(dt.date(2024, 3, 5), 3)   # Tue
    p(dt.date(2024, 3, 8), 3)   # Fri (censored tail: life 4)
    eid += 1
    rows.append(
        (eid, dt.datetime(2024, 3, 12, 23, 0), 99, "view", 0.0, "")
    )  # pins maxd
    sf = _write_events(spark, tmp_path, rows)
    r = Q["logrank_weekend_repurchase_events"](spark, sf).collect()[0]
    assert r.observed_weekend == 1
    assert abs(r.expected_weekend - 2.0 / 3.0) < 1e-6
    v = 16.0 / 45.0
    assert abs(r.z_logrank - (1.0 / 3.0) / math.sqrt(v)) < 1e-6
    assert abs(r.chi2_logrank - 0.3125) < 1e-6
