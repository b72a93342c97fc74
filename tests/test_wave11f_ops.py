"""Hand-computed semantic pins for the round-11 wave F.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand (Wilcoxon on two known paired diffs, Conover midranks on a
5-point pooled sample, ARCH ρ₁ = −0.5 on an alternating-variance
series, Croston's closed SES weights on a 3-demand customer, pinball
interpolation on a 1..9 ramp, the MAD-zero sentinel and a planted
volume spike, HL structural invariants, Engle–Granger on a planted
mean-reverting spread)."""

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


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )
    return str(tmp_path)


def _ev(eid, day, typ, val, uid=1):
    return (eid, dt.datetime(2024, 1, day, 12, 0), uid, typ, val, "{}")


def test_wilcoxon_two_known_pairs(spark, tmp_path):
    """Two complete ISO weeks of one type: week-1 weekend−weekday
    diff +3, week-2 diff −1 → |d| ranks (1:−1, 2:+3), W+ = 2, n = 2,
    μ = 1.5, σ² = 2·3·5/24 = 1.25 → z = 0.5/√1.25 = 0.447214."""
    rows, eid = [], 0
    # week of Mon 2024-01-01: weekdays Jan 1-5, weekend Jan 6-7
    for day in (1, 2, 3, 4, 5):
        eid += 1
        rows.append(_ev(eid, day, "t", 10.0))
    for day in (6, 7):
        eid += 1
        rows.append(_ev(eid, day, "t", 13.0))  # d = +3
    # week of Mon 2024-01-08: weekdays Jan 8-12, weekend Jan 13-14
    for day in (8, 9, 10, 11, 12):
        eid += 1
        rows.append(_ev(eid, day, "t", 10.0))
    for day in (13, 14):
        eid += 1
        rows.append(_ev(eid, day, "t", 9.0))  # d = -1
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["wilcoxon_signed_rank_weekend_events"](spark, sf).collect()[0]
    assert r.n_pairs == 2
    assert abs(r.w_plus - 2.0) < 1e-9
    assert abs(r.z_wilcoxon - 0.5 / math.sqrt(1.25)) < 5e-7


def test_conover_hand_midranks(spark, tmp_path):
    """Urgent {10, 20} (u = 500, 500 cents) vs other {14, 15, 16}
    (u = 100, 0, 100): midranks 1, 2.5, 4.5 → a = 1, 6.25, 20.25;
    T = 40.5, ā·n₁ = 21.6, Var = 0.3·316.05 → z = 18.9/√94.815."""
    day = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 10.0, day, "1-URGENT"),
        (2, 1, "O", 20.0, day, "1-URGENT"),
        (3, 1, "O", 14.0, day, "3-MEDIUM"),
        (4, 1, "O", 15.0, day, "3-MEDIUM"),
        (5, 1, "O", 16.0, day, "3-MEDIUM"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["conover_squared_ranks_orders"](spark, sf).collect()[0]
    assert r.n_urgent == 2 and r.n_other == 3
    assert abs(r.mean_sq_rank_urgent - 40.5 / (2 * 25)) < 5e-7
    assert abs(r.mean_sq_rank_null - 54.0 / (5 * 25)) < 5e-7
    assert abs(r.z - 18.9 / math.sqrt(94.815)) < 5e-7


def test_arch_lm_alternating_variance(spark, tmp_path):
    """Daily means 15, 10, 20, 15 → demeaned² s = 0, 25, 25, 0 →
    lag pairs (0,25), (25,25), (25,0) → ρ₁ = −0.5, LM = 3·0.25."""
    rows = [
        _ev(1, 1, "a", 15.0),
        _ev(2, 2, "a", 10.0),
        _ev(3, 3, "a", 20.0),
        _ev(4, 4, "a", 15.0),
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["arch_lm_daily_events"](spark, sf).collect()[0]
    assert r.event_type == "a" and r.n_obs == 3
    assert abs(r.rho1 - (-0.5)) < 5e-7
    assert abs(r.arch_lm - 0.75) < 5e-7


def test_croston_closed_form_weights(spark, tmp_path):
    """One customer, demands 100/200/300 dollars on days 1/3/7:
    ẑ = 0.64·100 + 0.16·200 + 0.2·300 = 156; intervals 2, 4 →
    p̂ = 0.8·2 + 0.2·4 = 2.4 → rate 65.0."""
    rows = [
        (1, 7, "O", 100.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (2, 7, "O", 200.0, dt.datetime(2024, 1, 3), "3-MEDIUM"),
        (3, 7, "O", 300.0, dt.datetime(2024, 1, 7), "3-MEDIUM"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    out = Q["croston_forecast_orders"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.custkey == 7 and r.n_demand_days == 3
    assert abs(r.z_hat - 156.0) < 5e-5
    assert abs(r.p_hat - 2.4) < 5e-7
    assert abs(r.croston_rate - 65.0) < 5e-5


def test_pinball_ramp_interpolation(spark, tmp_path):
    """v = 1..9 over 9 days: day 8 forecasts from sorted [1..7] →
    f10 = 1.6, f50 = 4, f90 = 6.4; day 9 from [2..8] → 2.6, 5, 7.4.
    Both days err identically → mean pinball 0.64 / 2.0 / 1.44,
    coverage 0 everywhere (the ramp always outruns its history)."""
    rows = [_ev(i, i, "t", float(i)) for i in range(1, 10)]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = Q["pinball_backtest_daily_events"](spark, sf).collect()
    got = {round(r.q, 1): r for r in out}
    assert len(out) == 3
    for q, want in [(0.1, 0.64), (0.5, 2.0), (0.9, 1.44)]:
        assert got[q].n_days == 2
        assert abs(got[q].mean_pinball - want) < 5e-5
        assert abs(got[q].coverage - 0.0) < 1e-9


def test_partition_volume_spike_and_mad_zero(spark, tmp_path):
    """Type 'u': counts 8,9,10,11,12,30 → med 10.5, MAD 1.5 →
    only the 30-day exceeds |z| > 3.5 (z = 19.5/(1.4826·1.5)).
    Type 't': constant 3/day → MAD 0 → robust z undefined, zero
    anomalies, worst_day = earliest day (the sentinel ordering)."""
    rows, eid = [], 0
    for day, c in [(1, 8), (2, 9), (3, 10), (4, 11), (5, 12), (6, 30)]:
        for _ in range(c):
            eid += 1
            rows.append(_ev(eid, day, "u", 1.0))
    for day in (1, 2, 3, 4):
        for _ in range(3):
            eid += 1
            rows.append(_ev(eid, day, "t", 1.0))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {r.event_type: r for r in
           Q["partition_volume_anomaly_events"](spark, sf).collect()}
    u = out["u"]
    assert u.n_days == 6 and u.n_anomalies == 1
    assert u.worst_day == dt.date(2024, 1, 6)
    assert abs(u.med_volume - 10.5) < 1e-9
    assert abs(u.mad_volume - 1.5) < 1e-9
    assert abs(u.max_abs_z - 19.5 / (1.4826 * 1.5)) < 5e-7
    t = out["t"]
    assert t.n_days == 4 and t.n_anomalies == 0
    assert t.max_abs_z is None
    assert t.worst_day == dt.date(2024, 1, 1)


def test_hosmer_lemeshow_invariants(spark, tmp_path):
    """Structural pins on a 12-doc corpus: bin populations sum to
    the corpus, observed positives sum to the English count, χ² ≥ 0,
    df = nbins − 2, exp_pos within each bin's population."""
    rows = [
        (i, f"tok{i} tok{i + 1} tok{i * 7} alpha beta",
         "en" if i % 3 else "fr", "s", 30)
        for i in range(1, 13)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = Q["hosmer_lemeshow_quality_docs"](spark, sf).collect()
    assert sum(r.n_docs for r in out) == 12
    assert sum(r.obs_pos for r in out) == 8
    nbins = len(out)
    for r in out:
        assert r.df == nbins - 2
        assert r.hl_chi2 >= 0
        assert 0 <= r.exp_pos <= r.n_docs


def test_engle_granger_planted_spread(spark, tmp_path):
    """y = 2x + alternating ±1 residual: the spread flips sign every
    day, so the no-constant DF on the fitted residuals is strongly
    negative.  Expected value computed by mirroring the closed-form
    OLS + DF arithmetic in numpy."""
    import numpy as np

    x = np.array([10.0, 12.0, 11.0, 13.0, 12.0, 14.0])
    e = np.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0])
    y = 2.0 * x + e
    rows, eid = [], 0
    for i in range(6):
        eid += 1
        rows.append(_ev(eid, i + 1, "click", float(x[i])))
        eid += 1
        rows.append(_ev(eid, i + 1, "purchase", float(y[i])))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["engle_granger_click_purchase_events"](spark, sf).collect()[0]
    n = 6.0
    b = (np.sum(x * y) - x.sum() * y.sum() / n) / (
        np.sum(x * x) - x.sum() ** 2 / n
    )
    a = y.mean() - b * x.mean()
    res = y - a - b * x
    rl, dr = res[:-1], np.diff(res)
    sxx2 = np.sum(rl * rl)
    sxy2 = np.sum(rl * dr)
    syy2 = np.sum(dr * dr)
    s2 = (syy2 - sxy2**2 / sxx2) / (len(rl) - 1)
    eg = (sxy2 / sxx2) / math.sqrt(s2 / sxx2)
    assert r.n_obs == 5
    assert abs(r.beta_coint - round(b, 6)) < 1e-4
    assert abs(r.alpha - round(a, 4)) < 1e-3
    assert abs(r.eg_stat - eg) < 1e-3
    assert r.eg_stat < -1.0
