"""Hand-computed semantic pins for the round-11 wave G.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand (entropy corrections on a 4-token distribution, AJ incidence
on three users with competing first events, the Weibull estimator on
an exact log-normal-free construction, a planted composition
reversal, index formulas on a two-part basket, the S-curve at
s = 0.5 and 1.0)."""

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
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )
    return str(tmp_path)


def _ev(eid, day, typ, val, uid=1, hour=12):
    return (eid, dt.datetime(2024, 1, day, hour, 0), uid, typ, val, "{}")


def test_entropy_corrections_small_distribution(spark, tmp_path):
    """Source 's': tokens a a b c → N=4, K=3, f1=2, plug-in
    H = −(½ln½ + 2·¼ln¼) = 1.5·ln2 ≈ 1.039721; MM adds (3−1)/8 =
    0.25.  Chao–Shen: C = ½, p̃ = {¼, ⅛, ⅛}, H_cs = −Σ p̃lnp̃ /
    (1−(1−p̃)⁴)."""
    rows = [(1, "a a b c", "en", "s", 7)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["entropy_bias_corrected_docs"](spark, sf).collect()[0]
    assert r.n_tokens == 4 and r.n_types == 3 and r.n_singletons == 2
    hp = 1.5 * math.log(2)
    assert abs(r.h_plugin - hp) < 5e-7
    assert abs(r.h_miller_madow - (hp + 0.25)) < 5e-7
    hcs = -sum(
        pt * math.log(pt) / (1 - (1 - pt) ** 4)
        for pt in (0.25, 0.125, 0.125)
    )
    assert abs(r.h_chao_shen - hcs) < 5e-7


def test_entropy_all_singletons_null(spark, tmp_path):
    """A source whose every token is a singleton has coverage 0 —
    Chao–Shen must be NULL, not ln(0)."""
    rows = [(1, "x y z", "en", "s", 5)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["entropy_bias_corrected_docs"](spark, sf).collect()[0]
    assert r.n_singletons == r.n_tokens == 3
    assert r.h_chao_shen is None


def test_aalen_johansen_three_users(spark, tmp_path):
    """u1: first event day 1, first purchase day 2 (life 1, cause 1);
    u2: first event day 1, first error day 3 (life 2, cause 2);
    u3: only views, censored at maxd.  At t=1: n=3, d1=1 →
    CIF₁ = 1/3.  At t=2: S(2−) = 2/3, n=2, d2=1 → CIF₂ = 1/3."""
    rows = [
        _ev(1, 1, "view", 1.0, uid=1),
        _ev(2, 2, "purchase", 5.0, uid=1),
        _ev(3, 1, "view", 1.0, uid=2),
        _ev(4, 3, "error", 0.0, uid=2),
        _ev(5, 1, "view", 1.0, uid=3),
        _ev(6, 4, "view", 1.0, uid=3),
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = Q["aalen_johansen_competing_events"](spark, sf).collect()
    assert [r.t_days for r in out] == [1, 2]
    t1, t2 = out
    assert t1.at_risk == 3 and t1.d_purchase == 1 and t1.d_error == 0
    assert abs(t1.cif_purchase - 1 / 3) < 5e-7
    assert abs(t1.cif_error - 0.0) < 1e-9
    assert t2.at_risk == 2 and t2.d_error == 1
    assert abs(t2.cif_purchase - 1 / 3) < 5e-7
    assert abs(t2.cif_error - (2 / 3) * (1 / 2)) < 5e-7


def test_weibull_log_moment_estimator(spark, tmp_path):
    """One user, one type, gaps of exactly 1h, 2h, 4h: k and λ from
    the closed Gumbel log-moment formulas mirrored in python."""
    times = [0, 1, 3, 7]  # hours → gaps 1h, 2h, 4h
    rows = [
        (i + 1, dt.datetime(2024, 1, 1, t, 0), 1, "click", 1.0, "{}")
        for i, t in enumerate(times)
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = [
        r
        for r in Q["weibull_interarrival_fit_events"](spark, sf).collect()
        if r.event_type == "click"
    ]
    r = out[0]
    lx = [math.log(1.0), math.log(2.0), math.log(4.0)]
    n = 3
    mu = sum(lx) / n
    s2 = (sum(v * v for v in lx) - sum(lx) ** 2 / n) / (n - 1)
    k = math.pi / math.sqrt(6 * s2)
    lam = math.exp(mu + 0.5772156649015329 / k)
    assert r.n_gaps == 3
    assert abs(r.k_shape - k) < 5e-6
    assert abs(r.lambda_hours - lam) < 5e-4
    assert abs(r.mean_gap_hours - 7 / 3) < 5e-4


def test_simpson_planted_reversal(spark, tmp_path):
    """Two types both trending DOWN within themselves, but the mix
    shifts toward the high-value type over time → the pooled daily
    mean trends UP: n_reversed = 2, any_reversal true."""
    rows, eid = [], 0
    # type a: cheap, declining slightly, heavy early
    # type b: expensive, declining slightly, heavy late
    for day in range(1, 11):
        a_count = 11 - day          # 10 .. 1
        b_count = day               # 1 .. 10
        for _ in range(a_count):
            eid += 1
            rows.append(_ev(eid, day, "a", 10.0 - 0.1 * day))
        for _ in range(b_count):
            eid += 1
            rows.append(_ev(eid, day, "b", 100.0 - 0.1 * day))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["simpson_reversal_events"](spark, sf).collect()[0]
    assert r.n_strata == 2
    assert r.overall_slope > 0
    assert r.n_reversed == 2
    assert bool(r.any_reversal) is True


def test_tornqvist_walsh_two_part_basket(spark, tmp_path):
    """Two parts, two years.  Part 1: p 10→20, q 1→1; part 2:
    p 10→10, q 1→1.  Shares: year0 ½/½, year1 ⅔/⅓ →
    lnP_T = (7/12)ln2; Walsh = 30/20 = 1.5."""
    d0, d1 = dt.datetime(2024, 3, 1), dt.datetime(2025, 3, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d0),
        (2, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d0),
        (3, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", d1),
        (4, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d1),
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    r = Q["tornqvist_price_index_lineitem"](spark, sf).collect()[0]
    assert r.yr == 2025 and r.n_parts == 2
    w_avg = 0.5 * (0.5 + 2 / 3)
    assert abs(r.tornqvist - math.exp(w_avg * math.log(2.0))) < 5e-7
    assert abs(r.walsh - 1.5) < 5e-7


def test_lsh_scurve_known_bands(spark, tmp_path):
    """An identical pair (s = 1 → expected recall 1) and a pair with
    s = 0.5 (recall 1−(1−0.5⁴)⁸ ≈ 0.40327), disjoint alphabets."""
    rows = [
        (1, "p q r s", "en", "s", 7),
        (2, "p q r s", "en", "s", 7),            # jac 1.0 → band 9
        (3, "x y z w t", "en", "s", 9),
        (4, "x y z w u", "en", "s", 9),          # jac 0.5 → band 5
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {r.band: r for r in Q["lsh_scurve_recall_docs"](spark, sf).collect()}
    assert set(out) == {5, 9}
    assert out[9].n_pairs == 1
    assert abs(out[9].expected_recall - 1.0) < 1e-9
    assert out[5].n_pairs == 1
    want = 1 - (1 - 0.5**4) ** 8
    assert abs(out[5].expected_recall - want) < 5e-5
    assert abs(out[5].mean_jaccard - 0.5) < 5e-5
