"""Hand-computed semantic pins for the round-11 wave.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand or recomputed from the defining formula independently
(year-stratified Theil–Sen/Mann–Kendall on two years with opposite
known trends, Kendall's W on perfectly concordant judges, Page's L on
monotone weeks, Buishand's partial sums from the definition, Chapman
on enumerable capture sets, Bowker on a symmetric 2-priority flip,
Shewhart limits from the A₂/D₃/D₄ constants, hubness on an orthogonal
basis where the tie-broken kNN votes are enumerable, Chebyshev on
axis-aligned vectors, footrule on reversed 3-doc rankings, trigrams on
one literal stream)."""

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


def _events_daily_counts(per_day):
    """rows with `count` events on each (date, type) cell."""
    rows, eid = [], 0
    for (d, typ), c in per_day.items():
        for k in range(c):
            eid += 1
            rows.append(
                (eid, dt.datetime(d.year, d.month, d.day, 1, 0, k), eid,
                 typ, 1.0, "{}")
            )
    return rows


def test_theil_sen_yearly_two_known_trends(spark, tmp_path):
    """Year 2023: counts 1,2,3,4 on 4 consecutive days (all pair
    slopes +1); year 2024: counts 10,8,6 (all pair slopes −2).  Pairs
    never cross the year boundary → 6 slopes of +1 and 3 of −2; lower
    median of the 9 sorted slopes (rank ⌊10/2⌋ = 5) = 1.0."""
    per = {}
    for i, c in enumerate([1, 2, 3, 4]):
        per[(dt.date(2023, 3, 1) + dt.timedelta(days=i), "a")] = c
    for i, c in enumerate([10, 8, 6]):
        per[(dt.date(2024, 3, 1) + dt.timedelta(days=i), "a")] = c
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    r = Q["theil_sen_yearly_events"](spark, sf).collect()
    assert len(r) == 1
    assert r[0].n_years == 2
    assert r[0].n_pairs == 9
    assert abs(r[0].sen_slope - 1.0) < 1e-9


def test_mann_kendall_yearly_sums_strata(spark, tmp_path):
    """Same construction: 2023 monotone up over 4 days (S = +6), 2024
    monotone down over 3 days (S = −3) → combined S = 3.  No ties in
    either stratum, so Var = [4·3·13 + 3·2·11]/18 = 222/18 and
    z = (3−1)/√(222/18)."""
    per = {}
    for i, c in enumerate([1, 2, 3, 4]):
        per[(dt.date(2023, 3, 1) + dt.timedelta(days=i), "a")] = c
    for i, c in enumerate([10, 8, 6]):
        per[(dt.date(2024, 3, 1) + dt.timedelta(days=i), "a")] = c
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    r = Q["mann_kendall_yearly_events"](spark, sf).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_years, row.n_days, row.s_stat) == (2, 7, 3)
    z = (3 - 1) / math.sqrt(222 / 18)
    assert abs(row.z - round(z, 6)) < 5e-7


def test_kendall_w_perfect_concordance(spark, tmp_path):
    """Two event types with IDENTICAL dow activity ranks (count = dow
    index for both) → W = 1 exactly and χ² = m(n−1)W = 12.  Week of
    2024-03-04 (a Monday) so isodow d gets d events."""
    per = {}
    for d in range(7):
        day = dt.date(2024, 3, 4) + dt.timedelta(days=d)
        for typ in ("a", "b"):
            per[(day, typ)] = d + 1
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    row = Q["kendall_w_dow_events"](spark, sf).collect()[0]
    assert (row.m_types, row.n_objects) == (2, 7)
    # R_j = 2j → Σ(2R_j − 8m)² = Σ(4j − 16)² = 16·Σ(j−4)² = 16·28
    assert row.s_dev4 == 448
    assert abs(row.w - 1.0) < 1e-9
    assert abs(row.chi2 - 12.0) < 1e-9


def test_pages_l_monotone_weeks(spark, tmp_path):
    """Two complete weeks, counts strictly increasing across isodow →
    within-block ranks r_j = j, L = 2·Σj² = 280; E = 112·2 = 224,
    Var = 392·2/3 → z recomputed from the formula."""
    per = {}
    for w in range(2):
        for d in range(7):
            day = dt.date(2024, 3, 4) + dt.timedelta(days=7 * w + d)
            per[(day, "a")] = d + 1
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    row = Q["pages_l_trend_dow_events"](spark, sf).collect()[0]
    assert (row.n_blocks, row.l_stat) == (2, 280)
    z = (280 - 112.0 * 2) / math.sqrt(392.0 * 2 / 3.0)
    assert abs(row.z - round(z, 6)) < 5e-7


def test_buishand_partial_sums_by_hand(spark, tmp_path):
    """Daily counts 1,2,3,4 → ȳ = 2.5, S_k = −1.5, −2, −1.5, 0;
    σ = √1.25, R = 0 − (−2) = 2, Q = 2 — both rescaled by σ√n."""
    per = {}
    for i, c in enumerate([1, 2, 3, 4]):
        per[(dt.date(2024, 3, 4) + dt.timedelta(days=i), "a")] = c
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    row = Q["buishand_range_daily_events"](spark, sf).collect()[0]
    sd = math.sqrt(1.25)
    assert row.n_days == 4
    assert abs(row.r_rescaled - round(2 / (sd * 2), 6)) < 5e-7
    assert abs(row.q_rescaled - round(2 / (sd * 2), 6)) < 5e-7


def test_chapman_enumerable_captures(spark, tmp_path):
    """4-day span (midpoint: first 2 days are capture 1): users
    {1,2,3} in the first half, {2,3,4,5} in the second → n₁ = 3,
    n₂ = 4, m = 2, Chapman = 4·5/3 − 1, LP = 12/2 = 6."""
    rows, eid = [], 0
    for day, users in [
        (0, [1, 2, 3]), (1, [1]), (2, [2, 3, 4]), (3, [5]),
    ]:
        for u in users:
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 4 + day, 12, 0, 0), u,
                 "click", 1.0, "{}")
            )
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    row = Q["chapman_population_users_events"](spark, sf).collect()[0]
    assert (row.n_capture1, row.n_capture2, row.n_recaptured) == (3, 4, 2)
    assert abs(row.chapman_estimate - round(4 * 5 / 3 - 1, 6)) < 5e-7
    assert abs(row.lincoln_petersen - 6.0) < 1e-9


def test_bowker_symmetric_flip(spark, tmp_path):
    """c1 flips P1→P2, c2 flips P2→P1, c3 stays P1 → n₁₂ = n₂₁ = 1:
    perfectly symmetric, χ² = 0 with df = 1, 3 paired customers."""
    rows = []
    half1, half2 = dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 30)
    cases = [
        (1, "1-URGENT", "2-HIGH"),
        (2, "2-HIGH", "1-URGENT"),
        (3, "1-URGENT", "1-URGENT"),
    ]
    k = 0
    for cust, p_first, p_second in cases:
        for ts, p in [(half1, p_first), (half2, p_second)]:
            k += 1
            rows.append((k, cust, "O", 100.0, ts, p))
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    row = Q["bowker_symmetry_priority_orders"](spark, sf).collect()[0]
    assert row.n_customers == 3
    assert row.df == 1
    assert abs(row.chi2) < 1e-9


def test_shewhart_limits_from_constants(spark, tmp_path):
    """Two complete weeks: week 1 counts 1..7 (x̄ = 4, R = 6), week 2
    counts 8,2,3,4,5,6,7 (x̄ = 5, R = 6) → X̿ = 4.5, R̄ = 6; X̄ limits
    4.5 ± 0.419·6 = [1.986, 7.014] → neither week out; R limits
    [0.456, 11.544] → none out."""
    per = {}
    week2 = [8, 2, 3, 4, 5, 6, 7]
    for d in range(7):
        per[(dt.date(2024, 3, 4) + dt.timedelta(days=d), "a")] = d + 1
        per[(dt.date(2024, 3, 11) + dt.timedelta(days=d), "a")] = week2[d]
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    row = Q["shewhart_xbar_r_weekly_events"](spark, sf).collect()[0]
    assert row.n_subgroups == 2
    assert abs(row.xbarbar - 4.5) < 1e-9
    assert abs(row.rbar - 6.0) < 1e-9
    assert (row.n_out_xbar, row.n_out_r) == (0, 0)


def test_hubness_orthogonal_basis_enumerable(spark, tmp_path):
    """8 orthogonal basis vectors: every pairwise cosine is 0, so each
    point's top-5 is the 5 smallest OTHER vec_ids (deterministic
    tie-break).  Occurrences: vecs 0–4 → 7, vec 5 → 5, vecs 6,7 → 0;
    mean is exactly k = 5, skewness recomputed from the integer
    deviations (2,2,2,2,2,0,−5,−5)."""
    rows = []
    for i in range(8):
        v = [0.0] * 64
        v[i] = 1.0
        rows.append((i, v, i % 3))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    row = Q["hubness_skew_embeddings"](spark, sf).collect()[0]
    assert (row.n_sample, row.k, row.max_occurrence) == (8, 5, 7)
    m2 = 70 / 8
    m3 = -210 / 8
    assert abs(row.occurrence_skewness - round(m3 / m2**1.5, 6)) < 5e-7


def test_chebyshev_axis_aligned_distances(spark, tmp_path):
    """Probe 0 at the origin; neighbors on axes at |coord| 0.5, 0.25,
    0.75 → L∞ distances are exactly those magnitudes and the top-k
    order is 2 (0.25), 1 (0.5), 3 (0.75)."""
    def vec(i, mag):
        v = [0.0] * 64
        if i >= 0:
            v[i] = mag
        return v

    rows = [
        (0, vec(-1, 0.0), 0),
        (1, vec(1, 0.5), 0),
        (2, vec(2, 0.25), 0),
        (3, vec(3, -0.75), 0),
    ]
    sf = _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    got = [
        (r.neighbor_id, r.dist, r.rnk)
        for r in Q["chebyshev_topk_embeddings"](spark, sf).collect()
        if r.probe_id == 0
    ]
    assert got == [(2, 0.25, 1), (1, 0.5, 2), (3, 0.75, 3)]


def test_footrule_reversed_rankings(spark, tmp_path):
    """3 docs: n_chars ranks (1,2,3), token-count ranks reversed
    (3,2,1) → F* = 2+0+2 = 4, all 3 common, normalized = 4/10100."""
    rows = [
        (1, "a", "en", "s", 30),
        (2, "a b", "en", "s", 20),
        (3, "a b c", "en", "s", 10),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    row = Q["spearman_footrule_rankers_docs"](spark, sf).collect()[0]
    assert (row.k, row.n_common, row.footrule_star) == (100, 3, 4)
    assert abs(row.normalized - round(4 / 10100, 6)) < 5e-7


def test_seq_trigrams_literal_stream(spark, tmp_path):
    """One user, stream a,b,c,a,b → trigrams (a,b,c), (b,c,a),
    (c,a,b), each once, support 1/3, ranked lexicographically."""
    rows = []
    for i, typ in enumerate(["a", "b", "c", "a", "b"]):
        rows.append(
            (i, dt.datetime(2024, 3, 4, 10, 0, i), 1, typ, 1.0, "{}")
        )
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = [
        (r.rnk, r.t1, r.t2, r.t3, r.cnt, r.support)
        for r in Q["seq_trigram_patterns_events"](spark, sf).collect()
    ]
    third = round(1 / 3, 6)
    assert got == [
        (1, "a", "b", "c", 1, third),
        (2, "b", "c", "a", 1, third),
        (3, "c", "a", "b", 1, third),
    ]


def test_median_polish_additive_grid_zero_residuals(spark, tmp_path):
    """Perfectly additive grid — type a: count = dow, type b:
    count = dow + 7 → after one row sweep the type effects are
    constant, after the column sweep all residuals are exactly 0
    (median polish converges on additive data in one cycle)."""
    per = {}
    for d in range(7):
        day = dt.date(2024, 3, 4) + dt.timedelta(days=d)
        per[(day, "a")] = d + 1
        per[(day, "b")] = d + 8
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    rows = Q["median_polish_dow_type_events"](spark, sf).collect()
    assert len(rows) == 14
    assert all(abs(r.residual) < 1e-9 for r in rows)


def test_mmd_two_point_masses(spark, tmp_path):
    """Cohort A = 24 copies of e₁, cohort B = 24 copies of e₂ →
    within-group kernel 1, cross kernel exp(−0.5·2) = e⁻¹, so
    MMD² = 2 − 2e⁻¹ exactly."""
    rows = []
    for i in range(48):
        v = [0.0] * 64
        v[0 if i < 24 else 1] = 1.0
        rows.append((i, v, 0))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    row = Q["mmd_rbf_embeddings"](spark, sf).collect()[0]
    assert (row.n_a, row.n_b) == (24, 24)
    assert abs(row.mmd2 - round(2 - 2 * math.exp(-1), 6)) < 5e-7


def test_tail_dependence_comonotone(spark, tmp_path):
    """20 comonotone rows (price = quantity in dollars) → both 95%
    thresholds cut at value 19, one joint exceedance out of one
    quantity exceedance → λ_U = 1 (perfect upper-tail dependence)."""
    rows = []
    for i in range(1, 21):
        rows.append(
            (i, i, i, 1, float(i), float(i), 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1))
        )
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    row = Q["tail_dependence_lineitem"](spark, sf).collect()[0]
    assert row.n_rows == 20
    assert abs(row.var95_price - 19.0) < 1e-9
    assert row.var95_quantity == 19
    assert (row.n_joint_tail, row.n_quantity_tail) == (1, 1)
    assert abs(row.lambda_upper - 1.0) < 1e-9


def test_expected_shortfall_uniform_values(spark, tmp_path):
    """One type, values 1..100 → VaR₉₅ is the 95th smallest (95.0)
    and ES₉₅ the mean of 95..100 = 97.5 over 6 tail values."""
    rows = []
    for i in range(1, 101):
        rows.append(
            (i, dt.datetime(2024, 3, 4, 10, 0, i % 60, i), 1, "a",
             float(i), "{}")
        )
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    row = Q["expected_shortfall_value_events"](spark, sf).collect()[0]
    assert (row.event_type, row.n_events, row.n_tail) == ("a", 100, 6)
    assert abs(row.var95 - 95.0) < 1e-9
    assert abs(row.es95 - 97.5) < 1e-9


def test_beta_moments_three_known_rates(spark, tmp_path):
    """Users with rates 0.2, 0.4, 0.6 (k purchases in 5 events) →
    m = 0.4, v = 2/75, t = 0.24/v − 1 = 8 → α = 3.2, β = 4.8."""
    rows, eid = [], 0
    for u, k in [(1, 1), (2, 2), (3, 3)]:
        for i in range(5):
            eid += 1
            typ = "purchase" if i < k else "click"
            rows.append(
                (eid, dt.datetime(2024, 3, 4, 10, 0, eid % 60), u, typ,
                 1.0, "{}")
            )
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    row = Q["beta_moments_purchase_users"](spark, sf).collect()[0]
    assert row.n_users == 3
    assert abs(row.mean_rate - 0.4) < 1e-9
    assert abs(row.var_rate - round(2 / 75, 6)) < 5e-7
    assert abs(row.alpha - 3.2) < 2e-4  # α = m·t built from rounded v
    assert abs(row.beta - 4.8) < 3e-4


def test_chatterjee_xi_monotone_series(spark, tmp_path):
    """Daily counts 1,2,3,4 strictly increasing in time (no ties):
    r = (1,2,3,4), l = (4,3,2,1) → Σ|Δr| = 3, Σl(n−l) = 10,
    ξ = 1 − 4·3/(2·10) = 0.4 (the exact finite-n value for a
    monotone function of time)."""
    per = {}
    for i, c in enumerate([1, 2, 3, 4]):
        per[(dt.date(2024, 3, 4) + dt.timedelta(days=i), "a")] = c
    sf = _write(spark, tmp_path, "events", _events_daily_counts(per), EV_SCHEMA)
    row = Q["chatterjee_xi_daily_events"](spark, sf).collect()[0]
    assert row.n_days == 4
    assert abs(row.xi - 0.4) < 1e-9
