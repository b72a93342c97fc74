"""Hand-computed semantic pins for the round-9 second-module wave —
the cross-engine oracle proves Spark ≡ DuckDB; these prove the
formulas themselves on inputs where the answer is known by hand
(Mood 1950, Bartlett 1937, Goodman–Kruskal 1954, Kendall–Babington
Smith 1939, Fleiss 1971, Lin 1989, the one-way ANOVA ICC, the 1-D
Cramér/energy identity, Quade 1979, Atkinson 1970, Hedges 1981, and
the frequency-spectrum richness constants)."""

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


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_mood_median_hand_2x2(spark, tmp_path):
    """Groups A={1,2,3}, B={4,5,6} dollars: pooled lower median = 3
    (smallest v with 2F ≥ N), above-median counts 0 vs 3, expected
    1.5 each → χ² = 4·(1.5²/1.5) = 6 with df 1."""
    rows = [(i + 1, g, float(v)) for i, (g, v) in enumerate(
        [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
    )]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["mood_median_test_orders"](spark, sf).collect()[0]
    assert r.n_groups == 2 and r.df == 1
    assert abs(r.pooled_median - 3.0) < 1e-9
    assert abs(r.chi2 - 6.0) < 1e-9


def test_bartlett_two_group_textbook(spark, tmp_path):
    """A=(10,20,30) s²=100, B=(40,60,80) s²=400: Sp²=250,
    T = (4·ln250 − 2·ln100 − 2·ln400) / C with
    C = 1 + (1/2 + 1/2 − 1/4)/3 = 1.25 — and the cents² unit
    constants must cancel exactly between the pooled and per-group
    logs."""
    rows = [(i + 1, g, float(v)) for i, (g, v) in enumerate(
        [("A", 10), ("A", 20), ("A", 30), ("B", 40), ("B", 60), ("B", 80)]
    )]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["bartlett_variance_orders"](spark, sf).collect()[0]
    expect = (
        4 * math.log(250) - 2 * math.log(100) - 2 * math.log(400)
    ) / 1.25
    assert r.n_groups == 2 and r.df == 1
    assert abs(r.bartlett_t - expect) < 1e-6


def test_gk_gamma_hand_grid(spark, tmp_path):
    """Priority 1: 3 low-band + 1 high-band orders; priority 2:
    1 low + 3 high.  Concordant = 3·3 = 9, discordant = 1·1 = 1
    → γ = 8/10 = 0.8 (same-band pairs are ties and must NOT count)."""
    rows = []
    k = 0
    for p, band, n in [("1-U", 0, 3), ("1-U", 1, 1), ("2-H", 0, 1), ("2-H", 1, 3)]:
        for _ in range(n):
            k += 1
            rows.append((k, p, 100.0 if band == 0 else 200000.0))
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["goodman_kruskal_gamma_orders"](spark, sf).collect()[0]
    assert r.concordant == 9 and r.discordant == 1
    assert abs(r.gamma - 0.8) < 1e-9


def _two_identical_weeks(scale2=1):
    """Two complete Mon–Sun weeks whose daily counts rank 1..7
    identically; week 2's counts scaled by ``scale2``."""
    rows = []
    eid = 0
    for wi, wk_start in enumerate((dt.date(2024, 3, 4), dt.date(2024, 3, 11))):
        mult = 1 if wi == 0 else scale2
        for d in range(7):
            day = wk_start + dt.timedelta(days=d)
            for i in range((d + 1) * 10 * mult):
                eid += 1
                rows.append(
                    (
                        eid,
                        dt.datetime.combine(day, dt.time(10, 0))
                        + dt.timedelta(seconds=i),
                        i,
                        "view",
                        0.0,
                        "",
                    )
                )
    return rows


def test_kendalls_w_perfect_concordance(spark, tmp_path):
    """Two weeks ranking the days identically, no ties → W must be
    exactly 1: S = Σ(2j−8)² = 112 and m²(k³−k) = 4·336 = 1344 =
    12·112."""
    sf = _write_events(spark, tmp_path, _two_identical_weeks())
    r = Q["kendalls_w_dow_weeks_events"](spark, sf).collect()[0]
    assert r.n_blocks == 2 and r.n_treatments == 7
    assert abs(r.kendalls_w - 1.0) < 1e-9


def test_quade_two_block_hand(spark, tmp_path):
    """Week 1 counts 10..70 (range 60), week 2 counts 20..140 (range
    120): range ranks Q = (1, 2), identical within-week day ranks →
    S_j = 3(j−4), B = 9·28/2 = 126, A = 5·28 = 140,
    F = (b−1)B/(A−B) = 126/14 = 9 with df (6, 6)."""
    sf = _write_events(spark, tmp_path, _two_identical_weeks(scale2=2))
    r = Q["quade_test_dow_weeks_events"](spark, sf).collect()[0]
    assert r.n_blocks == 2 and r.n_treatments == 7
    assert r.df1 == 6 and r.df2 == 6
    assert abs(r.quade_f - 9.0) < 1e-9


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_fleiss_kappa_hand_five_docs(spark, tmp_path):
    """Raters: n_chars ≥ 200, contains ' the ', word count ≥ 40.
    Docs with rater-positive counts (3, 3, 0, 0, 2):
    P̄ = (1+1+1+1+1/3)/5 = 13/15, p₁ = 8/15,
    P̄e = (64+49)/225 = 113/225 → κ = 82/112."""
    yes3 = "a the " + "w " * 45  # ' the ', 47 words
    no0 = "short text here"
    yes2 = "a the b"  # ' the ', 3 words
    rows = [
        (1, yes3, "en", "s", 300),
        (2, yes3, "en", "s", 300),
        (3, no0, "en", "s", 50),
        (4, no0, "en", "s", 50),
        (5, yes2, "en", "s", 300),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["fleiss_kappa_quality_docs"](spark, sf).collect()[0]
    assert r.n_docs == 5
    assert abs(r.p_bar - 13.0 / 15.0) < 1e-6
    assert abs(r.fleiss_kappa - 82.0 / 112.0) < 1e-6


def test_lin_ccc_shift_penalized(spark, tmp_path):
    """a = n_chars = (20, 30, 40), b = 5·wc = (10, 20, 30): perfectly
    correlated (r = 1) but location-biased — CCC must drop to
    2·(200/3)/(400/3 + 100) = 4/7, the exact penalty Pearson is
    blind to."""
    rows = [
        (1, "w w", "en", "s", 20),
        (2, "w w w w", "en", "s", 30),
        (3, "w w w w w w", "en", "s", 40),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["lin_ccc_quality_docs"](spark, sf).collect()[0]
    assert r.n_docs == 3
    assert abs(r.pearson_r - 1.0) < 1e-9
    assert abs(r.lin_ccc - 4.0 / 7.0) < 1e-6


def test_icc_perfect_clustering(spark, tmp_path):
    """Two users, two events each, values (0, 0) and (10, 10):
    MSW = 0 so ICC(1) = 1 exactly, and with m̄ = 2 the design effect
    doubles every variance: DEFF = 2."""
    t0 = dt.datetime(2024, 3, 4, 10, 0)
    rows = [
        (1, t0, 1, "view", 0.0, ""),
        (2, t0, 1, "view", 0.0, ""),
        (3, t0, 2, "view", 10.0, ""),
        (4, t0, 2, "view", 10.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = Q["icc_design_effect_events"](spark, sf).collect()[0]
    assert r.n_users == 2 and r.n_events == 4
    assert abs(r.icc1 - 1.0) < 1e-9
    assert abs(r.design_effect - 2.0) < 1e-9


def test_energy_distance_hand_grid(spark, tmp_path):
    """F = {1, 2}, O = {2, 3} dollars: the CDF gap is 1/2 on both
    unit segments, so 2∫(F−G)²dv = 2·(0.25 + 0.25) = 1.0 dollar —
    the 1-D Cramér identity on an enumerable grid."""
    rows = [
        (1, "F", 1.0),
        (2, "F", 2.0),
        (3, "O", 2.0),
        (4, "O", 3.0),
    ]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    r = Q["energy_distance_drift_orders"](spark, sf).collect()[0]
    assert r.n_f == 2 and r.n_o == 2
    assert abs(r.energy_dist - 1.0) < 1e-9


def test_atkinson_two_user_hand(spark, tmp_path):
    """User totals (1, 4): μ = 2.5, EDE = ((1+2)/2)² = 2.25 →
    A₀.₅ = 1 − 2.25/2.5 = 0.1 exactly."""
    t0 = dt.datetime(2024, 3, 4, 10, 0)
    rows = [
        (1, t0, 1, "view", 1.0, ""),
        (2, t0, 2, "view", 4.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = Q["atkinson_index_users_events"](spark, sf).collect()[0]
    assert r.n_users == 2
    assert abs(r.mean_value - 2.5) < 1e-9
    assert abs(r.atkinson_05 - 0.1) < 1e-9


def test_hedges_g_hand_correction(spark, tmp_path):
    """R = (10, 20, 30), N = (20, 30, 40): pooled s = 10 so
    d = −1 exactly, and J = 1 − 3/(4·6−9) = 0.8 → g = −0.8 (a wrong
    N in the correction, the classic slip, moves g off by > 0.02)."""
    rows = [(i + 1, g, float(v)) for i, (g, v) in enumerate(
        [("R", 10), ("R", 20), ("R", 30), ("N", 20), ("N", 30), ("N", 40)]
    )]
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_returnflag string, l_quantity double",
    )
    r = Q["hedges_g_quantity_returnflag"](spark, sf).collect()[0]
    assert r.n_r == 3 and r.n_n == 3
    assert abs(r.cohens_d - (-1.0)) < 1e-9
    assert abs(r.hedges_g - (-0.8)) < 1e-9


def test_hapax_richness_hand_spectrum(spark, tmp_path):
    """Tokens 'a a b c': V = 3, V₁ = 2, V₂ = 1, N = 4 →
    Honoré R = 100·ln4/(1 − 2/3) = 300·ln4, Sichel S = 1/3,
    TTR = 3/4."""
    rows = [(1, "a a b c", "en", "src", 7)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["hapax_richness_docs"](spark, sf).collect()[0]
    assert r.n_tokens == 4 and r.vocab == 3 and r.hapax == 2
    assert abs(r.honore_r - 300 * math.log(4)) < 1e-3
    assert abs(r.sichel_s - 1.0 / 3.0) < 1e-6
    assert abs(r.ttr - 0.75) < 1e-6


def test_rich_club_complete_clique(spark, tmp_path):
    """Six suppliers co-supplying two parts form K₆ (every degree 5):
    at k = 4 the club is all six nodes with all 15 edges → φ = 1
    exactly; k = 8 and 16 have no members and no rows."""
    rows = []
    i = 0
    for p, sups in [(1, range(1, 6)), (2, range(1, 7))]:
        for s in sups:
            i += 1
            rows.append((i, p, s))
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    out = {r.k: r for r in Q["rich_club_suppliers"](spark, sf).collect()}
    assert set(out) == {4}
    assert out[4].n_nodes == 6 and out[4].n_edges == 15
    assert abs(out[4].rich_club_phi - 1.0) < 1e-9


def test_chow_break_detects_level_shift(spark, tmp_path):
    """Ten days of daily mean value [1..5, 11..15] (same slope, +10
    level jump at the midpoint): the two half-fits are exact
    (RSS₁ = RSS₂ = 0) while the pooled line is not, so F must be
    +infinity-like (null under 0/0 guard is a fail) — pin against the
    closed-form pooled RSS computed here from first principles."""
    rows = []
    eid = 0
    t0 = dt.date(2024, 3, 4)
    ys = [1, 2, 3, 4, 5, 11, 12, 13, 14, 15]
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                float(y),
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["chow_break_daily_events"](spark, sf).collect()[0]
    # pooled regression of ys on t=1..10 from first principles
    n = 10
    ts = list(range(1, 11))
    st, stt = sum(ts), sum(t * t for t in ts)
    sy = sum(ys)
    syy = sum(y * y for y in ys)
    sty = sum(t * y for t, y in zip(ts, ys))
    rss_p = (syy - sy * sy / n) - (sty - st * sy / n) ** 2 / (
        stt - st * st / n
    )
    assert r.n_days == 10 and r.df1 == 2 and r.df2 == 6
    # RSS1 = RSS2 = 0 -> F undefined: both engines report NULL (the
    # guard this pin forced in) while the pooled RSS stays positive
    assert r.chow_f is None and rss_p > 0
    # noisy variant: halves are no longer exact fits, F is finite
    rows2 = list(rows)
    # perturb one day per half so the halves are not exact fits
    rows2[0] = rows2[0][:4] + (2.0,) + rows2[0][5:]
    rows2[5] = rows2[5][:4] + (12.0,) + rows2[5][5:]
    sf2 = _write_events(spark, f"{tmp_path}_2", rows2)
    r2 = Q["chow_break_daily_events"](spark, sf2).collect()[0]
    ys2 = [2, 2, 3, 4, 5, 12, 12, 13, 14, 15]

    def rss(ts_, ys_):
        n_ = len(ts_)
        st_, stt_ = sum(ts_), sum(t * t for t in ts_)
        sy_ = sum(ys_)
        syy_ = sum(y * y for y in ys_)
        sty_ = sum(t * y for t, y in zip(ts_, ys_))
        return (syy_ - sy_ * sy_ / n_) - (sty_ - st_ * sy_ / n_) ** 2 / (
            stt_ - st_ * st_ / n_
        )

    rss_p2 = rss(ts, ys2)
    rss_1 = rss(ts[:5], ys2[:5])
    rss_2 = rss(ts[5:], ys2[5:])
    f_expect = ((rss_p2 - rss_1 - rss_2) / 2) / ((rss_1 + rss_2) / 6)
    assert abs(r2.chow_f - f_expect) < 1e-4


def test_newey_west_iid_vs_alternating(spark, tmp_path):
    """An alternating daily series ±1 around its mean has negative
    lag-1 autocovariance, so se_hac < se_iid — and both must match
    the explicit Bartlett-kernel fold computed here from first
    principles on the same 12 numbers."""
    rows = []
    eid = 0
    t0 = dt.date(2024, 3, 4)
    ys = [10 + (1 if d % 2 == 0 else -1) for d in range(12)]
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                float(y),
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["newey_west_daily_events"](spark, sf).collect()[0]
    n = len(ys)
    m = sum(ys) / n
    z = [y - m for y in ys]
    g = [
        sum(z[t] * z[t - l] for t in range(l, n)) / n for l in range(6)
    ]
    var_hac = g[0] + 2 * sum((1 - l / 6.0) * g[l] for l in range(1, 6))
    assert r.n_days == n
    assert abs(r.mean_value - m) < 1e-6
    assert abs(r.se_iid - math.sqrt(g[0] / n)) < 1e-6
    assert abs(r.se_hac - math.sqrt(max(var_hac, 0.0) / n)) < 1e-6
    assert r.se_hac < r.se_iid  # negative serial correlation shrinks


def test_ar2_yule_walker_known_acf(spark, tmp_path):
    """Daily series with period-3 pattern (1, 2, 3, 1, 2, 3, ...):
    the Yule–Walker solve must reproduce φ from the empirical r₁/r₂
    computed here from first principles (and the oscillatory pattern
    forces φ₂ < 0)."""
    rows = []
    eid = 0
    t0 = dt.date(2024, 3, 4)
    ys = [(d % 3) + 1 for d in range(12)]
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                float(y),
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["ar2_yule_walker_daily_events"](spark, sf).collect()[0]
    n = len(ys)
    m = sum(ys) / n
    z = [y - m for y in ys]
    g0 = sum(v * v for v in z)
    g1 = sum(z[t] * z[t - 1] for t in range(1, n))
    g2 = sum(z[t] * z[t - 2] for t in range(2, n))
    r1, r2 = g1 / g0, g2 / g0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert r.n_days == n
    assert abs(r.phi1 - phi1) < 1e-6
    assert abs(r.phi2 - phi2) < 1e-6
    assert r.phi2 < 0
    assert abs(r.noise_var_ratio - (1 - phi1 * r1 - phi2 * r2)) < 1e-6


def test_ad_two_sample_hand_grids(spark, tmp_path):
    """F={1}, O={2}: every midrank term folds to 1 → A²ₐₖₙ = 1,
    exactly E[A²] under H₀.  F={1,1}, O={2,2} (maximal separation):
    both value cells contribute 2 → A²ₐₖₙ = 3.  Both worked by hand
    from the Scholz–Stephens midrank formula."""
    sch = "o_orderkey long, o_orderstatus string, o_totalprice double"
    sf = _write(
        spark, tmp_path, "orders",
        [(1, "F", 1.0), (2, "O", 2.0)], sch,
    )
    r = Q["anderson_darling_two_sample_orders"](spark, sf).collect()[0]
    assert r.n_f == 1 and r.n_o == 1
    assert abs(r.a2_akn - 1.0) < 1e-9
    sf2 = _write(
        spark, f"{tmp_path}_2", "orders",
        [(1, "F", 1.0), (2, "F", 1.0), (3, "O", 2.0), (4, "O", 2.0)],
        sch,
    )
    r2 = Q["anderson_darling_two_sample_orders"](spark, sf2).collect()[0]
    assert abs(r2.a2_akn - 3.0) < 1e-9


def test_cochran_q_hand_four_users(spark, tmp_path):
    """User positives (threshold 14 events/type): (v,c), (v), (v,c,p),
    (): G = (3,2,1), T = 6, ΣL² = 14 → Q = 6·Σ(G−2)²/(18−14) = 3."""
    t0 = dt.datetime(2024, 3, 4, 10, 0)
    rows = []
    eid = 0

    def add(uid, etype, n):
        nonlocal eid
        for i in range(n):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(seconds=eid), uid, etype, 0.0, ""))

    add(1, "view", 14); add(1, "click", 14)
    add(2, "view", 14)
    add(3, "view", 14); add(3, "click", 14); add(3, "purchase", 14)
    add(4, "view", 1)
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cochran_q_funnel_events"](spark, sf).collect()[0]
    assert r.n_users == 4 and r.df == 2
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 2, 1)
    assert abs(r.cochran_q - 3.0) < 1e-9


def test_partial_corr_first_principles(spark, tmp_path):
    """Four days with per-type counts (click, purchase, view) =
    (1,2,3), (2,1,1), (3,4,2), (4,3,5): the reported r's must match
    the closed-form pairwise/partial correlations computed here on
    the same 12 integers."""
    counts = [(1, 2, 3), (2, 1, 1), (3, 4, 2), (4, 3, 5)]
    t0 = dt.date(2024, 3, 4)
    rows = []
    eid = 0
    for d, (c, p, v) in enumerate(counts):
        day = dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10))
        for etype, n in (("click", c), ("purchase", p), ("view", v)):
            for i in range(n):
                eid += 1
                rows.append((eid, day + dt.timedelta(seconds=i), 1, etype, 0.0, ""))
    sf = _write_events(spark, tmp_path, rows)
    r = Q["partial_corr_daily_events"](spark, sf).collect()[0]
    xs = [c for c, _, _ in counts]
    ys = [p for _, p, _ in counts]
    zs = [v for _, _, v in counts]
    n = len(counts)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        return (n * sum(x * y for x, y in zip(a, b)) - sa * sb) / math.sqrt(
            (n * sum(x * x for x in a) - sa * sa)
            * (n * sum(y * y for y in b) - sb * sb)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    pr = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r.n_days == 4
    assert abs(r.r_click_purchase - rxy) < 1e-6
    assert abs(r.partial_r - pr) < 1e-6
    assert abs(r.fisher_z - 0.5 * math.log((1 + pr) / (1 - pr))) < 1e-6


def test_pettitt_monotone_series(spark, tmp_path):
    """Daily counts 1..6 (no ties): ranks equal the day order, so
    U_t = 2·Σt − t·7 is minimized at t = 3 with |U| = 9 → K = 9,
    break day 3, p = 2·exp(−486/252)."""
    t0 = dt.date(2024, 3, 4)
    rows = []
    eid = 0
    for d in range(6):
        day = dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10))
        for i in range(d + 1):
            eid += 1
            rows.append((eid, day + dt.timedelta(seconds=i), 1, "view", 0.0, ""))
    sf = _write_events(spark, tmp_path, rows)
    r = Q["pettitt_changepoint_daily_events"](spark, sf).collect()[0]
    assert r.n_days == 6
    assert abs(r.k_stat - 9.0) < 1e-9
    assert r.break_day == dt.date(2024, 3, 6)
    assert abs(r.p_approx - 2 * math.exp(-486.0 / 252.0)) < 1e-6


def test_brunner_munzel_hand_interleaved(spark, tmp_path):
    """F = {1, 3}, O = {2, 4}: pooled ranks (1,3) vs (2,4), within
    ranks (1,2) each → v₁ = v₂ = 0.5, p̂ = 0.75, BM = 4·1/(4·√2) =
    1/√2, Welch df = 4/(1+1) = 2 — worked by hand from Brunner &
    Munzel (2000)."""
    rows = [(1, "F", 1.0), (2, "F", 3.0), (3, "O", 2.0), (4, "O", 4.0)]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    r = Q["brunner_munzel_orders"](spark, sf).collect()[0]
    assert r.n_f == 2 and r.n_o == 2
    assert abs(r.p_hat - 0.75) < 1e-9
    assert abs(r.bm_stat - 1 / math.sqrt(2)) < 1e-6
    assert abs(r.df - 2.0) < 1e-6


def test_dunn_posthoc_no_tie_ladder(spark, tmp_path):
    """A={1,2}, B={3,4}, C={5,6}: pooled mean ranks 1.5/3.5/5.5, no
    ties → z_AB = −2/√(3.5·1) for every adjacent pair and
    z_AC = −4/√3.5 — the pooled-rank coherence a per-pair re-rank
    would break."""
    rows = [(i + 1, g, float(v)) for i, (g, v) in enumerate(
        [("A", 1), ("A", 2), ("B", 3), ("B", 4), ("C", 5), ("C", 6)]
    )]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    out = {
        (r.g_a, r.g_b): r.dunn_z
        for r in Q["dunn_posthoc_priority_orders"](spark, sf).collect()
    }
    s = math.sqrt(3.5)
    assert abs(out[("A", "B")] - (-2 / s)) < 1e-6
    assert abs(out[("B", "C")] - (-2 / s)) < 1e-6
    assert abs(out[("A", "C")] - (-4 / s)) < 1e-6


def test_dickey_fuller_first_principles(spark, tmp_path):
    """Mean-reverting daily series (alternating 10±1): β̂ of
    Δy on y₋₁ must match the closed-form OLS computed here on the
    same numbers, and be strongly negative (β → −2 for a perfect
    alternation)."""
    t0 = dt.date(2024, 3, 4)
    ys = [10 + (1 if d % 2 == 0 else -1) for d in range(10)]
    rows = []
    eid = 0
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                float(y),
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["dickey_fuller_daily_events"](spark, sf).collect()[0]
    dys = [ys[t] - ys[t - 1] for t in range(1, len(ys))]
    yls = ys[:-1]
    n = len(dys)
    sx, sy = sum(yls), sum(dys)
    sxx = sum(x * x for x in yls)
    sxy = sum(x * y for x, y in zip(yls, dys))
    beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert r.n_obs == n
    assert abs(r.beta - beta) < 1e-6
    assert r.beta < -1.5  # strong mean reversion
    assert r.df_stat < 0


def test_effective_rank_constructed_spectra(spark, tmp_path):
    """Variance confined to dim 1 → effective rank 1 exactly; equal
    variance split across dims 1 and 2 → exactly 2 (the participation
    ratio tr²/tr(C²) needs no eigendecomposition to see it)."""
    import pyspark.sql.types as T

    def write(vectors, path):
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField(
                    "embedding", T.ArrayType(T.FloatType())
                ),
                T.StructField("label", T.IntegerType()),
            ]
        )
        rows = [
            (i, [float(x) for x in v] + [0.0] * (64 - len(v)), 0)
            for i, v in enumerate(vectors)
        ]
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{path}/embeddings.parquet")
        return str(path)

    sf1 = write([[1.0], [-1.0], [2.0], [-2.0]], tmp_path)
    r1 = Q["effective_rank_embeddings"](spark, sf1).collect()[0]
    assert abs(r1.effective_rank - 1.0) < 1e-6

    sf2 = write(
        [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]],
        f"{tmp_path}_2",
    )
    r2 = Q["effective_rank_embeddings"](spark, sf2).collect()[0]
    assert abs(r2.effective_rank - 2.0) < 1e-6


def test_cucconi_hand_interleaved(spark, tmp_path):
    """F = {1, 3}, O = {2, 4}: ΣR²(O) = 20, contrary Σ = 10, so
    U = 30/(6√43), V = −U, ρ = 24/387 − 1 — C follows from Marozzi's
    closed form, worked by hand (a sign slip in the contrary ranks
    or a wrong ρ polynomial moves C by > 0.1)."""
    rows = [(1, "F", 1.0), (2, "F", 3.0), (3, "O", 2.0), (4, "O", 4.0)]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    r = Q["cucconi_location_scale_orders"](spark, sf).collect()[0]
    den = 6 * math.sqrt(43)
    u = 30 / den
    v = -30 / den
    rho = 24.0 / 387.0 - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert r.n_f == 2 and r.n_o == 2
    assert abs(r.u_stat - u) < 1e-6
    assert abs(r.v_stat - v) < 1e-6
    assert abs(r.cucconi_c - c) < 1e-6


def test_hodges_lehmann_hand_grid(spark, tmp_path):
    """R = {10, 20}, N = {11, 12}: the four pairwise differences are
    (−1, −2, 9, 8) → sorted (−2, −1, 8, 9), lower weighted median =
    −1 (the robust shift; the MEAN difference is +3.5, dragged by
    the outlier pair)."""
    rows = [(i + 1, g, float(v)) for i, (g, v) in enumerate(
        [("R", 10), ("R", 20), ("N", 11), ("N", 12)]
    )]
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_returnflag string, l_quantity double",
    )
    r = Q["hodges_lehmann_shift_lineitem"](spark, sf).collect()[0]
    assert r.n_pairs == 4
    assert r.hl_shift == -1


def test_weighted_kappa_near_miss_credit(spark, tmp_path):
    """Bands (a, b) = (0,0), (1,1), (2,3), (3,3): plain agreement is
    3/4 but linear weights credit the one-band miss at 2/3 →
    p_o = (3 + 2/3)/4 = 11/12; p_e from the marginals; κ_w follows
    exactly (computed here from the same 4 cells)."""
    docs = [
        (1, "w " * 10, "en", "s", 10),     # a=0 (10//150), b=0 (10//30)
        (2, "w " * 35, "en", "s", 160),    # a=1, b=1
        (3, "w " * 95, "en", "s", 310),    # a=2, b=3
        (4, "w " * 95, "en", "s", 460),    # a=3, b=3
    ]
    sf = _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    r = Q["weighted_kappa_quality_docs"](spark, sf).collect()[0]
    cells = [(0, 0), (1, 1), (2, 3), (3, 3)]
    n = 4
    p_obs = sum(1 - abs(a - b) / 3.0 for a, b in cells) / n
    ca = {0: 1, 1: 1, 2: 1, 3: 1}
    cb = {0: 1, 1: 1, 3: 2}
    p_exp = sum(
        (1 - abs(a - b) / 3.0) * (ca[a] / n) * (cb.get(b, 0) / n)
        for a in ca
        for b in cb
    )
    assert r.n_docs == 4
    assert abs(r.p_obs - p_obs) < 1e-6
    assert abs(r.p_exp - p_exp) < 1e-6
    assert abs(
        r.weighted_kappa - (p_obs - p_exp) / (1 - p_exp)
    ) < 1e-6


def test_breusch_pagan_first_principles(spark, tmp_path):
    """Daily means with variance growing over time (residual spread
    doubles in the second half): the Koenker LM = n·R²(e² on t) must
    match the closed-form computed here on the same 10 numbers, and
    be comfortably positive."""
    t0 = dt.date(2024, 3, 4)
    ys = [10.0, 10.2, 9.8, 10.1, 9.9, 11.0, 8.0, 12.0, 7.0, 13.0]
    rows = []
    eid = 0
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                y,
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["breusch_pagan_daily_events"](spark, sf).collect()[0]
    n = len(ys)
    ts = [float(t) for t in range(1, n + 1)]
    st, stt = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(ys), sum(t * y for t, y in zip(ts, ys))
    b = (sty - st * sy / n) / (stt - st * st / n)
    a = (sy - b * st) / n
    g = [(y - a - b * t) ** 2 for t, y in zip(ts, ys)]
    sg, sgg = sum(g), sum(x * x for x in g)
    stg = sum(t * x for t, x in zip(ts, g))
    r2 = (stg - st * sg / n) ** 2 / (
        (stt - st * st / n) * (sgg - sg * sg / n)
    )
    assert r.n_days == n and r.df == 1
    assert abs(r.bp_lm - n * r2) < 1e-4
    assert r.bp_lm > 1.0


def test_variance_ratio_first_principles(spark, tmp_path):
    """Alternating daily series: 1-day differences flip sign every
    step so 5-day sums partially cancel — VR(5) must match the
    explicit overlapping-difference fold computed here and sit well
    below 1 (mean reversion)."""
    t0 = dt.date(2024, 3, 4)
    ys = [10.0 + (1 if d % 2 == 0 else -1) for d in range(15)]
    rows = []
    eid = 0
    for d, y in enumerate(ys):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10)),
                1,
                "view",
                y,
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["variance_ratio_daily_events"](spark, sf).collect()[0]
    d1 = [ys[t] - ys[t - 1] for t in range(1, len(ys))]
    d5 = [ys[t] - ys[t - 5] for t in range(5, len(ys))]
    n = len(d1)
    mu = sum(d1) / n
    v1 = sum((x - mu) ** 2 for x in d1) / (n - 1)
    v5 = sum((x - 5 * mu) ** 2 for x in d5) / (len(d5) - 1)
    vr = v5 / (5 * v1)
    assert r.n_diffs == n
    assert abs(r.vr5 - vr) < 1e-6
    assert r.vr5 < 0.5  # strong mean reversion
    z = (vr - 1) / math.sqrt(2 * 9 * 4 / (3.0 * 5 * n))
    assert abs(r.z - z) < 1e-6


def test_seasonal_mk_monotone_weeks(spark, tmp_path):
    """Two weeks with strictly increasing daily counts: each dow
    stratum is a 2-point increasing series → S = 7, Var = 7·(2·1·9/18)
    = 7, z = 6/√7 — and plain-MK's cross-dow pairs must NOT leak in."""
    t0 = dt.date(2024, 3, 4)  # a Monday
    rows = []
    eid = 0
    for d in range(14):
        day = dt.datetime.combine(t0 + dt.timedelta(days=d), dt.time(10))
        for i in range(d + 1):  # strictly increasing counts 1..14
            eid += 1
            rows.append((eid, day + dt.timedelta(seconds=i), 1, "view", 0.0, ""))
    sf = _write_events(spark, tmp_path, rows)
    r = Q["seasonal_mann_kendall_events"](spark, sf).collect()[0]
    assert r.n_days == 14
    assert r.s_stat == 7
    assert abs(r.z - 6 / math.sqrt(7)) < 1e-6


def test_wasserstein_hand_grid(spark, tmp_path):
    """F = {1, 2}, O = {2, 3} dollars: the CDF gap is 1/2 on both
    unit segments, so W₁ = ∫|F−G|dv = 1.0 dollar exactly — and the
    energy-distance pin's same fixture gives 2∫(F−G)² = 1.0 too,
    pinning that the two integrals share the grid but NOT the
    integrand."""
    rows = [(1, "F", 1.0), (2, "F", 2.0), (3, "O", 2.0), (4, "O", 3.0)]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    r = Q["wasserstein_drift_orders"](spark, sf).collect()[0]
    assert r.n_f == 2 and r.n_o == 2
    assert abs(r.wasserstein_1 - 1.0) < 1e-9


def test_yules_k_hand_spectrum(spark, tmp_path):
    """Tokens 'a a b': Σf² = 5, N = 3 → K = 10⁴·(5−3)/9 = 20000/9;
    a second source of three distinct tokens has K = 0 exactly (no
    repetition)."""
    rows = [
        (1, "a a b", "en", "rep", 5),
        (2, "x y z", "en", "uni", 5),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {r.source: r for r in Q["yules_k_sources_docs"](spark, sf).collect()}
    assert out["rep"].n_tokens == 3 and out["rep"].n_types == 2
    assert abs(out["rep"].yules_k - 20000.0 / 9.0) < 1e-4
    assert abs(out["uni"].yules_k) < 1e-9


def test_bowley_moors_uniform_ladder(spark, tmp_path):
    """Values 1..8 once each in one group: type-1 octiles are exactly
    1..7, so Bowley skew = (6+2−8)/4 = 0 and Moors kurtosis =
    ((7−5)+(3−1))/4 = 1 — the symmetric-uniform reference point."""
    rows = [(i, "1-U", float(i)) for i in range(1, 9)]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    r = Q["bowley_moors_shape_orders"](spark, sf).collect()[0]
    assert r.n_orders == 8
    assert abs(r.bowley_skew) < 1e-9
    assert abs(r.moors_kurtosis - 1.0) < 1e-9


def test_theils_u_determined_vs_independent(spark, tmp_path):
    """Each source publishing exactly one language → U = 1 (source
    fully determines language); a balanced independent grid → U = 0
    exactly."""
    det = [
        (1, "t", "en", "s1", 1), (2, "t", "en", "s1", 1),
        (3, "t", "fr", "s2", 1), (4, "t", "fr", "s2", 1),
    ]
    sf = _write(spark, tmp_path, "documents", det, DOC_SCHEMA)
    r = Q["theils_u_lang_source_docs"](spark, sf).collect()[0]
    assert abs(r.theils_u - 1.0) < 1e-9
    ind = [
        (1, "t", "en", "s1", 1), (2, "t", "fr", "s1", 1),
        (3, "t", "en", "s2", 1), (4, "t", "fr", "s2", 1),
    ]
    sf2 = _write(spark, f"{tmp_path}_2", "documents", ind, DOC_SCHEMA)
    r2 = Q["theils_u_lang_source_docs"](spark, sf2).collect()[0]
    assert abs(r2.theils_u) < 1e-9
