"""Hand-computed semantic pins for the round-8 statistics tier
(VERDICT r8 Next-round #4).

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; a shared formula
error (wrong Tukey q* normalization, wrong Kruskal–Wallis tie
correction, wrong SPRT boundary, a dropped McNemar continuity term,
the wrong Cook's-distance leverage) would pass both engines
identically.  These tests prove the semantics themselves on crafted
inputs where the right answer is known by hand or from the defining
formula computed independently in the test (Wald 1945 for SPRT,
Tukey–Kramer for HSD, Conover's tie correction for Kruskal–Wallis,
Cliff 1993, Theil 1967, Cook 1977, Edwards 1948 for the McNemar
continuity correction).
"""

from __future__ import annotations

import datetime as dt
import math

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows, sub=""):
    base = f"{tmp_path}/{sub}" if sub else str(tmp_path)
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return base


def test_tukey_hsd_known_q_statistics(spark, tmp_path):
    """Equal-n textbook case: three groups of three with means
    20/30/60 and identical within-group SS=200 → MSW = 600/6 = 100,
    so SE per Tukey–Kramer = √(MSW/2·(1/3+1/3)) = √(100/3) and
    q(A,B) = 10/√(100/3) = √3 = 1.732051, q(B,C) = 3√3 = 5.196152,
    q(A,C) = 4√3 = 6.928203.  Only the latter two clear q*(k,∞) =
    3.858 — a wrong √(MSW/2) normalization or a dropped Kramer term
    shifts every q off these literals."""
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
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {
        (r.g_a, r.g_b): r
        for r in Q["tukey_hsd_priority_orders"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 3
    r3 = math.sqrt(3.0)
    ab = out[("1-A", "2-B")]
    assert ab.mean_diff == -10.0
    assert abs(ab.q_stat - r3) < 1e-6 and not ab.significant
    bc = out[("2-B", "3-C")]
    assert bc.mean_diff == -30.0
    assert abs(bc.q_stat - 3 * r3) < 1e-6 and bc.significant
    ac = out[("1-A", "3-C")]
    assert abs(ac.q_stat - 4 * r3) < 1e-6 and ac.significant


def test_kruskal_wallis_textbook_ties(spark, tmp_path):
    """Hand-ranked triple with ties: groups {1,2,5}, {2,3,6},
    {3,3,7} → midranks 1, 2.5, 2.5, 5, 5, 5, 7, 8, 9 and rank sums
    10.5 / 15.5 / 19, so H = 12/90·Σ R²/3 − 30 = 1.622222; the tie
    term Σ(t³−t) = 6+24 = 30 gives C = 1 − 30/720 and
    H/C = 1.692754.  A wrong midrank convention or a t²−t tie term
    misses both literals."""
    days = {1: dt.date(2024, 3, 4), 2: dt.date(2024, 3, 5), 3: dt.date(2024, 3, 6)}
    groups = {1: (1, 2, 5), 2: (2, 3, 6), 3: (3, 3, 7)}
    rows = []
    eid = 0
    for g, vals in groups.items():
        for v in vals:
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime.combine(days[g], dt.time(12, 0)),
                    eid,
                    "x",
                    v / 100.0,
                    "",
                )
            )
    sf = _write_events(spark, tmp_path, rows)
    r = Q["kruskal_wallis_dow_value_events"](spark, sf).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_events == 9 and row.n_groups == 3
    assert abs(row.h_stat - 1.622222) < 1e-6
    assert abs(row.h_tie_adj - 1.692754) < 1e-6


def test_sprt_wald_boundary_crossing(spark, tmp_path):
    """Wald's SPRT for H0 p=0.18 vs H1 p=0.22, α=0.05, β=0.10: a day
    of 20 events with 10 purchases adds
    llr = 10·ln(.22/.18) + 10·ln(.78/.82) = 1.506603; one such day
    stays under A = ln(0.9/0.05) = 2.890372 (continue), the second
    crosses it (accept_h1).  Mirror stream with 0/30 purchases
    crosses B = ln(0.1/0.95) = −2.251292 on day 2 (accept_h0).
    Expected values computed from Wald's formulas with math.log —
    independent of both engines' SQL."""
    la, lb = math.log(0.22 / 0.18), math.log(0.78 / 0.82)

    def day_rows(day, n, x, eid0):
        t = dt.datetime(2024, 3, day, 10, 0)
        return [
            (
                eid0 + i,
                t + dt.timedelta(minutes=i),
                i,
                "purchase" if i < x else "view",
                0.0,
                "",
            )
            for i in range(n)
        ]

    # scenario 1: p̂ = 0.5 ≫ 0.22 — crosses the upper boundary day 2
    sf = _write_events(
        spark, tmp_path, day_rows(1, 20, 10, 0) + day_rows(2, 20, 10, 100), "up"
    )
    out = {str(r.day): r for r in Q["sprt_purchase_rate_events"](spark, sf).collect()}
    exp_day = 10 * la + 10 * lb
    assert abs(out["2024-03-01"].llr_day - exp_day) < 1e-5
    assert out["2024-03-01"].state == "continue"
    assert abs(out["2024-03-02"].cum_llr - 2 * exp_day) < 1e-5
    assert 2 * exp_day >= math.log(0.9 / 0.05)  # the hand check itself
    assert out["2024-03-02"].state == "accept_h1"

    # scenario 2: zero purchases — crosses the lower boundary day 2
    sf0 = _write_events(
        spark, tmp_path, day_rows(1, 30, 0, 0) + day_rows(2, 30, 0, 100), "dn"
    )
    out0 = {
        str(r.day): r for r in Q["sprt_purchase_rate_events"](spark, sf0).collect()
    }
    assert out0["2024-03-01"].state == "continue"
    assert 2 * 30 * lb <= math.log(0.1 / 0.95)
    assert out0["2024-03-02"].state == "accept_h0"


def test_mcnemar_continuity_correction_and_cells(spark, tmp_path):
    """The heuristic classifier's cells are hand-controlled through
    n_chars (truth y = n_chars ≥ 300, heuristic b = n_chars ≥ 280):
    docs in [280, 300) are exactly the b-wrong/y=0 docs.  The
    reported χ² must equal Edwards' continuity form
    (|b−c|−1)²/(b+c) of the REPORTED discordant cells — a dropped
    −1 or an unsquared numerator fails here regardless of what the
    hashed scorer decided."""
    rows = []
    for i, n_chars in enumerate(
        [100, 150, 200, 285, 290, 295, 310, 350, 400, 500]
    ):
        rows.append((i, "word " * 20, "en", "s1", n_chars))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = Q["mcnemar_paired_quality_docs"](spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 10
    # heuristic is right on 7 of 10 (wrong exactly on the 280–299 band)
    assert abs(r.acc_heuristic - 0.7) < 1e-9
    b, c = r.only_a_correct, r.only_b_correct
    exp = ((abs(b - c) - 1.0) ** 2 / (b + c)) if (b + c) > 0 else 0.0
    assert abs(r.mcnemar_chi2 - round(exp, 6)) < 1e-9


def test_cooks_distance_three_point_regression(spark, tmp_path):
    """OLS through (1,0), (2,0), (3,3): slope 1.5, intercept −2,
    residuals (0.5, −1, 0.5), s² = 1.5, leverages (5/6, 1/3, 5/6) →
    Cook's D = e²h/(2s²(1−h)²) = (2.5, 0.25, 2.5).  The endpoint
    days dominate despite the middle day having the LARGEST
    residual — the influence ≠ residual property the query exists
    for.  Wrong leverage or a dropped p=2 shifts all three."""
    rows = []
    for day, v in ((1, 0.0), (2, 0.0), (3, 3.0)):
        rows.append((day, dt.datetime(2024, 3, day, 12, 0), 1, "x", v, ""))
    sf = _write_events(spark, tmp_path, rows)
    out = Q["cooks_distance_daily_events"](spark, sf).collect()
    got = {str(r.day): r for r in out}
    assert len(got) == 3
    d1, d2, d3 = (got[f"2024-03-0{i}"] for i in (1, 2, 3))
    assert abs(d1.residual - 0.5) < 1e-9 and abs(d3.residual - 0.5) < 1e-9
    assert abs(d2.residual + 1.0) < 1e-9
    assert abs(d1.leverage - 5 / 6) < 1e-6 and abs(d2.leverage - 1 / 3) < 1e-6
    assert abs(d1.cooks_d - 2.5) < 1e-6
    assert abs(d2.cooks_d - 0.25) < 1e-6
    assert abs(d3.cooks_d - 2.5) < 1e-6
    # output order: cooks_d desc, day asc
    assert [str(r.day)[-2:] for r in out] == ["01", "03", "02"]


def test_cliffs_delta_enumerable_pairs(spark, tmp_path):
    """R = {1,2,2}, N = {2,3}: the 6 pairs split 0 greater / 4 less /
    2 ties, so δ = (0−4)/6 = −2/3 and U = 0 + 0.5·2 = 1.  |δ| ≥
    0.474 → 'large'.  A tie counted as a win (or U without the ½
    tie credit) breaks both literals."""
    rows = [("R", 1), ("R", 2), ("R", 2), ("N", 2), ("N", 3), ("A", 99)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = Q["cliffs_delta_quantity_returnflag"](spark, str(tmp_path)).collect()[0]
    assert r.n_r == 3 and r.n_n == 2  # the 'A' row is excluded
    assert abs(r.u_stat - 1.0) < 1e-9
    assert abs(r.cliffs_delta - (-2.0 / 3.0)) < 1e-6
    assert r.magnitude == "large"


def test_theil_decomposition_two_cohorts(spark, tmp_path):
    """Four users with totals (100, 100, 200, 400) cents in cohorts
    a = {100, 100}, b = {200, 400}: T_between = ¼ln½ + ¾ln(3/2) =
    0.130812, T_within = ¾(ln... ) = 0.042475 (cohort a contributes
    ZERO — equal incomes), and the decomposition identity lands on
    the directly-computed T = ln(2)/4 − ... = 0.173287 =
    (1/n)Σ(x/μ)ln(x/μ).  Expected values recomputed from Theil's
    definition with math.log in this test."""
    rows = [
        (1, dt.datetime(2024, 3, 1, 10, 0), 1, "a", 1.0, ""),
        (2, dt.datetime(2024, 3, 1, 10, 1), 2, "a", 1.0, ""),
        (3, dt.datetime(2024, 3, 1, 10, 2), 3, "b", 2.0, ""),
        (4, dt.datetime(2024, 3, 1, 10, 3), 4, "b", 4.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = Q["theil_inequality_users_events"](spark, sf).collect()[0]
    assert r.n_users == 4
    exp_between = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    # direct Theil T over x/μ = (0.5, 0.5, 1, 2)
    exp_total = sum(s * math.log(s) for s in (0.5, 0.5, 1.0, 2.0)) / 4.0
    exp_within = exp_total - exp_between
    assert abs(r.theil_between - exp_between) < 1e-6
    assert abs(r.theil_within - exp_within) < 1e-6
    assert abs(r.theil_total - exp_total) < 1e-6
    # the additive identity the Theil index is chosen for
    assert abs(r.theil_between + r.theil_within - r.theil_total) < 2e-6


def test_pq_subspace_errors_arrow_matches_expression_chains(spark):
    """VERDICT r9 #1: pq_distortion now projects per-subspace errors
    through the mapInArrow numpy kernel because the 1024-term literal
    chains blow janino's 64 KB codegen limit.  The kernel's contract
    is BIT-IDENTITY with the expression path (same left-to-right IEEE
    accumulation per codeword, min over exact doubles) — pinned here
    on a synthetic batch so the SQL oracle stays valid for the
    kernel."""
    import pyspark.sql.functions as F

    from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
        _subspace_distances,
        pq_codebooks,
        pq_subspace_errors_arrow,
    )

    cb = pq_codebooks(8, 2, 4, seed=11)  # dim 8, 2 subspaces, 4 codewords
    m, _, sub = cb.shape
    rows = [
        (int(i), [float(((i * 7 + j * 3) % 13) - 6) / 3.0 for j in range(8)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.e0, r.e1)
        for r in pq_subspace_errors_arrow(df, cb).collect()
    }
    expr = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    ).select(
        "vec_id",
        *[
            F.array_min(_subspace_distances(cb[s], s * sub)).alias(f"e{s}")
            for s in range(m)
        ],
    )
    want = {r.vec_id: (r.e0, r.e1) for r in expr.collect()}
    assert got == want  # exact float equality: bit-identity, not tolerance
