"""Hand-computed semantic pins for the round-11 wave C.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand or recomputed from the defining formula independently in the
test (Fisher index on a two-part basket, SampEn by direct O(n²)
template matching, Breslow–Day via the quadratic MLE recomputed in
python, Kuiper on enumerable step CDFs, dCor = 1 on exact linear
dependence, l-diversity on enumerable groups, CKA = 1 on duplicated
feature blocks, self-BLEU on identical/disjoint docs, the van den
Broek score statistic from its closed form, Lorenz asymmetry on the
textbook 4-point case)."""

from __future__ import annotations

import datetime as dt
import hashlib
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


def test_fisher_index_two_part_basket(spark, tmp_path):
    """Base year 2023: part1 (p=10, q=2), part2 (p=5, q=4); 2024:
    part1 (p=20, q=1), part2 (p=5, q=8), plus an UNMATCHED part3 only
    in 2024 (must be excluded).  L = (20·2+5·4)/(10·2+5·4) = 1.5,
    P = (20·1+5·8)/(10·1+5·8) = 1.2, F = √1.8."""
    rows = [
        (1, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", dt.datetime(2023, 3, 1)),
        (2, 2, 1, 1, 4.0, 20.0, 0.0, 0.0, "N", "O", dt.datetime(2023, 3, 2)),
        (3, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 3, 1)),
        (4, 2, 1, 1, 8.0, 40.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 3, 2)),
        (5, 3, 1, 1, 5.0, 35.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 3, 3)),
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = Q["fisher_price_index_lineitem"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.yr == 2024 and r.n_parts == 2
    assert abs(r.laspeyres_matched - 1.5) < 1e-6
    assert abs(r.paasche - 1.2) < 1e-6
    assert abs(r.fisher - math.sqrt(1.8)) < 1e-6


def test_sample_entropy_direct_recompute(spark, tmp_path):
    """Daily counts = an alternating series with one burst; SampEn
    recomputed in-test by direct O(n²) template matching with the
    gate's exact m=2, r=0.2σ(population) contract."""
    series = [1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 5, 2]
    rows, eid = [], 0
    for i, y in enumerate(series):
        for _ in range(y):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 5, 1 + i), 1, "view", 1.0, "{}")
            )
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["sample_entropy_daily_events"](spark, sf).collect()[0]

    n = len(series)
    mu = sum(series) / n
    sd = math.sqrt(sum((y - mu) ** 2 for y in series) / n)
    tol = 0.2 * sd
    b_pairs = a_pairs = 0
    for i in range(n - 2):
        for j in range(i + 1, n - 2):
            if (
                abs(series[i] - series[j]) <= tol
                and abs(series[i + 1] - series[j + 1]) <= tol
            ):
                b_pairs += 1
                if abs(series[i + 2] - series[j + 2]) <= tol:
                    a_pairs += 1
    assert r.n_days == n
    assert r.b_pairs == b_pairs and r.a_pairs == a_pairs
    assert abs(r.sampen - (-math.log(a_pairs / b_pairs))) < 1e-6


def _bd_expected(strata):
    """Python recompute of the Breslow–Day/Tarone statistics."""
    psi = sum(a * d / (a + b + c + d) for a, b, c, d in strata) / sum(
        b * c / (a + b + c + d) for a, b, c, d in strata
    )
    bd = sdev = sv = 0.0
    for a, b, c, d in strata:
        n = a + b + c + d
        r1, r2, c1 = a + b, c + d, a + c
        if abs(psi - 1.0) < 1e-12:
            ea = r1 * c1 / n
        else:
            qa = psi - 1.0
            mb = psi * (r1 + c1) + n - r1 - c1
            qc = psi * r1 * c1
            disc = math.sqrt(mb * mb - 4 * qa * qc)
            x1, x2 = (mb - disc) / (2 * qa), (mb + disc) / (2 * qa)
            lo, hi = max(0.0, r1 + c1 - n), min(r1, c1)
            ea = x1 if lo < x1 < hi else x2
        v = 1.0 / (
            1.0 / ea + 1.0 / (r1 - ea) + 1.0 / (c1 - ea)
            + 1.0 / (r2 - c1 + ea)
        )
        bd += (a - ea) ** 2 / v
        sdev += a - ea
        sv += v
    return psi, bd, bd - sdev * sdev / sv


def _events_for_strata(strata):
    """One ISO week per stratum: a=weekend purchase, b=weekend other,
    c=weekday purchase, d=weekday other."""
    rows, eid = [], 0
    # 2024-01-01 is a Monday; Saturdays are 01-06, 01-13, ...
    for k, (a, b, c, d) in enumerate(strata):
        mon = dt.datetime(2024, 1, 1) + dt.timedelta(days=7 * k)
        sat = mon + dt.timedelta(days=5)
        for cnt, day, typ in [
            (a, sat, "purchase"),
            (b, sat, "view"),
            (c, mon, "purchase"),
            (d, mon, "view"),
        ]:
            for _ in range(cnt):
                eid += 1
                rows.append((eid, day, 1, typ, 1.0, "{}"))
    return rows


def test_breslow_day_homogeneous_strata_is_zero(spark, tmp_path):
    """Two strata with OR = 1 each → ψ = 1 (linear solver path),
    expected a-cells equal observed, BD = Tarone = 0."""
    strata = [(2, 3, 4, 6), (2, 3, 4, 6)]
    sf = _write(
        spark, tmp_path, "events", _events_for_strata(strata), EV_SCHEMA
    )
    r = Q["breslow_day_weekend_purchase_events"](spark, sf).collect()[0]
    assert r.n_strata == 2 and r.df == 1
    assert abs(r.or_mh - 1.0) < 1e-6
    assert abs(r.bd_chi2) < 1e-6 and abs(r.tarone_chi2) < 1e-6


def test_breslow_day_heterogeneous_recompute(spark, tmp_path):
    """Strata with opposite-direction ORs; BD/Tarone recomputed in
    python via the same quadratic MLE."""
    strata = [(2, 3, 4, 6), (8, 2, 2, 8)]
    sf = _write(
        spark, tmp_path, "events", _events_for_strata(strata), EV_SCHEMA
    )
    r = Q["breslow_day_weekend_purchase_events"](spark, sf).collect()[0]
    psi, bd, tarone = _bd_expected(strata)
    assert r.n_strata == 2
    assert abs(r.or_mh - psi) < 1e-6
    assert abs(r.bd_chi2 - bd) < 1e-6
    assert abs(r.tarone_chi2 - tarone) < 1e-6


def test_kuiper_enumerable_step_cdfs(spark, tmp_path):
    """Even keys all in bin 0; odd keys half bin 0, half bin 31.
    F_A = 1 from bin 0; F_B = 0.5 until bin 31 → D⁺ = 0.5, D⁻ = 0,
    V = 0.5."""
    rows = []
    for k in range(4):
        rows.append((2 * k, 1, "O", 100.0, dt.datetime(2024, 1, 1), "1-U"))
    for k in range(2):
        rows.append(
            (2 * k + 1, 1, "O", 100.0, dt.datetime(2024, 1, 1), "1-U")
        )
    for k in range(2, 4):
        rows.append(
            (2 * k + 1, 1, "O", 630000.0, dt.datetime(2024, 1, 1), "1-U")
        )
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["kuiper_drift_orders"](spark, sf).collect()[0]
    assert r.n_a == 4 and r.n_b == 4
    assert abs(r.d_plus - 0.5) < 1e-6
    assert abs(r.d_minus - 0.0) < 1e-6
    assert abs(r.kuiper_v - 0.5) < 1e-6


def test_distance_corr_linear_dependence_is_one(spark, tmp_path):
    """Daily value sum is EXACTLY proportional to the daily count
    (every event carries value 7.5), so the two distance matrices are
    proportional and dCor = 1."""
    rows, eid = [], 0
    for i in range(32):
        day = dt.datetime(2024, 3, 1) + dt.timedelta(days=i)
        for _ in range(1 + (i * 7) % 13):
            eid += 1
            rows.append((eid, day, 1, "view", 7.5, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = Q["distance_corr_daily_events"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.yr == 2024 and r.n_days >= 30
    assert abs(r.dcor - 1.0) < 1e-6


def test_l_diversity_enumerable_groups(spark, tmp_path):
    """Group (1-URGENT, Jan): statuses O,O,F → l=2, entropy-l =
    exp(H(2/3,1/3)); group (2-HIGH, Jan): O,O → l=1, entropy-l = 1."""
    d = dt.datetime(2024, 1, 5)
    rows = [
        (1, 1, "O", 10.0, d, "1-URGENT"),
        (2, 1, "O", 10.0, d, "1-URGENT"),
        (3, 1, "F", 10.0, d, "1-URGENT"),
        (4, 1, "O", 10.0, d, "2-HIGH"),
        (5, 1, "O", 10.0, d, "2-HIGH"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["l_diversity_report_orders"](spark, sf).collect()[0]
    assert r.n_groups == 2
    assert r.min_distinct_l == 1
    assert abs(r.min_entropy_l - 1.0) < 1e-6
    assert abs(r.frac_l_ge2 - 0.5) < 1e-6
    assert abs(r.frac_l_ge3 - 0.0) < 1e-6


def test_cka_duplicated_block_is_one(spark, tmp_path):
    """4-dim embeddings whose second half duplicates the first half:
    C_xy = C_xx = C_yy, so linear CKA = 1."""
    vecs = [[1.0, 0.0], [3.0, 1.0], [0.0, 2.0], [2.0, 5.0]]
    rows = [
        (i, [float(a), float(b), float(a), float(b)], 0)
        for i, (a, b) in enumerate(vecs)
    ]
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    r = Q["cka_linear_embeddings"](spark, sf).collect()[0]
    assert r.n_rows == 4
    assert abs(r.cka - 1.0) < 1e-6


def test_cka_formula_recompute(spark, tmp_path):
    """General 4-dim case recomputed from the block-Frobenius
    definition in pure python."""
    vecs = [
        [1.0, 0.0, 2.0, 1.0],
        [3.0, 1.0, 0.0, 4.0],
        [0.0, 2.0, 1.0, 1.0],
        [2.0, 5.0, 3.0, 0.0],
        [4.0, 1.0, 1.0, 2.0],
    ]
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    r = Q["cka_linear_embeddings"](spark, sf).collect()[0]
    n, dim = len(vecs), 4
    mu = [sum(v[i] for v in vecs) / n for i in range(dim)]
    c = [[v[i] - mu[i] for i in range(dim)] for v in vecs]
    cell = [
        [sum(row[i] * row[j] for row in c) for j in range(dim)]
        for i in range(dim)
    ]
    h = dim // 2
    sxy = sum(cell[i][j] ** 2 for i in range(h) for j in range(h, dim))
    sxx = sum(cell[i][j] ** 2 for i in range(h) for j in range(h))
    syy = sum(
        cell[i][j] ** 2 for i in range(h, dim) for j in range(h, dim)
    )
    assert abs(r.cka - sxy / math.sqrt(sxx * syy)) < 1e-6


def _sampled_ids(k, mod=17):
    """First k doc_ids passing the gate's md5 % 17 == 0 sampling coin."""
    out, i = [], 0
    while len(out) < k:
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % mod == 0:
            out.append(i)
        i += 1
    return out


def _unsampled_id():
    i = 0
    while int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 17 == 0:
        i += 1
    return i


def test_self_bleu_identical_and_disjoint_docs(spark, tmp_path):
    """Two identical sampled docs score self-BLEU 1 (every gram
    clipped by the other copy, BP = 1 at equal lengths); a third
    sampled doc with fully disjoint vocabulary scores 0; an UNSAMPLED
    doc must not affect the result."""
    ids = _sampled_ids(3)
    rows = [
        (ids[0], "alpha beta gamma", "en", "s1", 16),
        (ids[1], "alpha beta gamma", "en", "s1", 16),
        (ids[2], "delta epsilon zeta", "en", "s1", 18),
        (_unsampled_id(), "alpha beta gamma", "en", "s1", 16),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["self_bleu_sample_docs"](spark, sf).collect()[0]
    assert r.n_sampled == 3
    # identical pair: p1 = p2 = 1, bp = 1 -> bleu 1; disjoint doc: 0
    assert abs(r.mean_p1 - 2.0 / 3.0) < 1e-6
    assert abs(r.mean_p2 - 2.0 / 3.0) < 1e-6
    assert abs(r.mean_self_bleu2 - 2.0 / 3.0) < 1e-6


def test_zero_inflation_closed_form(spark, tmp_path):
    """(user, day) units with purchase counts y = (2, 0, 1):
    n = 3, n0 = 1, λ̂ = 1 — score statistic recomputed from the van
    den Broek closed form."""
    d = dt.datetime(2024, 6, 1)
    rows = [
        (1, d, 1, "purchase", 1.0, "{}"),
        (2, d, 1, "purchase", 1.0, "{}"),
        (3, d, 2, "view", 1.0, "{}"),
        (4, d, 3, "purchase", 1.0, "{}"),
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["zero_inflation_purchase_events"](spark, sf).collect()[0]
    n, n0, sy, syy = 3, 1, 3, 5
    lam = sy / n
    p0 = math.exp(-lam)
    s = (n0 - n * p0) ** 2 / (n * p0 * (1 - p0) - n * lam * p0 * p0)
    vmr = (syy - sy * sy / n) / sy
    assert r.n_units == n and r.n_zero == n0
    assert abs(r.lambda_hat - lam) < 1e-6
    assert abs(r.vmr - vmr) < 1e-6
    assert abs(r.zi_score_stat - s) < 1e-6


def test_lorenz_asymmetry_textbook_four_points(spark, tmp_path):
    """Customer totals (1, 2, 3, 10): μ = 4, m = 3, δ = 1/7,
    S = (3 + 1/7)/4 + (6 + 10/7)/16 = 1.25."""
    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 1.0, d, "1-U"),
        (2, 2, "O", 2.0, d, "1-U"),
        (3, 3, "O", 3.0, d, "1-U"),
        (4, 4, "O", 10.0, d, "1-U"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["lorenz_asymmetry_customers"](spark, sf).collect()[0]
    assert r.n_customers == 4 and r.n_below_mean == 3
    assert abs(r.lorenz_asymmetry - 1.25) < 1e-6


def test_err_degenerate_uniform_scores(spark, tmp_path):
    """All docs identical → every classifier score equals every
    threshold, so no score strictly exceeds any threshold: all grades
    0, ERR = 0."""
    rows = [
        (i, "spark stream window", "en", "s1", 19) for i in range(6)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["err_bm25_graded_docs"](spark, sf).collect()[0]
    assert r.n_at_20 == 6
    assert abs(r.err_at_20 - 0.0) < 1e-9
    assert abs(r.mean_grade_proxy - 0.0) < 1e-9


def test_err_bounds_on_mixed_corpus(spark, tmp_path):
    """Mixed corpus: ERR is in (0, 1] when grades vary and the
    cascade never exceeds the perfect-grade bound."""
    texts = [
        "spark stream window spark",
        "stream of words about nothing",
        "window shopping all day",
        "completely unrelated text here",
        "spark spark spark spark",
        "more filler text tokens",
        "another document body",
        "final entry in corpus",
    ]
    rows = [(i, t, "en", "s1", len(t)) for i, t in enumerate(texts)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["err_bm25_graded_docs"](spark, sf).collect()[0]
    assert r.n_at_20 == 8
    assert 0.0 <= r.err_at_20 <= 1.0
    assert 0.0 <= r.mean_grade_proxy <= 3.0
