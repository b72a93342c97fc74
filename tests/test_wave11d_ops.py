"""Hand-computed semantic pins for the round-11 wave D.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests
prove the SEMANTICS on crafted inputs where the right answer is known
by hand or recomputed from the defining formula independently in the
test (Krippendorff's α from a generic coincidence-matrix
implementation, Gwet AC1/κ from the 2×2 closed forms, Bland–Altman
from direct moments, Fisher's g on a planted weekly cycle,
participation ratio from the covariance definition, biweight
midvariance from Lax's formula, Blomqvist β on a comonotone set, the
AD statistic from the classic sorted-order form)."""

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


def _kripp_alpha(units):
    """Generic binary-nominal Krippendorff over [(n0, n1), ...]."""
    units = [(n0, n1) for n0, n1 in units if n0 + n1 >= 2]
    ntot = sum(n0 + n1 for n0, n1 in units)
    c0 = sum(n0 for n0, _ in units)
    c1 = sum(n1 for _, n1 in units)
    o01 = sum(n0 * n1 / (n0 + n1 - 1) for n0, n1 in units)
    return 1.0 - (ntot - 1) * o01 / (c0 * c1)


def test_krippendorff_missing_rater_recompute(spark, tmp_path):
    """Three docs exercising full panels AND the sub-50-char
    missing-rater path; α recomputed by a generic coincidence-matrix
    implementation."""
    long_text = "word " * 39 + "the end"  # 41 words, contains ' the '
    rows = [
        # n_chars=250 -> r1=1; ' the ' -> r2=1; 41 words & >=50 -> r3=1
        (1, long_text, "en", "s", 250),
        # n_chars=30 -> m=2 (r3 missing); no ' the ' -> (r1=0, r2=0)
        (2, "short text only", "en", "s", 30),
        # n_chars=100 -> r1=0; ' the ' -> r2=1; 4 words -> r3=0
        (3, "only the four words", "en", "s", 100),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["krippendorff_alpha_quality_docs"](spark, sf).collect()[0]
    # per-doc (n0, n1): doc1 (0,3), doc2 (2,0), doc3 (2,1)
    want = _kripp_alpha([(0, 3), (2, 0), (2, 1)])
    assert r.n_units == 3 and r.n_ratings == 8
    assert abs(r.kripp_alpha - want) < 1e-6


def test_gwet_ac1_closed_form(spark, tmp_path):
    """4 docs: r1 = (1,1,0,0), r2 = (1,0,0,0) → pa = 3/4, p1 = 1/2,
    p2 = 1/4; AC1 and κ recomputed from their closed forms."""
    rows = [
        (1, "has the marker", "en", "s", 250),   # r1=1, r2=1
        (2, "no marker here", "en", "s", 250),   # r1=1, r2=0
        (3, "no marker text", "en", "s", 100),   # r1=0, r2=0
        (4, "plain words again", "en", "s", 100),  # r1=0, r2=0
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["gwet_ac1_quality_docs"](spark, sf).collect()[0]
    pa, p1, p2 = 3 / 4, 1 / 2, 1 / 4
    pbar = (p1 + p2) / 2
    ac1 = (pa - 2 * pbar * (1 - pbar)) / (1 - 2 * pbar * (1 - pbar))
    pek = p1 * p2 + (1 - p1) * (1 - p2)
    kappa = (pa - pek) / (1 - pek)
    assert r.n_docs == 4
    assert abs(r.p_agree - pa) < 1e-6
    assert abs(r.gwet_ac1 - ac1) < 1e-6
    assert abs(r.cohen_kappa - kappa) < 1e-6


def test_bland_altman_direct_moments(spark, tmp_path):
    """Known word counts vs chars/5: diffs recomputed directly."""
    texts = ["one two three", "a b", "w x y z", "single"]
    rows = [(i, t, "en", "s", 10 * (i + 1)) for i, t in enumerate(texts)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = Q["bland_altman_tokenizers_docs"](spark, sf).collect()[0]
    diffs = [
        len(t.split()) - 10 * (i + 1) / 5.0 for i, t in enumerate(texts)
    ]
    n = len(diffs)
    md = sum(diffs) / n
    sd = math.sqrt(sum((d - md) ** 2 for d in diffs) / (n - 1))
    lo, hi = md - 1.96 * sd, md + 1.96 * sd
    within = sum(1.0 for d in diffs if lo <= d <= hi) / n
    assert r.n_docs == n
    assert abs(r.mean_diff - md) < 1e-6
    assert abs(r.loa_lo - lo) < 1e-6
    assert abs(r.loa_hi - hi) < 1e-6
    assert abs(r.frac_within - within) < 1e-6


def test_fisher_g_planted_weekly_cycle(spark, tmp_path):
    """35 days of counts 10 + round(5·cos(2π·5t/35)) — a planted
    period-7 cycle → the winning Fourier index must be k = 5
    (period 35/5 = 7 days) with a dominant g."""
    n = 35
    rows, eid = [], 0
    for t in range(1, n + 1):
        y = 10 + round(5 * math.cos(2 * math.pi * 5 * t / n))
        day = dt.datetime(2024, 2, 1) + dt.timedelta(days=t - 1)
        for _ in range(y):
            eid += 1
            rows.append((eid, day, 1, "view", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["fisher_g_periodicity_events"](spark, sf).collect()[0]
    assert r.n_days == n and r.m_freqs == 17
    assert r.top_k == 5
    assert abs(r.top_period_days - 7.0) < 1e-6
    assert r.fisher_g > 0.5
    assert r.p_approx < 0.01


def test_participation_ratio_formula_recompute(spark, tmp_path):
    """4-dim literal vectors: PR = (tr C)²/‖C‖²_F recomputed from the
    centered covariance cells in pure python."""
    vecs = [
        [1.0, 0.0, 2.0, 1.0],
        [3.0, 1.0, 0.0, 4.0],
        [0.0, 2.0, 1.0, 1.0],
        [2.0, 5.0, 3.0, 0.0],
    ]
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    r = Q["participation_ratio_embeddings"](spark, sf).collect()[0]
    dim = 4
    n = len(vecs)
    mu = [sum(v[i] for v in vecs) / n for i in range(dim)]
    c = [[v[i] - mu[i] for i in range(dim)] for v in vecs]
    cell = [
        [sum(row[i] * row[j] for row in c) for j in range(dim)]
        for i in range(dim)
    ]
    tr = sum(cell[i][i] for i in range(dim))
    fro2 = sum(cell[i][j] ** 2 for i in range(dim) for j in range(dim))
    assert r.n_rows == n and r.dim == dim
    assert abs(r.participation_ratio - tr * tr / fro2) < 1e-6


def test_participation_ratio_isotropic_is_dim(spark, tmp_path):
    """Perfectly isotropic 2-of-4 one-hot design: equal variances,
    zero covariances in each 2-dim pair → PR = effective dim."""
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, -1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, -1.0],
    ]
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    r = Q["participation_ratio_embeddings"](spark, sf).collect()[0]
    assert abs(r.participation_ratio - 4.0) < 1e-6


def test_biweight_midvariance_lax_formula(spark, tmp_path):
    """Values (1,2,3,4,100): med = 3, MAD = 1; the 100 gets ZERO
    weight (|u| > 1) — bwmv recomputed from Lax's formula."""
    d = dt.datetime(2024, 1, 1)
    xs = [1.0, 2.0, 3.0, 4.0, 100.0]
    rows = [(i, 1, "O", x, d, "1-U") for i, x in enumerate(xs)]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    r = Q["biweight_midvariance_totalprice"](spark, sf).collect()[0]
    med, mad = 3.0, 1.0
    n = len(xs)
    num = den = 0.0
    used = 0
    for x in xs:
        u = (x - med) / (9 * mad)
        if abs(u) < 1:
            used += 1
            num += (x - med) ** 2 * (1 - u * u) ** 4
            den += (1 - u * u) * (1 - 5 * u * u)
    bw = math.sqrt(n * num) / abs(den)
    mu = sum(xs) / n
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / n)
    assert r.n_rows == 5 and r.n_used == used == 4
    assert abs(r.median - med) < 1e-6 and abs(r.mad - mad) < 1e-6
    assert abs(r.bw_scale - bw) < 1e-3
    assert abs(r.scale_ratio - bw / sd) < 1e-6


def test_blomqvist_comonotone_is_one(spark, tmp_path):
    """Strictly increasing pairs: every off-median point lands in a
    concordant quadrant → β = 1; the on-median point is excluded."""
    d = dt.datetime(2024, 1, 1)
    rows = [
        (i, i, 1, 1, float(i), float(10 * i), 0.0, 0.0, "N", "O", d)
        for i in range(1, 6)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    r = Q["blomqvist_beta_lineitem"](spark, sf).collect()[0]
    assert r.n_used == 4 and r.n_excluded == 1
    assert abs(r.blomqvist_beta - 1.0) < 1e-6


def test_ad_exponential_sorted_form_recompute(spark, tmp_path):
    """One user, gaps (1, 2, 4, 8, 1) seconds — A² recomputed from
    the classic sorted-order formula with F = Exp(mean)."""
    gaps = [1, 2, 4, 8, 1]
    rows, eid, t = [], 0, dt.datetime(2024, 1, 1)
    rows.append((0, t, 1, "view", 1.0, "{}"))
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        eid += 1
        rows.append((eid, t, 1, "view", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = Q["ad_exponential_interarrivals_events"](spark, sf).collect()[0]
    xs = sorted(gaps)
    n = len(xs)
    mean = sum(xs) / n
    s = 0.0
    for i in range(1, n + 1):
        fi = 1 - math.exp(-xs[i - 1] / mean)
        fr = 1 - math.exp(-xs[n - i] / mean)
        s += (2 * i - 1) * (math.log(fi) + math.log(1 - fr))
    a2 = -n - s / n
    assert r.n_intervals == n
    assert abs(r.mean_seconds - mean) < 1e-6
    assert abs(r.ad_stat - a2) < 1e-6
