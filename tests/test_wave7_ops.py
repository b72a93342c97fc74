"""Hand-computed semantic pins for the intricate round-7 queries.

The DuckDB oracle gate proves CROSS-ENGINE EQUALITY; these tests prove
the semantics themselves on crafted inputs where the right answer is
known by hand — midnight carry-over and half-open boundaries for the
concurrency sweep, the 100/50-50/40-20-40 credit rules for position
attribution, and the mandatory verify step of SymSpell candidate
generation.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from aws_glue_jobs_incremental_database_etl_spark.registry import Q

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_peak_concurrency_midnight_carry_and_half_open(spark, tmp_path):
    """A session spanning midnight counts toward BOTH days (clipped at
    the boundary), overlap at [00:10, 00:35) makes day-2 peak 2, and a
    session ending exactly when another starts (half-open) never
    counts as concurrent."""
    t = lambda d, h, m: dt.datetime(2024, 3, d, h, m)
    rows = [
        # user 1: one session 23:50 -> 00:05 (+30m TTL => ends 00:35)
        (1, t(1, 23, 50), 1, "view", 0.0, ""),
        (2, t(2, 0, 5), 1, "view", 0.0, ""),
        # user 2: [00:10, 00:40) on day 2
        (3, t(2, 0, 10), 2, "view", 0.0, ""),
        # user 3: [00:50, 01:20) — after user 1 and 2 released
        (4, t(2, 0, 50), 3, "view", 0.0, ""),
        # users 4/5: u4 ends exactly as u5 starts — NOT concurrent
        (5, t(2, 2, 0), 4, "view", 0.0, ""),
        (6, t(2, 2, 30), 5, "view", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        str(r.day): (r.n_sessions, r.peak_concurrent)
        for r in Q["peak_concurrency_events"](spark, sf).collect()
    }
    # day 1: only user 1's session, clipped [23:50, 24:00)
    assert out["2024-03-01"] == (1, 1)
    # day 2: u1 carry [00:00,00:35) + u2 [00:10,00:40) overlap -> 2;
    # u3 alone; u4/u5 back-to-back stay 1 each
    assert out["2024-03-02"] == (5, 2)


def test_position_attribution_credit_rules(spark, tmp_path):
    """n=1 -> 100%, n=2 -> 50/50, n>=3 -> 40/20/40; purchases with no
    prior touches credit nothing; a user's second purchase anchors its
    own segment."""
    t = lambda m: dt.datetime(2024, 3, 1, 10, m)
    rows = [
        # user 10, segment 1: view, click, view -> purchase 100
        (1, t(0), 10, "view", 0.0, ""),
        (2, t(1), 10, "click", 0.0, ""),
        (3, t(2), 10, "view", 0.0, ""),
        (4, t(3), 10, "purchase", 100.0, ""),
        # user 10, segment 2: click -> purchase 10
        (5, t(4), 10, "click", 0.0, ""),
        (6, t(5), 10, "purchase", 10.0, ""),
        # user 11: click -> purchase 50 (n=1 -> 100%)
        (7, t(0), 11, "click", 0.0, ""),
        (8, t(1), 11, "purchase", 50.0, ""),
        # user 12: view, click -> purchase 200 (n=2 -> 50/50)
        (9, t(0), 12, "view", 0.0, ""),
        (10, t(1), 12, "click", 0.0, ""),
        (11, t(2), 12, "purchase", 200.0, ""),
        # user 13: bare purchase, no touches -> no credit anywhere
        (12, t(0), 13, "purchase", 999.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: (r.n_touches, r.credited_value)
        for r in Q["position_attribution_events"](spark, sf).collect()
    }
    # view: 40+40 of 100 (u10 seg1) + 100 of 200 (u12) = 180
    assert out["view"] == (3, 180.0)
    # click: 20 of 100 (u10 seg1 middle) + 10 (u10 seg2, n=1)
    #        + 50 (u11, n=1) + 100 (u12, n=2) = 180
    assert out["click"] == (4, 180.0)
    assert set(out) == {"view", "click"}


def test_symspell_verify_rejects_distance_two(spark, tmp_path):
    """old/rod share the delete 'od' at DIFFERENT positions (true edit
    distance 2) — candidate generation surfaces the pair and the
    Levenshtein verify must kill it, while cold/old (deletion) and
    red/rod (substitution) survive."""
    rows = [(i, name) for i, name in enumerate(
        ["old part", "rod part", "cold part", "red part"] * 3
    )]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    out = [
        (r.tok_a, r.tok_b)
        for r in Q["symspell_variants_parts"](spark, str(tmp_path)).collect()
    ]
    assert ("old", "rod") not in out
    assert ("cold", "old") in out and ("red", "rod") in out
    # 'part' is within distance 1 of nothing here
    assert all("part" not in p for p in out)


def test_hill_tail_index_pareto_recovery(spark, tmp_path):
    """On an exact Pareto(alpha) sample the Hill estimator must
    recover alpha closely: x_i = xm * U_i^(-1/alpha) with U a
    deterministic uniform grid."""
    alpha = 2.5
    n = 5000
    rows = [
        (i, 100.0 * ((i + 0.5) / n) ** (-1.0 / alpha)) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = Q["hill_tail_index_orders"](spark, str(tmp_path)).collect()[0]
    assert r.k == 100
    assert abs(r.hill_alpha - alpha) / alpha < 0.15


def test_gumbel_return_level_orders_monotone(spark, tmp_path):
    """Return levels must increase with horizon and sit above the
    fitted location mu; beta > 0 for any non-constant maxima."""
    t = lambda d, h: dt.datetime(2024, 3, d, h, 0)
    rows = []
    eid = 0
    for d in range(1, 21):
        for h, v in ((1, 1.0), (2, 2.0 + (d % 5))):
            eid += 1
            rows.append((eid, t(d, h), d, "view", v, ""))
    sf = _write_events(spark, tmp_path, rows)
    r = Q["gumbel_tail_events"](spark, sf).collect()[0]
    assert r.n_days == 20 and r.beta > 0
    assert r.mu < r.return_30d < r.return_365d
