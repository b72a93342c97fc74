"""Round-11 extension wave (SURVEY.md §2.30): multi-year-safe trend
statistics (the VERDICT r10 #6 stratified variants of Theil–Sen and
Mann–Kendall), concordance / ordered-alternative rank tests (Kendall's
W, Page's L), Buishand range homogeneity, capture–recapture population
estimation, paired-categorical symmetry (Bowker), X̄–R control charts,
embedding hubness and Chebyshev-metric retrieval, rank-distance
(Spearman footrule) ranker comparison, and sequential trigram pattern
mining.

Every query follows the registry conventions (``._core``): identical
column aliases in the Spark plan and the DuckDB oracle, exact integer
arithmetic until the final division, ROUND(…, 6) on floating outputs,
deterministic tie-breaks on every rank/top-k boundary, and bounded
grids (days², |types|², sample²) — never corpus² — on the join side.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  resolves pandas_udf string annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from ._core import O, Q, query  # noqa: F401


# =====================================================================
# Theil–Sen slope, stratified by year (VERDICT r10 Next-round #6)
# =====================================================================

@query(
    "theil_sen_yearly_events",
    """
    WITH daily AS (
      SELECT event_type, year(CAST(ts AS DATE)) AS yr,
             CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2, 3
    ), num AS (
      SELECT event_type, yr, y,
             ROW_NUMBER() OVER (PARTITION BY event_type, yr
                                ORDER BY day) AS rn
      FROM daily
    ), yrs AS (
      SELECT event_type, COUNT(DISTINCT yr) AS n_years FROM num
      GROUP BY event_type
    ), slopes AS (
      SELECT a.event_type, a.yr,
             CAST(b.y - a.y AS DOUBLE) / (b.rn - a.rn) AS s,
             a.rn AS i, b.rn AS j
      FROM num a JOIN num b
        ON a.event_type = b.event_type AND a.yr = b.yr AND b.rn > a.rn
    ), ranked AS (
      SELECT event_type, s,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s, yr, i, j) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM slopes
    ), med AS (
      SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
             ROUND(MAX(CASE WHEN r = CAST(FLOOR((np + 1) / 2.0) AS BIGINT)
                            THEN s END), 6) AS sen_slope
      FROM ranked GROUP BY event_type
    )
    SELECT med.event_type, CAST(yrs.n_years AS BIGINT) AS n_years,
           med.n_pairs, med.sen_slope
    FROM med JOIN yrs ON med.event_type = yrs.event_type
    ORDER BY med.event_type
    """,
)
def theil_sen_yearly_q(spark, sf_dir):
    """Year-stratified Theil–Sen slope — the multi-year companion the
    unstratified gate's docstring promises (VERDICT r10 #6): day pairs
    are formed only WITHIN a calendar year, and the reported slope is
    the median over all within-year pairwise slopes (the seasonal
    Kendall slope estimator with years as seasons, Gilbert 1987).

    Scale contract: the unstratified gate's pair grid grows with the
    CALENDAR SPAN² — a generator artifact at sf10 (each replica is
    shifted +1000 days, so span grows with the factor and decade2 hit
    43×, SCALE.md).  Here every stratum is capped at ≤366 days →
    ≤366²/2 pairs per (type, year), so total pairs grow LINEARLY in
    the number of years regardless of span.  Lower median at rank
    ⌊(n+1)/2⌋ with a deterministic (s, yr, i, j) tie-break, as in the
    unstratified twin."""
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = e.groupBy(
        "event_type", F.year(day).alias("yr"), day.alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wd = Window.partitionBy("event_type", "yr").orderBy("day")
    num = daily.select(
        "event_type", "yr", "y", F.row_number().over(wd).alias("rn")
    )
    yrs = num.groupBy("event_type").agg(
        F.countDistinct("yr").cast("bigint").alias("n_years")
    )
    a, b = num.alias("a"), num.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.yr") == F.col("b.yr"))
        & (F.col("b.rn") > F.col("a.rn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.yr").alias("yr"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.rn") - F.col("a.rn"))
        ).alias("s"),
        F.col("a.rn").alias("i"),
        F.col("b.rn").alias("j"),
    )
    wr = Window.partitionBy("event_type").orderBy("s", "yr", "i", "j")
    wt = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "s",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wt).alias("np"),
    )
    mid = F.floor((F.col("np") + 1) / F.lit(2.0)).cast("bigint")
    med = ranked.groupBy("event_type").agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.round(F.max(F.when(F.col("r") == mid, F.col("s"))), 6).alias(
            "sen_slope"
        ),
    )
    return (
        med.join(F.broadcast(yrs), "event_type")
        .select("event_type", "n_years", "n_pairs", "sen_slope")
        .orderBy("event_type")
    )


# =====================================================================
# Mann–Kendall trend test, stratified by year
# =====================================================================

@query(
    "mann_kendall_yearly_events",
    """
    WITH daily AS (
      SELECT event_type, year(CAST(ts AS DATE)) AS yr,
             CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ), s AS (
      SELECT a.event_type,
             SUM(CASE WHEN b.c > a.c THEN 1
                      WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.yr = a.yr AND b.d > a.d
      GROUP BY a.event_type
    ), nn AS (
      SELECT event_type, yr, COUNT(*) AS n FROM daily
      GROUP BY event_type, yr
    ), ties AS (
      SELECT event_type, yr,
             SUM(CAST(t * (t - 1) AS BIGINT) * (2 * t + 5)) AS tie_term
      FROM (SELECT event_type, yr, c, COUNT(*) AS t
            FROM daily GROUP BY event_type, yr, c) g
      WHERE t > 1 GROUP BY event_type, yr
    ), v AS (
      SELECT nn.event_type,
             COUNT(*) AS n_years,
             SUM(CAST(nn.n AS BIGINT)) AS n_days,
             SUM(CAST(nn.n * (nn.n - 1) AS BIGINT) * (2 * nn.n + 5)
                 - COALESCE(ties.tie_term, 0)) / 18.0 AS var_s
      FROM nn LEFT JOIN ties
        ON nn.event_type = ties.event_type AND nn.yr = ties.yr
      GROUP BY nn.event_type
    )
    SELECT v.event_type, CAST(v.n_years AS BIGINT) AS n_years,
           CAST(v.n_days AS BIGINT) AS n_days,
           CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
           ROUND(CASE WHEN COALESCE(s.s_stat, 0) > 0
                      THEN (s.s_stat - 1) / sqrt(v.var_s)
                      WHEN COALESCE(s.s_stat, 0) < 0
                      THEN (s.s_stat + 1) / sqrt(v.var_s)
                      ELSE 0.0 END, 6) AS z
    FROM v LEFT JOIN s ON v.event_type = s.event_type
    ORDER BY v.event_type
    """,
)
def mann_kendall_yearly_q(spark, sf_dir):
    """Year-stratified Mann–Kendall test — the seasonal-MK
    construction (Hirsch & Slack 1984) with calendar years as the
    seasons: S and the tie-corrected variance are computed per
    (event_type, year) on within-year day pairs only, then SUMMED
    across years before the continuity-corrected z.  Same bounded-grid
    rationale as theil_sen_yearly_events: the pair join is capped at
    ≤366²/2 per stratum, so cost grows linearly with the number of
    years — immune to the span-growing sf10 composition that blows the
    unstratified gate's day-pair grid up quadratically (VERDICT r10
    #6; the variance-sum requires only within-stratum independence, so
    the statistic stays valid when strata span different regimes)."""
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = e.groupBy(
        "event_type", F.year(day).alias("yr"), day.alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.yr") == F.col("a.yr"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type", "yr").agg(
        F.count(F.lit(1)).alias("n")
    )
    ties = (
        daily.groupBy("event_type", "yr", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type", "yr")
        .agg(
            F.sum(
                (F.col("t") * (F.col("t") - 1)).cast("bigint")
                * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    v = (
        nn.join(ties, ["event_type", "yr"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_years"),
            F.sum(F.col("n").cast("bigint")).cast("bigint").alias("n_days"),
            (
                F.sum(
                    (F.col("n") * (F.col("n") - 1)).cast("bigint")
                    * (2 * F.col("n") + 5)
                    - F.coalesce(F.col("tie_term"), F.lit(0))
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    j = v.join(s, "event_type", "left")
    s0 = F.coalesce(F.col("s_stat"), F.lit(0))
    return j.select(
        "event_type",
        "n_years",
        "n_days",
        s0.cast("bigint").alias("s_stat"),
        F.round(
            F.when(s0 > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")))
            .when(s0 < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
            .otherwise(0.0),
            6,
        ).alias("z"),
    ).orderBy("event_type")


# =====================================================================
# Kendall's W — concordance of day-of-week activity rankings
# =====================================================================

@query(
    "kendall_w_dow_events",
    """
    WITH dows AS (
      SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS dow
    ), cnt AS (
      SELECT event_type, isodow(CAST(ts AS DATE)) AS dow, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, dows.dow, COALESCE(cnt.c, 0) AS c
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN dows
      LEFT JOIN cnt ON cnt.event_type = t.event_type
                   AND cnt.dow = dows.dow
    ), rk AS (
      SELECT event_type, dow,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY c, dow) AS r
      FROM grid
    ), rj AS (
      SELECT dow, SUM(r) AS rsum, COUNT(*) AS m FROM rk GROUP BY dow
    ), dev AS (
      SELECT SUM(CAST((2 * rsum - m * 8) * (2 * rsum - m * 8) AS BIGINT))
               AS s4,
             MAX(m) AS m
      FROM rj
    )
    SELECT CAST(m AS BIGINT) AS m_types,
           CAST(7 AS BIGINT) AS n_objects,
           CAST(s4 AS BIGINT) AS s_dev4,
           ROUND(CAST(3 * s4 AS DOUBLE) / (m * m * 336), 6) AS w,
           ROUND(CAST(3 * s4 AS DOUBLE) / (m * 56), 6) AS chi2
    FROM dev
    """,
)
def kendall_w_q(spark, sf_dir):
    """Kendall's coefficient of concordance W across event types'
    day-of-week activity rankings — "do all event streams agree on
    which weekdays are busy?" (W = 1 perfect agreement, 0 none), with
    the large-sample χ²_r = m(n−1)W companion.  Judges = event types
    (m), objects = the 7 ISO weekdays, score = exact event count on a
    DENSIFIED type×dow grid (a missing cell ranks as 0, so every
    judge ranks all 7 objects).  Ranks are deterministic row_numbers
    with a (count, dow) tie-break — identical in both engines, so W
    needs no average-rank tie machinery.  All deviations stay exact
    integers via 4·Σ(R_j − m(n+1)/2)² = Σ(2R_j − 8m)² (n = 7), hence
    W = 12S/(m²(n³−n)) = 3·S4/(336m²).  The whole computation lives
    on a ≤|types|×7 grid after one map-side count."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        "event_type",
        (F.weekday(F.to_date("ts")) + 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    types = e.select("event_type").distinct()
    dows = spark.range(1, 8).select(F.col("id").cast("int").alias("dow"))
    grid = (
        types.crossJoin(F.broadcast(dows))
        .join(cnt, ["event_type", "dow"], "left")
        .select(
            "event_type", "dow", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    wr = Window.partitionBy("event_type").orderBy("c", "dow")
    rk = grid.select(
        "event_type", "dow", F.row_number().over(wr).alias("r")
    )
    rj = rk.groupBy("dow").agg(
        F.sum("r").alias("rsum"), F.count(F.lit(1)).alias("m")
    )
    dev = rj.agg(
        F.sum(
            (
                (2 * F.col("rsum") - F.col("m") * 8)
                * (2 * F.col("rsum") - F.col("m") * 8)
            ).cast("bigint")
        ).alias("s4"),
        F.max("m").alias("m"),
    )
    return dev.select(
        F.col("m").cast("bigint").alias("m_types"),
        F.lit(7).cast("bigint").alias("n_objects"),
        F.col("s4").cast("bigint").alias("s_dev4"),
        F.round(
            (3 * F.col("s4")).cast("double")
            / (F.col("m") * F.col("m") * 336),
            6,
        ).alias("w"),
        F.round(
            (3 * F.col("s4")).cast("double") / (F.col("m") * 56), 6
        ).alias("chi2"),
    )


# =====================================================================
# Page's L — ordered-alternative trend across the week
# =====================================================================

@query(
    "pages_l_trend_dow_events",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             isodow(CAST(ts AS DATE)) AS dow, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), full_wk AS (
      SELECT wk FROM daily GROUP BY wk HAVING COUNT(*) = 7
    ), rk AS (
      SELECT d.wk, d.dow,
             ROW_NUMBER() OVER (PARTITION BY d.wk
                                ORDER BY d.c, d.dow) AS r
      FROM daily d JOIN full_wk USING (wk)
    ), l AS (
      SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS b,
             CAST(SUM(CAST(dow * r AS BIGINT)) AS BIGINT) AS l_stat
      FROM rk
    )
    SELECT b AS n_blocks, l_stat,
           ROUND((l_stat - 112.0 * b)
                 / sqrt(392.0 * b / 3.0), 6) AS z
    FROM l WHERE b > 0
    """,
)
def pages_l_q(spark, sf_dir):
    """Page's L test for an ORDERED alternative across the week — "does
    activity increase monotonically from Monday to Sunday?", strictly
    sharper than Friedman when the alternative is ordered (Page 1963).
    Blocks = complete ISO weeks (all 7 days observed; date_trunc-week
    keys, Monday-start in both engines), treatments = isodow 1..7 in
    hypothesis order, within-block ranks are deterministic (count, dow)
    row_numbers.  L = Σ_blocks Σ_j j·r_j; with n = 7 treatments the
    null moments reduce exactly to E[L] = 112b and Var[L] = 392b/3,
    so z = (L − 112b)/√(392b/3).  Cost: one day-grid aggregate, ranks
    on ≤7-row partitions — linear in days at any scale."""
    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    daily = e.groupBy(
        F.date_trunc("week", d).cast("date").alias("wk"),
        (F.weekday(d) + 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    full_wk = (
        daily.groupBy("wk")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") == 7)
        .select("wk")
    )
    wr = Window.partitionBy("wk").orderBy("c", "dow")
    rk = daily.join(full_wk, "wk").select(
        "wk", "dow", F.row_number().over(wr).alias("r")
    )
    l = rk.agg(
        F.countDistinct("wk").cast("bigint").alias("b"),
        F.sum((F.col("dow") * F.col("r")).cast("bigint"))
        .cast("bigint")
        .alias("l_stat"),
    )
    return l.filter(F.col("b") > 0).select(
        F.col("b").alias("n_blocks"),
        "l_stat",
        F.round(
            (F.col("l_stat") - 112.0 * F.col("b"))
            / F.sqrt(392.0 * F.col("b") / 3.0),
            6,
        ).alias("z"),
    )


# =====================================================================
# Buishand range test — homogeneity of the daily series
# =====================================================================

@query(
    "buishand_range_daily_events",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ), st AS (
      SELECT COUNT(*) AS n, AVG(CAST(y AS DOUBLE)) AS ybar,
             sqrt(SUM(CAST(y AS DOUBLE) * y) / COUNT(*)
                  - AVG(CAST(y AS DOUBLE)) * AVG(CAST(y AS DOUBLE)))
               AS sd
      FROM daily
    ), cum AS (
      SELECT SUM(CAST(d.y AS DOUBLE) - st.ybar)
               OVER (ORDER BY d.day) AS sk
      FROM daily d CROSS JOIN st
    )
    SELECT CAST(st.n AS BIGINT) AS n_days,
           ROUND((MAX(cum.sk) - MIN(cum.sk))
                 / (st.sd * sqrt(CAST(st.n AS DOUBLE))), 6)
             AS r_rescaled,
           ROUND(GREATEST(MAX(ABS(cum.sk)), 0.0)
                 / (st.sd * sqrt(CAST(st.n AS DOUBLE))), 6)
             AS q_rescaled
    FROM cum CROSS JOIN st
    GROUP BY st.n, st.sd
    """,
)
def buishand_q(spark, sf_dir):
    """Buishand range test for homogeneity of the daily event series
    (Buishand 1982): partial sums S_k = Σ_{i≤k}(y_i − ȳ) of the
    mean-centered daily counts, rescaled range R/σ√n (and the one-
    sided Q = max|S_k|/σ√n) — the classical break-detection companion
    to the Pettitt gate (Pettitt locates the break; Buishand's R is
    the calibrated table statistic for "is the series homogeneous at
    all").  σ is the population standard deviation, computed from
    exact integer Σy and Σy² moments.  The cumulative window runs
    unpartitioned over the DAY grid — bounded by the calendar, never
    by event volume (the pettitt/dickey_fuller audited shape)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("y").cast("double")).alias("ybar"),
        F.sqrt(
            F.sum(F.col("y").cast("double") * F.col("y")) / F.count(F.lit(1))
            - F.avg(F.col("y").cast("double"))
            * F.avg(F.col("y").cast("double"))
        ).alias("sd"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        daily.crossJoin(F.broadcast(st))
        .select(
            (F.sum(F.col("y").cast("double") - F.col("ybar")).over(wcum)).alias(
                "sk"
            ),
            "n",
            "sd",
        )
    )
    return cum.groupBy("n", "sd").agg(
        F.max("sk").alias("mx"),
        F.min("sk").alias("mn"),
        F.max(F.abs(F.col("sk"))).alias("mxa"),
    ).select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("mx") - F.col("mn"))
            / (F.col("sd") * F.sqrt(F.col("n").cast("double"))),
            6,
        ).alias("r_rescaled"),
        F.round(
            F.greatest(F.col("mxa"), F.lit(0.0))
            / (F.col("sd") * F.sqrt(F.col("n").cast("double"))),
            6,
        ).alias("q_rescaled"),
    )


# =====================================================================
# Chapman capture–recapture population estimate
# =====================================================================

@query(
    "chapman_population_users_events",
    """
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS mind, MAX(CAST(ts AS DATE)) AS maxd
      FROM events
    ), marked AS (
      SELECT DISTINCT user_id FROM events CROSS JOIN bounds
      WHERE CAST(ts AS DATE) <= mind
            + CAST(FLOOR(datediff('day', mind, maxd) / 2.0) AS INTEGER)
    ), recap AS (
      SELECT DISTINCT user_id FROM events CROSS JOIN bounds
      WHERE CAST(ts AS DATE) > mind
            + CAST(FLOOR(datediff('day', mind, maxd) / 2.0) AS INTEGER)
    ), counts AS (
      SELECT (SELECT COUNT(*) FROM marked) AS n1,
             (SELECT COUNT(*) FROM recap) AS n2,
             (SELECT COUNT(*) FROM marked JOIN recap USING (user_id))
               AS m
    )
    SELECT CAST(n1 AS BIGINT) AS n_capture1,
           CAST(n2 AS BIGINT) AS n_capture2,
           CAST(m AS BIGINT) AS n_recaptured,
           ROUND(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 6)
             AS chapman_estimate,
           ROUND(CASE WHEN m > 0
                      THEN CAST(n1 AS DOUBLE) * n2 / m END, 6)
             AS lincoln_petersen
    FROM counts
    """,
)
def chapman_population_q(spark, sf_dir):
    """Chapman capture–recapture estimate of the total user population
    from two observation windows — the mark-recapture estimator
    (Chapman 1951) applied to activity logs: users seen in the first
    half of the span are the "marked" sample (n₁), users in the second
    half the recapture sample (n₂), and the overlap m calibrates how
    much of the population each window sees.  N̂ = (n₁+1)(n₂+1)/(m+1)−1
    is the bias-corrected estimator (finite even at m = 0, unlike the
    classic Lincoln–Petersen n₁n₂/m, emitted alongside but NULL-guarded
    — both engines return NULL at m = 0 rather than tripping ANSI
    division).  The same estimator sizes how many NEAR-DUPLICATE pairs
    two independent dedup passes are jointly missing.  Cost: two
    distinct-aggregates and one key join on user_id — linear, no
    grids."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.to_date("ts")).alias("mind"),
        F.max(F.to_date("ts")).alias("maxd"),
    )
    d = e.crossJoin(F.broadcast(b)).select(
        "user_id",
        (
            F.to_date("ts")
            <= F.date_add(
                "mind",
                F.floor(F.datediff("maxd", "mind") / 2.0).cast("int"),
            )
        ).alias("first_half"),
    )
    per_user = d.groupBy("user_id").agg(
        F.max(F.col("first_half").cast("int")).alias("in1"),
        F.max((~F.col("first_half")).cast("int")).alias("in2"),
    )
    out = per_user.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m"),
    )
    return out.select(
        F.col("n1").alias("n_capture1"),
        F.col("n2").alias("n_capture2"),
        F.col("m").alias("n_recaptured"),
        F.round(
            (F.col("n1") + 1).cast("double")
            * (F.col("n2") + 1)
            / (F.col("m") + 1)
            - 1,
            6,
        ).alias("chapman_estimate"),
        F.round(
            F.when(
                F.col("m") > 0,
                F.col("n1").cast("double") * F.col("n2") / F.col("m"),
            ),
            6,
        ).alias("lincoln_petersen"),
    )


# =====================================================================
# Bowker symmetry test on priority transitions
# =====================================================================

@query(
    "bowker_symmetry_priority_orders",
    """
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS mind,
             MAX(CAST(o_orderdate AS DATE)) AS maxd
      FROM orders
    ), tagged AS (
      SELECT o_custkey, o_orderpriority,
             CASE WHEN CAST(o_orderdate AS DATE) <= mind
                       + CAST(FLOOR(datediff('day', mind, maxd) / 2.0)
                              AS INTEGER)
                  THEN 0 ELSE 1 END AS half
      FROM orders CROSS JOIN bounds
    ), modal AS (
      SELECT o_custkey, half, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_custkey, half
                                ORDER BY COUNT(*) DESC,
                                         o_orderpriority) AS rk
      FROM tagged GROUP BY o_custkey, half, o_orderpriority
    ), pairs AS (
      SELECT a.o_custkey, a.o_orderpriority AS p1,
             b.o_orderpriority AS p2
      FROM modal a JOIN modal b
        ON a.o_custkey = b.o_custkey AND a.half = 0 AND b.half = 1
       AND a.rk = 1 AND b.rk = 1
    ), cells AS (
      SELECT p1, p2, COUNT(*) AS n FROM pairs GROUP BY p1, p2
    ), prios AS (
      SELECT DISTINCT o_orderpriority AS p FROM orders
    ), grid AS (
      SELECT i.p AS p1, j.p AS p2,
             COALESCE(cij.n, 0) AS nij, COALESCE(cji.n, 0) AS nji
      FROM prios i JOIN prios j ON i.p < j.p
      LEFT JOIN cells cij ON cij.p1 = i.p AND cij.p2 = j.p
      LEFT JOIN cells cji ON cji.p1 = j.p AND cji.p2 = i.p
    )
    SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS df,
           ROUND(SUM(CASE WHEN nij + nji > 0
                          THEN CAST((nij - nji) * (nij - nji) AS DOUBLE)
                               / (nij + nji)
                          ELSE 0.0 END), 6) AS chi2
    FROM grid
    """,
)
def bowker_symmetry_q(spark, sf_dir):
    """Bowker's test of symmetry on paired categorical outcomes — does
    a customer's dominant order priority DRIFT in a preferred direction
    between the first and second half of the observation span, or are
    i→j and j→i transitions balanced?  (Bowker 1948; the k×k
    generalization of McNemar.)  Each customer active in both halves
    contributes one (p₁, p₂) transition, where pₕ is the modal priority
    of that half with a deterministic (count DESC, priority ASC)
    tie-break.  χ² = Σ_{i<j}(n_ij−n_ji)²/(n_ij+n_ji) over the densified
    5×5 priority grid (zero-sum pairs contribute nothing and are
    excluded from df).  Everything after the per-customer modal
    aggregation lives on a ≤25-row grid."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.to_date("o_orderdate")).alias("mind"),
        F.max(F.to_date("o_orderdate")).alias("maxd"),
    )
    tagged = o.crossJoin(F.broadcast(b)).select(
        "o_custkey",
        "o_orderpriority",
        F.when(
            F.to_date("o_orderdate")
            <= F.date_add(
                "mind",
                F.floor(F.datediff("maxd", "mind") / 2.0).cast("int"),
            ),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    wm = Window.partitionBy("o_custkey", "half").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    modal = (
        tagged.groupBy("o_custkey", "half", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "o_custkey",
            "half",
            "o_orderpriority",
            F.row_number().over(wm).alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    a, c = modal.alias("a"), modal.alias("b")
    pairs = a.join(
        c,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.half") == 0)
        & (F.col("b.half") == 1),
    ).select(
        F.col("a.o_orderpriority").alias("p1"),
        F.col("b.o_orderpriority").alias("p2"),
    )
    cells = pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n"))
    nc = cells.agg(
        F.sum("n").cast("bigint").alias("n_customers")
    )
    prios = o.select(
        F.col("o_orderpriority").alias("p")
    ).distinct()
    i, j = prios.alias("i"), prios.alias("j")
    grid = (
        i.join(j, F.col("i.p") < F.col("j.p"))
        .select(F.col("i.p").alias("gp1"), F.col("j.p").alias("gp2"))
        .join(
            F.broadcast(
                cells.select(
                    F.col("p1").alias("gp1"),
                    F.col("p2").alias("gp2"),
                    F.col("n").alias("nij"),
                )
            ),
            ["gp1", "gp2"],
            "left",
        )
        .join(
            F.broadcast(
                cells.select(
                    F.col("p2").alias("gp1"),
                    F.col("p1").alias("gp2"),
                    F.col("n").alias("nji"),
                )
            ),
            ["gp1", "gp2"],
            "left",
        )
        .select(
            F.coalesce("nij", F.lit(0)).alias("nij"),
            F.coalesce("nji", F.lit(0)).alias("nji"),
        )
    )
    tot = F.col("nij") + F.col("nji")
    stats = grid.agg(
        F.sum(F.when(tot > 0, 1).otherwise(0)).cast("bigint").alias("df"),
        F.round(
            F.sum(
                F.when(
                    tot > 0,
                    (
                        (F.col("nij") - F.col("nji"))
                        * (F.col("nij") - F.col("nji"))
                    ).cast("double")
                    / tot,
                ).otherwise(0.0)
            ),
            6,
        ).alias("chi2"),
    )
    return nc.crossJoin(F.broadcast(stats)).select(
        "n_customers", "df", "chi2"
    )


# =====================================================================
# Shewhart X̄–R control chart over weekly subgroups
# =====================================================================

@query(
    "shewhart_xbar_r_weekly_events",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), sub AS (
      SELECT wk, AVG(CAST(c AS DOUBLE)) AS xbar,
             CAST(MAX(c) - MIN(c) AS DOUBLE) AS r
      FROM daily GROUP BY wk HAVING COUNT(*) = 7
    ), cl AS (
      SELECT AVG(xbar) AS xbarbar, AVG(r) AS rbar, COUNT(*) AS k
      FROM sub
    )
    SELECT CAST(cl.k AS BIGINT) AS n_subgroups,
           ROUND(cl.xbarbar, 6) AS xbarbar,
           ROUND(cl.rbar, 6) AS rbar,
           CAST(SUM(CASE WHEN sub.xbar > cl.xbarbar + 0.419 * cl.rbar
                           OR sub.xbar < cl.xbarbar - 0.419 * cl.rbar
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_xbar,
           CAST(SUM(CASE WHEN sub.r > 1.924 * cl.rbar
                           OR sub.r < 0.076 * cl.rbar
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_r
    FROM sub CROSS JOIN cl
    GROUP BY cl.k, cl.xbarbar, cl.rbar
    """,
)
def shewhart_q(spark, sf_dir):
    """Shewhart X̄–R control chart over weekly subgroups of the daily
    event count — the classical SPC pair the streaming monitors
    (EWMA, CUSUM, Page–Hinkley — all gated) descend from: subgroups
    are complete ISO weeks (n = 7 days), the X̄ chart flags weeks whose
    mean drifts beyond X̿ ± A₂R̄ and the R chart flags dispersion
    breaks outside [D₃R̄, D₄R̄], with the standard n = 7 constants
    A₂ = 0.419, D₃ = 0.076, D₄ = 1.924 (ASTM factor tables).  Output
    is the chart geometry plus the out-of-control counts, not the
    per-week verdicts — the bounded summary a 100 TB monitoring job
    would emit.  Cost: one day-grid aggregate and a ≤weeks-row fold."""
    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    daily = e.groupBy(
        F.date_trunc("week", d).cast("date").alias("wk"),
        d.alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    sub = (
        daily.groupBy("wk")
        .agg(
            F.avg(F.col("c").cast("double")).alias("xbar"),
            (F.max("c") - F.min("c")).cast("double").alias("r"),
            F.count(F.lit(1)).alias("nd"),
        )
        .filter(F.col("nd") == 7)
        .drop("nd")
    )
    cl = sub.agg(
        F.avg("xbar").alias("xbarbar"),
        F.avg("r").alias("rbar"),
        F.count(F.lit(1)).alias("k"),
    )
    j = sub.crossJoin(F.broadcast(cl))
    out_x = F.when(
        (F.col("xbar") > F.col("xbarbar") + 0.419 * F.col("rbar"))
        | (F.col("xbar") < F.col("xbarbar") - 0.419 * F.col("rbar")),
        1,
    ).otherwise(0)
    out_r = F.when(
        (F.col("r") > 1.924 * F.col("rbar"))
        | (F.col("r") < 0.076 * F.col("rbar")),
        1,
    ).otherwise(0)
    return j.groupBy("k", "xbarbar", "rbar").agg(
        F.sum(out_x).cast("bigint").alias("n_out_xbar"),
        F.sum(out_r).cast("bigint").alias("n_out_r"),
    ).select(
        F.col("k").cast("bigint").alias("n_subgroups"),
        F.round("xbarbar", 6).alias("xbarbar"),
        F.round("rbar", 6).alias("rbar"),
        "n_out_xbar",
        "n_out_r",
    )


# =====================================================================
# Hubness of the embedding space (k-occurrence skewness)
# =====================================================================

@query(
    "hubness_skew_embeddings",
    """
    WITH probes AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT 128
    ), x AS (
      SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
      FROM probes CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
    ), nrm AS (
      SELECT vec_id, SQRT(SUM(v * v)) AS nv FROM x GROUP BY vec_id
    ), u AS (
      SELECT x.vec_id, x.i,
             CASE WHEN nrm.nv > 0 THEN x.v / nrm.nv ELSE 0.0 END AS v
      FROM x JOIN nrm USING (vec_id)
    ), cos AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.v * b.v) AS c
      FROM u a JOIN u b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), knn AS (
      SELECT ia, ib,
             ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c DESC, ib)
               AS rk
      FROM cos
    ), occ AS (
      SELECT p.vec_id, COUNT(k.ib) AS o
      FROM probes p LEFT JOIN (SELECT ib FROM knn WHERE rk <= 5) k
        ON k.ib = p.vec_id
      GROUP BY p.vec_id
    ), mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST((o - 5) * (o - 5) AS BIGINT)) AS m2s,
             SUM(CAST((o - 5) * (o - 5) * (o - 5) AS BIGINT)) AS m3s,
             MAX(o) AS mx
      FROM occ
    )
    SELECT CAST(n AS BIGINT) AS n_sample,
           CAST(5 AS BIGINT) AS k,
           CAST(mx AS BIGINT) AS max_occurrence,
           ROUND(CASE WHEN m2s > 0
                      THEN (CAST(m3s AS DOUBLE) / n)
                           / POW(CAST(m2s AS DOUBLE) / n, 1.5) END, 6)
             AS occurrence_skewness
    FROM mom
    """,
)
def hubness_q(spark, sf_dir):
    """Hubness of the embedding space — the skewness of the
    k-occurrence distribution N_k(x) = "how many points count x among
    their k nearest neighbors" (Radovanović et al., JMLR 2010): in
    high-dimensional spaces a few points become HUBS that appear in
    everyone's neighbor lists, silently biasing kNN dedup
    (SemDeDup-style) and retrieval toward them; skewness > ~1 is the
    standard alarm.  Measured exactly on the 128 smallest-id probe
    vectors (the deterministic-probe convention): cosine kNN (k = 5,
    ties broken by vec_id) within the sample, occurrence counts
    densified to 0 for never-chosen points, and population moment
    skewness m₃/m₂^1.5 from exact integer deviations (mean occurrence
    is exactly k because every probe emits exactly k votes).  The
    128² pair grid is sample-bounded — constant cost at any corpus
    size."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.orderBy("vec_id").limit(128).select("vec_id", "embedding")
    x = probes.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("i", "v"),
    )
    nrm = x.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv")
    )
    u = x.join(F.broadcast(nrm), "vec_id").select(
        "vec_id",
        "i",
        F.when(F.col("nv") > 0, F.col("v") / F.col("nv"))
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    a, b = u.alias("a"), u.alias("b")
    cos = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
        )
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("c"))
    )
    wk = Window.partitionBy("ia").orderBy(F.col("c").desc(), "ib")
    knn = cos.select(
        "ib", F.row_number().over(wk).alias("rk")
    ).filter(F.col("rk") <= 5)
    occ = (
        probes.select("vec_id")
        .join(
            knn.withColumnRenamed("ib", "vec_id"), "vec_id", "left"
        )
        .groupBy("vec_id")
        .agg(F.count("rk").alias("o"))
    )
    dev = F.col("o") - 5
    mom = occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((dev * dev).cast("bigint")).alias("m2s"),
        F.sum((dev * dev * dev).cast("bigint")).alias("m3s"),
        F.max("o").alias("mx"),
    )
    return mom.select(
        F.col("n").alias("n_sample"),
        F.lit(5).cast("bigint").alias("k"),
        F.col("mx").cast("bigint").alias("max_occurrence"),
        F.round(
            F.when(
                F.col("m2s") > 0,
                (F.col("m3s").cast("double") / F.col("n"))
                / F.pow(F.col("m2s").cast("double") / F.col("n"), 1.5),
            ),
            6,
        ).alias("occurrence_skewness"),
    )


# =====================================================================
# Chebyshev-metric (L∞) top-k retrieval
# =====================================================================

@query(
    "chebyshev_topk_embeddings",
    """
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
      ORDER BY vec_id LIMIT 4
    ), dist AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             MAX(ABS(CAST(p.pe[i + 1] AS DOUBLE)
                     - CAST(e.embedding[i + 1] AS DOUBLE))) AS d
      FROM probes p
      CROSS JOIN embeddings e
      CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      WHERE e.vec_id <> p.probe_id
      GROUP BY p.probe_id, e.vec_id
    ), rk AS (
      SELECT probe_id, neighbor_id, d,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY d, neighbor_id) AS rnk
      FROM dist
    )
    SELECT CAST(probe_id AS BIGINT) AS probe_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           ROUND(d, 6) AS dist, CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= 10
    ORDER BY probe_id, rnk
    """,
)
def chebyshev_topk_q(spark, sf_dir):
    """Chebyshev-metric (L∞) top-10 retrieval for 4 deterministic
    probes — the metric-diversity companion to the cosine/L2 ANN
    family: max-coordinate distance is what quantization error bounds
    and per-dimension guard-rail filters actually constrain (a vector
    within ε of the probe in L∞ is within ε on EVERY dimension — the
    property range-tree/quantization pruning exploits), so the exact
    L∞ ranking is the oracle an int8/PQ residual bound gets checked
    against.  Spark side stays fully JVM-vectorized: a 4-row broadcast
    against the corpus scan with zip_with/array_max per pair — one
    map-only pass, no explode, no shuffle on the corpus; top-10 via a
    probe-partitioned rank on the ≤4×corpus distance frame reduced by
    TakeOrdered semantics."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.transform("embedding", lambda v: v.cast("double")).alias(
                "pe"
            ),
        )
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda v: v.cast("double")).alias("ce"),
    )
    dist = (
        corpus.crossJoin(F.broadcast(probes))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.array_max(
                F.zip_with("pe", "ce", lambda a, b: F.abs(a - b))
            ).alias("d"),
        )
    )
    wr = Window.partitionBy("probe_id").orderBy("d", "neighbor_id")
    return (
        dist.select(
            "probe_id",
            "neighbor_id",
            "d",
            F.row_number().over(wr).alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("probe_id").cast("bigint").alias("probe_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            F.round("d", 6).alias("dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("probe_id", "rnk")
    )


# =====================================================================
# Spearman footrule distance between top-k rankers (Fagin F*)
# =====================================================================

@query(
    "spearman_footrule_rankers_docs",
    """
    WITH ra AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
      FROM documents QUALIFY r <= 100
    ), rb AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY len(string_split_regex(lower(trim(text)), '\\s+'))
                          DESC, doc_id) AS r
      FROM documents QUALIFY r <= 100
    ), merged AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             COALESCE(ra.r, 101) AS r1, COALESCE(rb.r, 101) AS r2
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT CAST(100 AS BIGINT) AS k,
           CAST(SUM(CASE WHEN r1 <= 100 AND r2 <= 100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_common,
           CAST(SUM(CAST(ABS(r1 - r2) AS BIGINT)) AS BIGINT)
             AS footrule_star,
           ROUND(CAST(SUM(CAST(ABS(r1 - r2) AS BIGINT)) AS DOUBLE)
                 / 10100, 6) AS normalized
    FROM merged
    """,
)
def footrule_q(spark, sf_dir):
    """Spearman footrule distance with location parameter between two
    document rankers' top-100 lists (Fagin, Kumar & Sivakumar, SODA
    2003 — the induced-metric F* variant for comparing TOP-K lists,
    where a doc missing from one list ranks at ℓ = k+1): ranker A
    orders by character length, ranker B by whitespace token count,
    both with doc_id tie-breaks so the orders are engine-identical.
    F* = Σ|r₁−r₂| over the union of the lists, normalized by its
    disjoint-lists maximum k(k+1) = 10100.  Unlike RBO (gated) this
    is an exact integer metric with known constants — the pair of
    them brackets ranker drift from both the top-weighted and the
    uniform side.  Each top-100 comes from TakeOrderedAndProject
    (never a global window over the corpus); everything after lives
    on ≤200 rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))

    def topk(df, score, name):
        t = df.select("doc_id", score.alias("sc")).orderBy(
            F.col("sc").desc(), F.col("doc_id").asc()
        ).limit(100)
        w = Window.orderBy(F.col("sc").desc(), F.col("doc_id").asc())
        return t.select(
            "doc_id", F.row_number().over(w).alias(name)
        )

    ra = topk(d, F.col("n_chars"), "r1")
    rb = topk(d, toks, "r2")
    merged = ra.join(rb, "doc_id", "full_outer").select(
        F.coalesce("r1", F.lit(101)).alias("r1"),
        F.coalesce("r2", F.lit(101)).alias("r2"),
    )
    absd = F.abs(F.col("r1") - F.col("r2")).cast("bigint")
    return merged.agg(
        F.lit(100).cast("bigint").alias("k"),
        F.sum(
            F.when((F.col("r1") <= 100) & (F.col("r2") <= 100), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_common"),
        F.sum(absd).cast("bigint").alias("footrule_star"),
        F.round(F.sum(absd).cast("double") / 10100, 6).alias("normalized"),
    )


# =====================================================================
# Sequential trigram pattern mining over event streams
# =====================================================================

@query(
    "seq_trigram_patterns_events",
    """
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t3
      FROM events
    ), tri AS (
      SELECT t1, t2, t3, COUNT(*) AS cnt FROM seq
      WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY t1, t2, t3
    ), tot AS (
      SELECT SUM(cnt) AS total FROM tri
    ), rk AS (
      SELECT t1, t2, t3, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, t1, t2, t3) AS rnk
      FROM tri
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, t1, t2, t3,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(CAST(cnt AS DOUBLE) / tot.total, 6) AS support
    FROM rk CROSS JOIN tot
    WHERE rnk <= 10 ORDER BY rnk
    """,
)
def seq_trigram_q(spark, sf_dir):
    """Top-10 sequential trigram patterns over per-user event streams
    — sequence mining one order up from the gated first-order
    transition matrix: consecutive (t₁→t₂→t₃) event-type runs within
    each user's (ts, event_id)-ordered stream, with global support =
    count/total-trigrams.  Funnel diagnostics and Markov-order tests
    both start from this table (a trigram distribution that factors
    into the bigram products ⇒ first-order is enough).  The stream
    walk is one user-partitioned window (the sessionize shape); the
    pattern grid is ≤|types|³ rows, so the final rank is a bounded
    fold."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(wu).alias("t2"),
        F.lead("event_type", 2).over(wu).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    tri = seq.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = tri.agg(F.sum("cnt").alias("total"))
    wr = Window.orderBy(F.col("cnt").desc(), "t1", "t2", "t3")
    rk = tri.select(
        "t1", "t2", "t3", "cnt", F.row_number().over(wr).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            F.col("rnk").cast("bigint").alias("rnk"),
            "t1",
            "t2",
            "t3",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "support"
            ),
        )
        .orderBy("rnk")
    )


# =====================================================================
# Tukey median polish on the dow × type activity grid
# =====================================================================

@query(
    "median_polish_dow_type_events",
    """
    WITH dows AS (
      SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS dow
    ), cnt AS (
      SELECT event_type, isodow(CAST(ts AS DATE)) AS dow, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), cells AS (
      SELECT t.event_type, dows.dow,
             CAST(COALESCE(cnt.c, 0) AS DOUBLE) AS v
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN dows
      LEFT JOIN cnt ON cnt.event_type = t.event_type
                   AND cnt.dow = dows.dow
    ), rm1 AS (
      SELECT dow, MAX(CASE WHEN r = mid THEN v END) AS med FROM (
        SELECT dow, v,
               ROW_NUMBER() OVER (PARTITION BY dow
                                  ORDER BY v, event_type) AS r,
               CAST(FLOOR((COUNT(*) OVER (PARTITION BY dow) + 1) / 2.0)
                    AS BIGINT) AS mid
        FROM cells) x GROUP BY dow
    ), r1 AS (
      SELECT c.event_type, c.dow, c.v - rm1.med AS v
      FROM cells c JOIN rm1 USING (dow)
    ), cm1 AS (
      SELECT event_type, MAX(CASE WHEN r = mid THEN v END) AS med FROM (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v, dow) AS r,
               CAST(FLOOR((COUNT(*) OVER (PARTITION BY event_type) + 1)
                          / 2.0) AS BIGINT) AS mid
        FROM r1) x GROUP BY event_type
    ), r2 AS (
      SELECT r1.event_type, r1.dow, r1.v - cm1.med AS v
      FROM r1 JOIN cm1 USING (event_type)
    ), rm2 AS (
      SELECT dow, MAX(CASE WHEN r = mid THEN v END) AS med FROM (
        SELECT dow, v,
               ROW_NUMBER() OVER (PARTITION BY dow
                                  ORDER BY v, event_type) AS r,
               CAST(FLOOR((COUNT(*) OVER (PARTITION BY dow) + 1) / 2.0)
                    AS BIGINT) AS mid
        FROM r2) x GROUP BY dow
    ), r3 AS (
      SELECT r2.event_type, r2.dow, r2.v - rm2.med AS v
      FROM r2 JOIN rm2 USING (dow)
    ), cm2 AS (
      SELECT event_type, MAX(CASE WHEN r = mid THEN v END) AS med FROM (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v, dow) AS r,
               CAST(FLOOR((COUNT(*) OVER (PARTITION BY event_type) + 1)
                          / 2.0) AS BIGINT) AS mid
        FROM r3) x GROUP BY event_type
    )
    SELECT r3.event_type, CAST(r3.dow AS BIGINT) AS dow,
           ROUND(r3.v - cm2.med, 6) AS residual
    FROM r3 JOIN cm2 USING (event_type)
    ORDER BY r3.event_type, r3.dow
    """,
)
def median_polish_q(spark, sf_dir):
    """Tukey median polish of the day-of-week × event-type activity
    grid — the robust two-way decomposition (value = overall + row
    effect + column effect + residual, fitted by alternately sweeping
    out row and column MEDIANS; Tukey 1977, EDA ch. 10–11): the
    residual surface is what seasonal-adjustment should look at AFTER
    removing dow and type effects without letting one anomalous cell
    drag the means.  Two full sweeps (row, column, row, column)
    unrolled; every median is the deterministic LOWER median at rank
    ⌊(n+1)/2⌋ with a (value, key) tie-break so both engines sweep
    identically (and integer cell counts stay exact through every
    subtraction).  The whole computation lives on the densified
    ≤7×|types| grid after one map-side count."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        "event_type",
        (F.weekday(F.to_date("ts")) + 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    types = e.select("event_type").distinct()
    dows = spark.range(1, 8).select(F.col("id").cast("int").alias("dow"))
    cells = (
        types.crossJoin(F.broadcast(dows))
        .join(cnt, ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce("c", F.lit(0)).cast("double").alias("v"),
        )
    )

    def sweep(df, key, tiebreak):
        w = Window.partitionBy(key).orderBy("v", tiebreak)
        wc = Window.partitionBy(key)
        mid = F.floor(
            (F.count(F.lit(1)).over(wc) + 1) / F.lit(2.0)
        ).cast("bigint")
        med = (
            df.select(
                key,
                tiebreak,
                "v",
                F.row_number().over(w).alias("r"),
                mid.alias("mid"),
            )
            .groupBy(key)
            .agg(
                F.max(
                    F.when(F.col("r") == F.col("mid"), F.col("v"))
                ).alias("med")
            )
        )
        return df.join(F.broadcast(med), key).select(
            "event_type", "dow", (F.col("v") - F.col("med")).alias("v")
        )

    r = cells
    for key, tie in (
        ("dow", "event_type"),
        ("event_type", "dow"),
        ("dow", "event_type"),
        ("event_type", "dow"),
    ):
        r = sweep(r, key, tie)
    return r.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        F.round("v", 6).alias("residual"),
    ).orderBy("event_type", "dow")


# =====================================================================
# RBF-kernel maximum mean discrepancy between probe cohorts
# =====================================================================

@query(
    "mmd_rbf_embeddings",
    """
    WITH probes AS (
      SELECT vec_id, embedding,
             ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
      FROM embeddings QUALIFY rn <= 48
    ), g AS (
      SELECT vec_id, CASE WHEN rn <= 24 THEN 0 ELSE 1 END AS grp,
             embedding
      FROM probes
    ), x AS (
      SELECT vec_id, grp, i, CAST(embedding[i + 1] AS DOUBLE) AS v
      FROM g CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
    ), sq AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ANY_VALUE(a.grp) AS ga, ANY_VALUE(b.grp) AS gb,
             SUM((a.v - b.v) * (a.v - b.v)) AS d2
      FROM x a JOIN x b ON a.i = b.i
      GROUP BY a.vec_id, b.vec_id
    ), k AS (
      SELECT ga, gb, AVG(EXP(-0.5 * d2)) AS mk
      FROM sq GROUP BY ga, gb
    )
    SELECT CAST(24 AS BIGINT) AS n_a, CAST(24 AS BIGINT) AS n_b,
           ROUND(MAX(CASE WHEN ga = 0 AND gb = 0 THEN mk END)
                 + MAX(CASE WHEN ga = 1 AND gb = 1 THEN mk END)
                 - 2 * MAX(CASE WHEN ga = 0 AND gb = 1 THEN mk END),
                 6) AS mmd2
    FROM k
    """,
)
def mmd_rbf_q(spark, sf_dir):
    """Maximum mean discrepancy (biased V-statistic) with an RBF
    kernel (γ = 0.5) between two deterministic 24-vector probe cohorts
    (the 48 smallest vec_ids split in id order) — the kernel two-sample
    test (Gretton et al., JMLR 2012) that detects DISTRIBUTION shift
    between embedding batches where mean-vector drift tests see
    nothing (MMD² = E k(a,a′) + E k(b,b′) − 2 E k(a,b) ≥ 0, zero iff
    the distributions match, for a characteristic kernel).  This is
    the standard drift alarm between embedding-model versions before
    re-clustering 100 TB.  All 48² kernel entries come from one
    dimension-keyed join on the probe frame — constant cost at any
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    probes = (
        emb.orderBy("vec_id")
        .limit(48)
        .select("vec_id", "embedding", F.row_number().over(w).alias("rn"))
    )
    g = probes.select(
        "vec_id",
        F.when(F.col("rn") <= 24, 0).otherwise(1).alias("grp"),
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("i", "v"),
    )
    a, b = g.alias("a"), g.alias("b")
    sq = (
        a.join(b, F.col("a.i") == F.col("b.i"))
        .groupBy(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
        )
        .agg(
            F.any_value(F.col("a.grp")).alias("ga"),
            F.any_value(F.col("b.grp")).alias("gb"),
            F.sum(
                (F.col("a.v") - F.col("b.v"))
                * (F.col("a.v") - F.col("b.v"))
            ).alias("d2"),
        )
    )
    k = sq.groupBy("ga", "gb").agg(
        F.avg(F.exp(F.lit(-0.5) * F.col("d2"))).alias("mk")
    )
    pick = lambda i, j: F.max(  # noqa: E731
        F.when((F.col("ga") == i) & (F.col("gb") == j), F.col("mk"))
    )
    return k.agg(
        F.lit(24).cast("bigint").alias("n_a"),
        F.lit(24).cast("bigint").alias("n_b"),
        F.round(pick(0, 0) + pick(1, 1) - 2 * pick(0, 1), 6).alias("mmd2"),
    )


# =====================================================================
# Empirical upper-tail dependence between price and quantity
# =====================================================================

@query(
    "tail_dependence_lineitem",
    """
    WITH li AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ), n AS (
      SELECT COUNT(*) AS n FROM li
    ), pgrid AS (
      SELECT pc, SUM(COUNT(*)) OVER (ORDER BY pc) AS cum
      FROM li GROUP BY pc
    ), qgrid AS (
      SELECT q, SUM(COUNT(*)) OVER (ORDER BY q) AS cum
      FROM li GROUP BY q
    ), tp AS (
      SELECT MIN(pc) AS thresh_p FROM pgrid CROSS JOIN n
      WHERE cum >= CAST(CEIL(0.95 * n) AS BIGINT)
    ), tq AS (
      SELECT MIN(q) AS thresh_q FROM qgrid CROSS JOIN n
      WHERE cum >= CAST(CEIL(0.95 * n) AS BIGINT)
    ), tails AS (
      SELECT SUM(CASE WHEN pc > thresh_p AND q > thresh_q
                      THEN 1 ELSE 0 END) AS n_joint,
             SUM(CASE WHEN q > thresh_q THEN 1 ELSE 0 END) AS n_qtail
      FROM li CROSS JOIN tp CROSS JOIN tq
    )
    SELECT CAST(n.n AS BIGINT) AS n_rows,
           ROUND(CAST(tp.thresh_p AS DOUBLE) / 100, 6) AS var95_price,
           CAST(tq.thresh_q AS BIGINT) AS var95_quantity,
           CAST(tails.n_joint AS BIGINT) AS n_joint_tail,
           CAST(tails.n_qtail AS BIGINT) AS n_quantity_tail,
           ROUND(CASE WHEN tails.n_qtail > 0
                      THEN CAST(tails.n_joint AS DOUBLE) / tails.n_qtail
                      END, 6) AS lambda_upper
    FROM tails CROSS JOIN tp CROSS JOIN tq CROSS JOIN n
    """,
)
def tail_dependence_q(spark, sf_dir):
    """Empirical upper-tail dependence λ_U between extended price and
    quantity — P(price in its top 5% | quantity in its top 5%), the
    copula-margin diagnostic for "do extremes co-occur?" that a
    Pearson/Spearman number hides (two series can correlate 0.9 yet be
    tail-independent, and risk/anomaly budgets care about the joint
    tail).  The 95th-percentile thresholds come from exact integer
    cumulative counts over the quantized-cents / integer-quantity
    value grids (the Mann–Whitney audited shape: the VALUE DOMAIN, not
    the corpus, bounds each window), then one conditional-count pass
    with the two 1-row thresholds broadcast.  NULL-guarded when the
    conditioning tail is empty."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("pc"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    n = li.agg(F.count(F.lit(1)).alias("n"))

    def thresh(col):
        grid = (
            li.groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                col,
                F.sum("cnt").over(Window.orderBy(col)).alias("cum"),
            )
        )
        return (
            grid.crossJoin(F.broadcast(n))
            .filter(
                F.col("cum")
                >= F.ceil(F.lit(0.95) * F.col("n")).cast("bigint")
            )
            .agg(F.min(col).alias(f"thresh_{col}"))
        )

    tp, tq = thresh("pc"), thresh("q")
    tails = (
        li.crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tq))
        .agg(
            F.sum(
                F.when(
                    (F.col("pc") > F.col("thresh_pc"))
                    & (F.col("q") > F.col("thresh_q")),
                    1,
                ).otherwise(0)
            ).alias("n_joint"),
            F.sum(
                F.when(F.col("q") > F.col("thresh_q"), 1).otherwise(0)
            ).alias("n_qtail"),
        )
    )
    return (
        tails.crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(F.col("thresh_pc").cast("double") / 100, 6).alias(
                "var95_price"
            ),
            F.col("thresh_q").cast("bigint").alias("var95_quantity"),
            F.col("n_joint").cast("bigint").alias("n_joint_tail"),
            F.col("n_qtail").cast("bigint").alias("n_quantity_tail"),
            F.round(
                F.when(
                    F.col("n_qtail") > 0,
                    F.col("n_joint").cast("double") / F.col("n_qtail"),
                ),
                6,
            ).alias("lambda_upper"),
        )
    )


# =====================================================================
# Expected shortfall (CVaR) of event values per type
# =====================================================================

@query(
    "expected_shortfall_value_events",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), grid AS (
      SELECT event_type, vc, COUNT(*) AS cnt
      FROM ev GROUP BY event_type, vc
    ), cum AS (
      SELECT event_type, vc, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc) AS c,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM grid
    ), thr AS (
      SELECT event_type, MIN(vc) AS var_c, MAX(n) AS n
      FROM cum WHERE c >= CAST(CEIL(0.95 * n) AS BIGINT)
      GROUP BY event_type
    ), tail AS (
      SELECT g.event_type,
             SUM(g.cnt) AS n_tail,
             SUM(g.cnt * g.vc) AS sum_c
      FROM grid g JOIN thr ON g.event_type = thr.event_type
      WHERE g.vc >= thr.var_c
      GROUP BY g.event_type
    )
    SELECT thr.event_type, CAST(thr.n AS BIGINT) AS n_events,
           ROUND(CAST(thr.var_c AS DOUBLE) / 100, 6) AS var95,
           CAST(tail.n_tail AS BIGINT) AS n_tail,
           ROUND(CAST(tail.sum_c AS DOUBLE) / tail.n_tail / 100, 6)
             AS es95
    FROM thr JOIN tail ON thr.event_type = tail.event_type
    ORDER BY thr.event_type
    """,
)
def expected_shortfall_q(spark, sf_dir):
    """95% value-at-risk and expected shortfall (CVaR) of the event
    value per type — the coherent tail-risk pair (Artzner et al. 1999;
    Basel's ES replaced VaR precisely because VaR ignores HOW BAD the
    tail is): VaR₉₅ is the smallest value whose exact cumulative count
    reaches ⌈0.95n⌉ on the quantized-cents grid, ES₉₅ the
    exact-integer mean of all values at or above it (the upper-tail
    conditional mean form — ties at the threshold are included, which
    keeps both engines byte-identical without interpolation).
    Everything runs on type-partitioned cents-grid windows (the
    Mann–Whitney audited shape) — the value DOMAIN bounds the windows,
    never event volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    grid = ev.groupBy("event_type", "vc").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.partitionBy("event_type").orderBy("vc")
    wt = Window.partitionBy("event_type")
    cum = grid.select(
        "event_type",
        "vc",
        "cnt",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wt).alias("n"),
    )
    thr = (
        cum.filter(
            F.col("c") >= F.ceil(F.lit(0.95) * F.col("n")).cast("bigint")
        )
        .groupBy("event_type")
        .agg(F.min("vc").alias("var_c"), F.max("n").alias("n"))
    )
    tail = (
        grid.join(F.broadcast(thr), "event_type")
        .filter(F.col("vc") >= F.col("var_c"))
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_tail"),
            F.sum(F.col("cnt") * F.col("vc")).alias("sum_c"),
        )
    )
    return (
        thr.join(tail, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("var_c").cast("double") / 100, 6).alias("var95"),
            F.col("n_tail").cast("bigint").alias("n_tail"),
            F.round(
                F.col("sum_c").cast("double") / F.col("n_tail") / 100, 6
            ).alias("es95"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# Beta method-of-moments fit of per-user purchase rates
# =====================================================================

@query(
    "beta_moments_purchase_users",
    """
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS k,
             COUNT(*) AS n
      FROM events GROUP BY user_id
    ), rates AS (
      SELECT CAST(k AS DOUBLE) / n AS r FROM per_user
    ), mom AS (
      SELECT COUNT(*) AS nu, AVG(r) AS m,
             AVG(r * r) - AVG(r) * AVG(r) AS v
      FROM rates
    )
    SELECT CAST(nu AS BIGINT) AS n_users,
           ROUND(m, 6) AS mean_rate,
           ROUND(v, 6) AS var_rate,
           ROUND(CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                      THEN m * (m * (1 - m) / v - 1) END, 6) AS alpha,
           ROUND(CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                      THEN (1 - m) * (m * (1 - m) / v - 1) END, 6)
             AS beta
    FROM mom
    """,
)
def beta_moments_q(spark, sf_dir):
    """Beta(α, β) method-of-moments fit of the per-user purchase-rate
    distribution — the empirical-Bayes PRIOR for rate smoothing (the
    Beta-Binomial companion to the gated James–Stein gate, which
    shrinks normal means; this one shrinks RATES): with m and v the
    population mean/variance of per-user rates, t = m(1−m)/v − 1 and
    α = mt, β = (1−m)t.  A user with k purchases in n events then gets
    the shrunken posterior rate (k+α)/(n+α+β) — the right ranking
    statistic when per-user n varies by orders of magnitude.  Guarded
    NULL when v = 0 or the moment factor is non-positive (the MoM
    precondition v < m(1−m); both engines return NULL, no ANSI 0/0).
    Cost: one per-user aggregate and a 1-row moment fold."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    rates = per_user.select(
        (F.col("k").cast("double") / F.col("n")).alias("r")
    )
    mom = rates.agg(
        F.count(F.lit(1)).alias("nu"),
        F.avg("r").alias("m"),
        (F.avg(F.col("r") * F.col("r")) - F.avg("r") * F.avg("r")).alias(
            "v"
        ),
    )
    t = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    ok = (F.col("v") > 0) & (t > 0)
    return mom.select(
        F.col("nu").cast("bigint").alias("n_users"),
        F.round("m", 6).alias("mean_rate"),
        F.round("v", 6).alias("var_rate"),
        F.round(F.when(ok, F.col("m") * t), 6).alias("alpha"),
        F.round(F.when(ok, (1 - F.col("m")) * t), 6).alias("beta"),
    )


# =====================================================================
# Chatterjee's ξ dependence coefficient on the daily series
# =====================================================================

@query(
    "chatterjee_xi_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ), vals AS (
      SELECT event_type, y AS v, COUNT(*) AS cnt
      FROM daily GROUP BY event_type, y
    ), cums AS (
      SELECT event_type, v,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS le,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v DESC)
               AS ge
      FROM vals
    ), seq AS (
      SELECT d.event_type, d.day, c.le AS r, c.ge AS l,
             COUNT(*) OVER (PARTITION BY d.event_type) AS n
      FROM daily d JOIN cums c
        ON d.event_type = c.event_type AND d.y = c.v
    ), diffs AS (
      SELECT event_type, n, l,
             ABS(r - LAG(r) OVER (PARTITION BY event_type
                                  ORDER BY day)) AS dr
      FROM seq
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(CASE WHEN SUM(CAST(l * (n - l) AS BIGINT)) > 0
                      THEN 1 - CAST(MAX(n) AS DOUBLE)
                               * SUM(COALESCE(dr, 0))
                               / (2.0 * SUM(CAST(l * (n - l) AS BIGINT)))
                      END, 6) AS xi
    FROM diffs GROUP BY event_type ORDER BY event_type
    """,
)
def chatterjee_xi_q(spark, sf_dir):
    """Chatterjee's ξ coefficient of the daily count as a function of
    TIME, per event type (Chatterjee, JASA 2021) — the new rank
    correlation that is 0 iff independent and 1 iff y is a measurable
    FUNCTION of x, catching nonmonotone dependence (U-shapes,
    seasonality) that Spearman/Kendall score as ~0.  The
    ties-general form: with r_i = #{j: y_j ≤ y_i}, l_i = #{j: y_j ≥
    y_i} and the series in x-order, ξ = 1 − n·Σ|r_{i+1}−r_i| /
    (2·Σ l_i(n−l_i)).  Ranks come from exact integer cumulative
    counts over the per-type VALUE grid (never a row-wise rank over
    raw events) joined back to the day series; x is the day order, so
    the adjacent-difference walk is one LAG over the bounded daily
    grid.  NULL-guarded when all days tie (denominator 0)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    vals = daily.groupBy("event_type", F.col("y").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wle = Window.partitionBy("event_type").orderBy("v")
    wge = Window.partitionBy("event_type").orderBy(F.col("v").desc())
    # rename the grid keys before joining back onto `daily`: cums
    # DERIVES from daily, and a parent⋈child join on same-name
    # columns is an ambiguous self-reference to Catalyst
    cums = vals.select(
        F.col("event_type").alias("et"),
        "v",
        F.sum("cnt").over(wle).alias("le"),
        F.sum("cnt").over(wge).alias("ge"),
    )
    wt = Window.partitionBy("event_type")
    seq = daily.join(
        cums,
        (F.col("event_type") == F.col("et")) & (F.col("y") == F.col("v")),
    ).select(
        "event_type",
        "day",
        F.col("le").alias("r"),
        F.col("ge").alias("l"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    diffs = seq.select(
        "event_type",
        "n",
        "l",
        F.abs(F.col("r") - F.lag("r").over(wd)).alias("dr"),
    )
    denom = F.sum((F.col("l") * (F.col("n") - F.col("l"))).cast("bigint"))
    return (
        diffs.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.round(
                F.when(
                    denom > 0,
                    1
                    - F.max("n").cast("double")
                    * F.sum(F.coalesce("dr", F.lit(0)))
                    / (2.0 * denom),
                ),
                6,
            ).alias("xi"),
        )
        .orderBy("event_type")
    )
