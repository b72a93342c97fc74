"""Round-7 wave: association / dispersion statistics — split from the single-file registry (VERDICT r7 #7).

Registration order is preserved by the package ``__init__`` importing
the domain modules in the original file order; ``Q``/``O`` are the
shared dicts from ``._core``.
"""

from __future__ import annotations

import tempfile  # noqa: F401  (several queries stage scratch dirs)

import pandas as pd  # noqa: F401  resolves pandas_udf string annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..functions import epoch_us  # noqa: F401
from ..tables import load_table  # noqa: F401
from ._core import (  # noqa: F401
    _LM_CE_SQL,
    _SHINGLE_INTER_SQL,
    O,
    Q,
    query,
)

# =====================================================================
# Round-7 wave: association / dispersion statistics
# =====================================================================

@query(
    "cramers_v_lang_source_docs",
    """
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o
      FROM documents GROUP BY lang, source
    ), rows_ AS (
      SELECT lang, SUM(o) AS rt FROM cells GROUP BY lang
    ), cols_ AS (
      SELECT source, SUM(o) AS ct FROM cells GROUP BY source
    ), tot AS (
      SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS r,
             COUNT(DISTINCT source) AS c
      FROM cells
    ), chi AS (
      SELECT SUM(POWER(ce.o - CAST(rw.rt AS DOUBLE) * cl.ct / t.n, 2)
                 / (CAST(rw.rt AS DOUBLE) * cl.ct / t.n)) AS chi2
      FROM cells ce
      JOIN rows_ rw USING (lang) JOIN cols_ cl USING (source)
      CROSS JOIN tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n_docs, CAST(t.r AS BIGINT) AS n_langs,
           CAST(t.c AS BIGINT) AS n_sources,
           ROUND(chi.chi2, 6) AS chi2,
           ROUND(sqrt(chi.chi2 / (t.n * (LEAST(t.r, t.c) - 1))), 6)
             AS cramers_v
    FROM chi CROSS JOIN tot t
    """,
)
def cramers_v_q(spark, sf_dir):
    """Cramér's V over the lang × source contingency grid — the
    normalized [0,1] strength behind the chi-square drift gate's raw
    statistic (chi-square says "dependent", V says HOW dependent,
    comparably across grids of different shape).  Observed/expected
    cells come from exact integer counts; the only shuffles are the
    two dimension-keyed aggregations and the chi-square sum runs on
    the |langs|×|sources| bounded grid.  The grid join is
    dimension-bounded exactly like chisq_lang_drift_by_source."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    chi = (
        cells.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .join(F.broadcast(tot), F.lit(True))
        .agg(F.sum(F.pow(F.col("o") - e, F.lit(2)) / e).alias("chi2"))
    )
    return chi.join(F.broadcast(tot), F.lit(True)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("r").cast("bigint").alias("n_langs"),
        F.col("c").cast("bigint").alias("n_sources"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n") * (F.least("r", "c") - F.lit(1)))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "hellinger_lang_by_source_docs",
    """
    WITH sl AS (
      SELECT source, lang, COUNT(*) AS c
      FROM documents GROUP BY source, lang
    ), st AS (
      SELECT source, SUM(c) AS stot FROM sl GROUP BY source
    ), gl AS (
      SELECT lang, COUNT(*) AS g FROM documents GROUP BY lang
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    bc AS (
      SELECT sl.source, ANY_VALUE(st.stot) AS n_docs,
             SUM(sqrt((CAST(sl.c AS DOUBLE) / st.stot)
                      * (CAST(gl.g AS DOUBLE) / n.n))) AS bc
      FROM sl JOIN st USING (source) JOIN gl USING (lang) CROSS JOIN n
      GROUP BY sl.source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(bc, 6) AS bhattacharyya,
           ROUND(sqrt(GREATEST(1.0 - bc, 0.0)), 6) AS hellinger
    FROM bc ORDER BY source
    """,
)
def hellinger_q(spark, sf_dir):
    """Hellinger distance between each source's language distribution
    and the pooled corpus distribution — the bounded-[0,1] drift
    metric that (unlike KL/JSD) never blows up on a zero cell: langs
    absent from a source simply drop out of the Bhattacharyya sum
    (√(0·q) = 0) and H = √(1−BC).  Two dimension-keyed count
    aggregations plus a |sources|×|langs|-bounded grid sum — the
    chisq/JSD family shape, integer counts exact until the √."""
    d = load_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    st = sl.groupBy("source").agg(F.sum("c").alias("stot"))
    gl = d.groupBy("lang").agg(F.count(F.lit(1)).alias("g"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    bc = (
        sl.join(F.broadcast(st), "source")
        .join(F.broadcast(gl), "lang")
        .join(F.broadcast(n), F.lit(True))
        .groupBy("source")
        .agg(
            F.any_value(F.col("stot")).alias("n_docs"),
            F.sum(
                F.sqrt(
                    (F.col("c").cast("double") / F.col("stot"))
                    * (F.col("g").cast("double") / F.col("n"))
                )
            ).alias("bc"),
        )
    )
    return bc.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("bc", 6).alias("bhattacharyya"),
        F.round(
            F.sqrt(F.greatest(F.lit(1.0) - F.col("bc"), F.lit(0.0))), 6
        ).alias("hellinger"),
    ).orderBy("source")


@query(
    "anova_dow_value_events",
    """
    WITH cells AS (
      SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS s,
             SUM(CAST(ROUND(value * 10000) AS BIGINT)
                 * CAST(ROUND(value * 10000) AS BIGINT)) AS ss
      FROM events GROUP BY event_type, isodow(CAST(ts AS DATE))
    ), agg AS (
      SELECT event_type, COUNT(*) AS k, SUM(n) AS n,
             SUM(CAST(s AS DOUBLE) * s / n) AS sb_raw,
             SUM(s) AS gs, SUM(ss) AS gss
      FROM cells GROUP BY event_type
    ), f AS (
      SELECT event_type, k, n,
             sb_raw - CAST(gs AS DOUBLE) * gs / n AS ssb,
             CAST(gss AS DOUBLE) - sb_raw AS ssw,
             CAST(gss AS DOUBLE) - CAST(gs AS DOUBLE) * gs / n AS sst
      FROM agg
    )
    SELECT event_type, CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n_events,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
           ROUND(ssb / sst, 6) AS eta_sq
    FROM f ORDER BY event_type
    """,
)
def anova_dow_q(spark, sf_dir):
    """One-way ANOVA of event value across ISO day-of-week groups,
    per event type — the omnibus "does the day matter at all" test
    upstream of the per-cell z sweep (fdr_bh gate): F = (SSB/(k−1)) /
    (SSW/(n−k)) plus η² effect size.  All three sums of squares come
    from the ×1e4 integer-scaled per-(type,dow) moment cells — exact
    BIGINT until the final doubles — so the answer is
    partition-order-free; Spark weekday()+1 ≙ DuckDB isodow (plain
    dayofweek DIFFERS across engines)."""
    e = load_table(spark, sf_dir, "events")
    scaled = F.round(F.col("value") * 10000).cast("bigint")
    cells = e.groupBy(
        "event_type", (F.weekday(F.to_date("ts")) + 1).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("s"),
        F.sum(scaled * scaled).alias("ss"),
    )
    agg = cells.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
            "sb_raw"
        ),
        F.sum("s").alias("gs"),
        F.sum("ss").alias("gss"),
    )
    ssb = F.col("sb_raw") - F.col("gs").cast("double") * F.col("gs") / F.col(
        "n"
    )
    ssw = F.col("gss").cast("double") - F.col("sb_raw")
    sst = F.col("gss").cast("double") - F.col("gs").cast("double") * F.col(
        "gs"
    ) / F.col("n")
    return agg.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    ).orderBy("event_type")


@query(
    "iqr_outlier_fences_orders",
    """
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(q.q1, 6) AS q1, ROUND(q.q3, 6) AS q3,
           ROUND(q.q3 - q.q1, 6) AS iqr,
           ROUND(q.q1 - 1.5 * (q.q3 - q.q1), 6) AS lo_fence,
           ROUND(q.q3 + 1.5 * (q.q3 - q.q1), 6) AS hi_fence,
           CAST(SUM(CASE WHEN o.o_totalprice
                              < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN o.o_totalprice
                              > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM orders o JOIN q USING (o_orderpriority)
    GROUP BY o.o_orderpriority, q.q1, q.q3
    ORDER BY priority
    """,
)
def iqr_fences_q(spark, sf_dir):
    """Tukey IQR outlier fences per order priority: grouped exact
    Q1/Q3 (Spark percentile ≙ DuckDB quantile_cont, linear
    interpolation — parity proven by the sketch-quantile gates),
    1.5·IQR fences, and the outlier counts each side.  One grouped
    percentile pass + one broadcast join of the 5-row fence dimension
    back onto orders — no window, no sort, scales as a pair of
    priority-keyed aggregations."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("q1"),
            F.col("q3"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("o_totalprice") < lo, 1).otherwise(0))
            .cast("bigint")
            .alias("n_below"),
            F.sum(F.when(F.col("o_totalprice") > hi, 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
        )
        .select(
            "priority",
            "n_orders",
            F.round("q1", 6).alias("q1"),
            F.round("q3", 6).alias("q3"),
            F.round(iqr, 6).alias("iqr"),
            F.round(lo, 6).alias("lo_fence"),
            F.round(hi, 6).alias("hi_fence"),
            "n_below",
            "n_above",
        )
        .orderBy("priority")
    )


# =====================================================================
# Round-7 wave: ordinal / fractal / symbolic time-series diagnostics
# =====================================================================

@query(
    "permutation_entropy_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ), tri AS (
      SELECT event_type, x AS a,
             LEAD(x, 1) OVER (PARTITION BY event_type ORDER BY t) AS b,
             LEAD(x, 2) OVER (PARTITION BY event_type ORDER BY t) AS c
      FROM idx
    ), pat AS (
      SELECT event_type,
             100 * (CASE WHEN b < a THEN 1 ELSE 0 END
                    + CASE WHEN c < a THEN 1 ELSE 0 END)
             + 10 * (CASE WHEN a <= b THEN 1 ELSE 0 END
                     + CASE WHEN c < b THEN 1 ELSE 0 END)
             + (CASE WHEN a <= c THEN 1 ELSE 0 END
                + CASE WHEN b <= c THEN 1 ELSE 0 END) AS code
      FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
    ), dist AS (
      SELECT event_type, code, COUNT(*) AS cnt FROM pat
      GROUP BY event_type, code
    ), tot AS (
      SELECT event_type, SUM(cnt) AS n FROM dist GROUP BY event_type
    )
    SELECT d.event_type, CAST(t.n AS BIGINT) AS n_triples,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           ROUND(-SUM((CAST(d.cnt AS DOUBLE) / t.n)
                      * LN(CAST(d.cnt AS DOUBLE) / t.n)) / LN(6), 6)
             AS perm_entropy
    FROM dist d JOIN tot t USING (event_type)
    GROUP BY d.event_type, t.n ORDER BY d.event_type
    """,
)
def perm_entropy_q(spark, sf_dir):
    """Order-3 permutation entropy of daily event counts (Bandt &
    Pompe) — complexity of the series' ORDINAL dynamics, immune to
    monotone rescaling: each consecutive triple maps to one of six
    rank patterns (ties broken toward the earlier day — the stable
    rule, so the pattern code is pure integer comparisons, identical
    in both engines) and H = −Σp·ln p / ln 6 over the pattern
    distribution.  Two LEADs over the bounded per-type daily frame +
    a ≤6-row-per-type distribution — never touches raw events after
    the first aggregation."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    tri = daily.select(
        "event_type",
        F.col("x").alias("a"),
        F.lead("x", 1).over(w).alias("b"),
        F.lead("x", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    bit = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
    code = (
        100 * (bit(F.col("b") < F.col("a")) + bit(F.col("c") < F.col("a")))
        + 10
        * (bit(F.col("a") <= F.col("b")) + bit(F.col("c") < F.col("b")))
        + (bit(F.col("a") <= F.col("c")) + bit(F.col("b") <= F.col("c")))
    )
    dist = tri.select("event_type", code.alias("code")).groupBy(
        "event_type", "code"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = dist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt").cast("double") / F.col("n")
    return (
        dist.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.lit(6.0)), 6
            ).alias("perm_entropy"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_triples"),
            "n_patterns",
            "perm_entropy",
        )
        .orderBy("event_type")
    )


@query(
    "hurst_rs_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ), win AS (
      SELECT i.event_type, w.ws, i.t, i.x,
             CAST(floor((i.t - 1) / w.ws) AS INTEGER) AS seg,
             (i.t - 1) % w.ws + 1 AS rl
      FROM idx i JOIN (SELECT unnest([8, 16, 32]) AS ws) w ON TRUE
    ), segstat AS (
      SELECT event_type, ws, seg, COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx
      FROM win GROUP BY event_type, ws, seg HAVING COUNT(*) = ANY_VALUE(ws)
    ), z AS (
      SELECT w.event_type, w.ws, w.seg,
             SUM(w.x) OVER (PARTITION BY w.event_type, w.ws, w.seg
                            ORDER BY w.t ROWS UNBOUNDED PRECEDING)
               - w.rl * (CAST(s.sx AS DOUBLE) / w.ws) AS zc
      FROM win w JOIN segstat s USING (event_type, ws, seg)
    ), rs AS (
      SELECT z.event_type, z.ws, z.seg,
             (MAX(z.zc) - MIN(z.zc))
               / sqrt((ANY_VALUE(s.sxx)
                       - CAST(ANY_VALUE(s.sx) AS DOUBLE)
                         * ANY_VALUE(s.sx) / z.ws) / z.ws) AS rs
      FROM z JOIN segstat s USING (event_type, ws, seg)
      WHERE s.sxx * s.n > s.sx * s.sx
      GROUP BY z.event_type, z.ws, z.seg
    ), pts AS (
      SELECT event_type, ws, COUNT(*) AS n_seg,
             LN(AVG(rs)) AS v, LN(CAST(ws AS DOUBLE)) AS u
      FROM rs GROUP BY event_type, ws
    )
    SELECT event_type, CAST(SUM(n_seg) AS BIGINT) AS n_segments,
           ROUND((SUM(u * v) - SUM(u) * SUM(v) / 3)
                 / (SUM(u * u) - SUM(u) * SUM(u) / 3), 6) AS hurst
    FROM pts GROUP BY event_type ORDER BY event_type
    """,
)
def hurst_q(spark, sf_dir):
    """Hurst exponent of daily event counts by rescaled-range (R/S)
    analysis over dyadic windows {8,16,32}: per complete segment,
    R = range of the cumulative mean-deviation walk, S = population
    std (both from exact integer segment sums; the cumulative walk
    sums INTEGERS then subtracts rl·mean once, so both engines walk
    identical doubles), H = OLS slope of ln(avg R/S) on ln(ws) over
    the three literal points.  H≈0.5 is a memoryless series; the
    windows and the 3-point fit are literal-bounded, segments shuffle
    on (type, ws, seg) — never a corpus-wide window."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    ws_lit = spark.range(0, 3).select(
        F.element_at(
            F.array(F.lit(8), F.lit(16), F.lit(32)), F.col("id").cast("int") + 1
        ).alias("ws")
    )
    win = idx.join(F.broadcast(ws_lit), F.lit(True)).select(
        "event_type",
        "ws",
        "t",
        "x",
        ((F.col("t") - 1) / F.col("ws")).cast("int").alias("seg"),
        ((F.col("t") - 1) % F.col("ws") + 1).alias("rl"),
    )
    segstat = (
        win.groupBy("event_type", "ws", "seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .filter(F.col("n") == F.col("ws"))
    )
    zw = Window.partitionBy("event_type", "ws", "seg").orderBy("t")
    z = win.join(segstat, ["event_type", "ws", "seg"]).select(
        "event_type",
        "ws",
        "seg",
        "sx",
        "sxx",
        (
            F.sum("x").over(
                zw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("rl") * (F.col("sx").cast("double") / F.col("ws"))
        ).alias("zc"),
    )
    rs = (
        z.filter(F.col("sxx") * F.col("ws") > F.col("sx") * F.col("sx"))
        .groupBy("event_type", "ws", "seg")
        .agg(
            (
                (F.max("zc") - F.min("zc"))
                / F.sqrt(
                    (
                        F.any_value("sxx")
                        - F.any_value("sx").cast("double")
                        * F.any_value("sx")
                        / F.col("ws")
                    )
                    / F.col("ws")
                )
            ).alias("rs")
        )
    )
    pts = rs.groupBy("event_type", "ws").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.log(F.avg("rs")).alias("v"),
        F.log(F.col("ws").cast("double")).alias("u"),
    )
    return (
        pts.groupBy("event_type")
        .agg(
            F.sum("n_seg").cast("bigint").alias("n_segments"),
            F.round(
                (F.sum(F.col("u") * F.col("v")) - F.sum("u") * F.sum("v") / 3)
                / (F.sum(F.col("u") * F.col("u")) - F.sum("u") * F.sum("u") / 3),
                6,
            ).alias("hurst"),
        )
        .orderBy("event_type")
    )


@query(
    "sax_symbols_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ), st AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      FROM idx GROUP BY event_type
    ), seg AS (
      SELECT i.event_type, CAST(floor((i.t - 1) / 7) AS INTEGER) AS seg,
             COUNT(*) AS sn, SUM(i.x) AS ssx
      FROM idx i GROUP BY i.event_type, CAST(floor((i.t - 1) / 7) AS INTEGER)
      HAVING COUNT(*) = 7
    ), sym AS (
      SELECT s.event_type, s.seg,
             CASE
               WHEN (CAST(s.ssx AS DOUBLE) / 7 - CAST(t.sx AS DOUBLE) / t.n)
                    / sqrt((t.sxx - CAST(t.sx AS DOUBLE) * t.sx / t.n) / t.n)
                    < -0.6745 THEN 'a'
               WHEN (CAST(s.ssx AS DOUBLE) / 7 - CAST(t.sx AS DOUBLE) / t.n)
                    / sqrt((t.sxx - CAST(t.sx AS DOUBLE) * t.sx / t.n) / t.n)
                    < 0.0 THEN 'b'
               WHEN (CAST(s.ssx AS DOUBLE) / 7 - CAST(t.sx AS DOUBLE) / t.n)
                    / sqrt((t.sxx - CAST(t.sx AS DOUBLE) * t.sx / t.n) / t.n)
                    < 0.6745 THEN 'c'
               ELSE 'd'
             END AS sym
      FROM seg s JOIN st t USING (event_type)
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_segments,
           string_agg(sym, '' ORDER BY seg) AS sax
    FROM sym GROUP BY event_type ORDER BY event_type
    """,
)
def sax_q(spark, sf_dir):
    """SAX symbolic discretization of daily event counts: z-normalize
    per type (moments from exact integer sums), PAA-average over
    complete 7-day segments (the segment mean is segment-sum/7 — one
    integer sum per segment, no per-day double walk), then map each
    segment to {a,b,c,d} at the literal Gaussian quartile breakpoints
    ±0.6745 — the alphabet-4 SAX word that makes motif/anomaly search
    a string problem.  Deterministic end-to-end: the only doubles are
    algebra on exact sums; segment order is pinned by the ordered
    aggregation both engines share."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    st = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    seg = (
        idx.groupBy(
            "event_type", ((F.col("t") - 1) / 7).cast("int").alias("seg")
        )
        .agg(F.count(F.lit(1)).alias("sn"), F.sum("x").alias("ssx"))
        .filter(F.col("sn") == 7)
    )
    mu = F.col("sx").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
        / F.col("n")
    )
    paa = (F.col("ssx").cast("double") / 7 - mu) / sd
    sym = seg.join(F.broadcast(st), "event_type").select(
        "event_type",
        "seg",
        F.when(paa < -0.6745, "a")
        .when(paa < 0.0, "b")
        .when(paa < 0.6745, "c")
        .otherwise("d")
        .alias("sym"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("sax"),
        )
        .orderBy("event_type")
    )


@query(
    "pacf_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ), st AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      FROM idx GROUP BY event_type
    ), lag_terms AS (
      SELECT a.event_type, l.lag,
             SUM(a.x * b.x) AS sxy, SUM(a.x) AS s1, SUM(b.x) AS s2,
             COUNT(*) AS np
      FROM idx a
      JOIN (SELECT unnest(range(1, 4)) AS lag) l ON TRUE
      JOIN idx b ON b.event_type = a.event_type AND b.t = a.t - l.lag
      GROUP BY a.event_type, l.lag
    ), acf AS (
      SELECT t.event_type, t.lag,
             (t.sxy - (s.sx / CAST(s.n AS DOUBLE)) * (t.s1 + t.s2)
                    + t.np * (s.sx / CAST(s.n AS DOUBLE))
                           * (s.sx / CAST(s.n AS DOUBLE)))
             / (s.sxx - s.n * (s.sx / CAST(s.n AS DOUBLE))
                            * (s.sx / CAST(s.n AS DOUBLE))) AS r
      FROM lag_terms t JOIN st s USING (event_type)
    ), wide AS (
      SELECT event_type,
             MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             MAX(CASE WHEN lag = 3 THEN r END) AS r3
      FROM acf GROUP BY event_type
    ), dl AS (
      SELECT event_type, r1, r2, r3,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
      FROM wide
    )
    SELECT event_type,
           ROUND(r1, 6) AS pacf1,
           ROUND(phi22, 6) AS pacf2,
           ROUND((r3 - (r1 - phi22 * r1) * r2 - phi22 * r1)
                 / (1 - (r1 - phi22 * r1) * r1 - phi22 * r2), 6) AS pacf3
    FROM dl ORDER BY event_type
    """,
)
def pacf_q(spark, sf_dir):
    """Partial autocorrelation of daily event counts at lags 1–3 via
    the Durbin–Levinson recursion unrolled on the ACF values (the acf
    gate's exact integer-sum estimator feeds it): φ11 = r1,
    φ22 = (r2−r1²)/(1−r1²), φ33 from the level-2 coefficients — the
    AR-order diagnostic that separates direct lag influence from
    propagated lag-1 echo.  Everything after the bounded lag join is
    per-type scalar algebra on exact moments; no new shuffles beyond
    the ACF construction."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    st = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    a, b = idx.alias("a"), idx.alias("b")
    terms = (
        a.join(F.broadcast(lags), F.lit(True))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.t") == F.col("a.t") - F.col("lag")),
        )
        .groupBy("a.event_type", "lag")
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
            F.sum("a.x").alias("s1"),
            F.sum("b.x").alias("s2"),
            F.count(F.lit(1)).alias("np"),
        )
    )
    mu = F.col("sx") / F.col("n").cast("double")
    r = (
        F.col("sxy") - mu * (F.col("s1") + F.col("s2")) + F.col("np") * mu * mu
    ) / (F.col("sxx") - F.col("n") * mu * mu)
    acf = terms.join(F.broadcast(st), "event_type").select(
        "event_type", "lag", r.alias("r")
    )
    wide = acf.groupBy("event_type").agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1) - F.col("r1") * F.col("r1")
    )
    phi21 = F.col("r1") - phi22 * F.col("r1")
    return (
        wide.withColumn("phi22", phi22)
        .select(
            "event_type",
            F.round("r1", 6).alias("pacf1"),
            F.round("phi22", 6).alias("pacf2"),
            F.round(
                (
                    F.col("r3")
                    - (F.col("r1") - F.col("phi22") * F.col("r1")) * F.col("r2")
                    - F.col("phi22") * F.col("r1")
                )
                / (
                    F.lit(1)
                    - (F.col("r1") - F.col("phi22") * F.col("r1")) * F.col("r1")
                    - F.col("phi22") * F.col("r2")
                ),
                6,
            ).alias("pacf3"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# Round-7 wave: causality / chain dynamics / cardinality sketches
# =====================================================================

@query(
    "granger_lag1_events",
    """
    WITH days AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS xv,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yv
      FROM events GROUP BY CAST(ts AS DATE)
    ), idx AS (
      SELECT xv, yv, ROW_NUMBER() OVER (ORDER BY d) AS t FROM days
    ), tri AS (
      SELECT a.yv AS w, b.yv AS u, b.xv AS v
      FROM idx a JOIN idx b ON b.t = a.t - 1
    ), m AS (
      SELECT COUNT(*) AS n, SUM(u) AS su, SUM(v) AS sv, SUM(w) AS sw,
             SUM(u * u) AS suu, SUM(v * v) AS svv, SUM(u * v) AS suv,
             SUM(u * w) AS suw, SUM(v * w) AS svw, SUM(w * w) AS sww
      FROM tri
    ), c AS (
      SELECT n,
             suu - CAST(su AS DOUBLE) * su / n AS cuu,
             svv - CAST(sv AS DOUBLE) * sv / n AS cvv,
             suv - CAST(su AS DOUBLE) * sv / n AS cuv,
             suw - CAST(su AS DOUBLE) * sw / n AS cuw,
             svw - CAST(sv AS DOUBLE) * sw / n AS cvw,
             sww - CAST(sw AS DOUBLE) * sw / n AS cww
      FROM m
    ), fit AS (
      SELECT n,
             (cvv * cuw - cuv * cvw) / (cuu * cvv - cuv * cuv) AS b_y,
             (cuu * cvw - cuv * cuw) / (cuu * cvv - cuv * cuv) AS c_x,
             cww - ((cvv * cuw - cuv * cvw) / (cuu * cvv - cuv * cuv)) * cuw
                 - ((cuu * cvw - cuv * cuw) / (cuu * cvv - cuv * cuv)) * cvw
               AS rss_full,
             cww - cuw * cuw / cuu AS rss_restricted
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(b_y, 6) AS beta_y_lag, ROUND(c_x, 6) AS beta_x_lag,
           ROUND(rss_restricted, 6) AS rss_restricted,
           ROUND(rss_full, 6) AS rss_full,
           ROUND((rss_restricted - rss_full) / (rss_full / (n - 3)), 6)
             AS f_stat
    FROM fit
    """,
)
def granger_q(spark, sf_dir):
    """Granger-style lag-1 test: do yesterday's VIEW counts help
    predict today's PURCHASE counts beyond yesterday's purchases?
    Full model y_t = a + b·y_{t−1} + c·x_{t−1} vs restricted
    y_t = a + b·y_{t−1}, both solved in closed form from centered
    moments (2-regressor normal equations — determinant algebra, no
    iterative solver), F = ((RSS_r − RSS_f)/1)/(RSS_f/(n−3)).  Every
    moment is an exact integer sum over the bounded daily frame; the
    lag join is a self-join on the day index — O(days), one shuffle."""
    e = load_table(spark, sf_dir, "events")
    days = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "xv"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("yv"),
    )
    idx = days.select(
        "xv", "yv", F.row_number().over(Window.orderBy("d")).alias("t")
    )
    a, b = idx.alias("a"), idx.alias("b")
    tri = a.join(b, F.col("b.t") == F.col("a.t") - 1).select(
        F.col("a.yv").alias("w"),
        F.col("b.yv").alias("u"),
        F.col("b.xv").alias("v"),
    )
    m = tri.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum("w").alias("sw"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("u") * F.col("w")).alias("suw"),
        F.sum(F.col("v") * F.col("w")).alias("svw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    n = F.col("n")
    c = m.select(
        "n",
        (F.col("suu") - F.col("su").cast("double") * F.col("su") / n).alias(
            "cuu"
        ),
        (F.col("svv") - F.col("sv").cast("double") * F.col("sv") / n).alias(
            "cvv"
        ),
        (F.col("suv") - F.col("su").cast("double") * F.col("sv") / n).alias(
            "cuv"
        ),
        (F.col("suw") - F.col("su").cast("double") * F.col("sw") / n).alias(
            "cuw"
        ),
        (F.col("svw") - F.col("sv").cast("double") * F.col("sw") / n).alias(
            "cvw"
        ),
        (F.col("sww") - F.col("sw").cast("double") * F.col("sw") / n).alias(
            "cww"
        ),
    )
    det = F.col("cuu") * F.col("cvv") - F.col("cuv") * F.col("cuv")
    b_y = (F.col("cvv") * F.col("cuw") - F.col("cuv") * F.col("cvw")) / det
    c_x = (F.col("cuu") * F.col("cvw") - F.col("cuv") * F.col("cuw")) / det
    rss_full = F.col("cww") - b_y * F.col("cuw") - c_x * F.col("cvw")
    rss_r = F.col("cww") - F.col("cuw") * F.col("cuw") / F.col("cuu")
    return c.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(b_y, 6).alias("beta_y_lag"),
        F.round(c_x, 6).alias("beta_x_lag"),
        F.round(rss_r, 6).alias("rss_restricted"),
        F.round(rss_full, 6).alias("rss_full"),
        F.round((rss_r - rss_full) / (rss_full / (F.col("n") - 3)), 6).alias(
            "f_stat"
        ),
    )


@query(
    "entropy_rate_transitions_events",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), tr AS (
      SELECT event_type AS cur, nxt, COUNT(*) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ), rowt AS (
      SELECT cur, SUM(c) AS rc FROM tr GROUP BY cur
    ), tot AS (
      SELECT SUM(c) AS n, COUNT(DISTINCT cur) AS k FROM tr
    )
    SELECT CAST(t.n AS BIGINT) AS n_transitions,
           CAST(t.k AS BIGINT) AS n_states,
           ROUND(-SUM((CAST(tr.c AS DOUBLE) / t.n)
                      * LN(CAST(tr.c AS DOUBLE) / r.rc)), 6)
             AS entropy_rate,
           ROUND(-SUM((CAST(tr.c AS DOUBLE) / t.n)
                      * LN(CAST(tr.c AS DOUBLE) / r.rc)) / LN(t.k), 6)
             AS entropy_rate_norm
    FROM tr JOIN rowt r USING (cur) CROSS JOIN tot t
    GROUP BY t.n, t.k
    """,
)
def entropy_rate_q(spark, sf_dir):
    """Entropy rate of the per-user event chain: H = −Σᵢⱼ π̂ᵢ Pᵢⱼ ln Pᵢⱼ
    with π̂ the empirical transition-source distribution — how
    predictable the NEXT action is given the current one (ln-k
    normalized to [0,1]).  One per-user LEAD window builds the
    transition stream; everything after is aggregates on the
    |states|²-bounded count grid — the transition-matrix gate's
    information-theoretic summary."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = seq.groupBy(F.col("event_type").alias("cur"), "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    rowt = tr.groupBy("cur").agg(F.sum("c").alias("rc"))
    tot = tr.agg(
        F.sum("c").alias("n"), F.countDistinct("cur").alias("k")
    )
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double") / F.col("rc")
    )
    return (
        tr.join(F.broadcast(rowt), "cur")
        .join(F.broadcast(tot), F.lit(True))
        .groupBy("n", "k")
        .agg(
            F.round(-F.sum(term), 6).alias("entropy_rate"),
            F.round(
                -F.sum(term) / F.log(F.col("k").cast("double")), 6
            ).alias("entropy_rate_norm"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_transitions"),
            F.col("k").cast("bigint").alias("n_states"),
            "entropy_rate",
            "entropy_rate_norm",
        )
    )


@query(
    "linear_counting_daily_users_events",
    """
    WITH pos AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 4096 AS p,
             user_id
      FROM events
    ), agg AS (
      SELECT d, COUNT(DISTINCT p) AS z, COUNT(DISTINCT user_id) AS exact
      FROM pos GROUP BY d
    )
    SELECT d AS day, CAST(z AS BIGINT) AS occupied,
           CAST(exact AS BIGINT) AS exact_distinct,
           CASE WHEN z >= 4096 THEN NULL
                ELSE ROUND(-4096.0 * LN((4096.0 - z) / 4096.0), 6)
           END AS lc_estimate
    FROM agg ORDER BY day
    """,
)
def linear_counting_q(spark, sf_dir):
    """Linear-counting distinct-user estimate per day: hash each user
    to one of m=4096 bitmap positions (the repo's md5-mod contract —
    hashlib/DuckDB/Spark parity proven by the sharding gates), count
    occupied positions z, estimate n̂ = −m·ln((m−z)/m).  The bitmap is
    a fixed-size MERGEABLE daily sketch (OR across partitions/days);
    the exact distinct rides along as the accuracy readout.  Saturated
    bitmaps (z = m) yield NULL — DuckDB ln(0) errors where Spark
    returns null, so the guard is explicit in BOTH engines."""
    e = load_table(spark, sf_dir, "events")
    p = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 4096
    )
    agg = e.select(F.to_date("ts").alias("d"), p.alias("p"), "user_id").groupBy(
        "d"
    ).agg(
        F.countDistinct("p").alias("z"),
        F.countDistinct("user_id").alias("exact"),
    )
    return agg.select(
        F.col("d").alias("day"),
        F.col("z").cast("bigint").alias("occupied"),
        F.col("exact").cast("bigint").alias("exact_distinct"),
        F.when(F.col("z") >= 4096, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                -4096.0 * F.log((4096.0 - F.col("z")) / 4096.0), 6
            )
        )
        .alias("lc_estimate"),
    ).orderBy("day")


@query(
    "markov_stationary_event_types",
    """
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), tr AS (
      SELECT event_type AS cur, nxt, COUNT(*) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ), rowt AS (
      SELECT cur, SUM(c) AS rc FROM tr GROUP BY cur
    ), sts AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS i
      FROM (SELECT DISTINCT event_type AS s FROM events)
    ), kk AS (SELECT COUNT(*) AS k FROM sts),
    dense AS (
      SELECT a.i AS i, b.i AS j,
             CASE WHEN r.rc IS NULL THEN 1.0 / kk.k
                  ELSE COALESCE(t.c, 0) / CAST(r.rc AS DOUBLE) END AS p
      FROM sts a CROSS JOIN sts b CROSS JOIN kk
      LEFT JOIN tr t ON t.cur = a.s AND t.nxt = b.s
      LEFT JOIN rowt r ON r.cur = a.s
    ), rows_ AS (
      SELECT i, list(p ORDER BY j) AS pr FROM dense GROUP BY i
    ), mat AS (SELECT list(pr ORDER BY i) AS M FROM rows_),
    it AS (
      SELECT 0 AS n, list_transform(range(1, k + 1), x -> 1.0 / k) AS pi
      FROM kk
      UNION ALL
      SELECT n + 1,
             list_transform(range(1, len(pi) + 1),
               j -> list_sum(list_transform(range(1, len(pi) + 1),
                      i -> pi[i] * M[i][j])))
      FROM it, mat WHERE n < 30
    )
    SELECT s.s AS event_type, ROUND(it.pi[s.i], 6) AS stationary_p
    FROM it, sts s WHERE it.n = 30 ORDER BY event_type
    """,
)
def markov_stationary_q(spark, sf_dir):
    """Stationary distribution of the per-user event-type Markov
    chain: 30 power-iteration steps π ← πP from uniform — where user
    sessions settle in the long run, the chain-level complement of
    the one-step transition-matrix gate.  The 100 TB work (the
    per-user LEAD + transition counting) is fully distributed; the
    iteration itself runs on the |states|² grid — BOUNDED BY THE
    EVENT-TYPE DIMENSION, the same class as the audited bucket-count
    collects — with dangling rows (states with no outgoing
    transitions) patched to uniform, and left-to-right accumulation
    matching the oracle's list_sum order bit-for-bit.  The DuckDB
    twin carries π as a LIST through a recursive CTE (the
    holt_winters pattern) because recursive terms cannot aggregate."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = (
        seq.groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    states = sorted(
        r["event_type"]
        for r in e.select("event_type").distinct().collect()
    )
    k = len(states)
    pos = {s: i for i, s in enumerate(states)}
    counts = [[0] * k for _ in range(k)]
    for r in tr:
        counts[pos[r["cur"]]][pos[r["nxt"]]] += r["c"]
    P = []
    for i in range(k):
        rc = sum(counts[i])
        P.append(
            [1.0 / k] * k
            if rc == 0
            else [counts[i][j] / float(rc) for j in range(k)]
        )
    pi = [1.0 / k] * k
    for _ in range(30):
        nxt = []
        for j in range(k):
            acc = 0.0
            for i in range(k):  # ascending i = the oracle's list_sum order
                acc += pi[i] * P[i][j]
            nxt.append(acc)
        pi = nxt
    return spark.createDataFrame(
        [(s, round(pi[pos[s]], 6)) for s in states],
        "event_type string, stationary_p double",
    ).orderBy("event_type")


