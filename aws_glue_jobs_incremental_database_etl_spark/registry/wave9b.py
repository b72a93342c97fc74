"""Round-9 wave (second module): distributional two-sample and
variance-homogeneity tests, ordinal association, agreement measures,
regression diagnostics, privacy/experimentation gates, lexical
richness, graph topology, and multimodal quality companions.

Registration order is preserved by the package ``__init__`` importing
the domain modules in the original file order; ``Q``/``O`` are the
shared dicts from ``._core``.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  resolves pandas_udf string annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..tables import load_table  # noqa: F401
from ._core import (  # noqa: F401
    O,
    Q,
    query,
)


# =====================================================================
# Round-9 wave 8: two-sample scale / variance tests, ordinal assoc.
# =====================================================================

@query(
    "mood_median_test_orders",
    """
    WITH obs AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ), grid AS (
      SELECT v, COUNT(*) AS c FROM obs GROUP BY v
    ), cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f,
             (SELECT SUM(c) FROM grid) AS n
      FROM grid
    ), med AS (
      SELECT MIN(v) AS m FROM cum WHERE 2 * f >= n
    ), cells AS (
      SELECT g, SUM(CASE WHEN v > m THEN 1 ELSE 0 END) AS a,
             COUNT(*) AS n_g
      FROM obs CROSS JOIN med GROUP BY g
    ), tot AS (
      SELECT SUM(a) AS ta, SUM(n_g) AS n FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           ROUND(CAST(ANY_VALUE(m) AS DOUBLE) / 100.0, 2)
             AS pooled_median,
           ROUND(SUM(
             (c.a - c.n_g * CAST(t.ta AS DOUBLE) / t.n)
               * (c.a - c.n_g * CAST(t.ta AS DOUBLE) / t.n)
               / (c.n_g * CAST(t.ta AS DOUBLE) / t.n)
             + ((c.n_g - c.a) - c.n_g * CAST(t.n - t.ta AS DOUBLE) / t.n)
               * ((c.n_g - c.a) - c.n_g * CAST(t.n - t.ta AS DOUBLE) / t.n)
               / (c.n_g * CAST(t.n - t.ta AS DOUBLE) / t.n)), 6)
             AS chi2,
           CAST(COUNT(*) - 1 AS BIGINT) AS df
    FROM cells c CROSS JOIN tot t CROSS JOIN med
    """,
)
def mood_median_q(spark, sf_dir):
    """Mood's median test of order value across the five priorities —
    the nonparametric variance-free omnibus (Kruskal–Wallis compares
    mean ranks and needs the full rank grid; Mood's test needs ONE
    scalar — the pooled median — then a 2×k contingency chi-square,
    making it the cheapest k-sample location screen at 100 TB: one
    cents-histogram pass for the median, one hash-agg for the cells).
    Pooled lower median from the cumulative cents grid (smallest v
    with 2·F(v) ≥ N, exact integers); χ² = Σ(O−E)²/E over the
    above/≤ × priority cells."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    grid = obs.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_tot = grid.agg(F.sum("c").alias("n"))
    cum = grid.select(
        "v", F.sum("c").over(wv).alias("f")
    ).join(F.broadcast(n_tot), F.lit(True))
    med = cum.filter(2 * F.col("f") >= F.col("n")).agg(
        F.min("v").alias("m")
    )
    cells = obs.join(F.broadcast(med), F.lit(True)).groupBy("g").agg(
        F.sum(F.when(F.col("v") > F.col("m"), 1).otherwise(0)).alias("a"),
        F.count(F.lit(1)).alias("n_g"),
        F.first("m").alias("m"),
    )
    tot = cells.agg(F.sum("a").alias("ta"), F.sum("n_g").alias("n"))
    ea = F.col("n_g") * F.col("ta").cast("double") / F.col("n")
    eb = F.col("n_g") * (F.col("n") - F.col("ta")).cast("double") / F.col("n")
    term = (
        (F.col("a") - ea) * (F.col("a") - ea) / ea
        + ((F.col("n_g") - F.col("a")) - eb)
        * ((F.col("n_g") - F.col("a")) - eb)
        / eb
    )
    return (
        cells.join(F.broadcast(tot), F.lit(True))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.round(F.first("m").cast("double") / 100.0, 2).alias(
                "pooled_median"
            ),
            F.round(F.sum(term), 6).alias("chi2"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("df"),
        )
    )


@query(
    "bartlett_variance_orders",
    """
    WITH cells AS (
      SELECT o_orderpriority AS g, COUNT(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s,
             SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS ss
      FROM orders GROUP BY o_orderpriority
    ), vcells AS (
      SELECT g, n,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
               AS s2
      FROM cells
    ), agg AS (
      SELECT COUNT(*) AS k, SUM(n) AS bign,
             SUM((n - 1) * s2) AS ssw,
             SUM((n - 1) * LN(s2)) AS slog,
             SUM(1.0 / (n - 1)) AS sinv
      FROM vcells
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           ROUND(((bign - k) * LN(ssw / (bign - k)) - slog)
                 / (1 + (sinv - 1.0 / (bign - k)) / (3.0 * (k - 1))), 6)
             AS bartlett_t,
           CAST(k - 1 AS BIGINT) AS df
    FROM agg
    """,
)
def bartlett_q(spark, sf_dir):
    """Bartlett's test of variance homogeneity across order
    priorities — the likelihood-ratio companion to Brown–Forsythe
    (B–F is robust to non-normality; Bartlett is the most powerful
    under normality, so running both brackets the heterogeneity
    call): T = ((N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(sᵢ²)) / C with Bartlett's
    correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).  The corpus
    reduces to k=5 exact integer-cents moment cells (the log terms
    are unit-invariant because the cents² constants cancel between
    the pooled and per-group logs); everything after is k-row scalar
    math — one hash-agg at any scale."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cells = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("ss"),
    )
    vcells = cells.select(
        "n",
        (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("s2"),
    )
    agg = vcells.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("bign"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("ssw"),
        F.sum((F.col("n") - 1) * F.log(F.col("s2"))).alias("slog"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sinv"),
    )
    nk = F.col("bign") - F.col("k")
    return agg.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.round(
            (nk * F.log(F.col("ssw") / nk) - F.col("slog"))
            / (
                1
                + (F.col("sinv") - 1.0 / nk) / (3.0 * (F.col("k") - 1))
            ),
            6,
        ).alias("bartlett_t"),
        (F.col("k") - 1).cast("bigint").alias("df"),
    )


@query(
    "energy_distance_drift_orders",
    """
    WITH obs AS (
      SELECT o_orderstatus AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), hist AS (
      SELECT v,
             SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS c2
      FROM obs GROUP BY v
    ), tot AS (
      SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM hist
    ), cum AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2,
             LEAD(v) OVER (ORDER BY v) AS nv
      FROM hist
    )
    SELECT CAST(ANY_VALUE(t.n1) AS BIGINT) AS n_f,
           CAST(ANY_VALUE(t.n2) AS BIGINT) AS n_o,
           ROUND(2.0 * SUM(
             (CAST(c.f1 AS DOUBLE) / t.n1 - CAST(c.f2 AS DOUBLE) / t.n2)
             * (CAST(c.f1 AS DOUBLE) / t.n1 - CAST(c.f2 AS DOUBLE) / t.n2)
             * (c.nv - c.v)) / 100.0, 6) AS energy_dist
    FROM cum c CROSS JOIN tot t WHERE c.nv IS NOT NULL
    """,
)
def energy_distance_q(spark, sf_dir):
    """1-D energy distance between finished and open order price
    distributions — completing the drift ladder's metric corner
    (KS = max CDF gap, W₁ = ∫|F−G|, CvM = Σ(F−G)² at data points;
    energy distance = 2∫(F−G)²dv is the 1-D case of Székely's
    E-statistic 2E|X−Y|−E|X−X'|−E|Y−Y'|, the only one of the four
    that generalizes to embeddings unchanged).  Same quantized-cents
    histogram + one cumulative window as the Wasserstein gate; the
    squared-gap segments integrate in dollars (÷100).  At 100 TB the
    grid is bounded by the price domain, not row count — events
    contribute only histogram cell deltas."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    obs = o.select(
        F.col("o_orderstatus").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    hist = obs.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("c2"),
    )
    tot = hist.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        F.sum("c1").over(wv).alias("f1"),
        F.sum("c2").over(wv).alias("f2"),
        F.lead("v").over(Window.orderBy("v")).alias("nv"),
    )
    gap = (
        F.col("f1").cast("double") / F.col("n1")
        - F.col("f2").cast("double") / F.col("n2")
    )
    return (
        cum.filter(F.col("nv").isNotNull())
        .join(F.broadcast(tot), F.lit(True))
        .agg(
            F.first("n1").cast("bigint").alias("n_f"),
            F.first("n2").cast("bigint").alias("n_o"),
            F.round(
                2.0
                * F.sum(gap * gap * (F.col("nv") - F.col("v")))
                / 100.0,
                6,
            ).alias("energy_dist"),
        )
    )


@query(
    "goodman_kruskal_gamma_orders",
    """
    WITH obs AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS p,
             LEAST(3, CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        // 15000000) AS b
      FROM orders
    ), grid AS (
      SELECT p, b, COUNT(*) AS n FROM obs GROUP BY p, b
    ), pairs AS (
      SELECT SUM(CASE WHEN x.b < y.b
                      THEN CAST(x.n AS HUGEINT) * y.n ELSE 0 END) AS conc,
             SUM(CASE WHEN x.b > y.b
                      THEN CAST(x.n AS HUGEINT) * y.n ELSE 0 END) AS disc
      FROM grid x JOIN grid y ON x.p < y.p
    )
    SELECT CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           ROUND(CAST(conc - disc AS DOUBLE) / (conc + disc), 6)
             AS gamma
    FROM pairs
    """,
)
def gk_gamma_q(spark, sf_dir):
    """Goodman–Kruskal gamma between order priority (1-URGENT …
    5-LOW) and a four-band price ordinal — the ordinal-×-ordinal
    association measure that ignores ties entirely (Kendall's τ-b
    penalizes them; γ = (C−D)/(C+D) answers "of the pairs that
    disagree on both axes, what share move together?").  The corpus
    reduces to a 5×4 contingency grid; concordant/discordant pairs
    are the bounded 20×20 grid self-join with exact integer products
    (decimal-widened — at 10⁹ rows per cell the product needs 128
    bits), so the cost at 100 TB is one hash-agg."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("p"),
        F.least(
            F.lit(3),
            (
                F.round(F.col("o_totalprice") * 100).cast("bigint")
                / F.lit(15000000)
            ).cast("bigint"),
        ).alias("b"),
    )
    grid = obs.groupBy("p", "b").agg(F.count(F.lit(1)).alias("n"))
    x = grid.select(
        F.col("p").alias("xp"),
        F.col("b").alias("xb"),
        F.col("n").cast("decimal(19,0)").alias("xn"),
    )
    y = grid.select(
        F.col("p").alias("yp"),
        F.col("b").alias("yb"),
        F.col("n").cast("decimal(19,0)").alias("yn"),
    )
    pairs = x.join(F.broadcast(y), F.col("xp") < F.col("yp")).agg(
        F.sum(
            F.when(
                F.col("xb") < F.col("yb"), F.col("xn") * F.col("yn")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("conc"),
        F.sum(
            F.when(
                F.col("xb") > F.col("yb"), F.col("xn") * F.col("yn")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("disc"),
    )
    return pairs.select(
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / (F.col("conc") + F.col("disc")).cast("double"),
            6,
        ).alias("gamma"),
    )
