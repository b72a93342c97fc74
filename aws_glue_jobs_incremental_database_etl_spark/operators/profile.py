"""Column profiling: per-column stats for data-quality gating.

An incremental ETL pipeline (reference scope: blind pass-through of
whatever the JDBC source ships, ``jdbc_incremental.py:199-208``)
needs a cheap profile of each batch before publishing: null explosions,
distinct-count collapses, and range drift are the standard signals a
replication bug upstream has corrupted a table.

One aggregate pass produces every column's stats simultaneously (one
wide row → ``inline`` unpivot to one row per column) — never one job
per column.  Scale note: multiple exact ``COUNT(DISTINCT col)``
aggregates expand the input ×k columns before the shuffle (Spark's
Expand operator); at 100 TB profile with ``exact_distinct=False`` —
``approx_count_distinct`` is a plain (non-distinct) HLL aggregate, so
the Expand disappears and the pass stays map-side-partial.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def column_checksums(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    buckets: int = 1 << 32,
) -> DataFrame:
    """Order-independent per-column checksums for replication
    validation: one row ``(col_name, n_rows, checksum)`` per column,
    where ``checksum = Σ md5-int64(value string)`` (nulls hash a
    sentinel).

    The md5 contract makes the digest ENGINE-PORTABLE: any system that
    can md5 strings computes the identical number, so source-database
    and lake-target checksums can be compared without moving data —
    the end-to-end "did replication corrupt anything" test.  Sums are
    commutative, so row order, partitioning, and parallelism never
    change the result.  One aggregate pass, map-side partial.
    """
    cols = list(columns or df.columns)

    def digest(c: str) -> F.Column:
        s = F.coalesce(F.col(c).cast("string"), F.lit("∅null∅"))
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")

    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(digest(c)).alias(f"{c}__sum") for c in cols
    ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"), F.col(f"{c}__sum").alias("checksum")
            )
            for c in cols
        ]
    )
    return wide.select("n_rows", F.inline(rows)).select(
        "col_name", "n_rows", "checksum"
    )


def zscore_outliers(
    df: DataFrame, col: str, threshold: float = 3.0
) -> DataFrame:
    """Flag rows whose ``col`` deviates more than ``threshold``
    population standard deviations from the mean: adds ``zscore``
    (rounded to 6) and keeps only the outliers.

    Two passes by necessity (mean/stddev are corpus facts), both cheap:
    a 1-row aggregate broadcast back via cross join, then a map-only
    filter — no window over the whole table."""
    stats = df.agg(
        F.avg(F.col(col)).alias("_mu"), F.stddev_pop(F.col(col)).alias("_sigma")
    )
    z = (F.col(col) - F.col("_mu")) / F.col("_sigma")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zscore", F.round(z, 6))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("_mu", "_sigma")
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram: ``(bin, bin_lo, bin_hi, n)`` for the
    non-empty bins of ``col``.

    With explicit ``lo``/``hi`` this is ONE map-side-partial
    aggregation pass (the production shape: bounds come from a prior
    profile or domain knowledge).  Without them a min/max pre-pass
    runs first — two scans, still no extra shuffle.  Values at ``hi``
    land in the last bin; out-of-range rows are dropped (count them
    upstream if that matters).  All arithmetic is plain double
    expressions, so any engine reproduces the exact bin edges.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
        ).first()
        lo = lo if lo is not None else row[0]
        hi = hi if hi is not None else row[1]
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(bins))
    x = F.col(col).cast("double")
    b = F.least(
        F.lit(bins - 1), F.floor((x - F.lit(float(lo))) / width)
    ).cast("bigint")
    return (
        df.filter((x >= float(lo)) & (x <= float(hi)))
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(float(lo)) + F.col("bin") * width).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * width).alias("bin_hi"),
            "n",
        )
    )


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact_distinct: bool = True,
    numeric_decimals: int | None = None,
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val)``, one row per column, one pass over ``df``.

    ``min_val``/``max_val`` are computed on the native type (NOT
    lexicographically) and rendered as strings for a uniform schema.
    ``numeric_decimals`` renders float/double extrema via
    ``decimal(18, n)`` so the string form is engine-portable.
    """
    cols = list(columns or df.columns)
    types = dict(df.dtypes)

    def _render(c: str, agg) -> F.Column:
        if numeric_decimals is not None and types[c] in ("float", "double"):
            agg = agg.cast(f"decimal(18,{numeric_decimals})")
        return agg.cast("string")

    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    # Two single-row aggregates instead of one, deliberately.  A string
    # min/max has an immutable agg buffer, which knocks the whole
    # aggregate off HashAggregate onto SortAggregate; combined with the
    # COUNT-DISTINCT Expand that meant fully sorting cols+1 copies of
    # the table twice (measured 2.9 s steady-state on 150 k rows).
    # Split, the distinct pass keeps pure-count buffers (Expand +
    # HashAggregate, no sort) and the stats pass is a global aggregate
    # with no grouping keys (SortAggregate degenerates to a single
    # fold, no Sort node).  The extra column-pruned scan is far cheaper
    # than sorting the expanded table at any scale.
    stats_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        stats_aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            _render(c, F.min(F.col(c))).alias(f"{c}__min"),
            _render(c, F.max(F.col(c))).alias(f"{c}__max"),
        ]
    dist_aggs = [distinct(F.col(c)).alias(f"{c}__distinct") for c in cols]
    wide = df.agg(*stats_aggs).crossJoin(df.agg(*dist_aggs))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select("n_rows", F.inline(rows)).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    relative_error: float = 1e-4,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row a quantile bucket 1..n by VALUE thresholds —
    the 100 TB companion to an exact global NTILE: ``approxQuantile``
    (Greenwald-Khanna sketch, one pass, mergeable partials) computes
    the n−1 cut points, then bucketing is a map-only CASE — no
    single-partition global sort anywhere.

    Differs from NTILE exactly where it should: rows with EQUAL values
    land in the SAME bucket (value semantics), where NTILE splits ties
    across buckets to force equal counts.  Bucket sizes are therefore
    approximately n-tiles, exact only when values at the cut points
    are distinct.  NULL values get bucket NULL.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(col, probs, relative_error)
    bucket = F.lit(1)
    for t in cuts:
        bucket = bucket + F.when(F.col(col) > t, 1).otherwise(0)
    return df.withColumn(
        bucket_col, F.when(F.col(col).isNotNull(), bucket)
    )


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    value_col: str,
    id_col: str,
    coarse_buckets: int = 32,
    bucket_col: str = "bucket",
    cuts: list | None = None,
) -> DataFrame:
    """EXACT global ``NTILE(n) OVER (ORDER BY value, id)`` without the
    single-partition sort a bare unpartitioned Window plans.

    ``cuts`` lets callers reuse one approxQuantile sketch across
    several rankings of the same frame (placement only — exactness
    never depends on it).

    Two-level rank construction (the classic distributed total-order
    ranking):

    1. coarse range keys from ``approxQuantile`` cut points — the
       sketch is a PLACEMENT heuristic only (balances the local
       sorts); exactness never depends on its accuracy;
    2. ``row_number`` within each coarse bucket — the only shuffle,
       keyed on ~``coarse_buckets`` values, each partition a bounded
       local sort (spillable);
    3. coarse-bucket counts to the driver (≤ ``coarse_buckets``
       scalars — bounded by construction) → cumulative offsets as a
       literal map; ``global_rank = offset[coarse] + local_rank``;
    4. the SQL NTILE formula from global rank and total count, in
       long arithmetic (``div``), never double division.

    Matches ``NTILE`` bit-for-bit: ties on ``value`` are split across
    tiles by ``id`` order, the first ``total mod n`` tiles get the
    extra row.  ``value_col`` must be non-null (filter or coalesce
    first); equal values sharing a cut point stay in one coarse bucket
    so the concatenated order is the true total order.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    from pyspark.sql.window import Window

    if cuts is None:
        probs = [i / coarse_buckets for i in range(1, coarse_buckets)]
        cuts = df.approxQuantile(value_col, probs, 1e-3)
    coarse = F.lit(0)
    for t in cuts:
        coarse = coarse + F.when(F.col(value_col) > t, 1).otherwise(0)
    ranked = df.withColumn("_pb", coarse).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_pb").orderBy(
                F.col(value_col).asc(), F.col(id_col).asc()
            )
        ),
    )
    sizes = dict(
        ranked.groupBy("_pb").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    total = sum(sizes.values())
    offsets, acc = {}, 0
    for pb in sorted(sizes):
        offsets[pb] = acc
        acc += sizes[pb]
    if total == 0:
        return df.withColumn(bucket_col, F.lit(None).cast("int"))
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("_pb"),
    )
    grank = (off + F.col("_rn")).cast("long")
    base, rem = total // n_tiles, total % n_tiles
    threshold = (base + 1) * rem
    big, small = base + 1, max(base, 1)
    # long-exact ceil division via (a + b - 1) div b
    return (
        ranked.withColumn("_grank", grank)
        .withColumn(
            bucket_col,
            F.when(
                F.col("_grank") <= F.lit(threshold),
                F.expr(f"(_grank + {big - 1}) div {big}"),
            )
            .otherwise(
                F.lit(rem)
                + F.expr(f"(_grank - {threshold} + {small - 1}) div {small}")
            )
            .cast("int"),
        )
        .drop("_pb", "_rn", "_grank")
    )


def exact_global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    rank_col: str = "rank",
    coarse_buckets: int = 32,
) -> DataFrame:
    """EXACT global ``ROW_NUMBER() OVER (ORDER BY value, id)`` without
    a single-partition sort — steps 1–3 of :func:`exact_ntile`'s
    two-level construction exposed as a reusable ranking primitive
    (coarse range placement from an approxQuantile sketch, per-bucket
    local sorts, ≤``coarse_buckets`` driver-side offsets).  Exactness
    never depends on the sketch; ``value_col`` must be non-null."""
    from pyspark.sql.window import Window

    probs = [i / coarse_buckets for i in range(1, coarse_buckets)]
    cuts = df.approxQuantile(value_col, probs, 1e-3)
    coarse = F.lit(0)
    for t in cuts:
        coarse = coarse + F.when(F.col(value_col) > t, 1).otherwise(0)
    ranked = df.withColumn("_pb", coarse).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_pb").orderBy(
                F.col(value_col).asc(), F.col(id_col).asc()
            )
        ),
    )
    sizes = dict(
        ranked.groupBy("_pb").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for pb in sorted(sizes):
        offsets[pb] = acc
        acc += sizes[pb]
    if not sizes:
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("_pb"),
    )
    return ranked.withColumn(
        rank_col, (off + F.col("_rn")).cast("long")
    ).drop("_pb", "_rn")


def exact_ntile_grouped(
    df: DataFrame,
    n_tiles: int,
    value_col: str,
    id_col: str,
    group_col: str,
    coarse_buckets: int = 32,
    bucket_col: str = "bucket",
    max_groups: int = 10_000,
    cuts: list | None = None,
) -> DataFrame:
    """EXACT ``NTILE(n) OVER (PARTITION BY group ORDER BY value, id)``
    with the same two-level distributed-rank construction as
    :func:`exact_ntile` — per-group totals instead of one global
    total, so no group's rows ever funnel through a single-partition
    sort.

    The coarse cut points stay GLOBAL (placement only — exactness
    never depends on them); ranking windows key on ``(group, coarse
    bucket)``; the driver collects ``groups × coarse_buckets`` counts
    (bounded: raises if the group count exceeds ``max_groups`` —
    grouped NTILE over an unbounded key domain is a different
    problem, use a hash-bucket contract instead).  Offsets and the
    NTILE arithmetic ride literal maps keyed by group; all tile math
    is long-exact ``div``, never double division."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    from pyspark.sql.window import Window

    if cuts is None:
        probs = [i / coarse_buckets for i in range(1, coarse_buckets)]
        cuts = df.approxQuantile(value_col, probs, 1e-3)
    coarse = F.lit(0)
    for t in cuts:
        coarse = coarse + F.when(F.col(value_col) > t, 1).otherwise(0)
    ranked = df.withColumn("_pb", coarse).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(group_col, "_pb").orderBy(
                F.col(value_col).asc(), F.col(id_col).asc()
            )
        ),
    )
    counts = (
        ranked.groupBy(group_col, "_pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    groups = {r[group_col] for r in counts}
    if len(groups) > max_groups:
        raise ValueError(
            f"{len(groups)} groups exceeds max_groups={max_groups}: "
            "grouped exact NTILE collects groups x coarse_buckets "
            "offsets to the driver and is only bounded for a bounded "
            "group domain"
        )
    sizes: dict = {}
    for r in counts:
        sizes.setdefault(r[group_col], {})[r["_pb"]] = r["c"]
    off_entries, tot_entries = [], []
    for g, per in sizes.items():
        acc = 0
        for pb in sorted(per):
            off_entries += [
                F.lit(f"{g}#{pb}"),
                F.lit(acc).cast("long"),
            ]
            acc += per[pb]
        tot_entries += [F.lit(str(g)), F.lit(acc).cast("long")]
    if not tot_entries:
        return df.withColumn(bucket_col, F.lit(None).cast("int"))
    off = F.element_at(
        F.create_map(*off_entries),
        F.concat_ws("#", F.col(group_col).cast("string"), F.col("_pb")),
    )
    total = F.element_at(
        F.create_map(*tot_entries), F.col(group_col).cast("string")
    )
    grank = (off + F.col("_rn")).cast("long")
    base = F.expr(f"_tot div {n_tiles}")
    rem = F.col("_tot") % n_tiles
    big = base + 1
    small = F.greatest(base, F.lit(1).cast("long"))
    threshold = big * rem
    return (
        ranked.withColumn("_tot", total)
        .withColumn("_grank", grank)
        .withColumn(
            bucket_col,
            F.when(
                F.col("_grank") <= threshold,
                F.expr(
                    f"(_grank + (_tot div {n_tiles})) div"
                    f" ((_tot div {n_tiles}) + 1)"
                ),
            )
            .otherwise(
                (
                    rem
                    + F.expr(
                        f"(_grank - ((_tot div {n_tiles}) + 1)"
                        f" * (_tot % {n_tiles})"
                        f" + greatest(_tot div {n_tiles}, 1) - 1)"
                        f" div greatest(_tot div {n_tiles}, 1)"
                    )
                )
            )
            .cast("int"),
        )
        .drop("_pb", "_rn", "_grank", "_tot")
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total —
    ``(group, w_median, total_weight)``.

    One shuffle on the group key + one in-partition sort; the
    qualifying-prefix trick (filter ``2·cumw ≥ total`` then take the
    group min) avoids any per-group collect or second pass.  Weights
    accumulate as longs, so the cut is integer-exact — no float-fold
    ambiguity at the boundary; ``tiebreak_col`` totalizes the order
    when values repeat.
    """
    g, v = F.col(group_col), F.col(value_col)
    wt = F.col(weight_col).cast("long")
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(v.asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    staged = df.select(
        g.alias("g"), v.alias("v"),
        F.sum(wt).over(w_cum).alias("_cumw"),
        F.sum(wt).over(w_all).alias("_tot"),
    )
    return (
        staged.filter(2 * F.col("_cumw") >= F.col("_tot"))
        .groupBy("g")
        .agg(
            F.min("v").alias("w_median"),
            F.first("_tot").alias("total_weight"),
        )
        .withColumnRenamed("g", group_col)
    )


def deterministic_mode(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group mode with a total tie order (highest count, then
    smallest value) — ``(group, mode_value, mode_count)``.  SQL's
    ``mode()`` is free to break count ties arbitrarily, which makes it
    unusable for reproducible pipelines; this one is a pure two-level
    aggregate (count per (group, value) → argmax per group), two
    partial-aggregated shuffles, deterministic everywhere.
    """
    counted = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    # a (count desc, value asc) mixed-direction argmax has no generic
    # max_by(struct) encoding, so rank the (group, value) counts —
    # the window input is already aggregated, one row per value
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("v").asc())
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias("mode_value"),
            F.col("c").alias("mode_count"),
        )
    )


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized mean per group: values clipped to the group's exact
    [lo, hi] percentiles before averaging — the outlier-robust
    location estimate feature pipelines use when trimming would bias
    small groups: ``(group, lo_cut, hi_cut, w_mean, n)``.

    Percentiles are Spark's exact interpolated ``percentile`` (the
    type-7 convention DuckDB's ``quantile_cont`` shares), computed in
    one per-group aggregate; cuts join back broadcast (group
    cardinality ≪ rows) and the clip is a map-only ``greatest/
    least``.  Two shuffles total, both partial-aggregated.  At 100 TB
    swap the exact percentile for ``approx_percentile`` and keep the
    rest of the plan unchanged — the clip/avg shape is identical.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    g, v = F.col(group_col), F.col(value_col)
    cuts = df.groupBy(g.alias("_wg")).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_lo_cut"),
        F.expr(f"percentile({value_col}, {hi})").alias("_hi_cut"),
    )
    clipped = df.join(
        F.broadcast(cuts), df[group_col] == cuts["_wg"]
    ).select(
        "_wg",
        "_lo_cut",
        "_hi_cut",
        F.greatest(F.least(v, F.col("_hi_cut")), F.col("_lo_cut")).alias("_cv"),
    )
    return (
        clipped.groupBy("_wg")
        .agg(
            F.round(F.first("_lo_cut"), 6).alias("lo_cut"),
            F.round(F.first("_hi_cut"), 6).alias("hi_cut"),
            F.round(F.avg("_cv"), 4).alias("w_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumnRenamed("_wg", group_col)
    )


def minmax_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "v_norm",
) -> DataFrame:
    """Per-group min-max feature scaling: ``(v − min) / (max − min)``
    appended as ``out_col`` (0.5 for degenerate single-value groups).
    One unordered window over the group — a single shuffle, no join,
    original columns preserved."""
    w = Window.partitionBy(group_col)
    mn = F.min(value_col).over(w)
    mx = F.max(value_col).over(w)
    norm = F.when(mx > mn, (F.col(value_col) - mn) / (mx - mn)).otherwise(0.5)
    return df.withColumn(out_col, F.round(norm, 6))


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Fixed-bin histogram sketch → ``(bin, cnt)`` over a literal
    value range — the MERGEABLE quantile state (the fixed-grid cousin
    of t-digest/KLL): bin counts from different partitions, batches,
    or days simply ADD, so incremental and streaming percentile
    maintenance is a cell-wise sum, never a re-scan (same
    mergeability contract as ``functions.bloom``/``functions.cms``,
    property-tested the same way).

    Values are clamped into the edge bins (no out-of-range loss);
    NULLs are dropped.  One partial-aggregated group-by over ≤
    ``bins`` keys — map-side combine makes the shuffle O(bins) per
    task regardless of row count.  ``bins`` trades memory for
    quantile resolution: the estimate's max error is one bin width.
    """
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(clamped.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches: cell-wise count sum (the operation
    that makes per-slice builds ≡ the whole-corpus build)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def sketch_quantiles(
    sketch: DataFrame,
    probs: list[float],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram sketch → ``(prob, quantile,
    n_rows)``: walk the cumulative bin counts to the bin containing
    ``p·n`` and interpolate linearly inside it (max error = one bin
    width).  The cumulative window runs over ≤ ``bins`` rows — bounded
    by construction, never by data volume; the probs list is a literal
    explode.  Exact integer cumulative counts make the interpolation
    arithmetic engine-reproducible."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    for p in probs:
        if not 0.0 < p < 1.0:
            raise ValueError(f"probs must be in (0,1), got {p}")
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = sketch.select(
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    tot = sketch.agg(F.sum("cnt").cast("bigint").alias("n_rows"))
    pl = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("prob")
    targets = tot.select(pl, "n_rows").withColumn(
        "target", F.col("prob") * F.col("n_rows")
    )
    # the containing bin: first bin whose cumulative count reaches the
    # target — min(bin) over qualifying bins, a ≤bins×probs join
    hit = (
        targets.join(
            cum,
            (F.col("cum_before") < F.col("target"))
            & (F.col("cum_before") + F.col("cnt") >= F.col("target")),
            "left",
        )
        .groupBy("prob", "n_rows", "target")
        .agg(
            F.min(F.struct("bin", "cnt", "cum_before")).alias("_b")
        )
    )
    q = (
        F.lit(lo)
        + (
            F.col("_b.bin")
            + (F.col("target") - F.col("_b.cum_before")) / F.col("_b.cnt")
        )
        * F.lit(width)
    )
    return hit.select(
        "prob",
        F.round(
            F.when(F.col("_b").isNull(), F.lit(lo)).otherwise(q), 6
        ).alias("quantile"),
        "n_rows",
    )


def grouped_histogram_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Per-group histogram sketch → ``(group, bin, cnt)`` — the keyed
    variant of :func:`histogram_sketch`: one partial-aggregated
    group-by over ``groups × bins`` keys, counts still merge by
    cell-wise sum, so per-key streaming percentile maintenance costs
    ≤ ``groups·bins`` rows of state."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("group"), clamped.alias("bin"))
        .groupBy("group", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def grouped_sketch_quantiles(
    sketch: DataFrame,
    probs: list[float],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Per-group quantiles from a grouped sketch → ``(group, prob,
    quantile, n_rows)``: the cumulative walk runs under a window
    PARTITIONED on group (≤ ``bins`` rows per partition — bounded by
    construction), then the same exact-integer interpolation as
    :func:`sketch_quantiles`."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    for p in probs:
        if not 0.0 < p < 1.0:
            raise ValueError(f"probs must be in (0,1), got {p}")
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = (
        Window.partitionBy("group")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = sketch.select(
        "group",
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    tot = sketch.groupBy("group").agg(
        F.sum("cnt").cast("bigint").alias("n_rows")
    )
    targets = (
        tot.select(
            "group",
            "n_rows",
            F.explode(
                F.array(*[F.lit(float(p)) for p in probs])
            ).alias("prob"),
        )
        .withColumn("target", F.col("prob") * F.col("n_rows"))
    )
    hit = targets.join(
        cum,
        (targets.group == cum.group)
        & (F.col("cum_before") < F.col("target"))
        & (F.col("cum_before") + F.col("cnt") >= F.col("target")),
    ).select(
        targets.group.alias("group"),
        "prob",
        "n_rows",
        "target",
        "bin",
        "cnt",
        "cum_before",
    )
    q = (
        F.lit(lo)
        + (
            F.col("bin")
            + (F.col("target") - F.col("cum_before")) / F.col("cnt")
        )
        * F.lit(width)
    )
    return hit.select(
        "group", "prob", F.round(q, 6).alias("quantile"), "n_rows"
    )


def experiment_daily_moments(events: DataFrame) -> DataFrame:
    """Day-level moment deltas for the group-sequential experiment
    monitor (registry ``group_sequential_monitor_events`` and its
    streaming twin): per calendar day, the treatment/control
    (user_id parity) row counts, ×1e4-integer value sums, and
    HUGEINT/decimal-widened squared sums.  These six exact integers
    per day are the ONLY state the monitor needs — they fold
    additively across batches (sum per day), which is what makes the
    streaming twin exactly-once-mergeable."""
    cells = events.select(
        F.to_date("ts").alias("d"),
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
    )
    t = F.col("grp") == 1
    c = F.col("grp") == 0
    vv = F.col("v").cast("decimal(38,0)") * F.col("v")
    return cells.groupBy("d").agg(
        F.count(F.when(t, F.lit(1))).alias("nt_d"),
        F.count(F.when(c, F.lit(1))).alias("nc_d"),
        F.coalesce(F.sum(F.when(t, F.col("v"))), F.lit(0)).alias("st_d"),
        F.coalesce(F.sum(F.when(c, F.col("v"))), F.lit(0)).alias("sc_d"),
        F.coalesce(
            F.sum(F.when(t, vv)), F.lit(0).cast("decimal(38,0)")
        ).alias("qt_d"),
        F.coalesce(
            F.sum(F.when(c, vv)), F.lit(0).cast("decimal(38,0)")
        ).alias("qc_d"),
    )


def merge_daily_moments(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive fold of two day-level moment frames (same schema as
    :func:`experiment_daily_moments`) — exact integer sums per day,
    so fold order and batch boundaries cannot change the result."""
    return (
        prev.unionByName(delta)
        .groupBy("d")
        .agg(
            F.sum("nt_d").alias("nt_d"),
            F.sum("nc_d").alias("nc_d"),
            F.sum("st_d").alias("st_d"),
            F.sum("sc_d").alias("sc_d"),
            F.sum("qt_d").cast("decimal(38,0)").alias("qt_d"),
            F.sum("qc_d").cast("decimal(38,0)").alias("qc_d"),
        )
    )


def sequential_z_report(
    daily: DataFrame, boundary: float = 2.413
) -> DataFrame:
    """Cumulative Welch z per day from day-level moment deltas, with
    a Pocock-style constant ``boundary`` — the readout half of the
    group-sequential monitor.  All windows run on the bounded
    observation-days grid; identical expression structure in the
    batch gate, its DuckDB twin, and the streaming twin, so all
    three produce bit-identical doubles from the same moments."""
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "d",
        F.sum("nt_d").over(w).alias("nt"),
        F.sum("nc_d").over(w).alias("nc"),
        F.sum("st_d").over(w).alias("st"),
        F.sum("sc_d").over(w).alias("sc"),
        F.sum("qt_d").over(w).alias("qt"),
        F.sum("qc_d").over(w).alias("qc"),
    ).filter((F.col("nt") >= 2) & (F.col("nc") >= 2))
    mt = F.col("st").cast("double") / (F.lit(10000.0) * F.col("nt"))
    mc = F.col("sc").cast("double") / (F.lit(10000.0) * F.col("nc"))
    zz = (mt - mc) / F.sqrt(
        (F.col("qt").cast("double") / 1e8 - F.col("nt") * mt * mt)
        / (F.col("nt") - 1)
        / F.col("nt")
        + (F.col("qc").cast("double") / 1e8 - F.col("nc") * mc * mc)
        / (F.col("nc") - 1)
        / F.col("nc")
    )
    return cum.select(
        "d",
        F.col("nt").cast("bigint").alias("n_treat"),
        F.col("nc").cast("bigint").alias("n_ctrl"),
        F.round(zz, 6).alias("z"),
        F.when(F.abs(zz) > boundary, 1).otherwise(0).alias("crossed"),
    ).orderBy("d")


def drift_daily_moments(events: DataFrame) -> DataFrame:
    """Day-level moment deltas for the Page–Hinkley drift monitor
    (registry ``page_hinkley_daily_events`` and its streaming twin):
    per (event_type, day), the row count and exact ×100-integer value
    sum — the only state the monitor needs, additive across batches
    (sum per day), which is what makes the streaming twin
    exactly-once-mergeable."""
    return events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum(
            F.round(F.col("value") * 100).cast("bigint")
        ).alias("s_d"),
    )


def merge_drift_daily_moments(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive fold of two drift-moment frames (schema of
    :func:`drift_daily_moments`) — exact integer sums per (type, day),
    so fold order and batch boundaries cannot change the result."""
    return (
        prev.unionByName(delta)
        .groupBy("event_type", "d")
        .agg(F.sum("n_d").alias("n_d"), F.sum("s_d").alias("s_d"))
    )


def page_hinkley_report(
    moments: DataFrame, delta: float = 0.005, lam: float = 5.0
) -> DataFrame:
    """Page–Hinkley readout over day-level drift moments — THE shared
    expressions of the batch gate and the streaming twin, so both
    agree bit-for-bit on the same events: daily mean m = s/n/100
    (exact integer division both engines), running mean allowance,
    M_t = Σ(m − m̄ − δ), PH_t = M_t − min_{s≤t} M_s, alarm past λ.
    All three ordered windows run on the bounded per-type daily
    grid."""
    from pyspark.sql.window import Window

    wd = Window.partitionBy("event_type").orderBy("d")
    acc = moments.select(
        "event_type",
        F.col("d").alias("day"),
        (
            F.col("s_d").cast("double") / F.col("n_d") / 100.0
        ).alias("m"),
    ).withColumn("rm", F.avg("m").over(Window.partitionBy("event_type").orderBy("day")))
    wdy = Window.partitionBy("event_type").orderBy("day")
    mt = acc.withColumn(
        "mt", F.sum(F.col("m") - F.col("rm") - delta).over(wdy)
    )
    ph = F.col("mt") - F.min("mt").over(wdy)
    return mt.select(
        "event_type",
        "day",
        F.round("m", 6).alias("daily_mean"),
        F.round(ph, 6).alias("ph_stat"),
        (ph > lam).alias("alarm"),
    ).orderBy("event_type", "day")


def cusum_chart_report(
    moments: DataFrame, k: float = 0.5, h: float = 4.0
) -> DataFrame:
    """Two-sided tabular CUSUM chart over day-level drift moments
    (schema of :func:`drift_daily_moments`) — THE shared expressions
    of the batch gate (registry ``cusum_chart_daily_events``) and the
    streaming readout (:func:`streaming.drift_cusum_series`), so both
    agree bit-for-bit on the same events:
    S⁺_t = max(0, S⁺_{t−1} + (m_t − μ − k·σ)),
    S⁻_t = max(0, S⁻_{t−1} + (μ − m_t − k·σ)), alarm past h·σ
    (Page 1954 / NIST tabular form; k = slack in σ units, h = decision
    interval).  μ/σ are the in-control estimates from the whole daily
    series; the recursion walks the BOUNDED per-type daily array in
    one applyInPandas kernel whose fold order equals the oracle's
    recursive CTE — bit-identical doubles."""
    import pandas as pd

    daily = moments.select(
        "event_type",
        F.col("d").alias("day"),
        (F.col("s_d").cast("double") / F.col("n_d") / 100.0).alias("x"),
    )
    base = daily.groupBy("event_type").agg(
        F.avg("x").alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sigma"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        mu = pdf["mu"].iloc[0]
        ks = k * pdf["sigma"].iloc[0]
        sp = 0.0
        sn = 0.0
        sps, sns = [], []
        for x in pdf["x"]:
            sp = max(0.0, sp + (x - mu - ks))
            sn = max(0.0, sn + (mu - x - ks))
            sps.append(sp)
            sns.append(sn)
        pdf["sp"] = sps
        pdf["sn"] = sns
        return pdf

    cu = (
        daily.join(base, "event_type")
        .groupBy("event_type")
        .applyInPandas(
            fold,
            "event_type string, day date, x double, mu double, "
            "sigma double, sp double, sn double",
        )
    )
    return cu.select(
        "event_type",
        "day",
        F.round("x", 6).alias("daily_mean"),
        F.round("sp", 6).alias("cusum_pos"),
        F.round("sn", 6).alias("cusum_neg"),
        (
            (F.col("sp") > h * F.col("sigma"))
            | (F.col("sn") > h * F.col("sigma"))
        ).alias("alarm"),
    ).orderBy("event_type", "day")


# --------------------------------------------------------------- SRM
#
# Shared between the batch gate (registry ``srm_check_events``) and
# the streaming monitor (streaming.run_srm_monitor): ONE place for
# the arm coin and the chi-square report, so streamed and batch
# readouts agree bit-for-bit on the same events.

def srm_user_arms(df: DataFrame) -> DataFrame:
    """Distinct (user_id, arm) assignment frame: the deterministic
    md5 coin (hex-prefix bucket % 10000 < 5000 → 'A') — a user's arm
    never changes as data accumulates, so the distinct frame is a
    MONOTONE SET under ingestion: any batch split of the same events
    unions to the identical state (the mergeability contract the
    streaming fold needs)."""
    return df.select(
        "user_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 10000
            < 5000,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    ).distinct()


def merge_srm_user_arms(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Set-union merge for the SRM state: idempotent (replayed users
    dedup) and order-independent — per-batch ∘ merge ≡ one whole-
    stream build."""
    return prev.unionByName(delta).distinct()


def srm_report(arms: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch chi-square against the designed 50/50
    split over a distinct (user_id, arm) frame — the shared report
    both the batch gate and the streaming readout fold.

    The 2-cell grid is DENSIFIED to both designed arms before the
    fold (ADVICE r9 #1): if every user lands in one arm (tiny/early
    streaming state), the missing arm must still contribute its
    ``(0 − t/2)²/(t/2)`` expected-count term — summing only observed
    cells halves χ² exactly in the most extreme mismatch.  The t=0
    degenerate (no users at all) yields NULL χ², not a NaN, per the
    ANSI guard."""
    observed = arms.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    designed = arms.sparkSession.createDataFrame(
        [("A",), ("B",)], "arm string"
    )
    cells = designed.join(F.broadcast(observed), "arm", "left").select(
        "arm", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    tot = cells.agg(F.sum("n").alias("t"))
    return cells.join(F.broadcast(tot), F.lit(True)).agg(
        F.sum(F.when(F.col("arm") == "A", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.round(
            F.sum(
                F.when(
                    F.col("t") > 0,
                    (F.col("n") - F.col("t") / 2.0)
                    * (F.col("n") - F.col("t") / 2.0)
                    / (F.col("t") / 2.0),
                )
            ),
            6,
        ).alias("srm_chi2"),
        F.lit(1).cast("bigint").alias("df"),
    )
