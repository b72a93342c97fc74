"""Declarative data-quality constraint checking (the Deequ/Great
Expectations pattern): a rule set is verified in as few passes as
possible and reported as one ``(check_name, passed, observed)`` frame
— the gate a pipeline puts between "wrote the batch" and "published
the batch".

Plan shape: every row-local rule (not-null, accepted-values, range,
uniqueness-as-count-distinct) folds into ONE global aggregate over a
single scan — observed metrics are just aggregate expressions.
Referential rules need the dimension side, so each foreign-key rule
adds one left-anti join against the (broadcast) referenced keys and
counts survivors.  Nothing collects to the driver; the report is a
DataFrame of one row per rule, unioned from 1-row aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report(name: str, passed, observed) -> list:
    return [
        F.lit(name).alias("check_name"),
        passed.cast("int").alias("passed"),
        observed.cast("double").alias("observed"),
    ]


def check_constraints(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    accepted_values: dict[str, Sequence] | None = None,
    min_value: dict[str, float] | None = None,
    max_value: dict[str, float] | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Verify constraints; returns ``(check_name, passed, observed)``.

    - ``not_null=[c]`` — observed = null count, passes at 0.
    - ``unique=[c]`` — observed = duplicate rows (count − distinct),
      passes at 0.  Exact, so it pays the COUNT-DISTINCT expand; use
      a profiler pre-check when approximate suffices.
    - ``accepted_values={c: [...]}`` — observed = rows outside the
      set, passes at 0.
    - ``min_value/max_value={c: bound}`` — observed = the violating
      extremum's violation count, passes at 0.
    - ``foreign_keys=[(col, dim_df, dim_col)]`` — observed = orphan
      rows whose ``col`` misses from ``dim_df.dim_col`` (NULLs are
      not orphans, matching SQL FK semantics), passes at 0.
    """
    aggs: list = []
    names: list[str] = []
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")))
        names.append(f"not_null_{c}")
    for c in unique:
        aggs.append(F.count(F.col(c)) - F.count_distinct(F.col(c)))
        names.append(f"unique_{c}")
    for c, vals in (accepted_values or {}).items():
        out_of_set = (~F.col(c).isin(list(vals))) & F.col(c).isNotNull()
        aggs.append(F.sum(out_of_set.cast("long")))
        names.append(f"accepted_values_{c}")
    for c, lo in (min_value or {}).items():
        aggs.append(F.sum((F.col(c) < lo).cast("long")))
        names.append(f"min_value_{c}")
    for c, hi in (max_value or {}).items():
        aggs.append(F.sum((F.col(c) > hi).cast("long")))
        names.append(f"max_value_{c}")

    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*[a.alias(f"_m{i}") for i, a in enumerate(aggs)])
        rows = F.array(
            *[
                F.struct(
                    F.lit(n).alias("check_name"),
                    (F.coalesce(F.col(f"_m{i}"), F.lit(0)) == 0)
                    .cast("int")
                    .alias("passed"),
                    F.coalesce(F.col(f"_m{i}"), F.lit(0))
                    .cast("double")
                    .alias("observed"),
                )
                for i, n in enumerate(names)
            ]
        )
        parts.append(wide.select(F.inline(rows)))

    for col, dim, dim_col in foreign_keys:
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        parts.append(
            orphans.select(
                *_report(f"fk_{col}", F.col("_n") == 0, F.col("_n"))
            )
        )

    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def psi_drift(
    df: DataFrame,
    slice_col: str,
    value_col: str,
    baseline_value,
    bins: list[float],
    laplace: float = 0.5,
) -> DataFrame:
    """Population Stability Index of ``value_col``'s distribution in
    every slice against the ``baseline_value`` slice:
    ``(slice, psi, n_rows)`` with PSI = Σ_bins (p−q)·ln(p/q) over
    LITERAL bin edges (left-open buckets; underflow/overflow included
    via −∞/+∞ sentinels).  PSI < 0.1 ⇒ stable, 0.1–0.25 ⇒ drifting,
    > 0.25 ⇒ broken — the standard monitoring gate for "did this
    batch's distribution move".

    Laplace-smoothed counts keep empty bins finite and the ratios
    deterministic (integer counts + literal smoothing → identical
    doubles in any engine).  One hash aggregate over
    (slice, bin) — bins are a literal CASE, so the pass is map-side
    partial; the per-slice PSI fold is over |bins| rows.
    """
    if len(bins) < 1:
        raise ValueError("need at least one bin edge")
    v = F.col(value_col).cast("double")
    b = F.lit(0)
    for t in bins:
        b = b + F.when(v > t, 1).otherwise(0)
    counted = (
        df.groupBy(F.col(slice_col).alias("s"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counted.groupBy("s").agg(F.sum("c").alias("tot"))
    base = (
        counted.filter(F.col("s") == baseline_value)
        .select(F.col("bin"), F.col("c").alias("bc"))
    )
    base_tot = totals.filter(F.col("s") == baseline_value).select(
        F.col("tot").alias("btot")
    )
    n_bins = len(bins) + 1
    # dense bin spine per slice so empty bins still contribute their
    # smoothed mass
    spine = (
        totals.select("s", "tot")
        .crossJoin(
            totals.sparkSession.range(n_bins).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    joined = (
        spine.join(counted, ["s", "bin"], "left")
        .join(F.broadcast(base), "bin", "left")
        .crossJoin(F.broadcast(base_tot))
        .select(
            "s",
            "tot",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + laplace)
                / (F.col("tot") + laplace * n_bins)
            ).alias("p"),
            (
                (F.coalesce(F.col("bc"), F.lit(0)) + laplace)
                / (F.col("btot") + laplace * n_bins)
            ).alias("q"),
        )
    )
    return (
        joined.groupBy("s")
        .agg(
            F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi"),
            F.first("tot").alias("n_rows"),
        )
        .withColumnRenamed("s", slice_col)
    )


def annotate_violations(df: DataFrame, rules: dict) -> DataFrame:
    """Data-contract annotation: append ``_violations`` — the sorted
    names of every rule the row FAILS.  ``rules`` maps rule name →
    SQL boolean expression that passing rows satisfy; a NULL
    evaluation counts as a violation (``coalesce(cond, false)``), so
    unexpected NULLs quarantine instead of slipping through — the
    semantics Deequ/Great-Expectations row rules use.

    Map-only: every rule is one codegen'd CASE over the row, the
    array is built inline, nothing shuffles.  Pair with
    :func:`quarantine` to split the stream."""
    if not rules:
        raise ValueError("rules must be a non-empty dict")
    marks = [
        F.when(~F.coalesce(F.expr(cond), F.lit(False)), F.lit(name))
        for name, cond in sorted(rules.items())
    ]
    return df.withColumn("_violations", F.array_compact(F.array(*marks)))


def quarantine(df: DataFrame, rules: dict):
    """Split a batch on its data contract → ``(clean, quarantined)``:
    clean rows drop the marker column, quarantined rows carry
    ``_violations`` for the dead-letter sink — the enforcement
    counterpart of ``check_constraints`` (which only reports) and
    ``transforms.rescue_columns`` (which handles SCHEMA drift; this
    handles VALUE drift).  One shared map pass; write the clean side
    to the lake and the quarantined side to a review location."""
    ann = annotate_violations(df, rules)
    clean = ann.filter(F.size("_violations") == 0).drop("_violations")
    bad = ann.filter(F.size("_violations") > 0)
    return clean, bad
