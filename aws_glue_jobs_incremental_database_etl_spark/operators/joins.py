"""Join operators Spark lacks as single primitives: as-of and range.

The reference has no joins at all (SURVEY.md §2.3); these are the
[EXT] surface, built as compositions of built-in operators so Catalyst
still owns the physical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import epoch_us


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Explicit broadcast marker for dimension tables — at 100 TB the
    difference between a map-side hash join and shuffling the fact
    table."""
    return F.broadcast(df)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = True,
    tolerance: str | float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), per ``on`` key.

    ``tolerance`` bounds how stale a match may be (pandas
    ``merge_asof(tolerance=...)``): a string is an interval for
    timestamp keys (``"30 minutes"``), a number is a plain difference
    for numeric keys.  Left rows whose only candidate is older than
    the tolerance keep NULL values rather than a stale match.

    Implementation is the scalable sort-based union trick (not a range
    cross-join): tag both sides, union by key+time, carry right values
    forward with ``last(..., ignorenulls)`` over an ordered window,
    keep left rows.  Cost = one shuffle on the key + a sort within
    partitions — the same cost profile as a sort-merge join, and no
    pair explosion regardless of time-density.  (Spark 4's
    ``DataFrame.joinAsOf`` would be the built-in alternative; this
    composition keeps us independent of its availability and supports
    the strict/non-strict variants symmetrically.)
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lcols = [c for c in left.columns]

    # the right row travels as ONE struct so the match is row-atomic:
    # values and the matched timestamp always come from the same row
    # (per-column ignorenulls carries could mix rows when a later
    # right row holds nulls)
    r_struct = F.struct(
        F.col(right_ts).alias("__mt"), *[F.col(c).alias(c) for c in value_cols]
    )
    null_struct = F.lit(None).cast(
        "struct<__mt:"
        + right.schema[right_ts].dataType.simpleString()
        + ","
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
        + ">"
    )
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        null_struct.alias("__r"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        r_struct.alias("__r"),
    ).select(*[F.col(c) for c in lcols], "__t", "__is_left", "__r")

    unioned = l_tagged.unionByName(r_tagged)
    # Order so that at equal timestamps the RIGHT row sorts first for
    # non-strict (<=, right value visible to the left row via the
    # to-current-row frame) and AFTER the left row for strict (<, the
    # to-previous-row frame then can't see it).
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        *lcols,
        "__t",
        "__is_left",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    if tolerance is not None:
        bound = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        fresh = (F.col("__t") - F.col("__m.__mt")) <= bound
        carried = carried.withColumn("__m", F.when(fresh, F.col("__m")))
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col(f"__m.{c}").alias(c) for c in value_cols]
    )
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the big side's key, replicate the
    small side across every salt value, join on (key, salt).

    AQE's skew-join split handles most skew automatically; explicit
    salting is for the pathological case — one key holding a double-
    digit percentage of the rows — where even a split partition
    overwhelms a task.  The big side gets a uniform random-free salt
    (hash of the full row via ``monotonically_increasing_id`` would be
    nondeterministic across retries; ``pmod(hash(all columns), n)`` is
    deterministic), the small side explodes ×``salt_buckets`` — only
    acceptable because it is the SMALL side.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    equi_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join: boolean-expression join, with optional equi
    keys so Catalyst plans a sort-merge/hash join on the keys and only
    applies the range predicate as a post-filter (a pure theta join is
    a broadcast-nested-loop — fine for a small side, fatal at scale)."""
    if equi_keys:
        eq = [left[k] == right[k] for k in equi_keys]
        cond = eq[0]
        for e in eq[1:]:
            cond = cond & e
        return left.join(right, cond & condition, how)
    return left.join(right, condition, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_width: int,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Keyless interval-overlap join: pairs where
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap (closed
    bounds: ``l_start <= r_end AND r_start <= l_end``).

    Without an equi key Spark plans a raw theta join as a
    broadcast-nested-loop — O(|L|·|R|) and a driver OOM once neither
    side is broadcastable.  The scale path MANUFACTURES the equi key:
    quantize time into buckets of ``bucket_width``, replicate each
    interval to every bucket it touches (``sequence`` + ``explode``,
    replication = len/width + 1), hash-join on the bucket, then keep a
    pair only in the FIRST bucket the two intervals share
    (``greatest`` of the start buckets) — an algebraic dedup, so no
    ``distinct`` shuffle.  Cost: one equi shuffle on
    (bucket [, equi_keys...]), plus the bounded replication.  Pick
    ``bucket_width`` near the typical interval length: too small
    inflates replication, too large inflates per-bucket candidate
    pairs.

    Bounds columns must be numeric (long/int — e.g. ``epoch_us`` for
    timestamps); column names must be disjoint between the two sides
    except the ``equi_keys`` themselves, which by definition exist on
    both (they merge in the output, like a name-based join).
    """
    ls, le = left_bounds
    rs, re = right_bounds
    eq = set(equi_keys or [])
    missing = [k for k in eq if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"equi_keys must exist on both sides: {sorted(missing)}")
    overlap = (set(left.columns) & set(right.columns)) - eq
    if overlap:
        raise ValueError(f"column names must be disjoint, both have: {sorted(overlap)}")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")

    def floor_bucket(c: str):
        # exact long floor-division: double division (floor(x / w))
        # loses integer precision past 2^53 (nanosecond-scale bounds);
        # pmod-then-div stays in long arithmetic at any magnitude and
        # keeps floor (not truncate-toward-zero) semantics for
        # negative starts
        return F.expr(
            f"(`{c}` - pmod(`{c}`, {bucket_width})) div {bucket_width}"
        )

    def buckets(df: DataFrame, s: str, e: str, sb: str) -> DataFrame:
        return df.withColumn(sb, floor_bucket(s)).withColumn(
            "_b", F.explode(F.sequence(F.col(sb), floor_bucket(e)))
        )

    lb = buckets(left, ls, le, "_lsb")
    rb = buckets(right, rs, re, "_rsb")
    keys = ["_b"] + list(equi_keys or [])
    pairs = lb.join(rb, keys).filter(
        (F.col(ls) <= F.col(re))
        & (F.col(rs) <= F.col(le))
        & (F.col("_b") == F.greatest(F.col("_lsb"), F.col("_rsb")))
    )
    return pairs.drop("_b", "_lsb", "_rsb")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_us: int,
    agg: str = "last",
) -> DataFrame:
    """Time-series resampling with forward fill — the gap-fill shape
    every metrics/feature pipeline needs: per key, a REGULAR grid of
    ``step_us``-wide slots spanning that key's own [min, max] range,
    each slot carrying the latest observation in it, empty slots
    forward-filled from the previous one:
    ``(key, slot_start timestamp, value, is_observed)``.

    Plan: one key-level min/max aggregate → per-key grid via
    ``sequence`` + ``explode`` (fan-out = key's active span / step,
    never the global span), observations collapsed per (key, slot)
    with ``max_by`` (latest ts wins — deterministic), a key+slot
    equi join, then ONE ordered window per key for the
    ``last(ignorenulls)`` carry.  Two shuffles on the key total; no
    driver state.  ``agg`` picks the in-slot reducer: ``last``
    (max_by ts) or ``avg``/``sum``/``min``/``max``.
    """
    us = epoch_us(ts_col)
    slot = F.floor(us / F.lit(step_us)).cast("long")
    obs_all = df.select(
        F.col(key_col).alias("k"), us.alias("_us"), slot.alias("_slot"),
        F.col(value_col).alias("_v"),
    )
    if agg == "last":
        reducer = F.max_by("_v", "_us")
    elif agg in ("avg", "sum", "min", "max"):
        reducer = getattr(F, agg)("_v")
    else:
        raise ValueError(f"unsupported agg: {agg!r}")
    obs = obs_all.groupBy("k", "_slot").agg(reducer.alias("_obs"))
    span = obs_all.groupBy("k").agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    grid = span.select(
        "k", F.explode(F.sequence("_lo", "_hi")).alias("_slot")
    )
    w = (
        Window.partitionBy("k")
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["k", "_slot"], "left")
        .select(
            F.col("k").alias(key_col),
            F.timestamp_micros(F.col("_slot") * step_us).alias("slot_start"),
            F.last("_obs", ignorenulls=True).over(w).alias(value_col),
            F.col("_obs").isNotNull().alias("is_observed"),
            "_slot",
        )
        .drop("_slot")
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """Blocked string-similarity self-join: pairs of rows in the same
    ``block_col`` group whose ``text_col`` values are within
    ``max_dist`` Levenshtein edits → ``(block, id_a, id_b, dist)``
    with ``id_a < id_b``.

    Scale shape: the equi-join on the blocking key turns the O(n²)
    all-pairs problem into Σ|block|² local work — the classic entity-
    resolution blocking pattern.  The join key is **(block, length)
    banded**: the left side keys each string by its exact length, the
    right side fans out to the ``2d+1`` lengths it could pair with
    (the Levenshtein length lower bound), so candidate pairs form
    only between length-compatible strings — exact (every qualifying
    pair matches in both orientations, the ``id_a < id_b`` filter
    keeps one), with per-block work Σ over length-groups instead of
    the whole block.  Surviving pairs run Spark's thresholded
    ``levenshtein(l, r, threshold)`` kernel, which abandons each DP
    row early once the band exceeds ``max_dist`` (returns −1) —
    O(d·min(m,n)) per pair instead of O(m·n).

    At 100 TB even banded blocks grow quadratically if the blocking
    key's cardinality is fixed; the scale composition is candidate
    generation by MinHash/shingle LSH (operators.dedup) followed by
    this operator as the exact *verify* stage over candidate pairs —
    the same build-verify split the near-dup family uses.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    a = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_s_a"),
        F.length(F.col(text_col)).alias("_lb"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_s_b"),
        F.explode(
            F.sequence(
                F.length(F.col(text_col)) - max_dist,
                F.length(F.col(text_col)) + max_dist,
            )
        ).alias("_lb"),
    )
    return (
        a.join(b.hint("merge"), ["block", "_lb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("_s_a"), F.col("_s_b"), max_dist)
        )
        .filter(F.col("dist") >= 0)
        .select("block", "id_a", "id_b", "dist")
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join on the cogrouped-pandas execution path:
    ``left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas`` with
    a per-key ``pandas.merge_asof`` (backward, inclusive, optional
    tolerance) — the Spark API surface for "align two keyed frames
    with arbitrary pandas logic".

    Semantics match operators.joins.asof_join (strict=False): each
    left row takes the greatest right ``right_ts`` ≤ its ``left_ts``
    within tolerance, else NULL — the two paths share one oracle.

    Scale shape: ONE co-partitioned shuffle of both sides on the key,
    then per-key Arrow batches into pandas; no window, no union.  Use
    the expression-based asof_join when keys are few and groups huge
    (a single key's group must fit in one pandas frame); use this one
    when per-key logic outgrows what expressions can say.
    """
    from pyspark.sql import types as T

    lf = {f.name: f for f in left.schema.fields}
    rf = {f.name: f for f in right.schema.fields}
    out_fields = [lf[c] for c in left.columns] + [
        T.StructField(c, rf[c].dataType, True) for c in value_cols
    ]
    schema = T.StructType(out_fields)
    left_cols = list(left.columns)
    out_cols = left_cols + list(value_cols)

    def kernel(l, r):
        import pandas as pd

        if l.empty:
            return pd.DataFrame(columns=out_cols)
        l2 = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            for c in value_cols:
                l2 = l2.assign(**{c: pd.Series([pd.NaT] * len(l2)).values})
            return l2[out_cols]
        r2 = r.sort_values(right_ts, kind="mergesort")
        tol = (
            pd.Timedelta(microseconds=tolerance_us)
            if tolerance_us is not None
            else None
        )
        merged = pd.merge_asof(
            l2,
            r2,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            tolerance=tol,
            suffixes=("", "_r"),
        )
        return merged[out_cols]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(kernel, schema)
    )


def jaro_winkler_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.9,
    length_band: int = 4,
) -> DataFrame:
    """Blocked Jaro-Winkler similarity self-join — the record-linkage
    matcher for name-like strings (prefix-weighted, transposition-
    tolerant), complementing :func:`edit_distance_join`'s
    edit-budget semantics.  Pairs share a ``block_col`` value and a
    ``length_band`` length window; survivors score with the textbook
    Jaro-Winkler (boost threshold 0.7, prefix scale 0.1, max prefix
    4 — bit-identical to DuckDB's ``jaro_winkler_similarity``,
    validated pairwise) and pass at ``jw ≥ threshold``.

    The similarity kernel is ONE documented Arrow-batched pandas UDF
    (the SimHash-kernel precedent): per pair it runs the O(|a|·band)
    matching walk in Python over the batch — strings are name-length,
    the blocking join has already bounded the candidate volume, and
    no built-in expression computes JW.  Same 100 TB contract as the
    edit-distance join: fixed-cardinality blocks grow quadratically,
    so at scale the blocking key must carry enough entropy (or LSH
    candidates feed this as the verify stage)."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if length_band < 0:
        raise ValueError("length_band must be >= 0")
    import pandas as pd

    # no inline type hints: this module's `from __future__ import
    # annotations` turns them into strings, which pandas_udf's
    # signature parser rejects — real annotations are attached below
    def _jw_kernel(sa, sb):
        def jaro(s1: str, s2: str) -> float:
            if s1 == s2:
                return 1.0
            l1, l2 = len(s1), len(s2)
            if l1 == 0 or l2 == 0:
                return 0.0
            md = max(l1, l2) // 2 - 1
            if md < 0:
                md = 0
            f1 = [False] * l1
            f2 = [False] * l2
            m = 0
            for i, c in enumerate(s1):
                lo, hi = max(0, i - md), min(l2, i + md + 1)
                for j in range(lo, hi):
                    if not f2[j] and s2[j] == c:
                        f1[i] = f2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            k = 0
            for i in range(l1):
                if f1[i]:
                    while not f2[k]:
                        k += 1
                    if s1[i] != s2[k]:
                        t += 1
                    k += 1
            t //= 2
            return (m / l1 + m / l2 + (m - t) / m) / 3.0

        def jw(s1: str, s2: str) -> float:
            j = jaro(s1, s2)
            if j <= 0.7:
                return j
            pre = 0
            for a, b in zip(s1[:4], s2[:4]):
                if a != b:
                    break
                pre += 1
            return j + pre * 0.1 * (1 - j)

        return pd.Series(
            [jw(x if x is not None else "", y if y is not None else "")
             for x, y in zip(sa, sb)]
        )

    _jw_kernel.__annotations__ = {
        "sa": pd.Series, "sb": pd.Series, "return": pd.Series
    }
    _jw = F.pandas_udf(_jw_kernel, "double")

    a = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("t_a"),
        F.length(text_col).alias("l_a"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("t_b"),
        F.length(text_col).alias("l_b"),
    )
    cand = a.join(b.hint("merge"), "block").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("l_a") - F.col("l_b")) <= length_band)
    )
    return (
        cand.withColumn("jw", F.round(_jw("t_a", "t_b"), 6))
        .filter(F.col("jw") >= threshold)
        .select("block", "id_a", "id_b", "jw")
    )
