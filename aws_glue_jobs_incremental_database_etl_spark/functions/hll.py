"""Portable HyperLogLog: distinct-count estimation with fixed-size
state, built and queried entirely with DataFrame expressions.

An HLL splits a uniform hash into a bucket index and a suffix; each of
``m = 2^b`` registers keeps the MAXIMUM over its keys of ``rho`` = the
1-based position of the suffix's leftmost set bit (Flajolet et al.,
AofA 2007).  The estimate is ``alpha_m · m² / Σ_j 2^(−M_j)`` with the
standard small-range linear-counting correction.

Portability (the :mod:`.bloom` / :mod:`.cms` rule): the hash is the
60-bit md5 hex prefix, bucket = ``h mod m``, suffix = ``h div m``
(``60−b`` usable bits), and ``rho`` comes from the base-2 STRING
length of the suffix — pure integer/string ops, no ``log2`` floats
whose libm could disagree across engines.  The harmonic sum is folded
in EXACT integer arithmetic with a scale DERIVED FROM ``b``:
``Σ 2^(−M_j) = (Σ 2^(S−M_j)) / 2^S`` with ``S = 61−b`` = the maximum
``rho`` — so the shift ``S−M_j`` is never negative for any supported
``b`` (a fixed S=53 went negative for b<8, and Java's mod-64 shift
silently corrupted the sum), and the numerator is a plain BIGINT sum
bounded by ``m·2^S = 2^61 < 2^63`` for EVERY ``b`` (a fixed scale also
overflowed for b>9).  Estimates replay bit-for-bit in any engine;
only the linear-counting branch touches ``ln`` (rounded by callers).
At the default ``b=8``, ``S = 53`` — the constant SQL twins write.

Representation: a DataFrame of ``(bucket int, reg int)`` with at most
``m`` rows regardless of input size.  Registers MERGE by per-bucket
MAX — the sketch is the canonical mergeable distinct-counter for
incremental aggregates and streaming folds.

Scale: ``m = 256`` registers (~2 KB) answer "how many distinct tokens
in 10^11 rows" within ~6.5% (1.04/√m) where an exact count-distinct
would shuffle every key; the build's group count is capped at ``m``,
so map-side partial aggregation collapses each partition to ≤ m rows
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_B = 8          # bucket bits -> m = 256 registers
_SUFFIX_BITS = 52      # 60-bit md5 prefix minus the default 8 bucket bits


def _check_b(b: int) -> None:
    """4 ≤ b ≤ 16: below 4 the estimator's alpha constant is wrong
    (HLL's bias correction assumes m ≥ 16); above 16 the 60-bit hash
    leaves < 44 suffix bits and the register frame stops being small.
    Validated on BOTH build and estimate — b is part of the sketch's
    wire format, and a mismatched b corrupts silently otherwise."""
    if not 4 <= b <= 16:
        raise ValueError(f"hll: b must be in [4, 16], got {b}")


def _hash60(key: Column) -> Column:
    """60-bit md5 hex prefix as a BIGINT — the shared portable hash."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hll_rho(suffix: Column, bits: int = _SUFFIX_BITS) -> Column:
    """1-based leftmost-set-bit position of the ``bits``-wide
    ``suffix``, ``bits + 1`` for an all-zero suffix.  Uses the base-2
    string length — ``len(bin(x)) = floor(log2(x)) + 1`` exactly, with
    no float whose libm could disagree across engines."""
    return F.when(suffix == 0, F.lit(bits + 1)).otherwise(
        F.lit(bits)
        - F.length(F.conv(suffix.cast("string"), 10, 2))
        + 1
    ).cast("int")


def hll_build(
    df: DataFrame,
    key_col: str,
    b: int = DEFAULT_B,
    group_cols: tuple = (),
) -> DataFrame:
    """Aggregate keys into the ``(bucket, reg)`` register frame —
    ≤ ``2^b`` rows per group however large (or duplicated) the
    input.  ``group_cols`` makes it a GROUPED distinct-counter (one
    sketch per group — e.g. per time window)."""
    _check_b(b)
    m = 1 << b
    h = _hash60(F.col(key_col).cast("string"))
    # `div` (not `/`): float division is lossy past 2^53 and the hash
    # carries 60 bits
    return (
        df.select(*group_cols, h.alias("_h"))
        .select(
            *group_cols,
            (F.col("_h") % m).cast("int").alias("bucket"),
            hll_rho(F.expr(f"_h div {m}"), bits=60 - b).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register frames and re-fold per-bucket MAX — merging
    sketches of disjoint or overlapping inputs equals the sketch of
    their union (max is idempotent/commutative/associative)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    sketch: DataFrame, b: int = DEFAULT_B, group_cols: tuple = ()
) -> DataFrame:
    """One-row ``(n_registers, zero_registers, est_distinct)`` from a
    register frame.  The harmonic numerator folds as an exact BIGINT
    (missing buckets contribute ``2^53`` each); the raw-estimate
    arithmetic is the identical literal expression any SQL twin
    writes, so before the final ROUND the doubles agree bit-for-bit
    (the linear-counting branch's ``ln`` may differ by an ulp — hence
    estimates are reported rounded)."""
    _check_b(b)
    m = 1 << b
    scale = 61 - b  # = max rho, so scale − reg ≥ 0 for every register
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    aggs = [
        F.count("*").alias("nz"),
        F.sum(
            # F.shiftleft only takes a literal shift — SQL form takes
            # a column
            F.expr(f"shiftleft(cast(1 as bigint), {scale} - reg)")
        ).alias("cpart"),
    ]
    agg = (
        sketch.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else sketch.agg(*aggs)
    )
    c = F.col("cpart") + (F.lit(m) - F.col("nz")) * F.lit(1 << scale)
    zeros = (F.lit(m) - F.col("nz")).cast("long")
    raw = (
        alpha
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << scale))
        / c.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.lit(m).alias("n_registers"),
        zeros.alias("zero_registers"),
        F.round(est, 2).alias("est_distinct"),
    )
