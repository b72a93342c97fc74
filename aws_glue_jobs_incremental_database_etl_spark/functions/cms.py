"""Portable Count-Min Sketch: frequency estimation with fixed-size
state, built and queried entirely with DataFrame expressions.

A CMS is a ``d × w`` counter grid; key ``s`` increments cell
``(i, h_i(s) mod w)`` for each of the ``d`` rows, and its estimate is
``min_i grid[i][h_i(s)]`` — an upper bound on the true count that
overcounts only via hash collisions (error ≤ ε·N with w = ⌈e/ε⌉ at
confidence 1 − (1/2)^d… standard Cormode–Muthukrishnan bounds).

Like :mod:`.bloom`, the row hashes derive from **md5** so the sketch —
including its collision-driven overcounts — is reproducible in any
engine (DuckDB: ``CAST('0x' || substr(md5(s || '@' || i), 1, 15) AS
BIGINT) % w``), making estimates oracle-checkable bit-for-bit.

Representation: a DataFrame of ``(row int, col int, cnt long)`` with
at most ``d·w`` entries regardless of input size.  Build = one
explode (d rows per input) + one hash aggregate; query = pack to ONE
``map<int,long>`` broadcast row + a ``least()`` over d lookups —
map-only on the probe side.

Scale: the sketch is the canonical fixed-memory answer to "how often
does each of 10^11 tokens occur" when an exact groupBy's shuffle is
unaffordable or when composing with streaming state: d·w counters
(e.g. 5 × 2^20 ≈ 40 MB) absorb any corpus.  The build aggregate's
group count is capped at d·w, so map-side partial aggregation
collapses each input partition to ≤ d·w rows before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_D = 4     # hash rows
DEFAULT_W = 1024  # counters per row


def cms_col(key: Column, i: int, w: int = DEFAULT_W) -> Column:
    """Counter column of hash row ``i`` for ``key``: 60-bit md5
    prefix of ``key || '@' || i``, mod ``w``.  Engine-portable."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f"@{i}"))), 1, 15), 16, 10
    ).cast("long")
    return (h % w).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
    weight_col: str | None = None,
) -> DataFrame:
    """Aggregate keys (optionally weighted) into the ``(row, col,
    cnt)`` sketch frame — ≤ ``d·w`` rows however large the input."""
    key = F.col(key_col)
    wt = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_col(key, i, w).alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_cell"),
        wt.cast("long").alias("_wt"),
    )
    return (
        cells.select("_cell.row", "_cell.col", "_wt")
        .groupBy("row", "col")
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
    result_col: str = "est",
) -> DataFrame:
    """Add ``result_col`` = the CMS frequency estimate for each row's
    key: ``least`` over the ``d`` row lookups (absent cell → 0).

    The sketch packs into ONE ``map<int,long>`` row keyed by
    ``row·w + col`` and broadcasts; the probe is pure expressions —
    no shuffle, no explode."""
    packed = sketch.groupBy().agg(
        F.map_from_arrays(
            F.collect_list(F.col("row") * w + F.col("col")),
            F.collect_list("cnt"),
        ).alias("_cms")
    )
    key = F.col(key_col)
    lookups = [
        F.coalesce(
            F.element_at(F.col("_cms"), (F.lit(i * w) + cms_col(key, i, w))),
            F.lit(0).cast("long"),
        )
        for i in range(d)
    ]
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn(result_col, F.least(*lookups))
        .drop("_cms")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union Count-Min sketches built with the same (d, w): cell-wise
    sum of the ``(row, col, cnt)`` frames.  Counts are additive, so
    per-batch sketches fold into the corpus sketch exactly — the
    streaming/incremental path (estimate error bounds then apply to
    the merged N)."""
    if not sketches:
        raise ValueError("need at least one sketch frame")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """1-row ``(est)``: the CMS inner-product estimate of
    ``Σ_k f_A(k) · f_B(k)`` — which for two key columns IS the inner
    equi-join's output cardinality — computed from two ``(row, col,
    cnt)`` sketches built with the same ``(d, w)``.

    Per hash row the cell-wise product-sum overcounts only via
    collisions, so ``min`` over the ``d`` rows is a one-sided
    (``≥ true``) estimate with error ≤ ε·N_A·N_B at w = ⌈e/ε⌉
    (Cormode–Muthukrishnan §4.2) — the classic sketch the optimizer
    uses to size a join WITHOUT running it.  All-integer arithmetic,
    so any engine replays it exactly.  Missing (row, col) cells are
    zero: an inner join of the frames drops exactly the zero-product
    terms, and a hash row sharing NO columns truly has product-sum 0 —
    restored via the left join from the d row ids."""
    j = (
        a.alias("a")
        .join(b.alias("b"), ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    rows = a.select("row").distinct()
    per_row = rows.join(j, "row", "left").select(
        F.coalesce(F.col("ip"), F.lit(0).cast("long")).alias("ip")
    )
    return per_row.agg(F.min("ip").alias("est"))
