"""Z-order (Morton) curve expressions for multi-column data skipping.

Single-column ``cluster_by`` compaction (``maintenance.py``) gives
perfect file skipping on ONE predicate column and nothing on the
others.  Interleaving the bits of k normalized columns into one
z-value and range-clustering on it gives every clustered column
partial locality: a file covering a contiguous z-range covers a small
hyper-rectangle of the original space, so parquet footer min/max on
the ORIGINAL columns still prunes most files for predicates on any
subset of them.  This is Delta/Iceberg ``OPTIMIZE ... ZORDER BY``
re-expressed as pure Catalyst bit arithmetic — no UDF, no hilbert
library, engine-exact (the same expression reproduces bit-for-bit in
any engine with integer shifts, which is what the DuckDB oracle does).

Normalization here is linear min/max scaling to ``2^bits`` cells.
Delta uses range-partition ranks instead, which is robust to skewed
value distributions; rank-based cells cost an extra shuffle per
column, so for the common telemetry/id/price shapes linear scaling is
the right default and the caller can pre-transform (log, clamp) a
skewed column before clustering on it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def z_cell(col: Column, cmin: Column, cmax: Column, bits: int = DEFAULT_BITS) -> Column:
    """Scale ``col`` linearly into an integer cell ``[0, 2^bits)``.

    All arithmetic is double-precision (IEEE, engine-portable); a
    degenerate ``cmin == cmax`` column lands every row in cell 0.
    """
    n_cells = float(2**bits)
    x = col.cast("double")
    lo = cmin.cast("double")
    hi = cmax.cast("double")
    scaled = F.floor((x - lo) / (hi - lo) * F.lit(n_cells)).cast("bigint")
    cell = F.least(F.lit(int(n_cells) - 1), F.greatest(F.lit(0), scaled))
    return F.when(hi > lo, cell).otherwise(F.lit(0))


def interleave_bits(cells: Sequence[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``k`` cell columns: bit ``b`` of column ``i``
    lands at z-bit ``b*k + i``.  Expands to ``bits × k`` shift/mask
    terms summed with ``+`` (positions are disjoint, so ``+`` ≡ ``|``)
    — a flat expression whole-stage codegen compiles to straight-line
    long arithmetic.
    """
    k = len(cells)
    if k == 0:
        raise ValueError("need at least one cell column")
    if bits * k > 63:
        raise ValueError(f"{bits} bits x {k} cols exceeds a signed 64-bit z-value")
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
        for i, c in enumerate(cells)
        for b in range(bits)
    ]
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def z_value(
    df: DataFrame, columns: Sequence[str], bits: int = DEFAULT_BITS
) -> DataFrame:
    """Append a ``_z`` Morton column over ``columns``.

    Column bounds come from one column-pruned min/max pre-pass joined
    back as a 1-row broadcast (no driver collect, no extra shuffle on
    the data side) — the same stats any lakehouse keeps in table
    metadata, recomputed here so the operator is self-contained.
    """
    cols = list(columns)
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c)).alias(f"__min_{c}"),
            F.max(F.col(c)).alias(f"__max_{c}"),
        ]
    bounds = df.agg(*aggs)
    withb = df.crossJoin(F.broadcast(bounds))
    cells = [
        z_cell(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
        for c in cols
    ]
    return withb.withColumn("_z", interleave_bits(cells, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_sql_expr(columns: Sequence[str], table: str, bits: int = DEFAULT_BITS) -> str:
    """The ANSI-SQL replica of :func:`z_value`'s ``_z`` expression
    (used by the DuckDB oracle): identical scaling + bit terms, bounds
    from a cross-joined scalar subquery."""
    k = len(columns)
    n_cells = float(2**bits)
    parts = []
    for i, c in enumerate(columns):
        cell = (
            f"CASE WHEN __max_{c} > __min_{c} THEN "
            f"LEAST({2**bits - 1}, GREATEST(0, CAST(FLOOR("
            f"(CAST({c} AS DOUBLE) - __min_{c}) / (__max_{c} - __min_{c})"
            f" * {n_cells}) AS BIGINT))) ELSE 0 END"
        )
        for b in range(bits):
            parts.append(f"((({cell} >> {b}) & 1) << {b * k + i})")
    bounds = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS __min_{c}, "
        f"MAX(CAST({c} AS DOUBLE)) AS __max_{c}"
        for c in columns
    )
    return (
        f"SELECT t.*, ({' + '.join(parts)}) AS _z "
        f"FROM {table} t CROSS JOIN (SELECT {bounds} FROM {table}) b"
    )
