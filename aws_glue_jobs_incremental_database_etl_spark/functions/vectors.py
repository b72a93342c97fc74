"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

Built from ``zip_with`` / ``aggregate`` higher-order functions so the
hot path stays inside whole-stage codegen — no Python UDF, no Arrow
transfer, no serialization.  At 100 TB this is the difference between
a scan-speed similarity pass and a 10-100× slower UDF pass
(SURVEY.md §2.11; the Pandas-UDF alternative lives in
``operators/similarity.py`` for when numpy batching wins).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ = sqrt(Σ aᵢ²)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); NULL if either norm is 0."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def epoch_us(col: Column | str) -> Column:
    """NTZ-safe exact-microsecond epoch value.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (parquet ``timestamp[us]``
    with no zone, which Spark 4 infers as NTZ by default).  The session
    timezone is pinned to UTC in ``session.get_spark``, so casting
    NTZ -> TIMESTAMP is value-preserving and this equals DuckDB's
    ``epoch_us`` on the same naive column.  On an already-zoned
    TIMESTAMP the cast is a no-op.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.unix_micros(col.cast("timestamp"))
