"""Grouped-aggregate Pandas UDFs (SURVEY.md §2.10 [EXT] "pandas_udf
scalar + grouped-agg").

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF kind (scalar vs grouped-agg) from the REAL type hints
(``pd.Series -> float`` = grouped agg), and stringified annotations
break that inference.

These are demonstration UDAFs for semantics Spark's built-ins already
cover; in the hot path prefer ``F.avg``/``F.sum`` (JVM, codegen).  The
pattern matters for aggregates Catalyst genuinely lacks (trimmed
means, custom sketches): Arrow ships each group's column to Python
once, the kernel is vectorized numpy/pandas.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def mean_udaf(v: pd.Series) -> float:
    """Grouped-agg mean (≡ F.avg — oracle-checkable demonstrator)."""
    return float(v.mean())


@pandas_udf("double")
def trimmed_mean_udaf(v: pd.Series) -> float:
    """10%-trimmed mean — a UDAF Catalyst has no built-in for: drop
    the lowest/highest decile (by rank, floor count) and average the
    rest.  Deterministic and SQL-expressible (quantile filter), so it
    still carries a DuckDB oracle."""
    n = len(v)
    k = n // 10
    if n - 2 * k <= 0:
        return float(v.mean())
    s = v.sort_values(kind="mergesort")
    return float(s.iloc[k : n - k].mean())
