"""Windowed aggregations over event time — batch and streaming share
these exact expressions (run them on a static DataFrame for the
oracle-checkable batch mode, or on a streaming DataFrame unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import epoch_us


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows: groupBy(window(ts, d)).

    Output carries ``window_start``/``window_end`` as plain timestamp
    columns (oracle-friendly).  Partial aggregation makes this one
    shuffle keyed by (window, keys) regardless of input size.
    """
    keys = [F.window(F.col(ts_col), duration).alias("w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows: each event contributes to duration/slide
    windows (window explode happens inside the window() expression)."""
    keys = [F.window(F.col(ts_col), duration, slide).alias("w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Data-driven session windows via Spark's native session_window
    (gap-based merge handled by the engine; works batch + streaming)."""
    keys = [F.session_window(F.col(ts_col), gap).alias("w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def sessionize(
    df: DataFrame, ts_col: str, user_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Assign session ids with the lag/cumsum technique: a new session
    starts where the gap to the previous event exceeds ``gap_seconds``.

    SQL-expressible (the DuckDB oracle runs the identical window
    algebra), and one shuffle on the user key.  Session id is
    (user, running count of session starts).  Gap arithmetic is exact
    integer microseconds (unix_micros), never fractional doubles.
    """
    order_cols = [F.col(ts_col).asc()]
    if "event_id" in df.columns:
        order_cols.append(F.col("event_id").asc())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    ts_us = epoch_us(ts_col)
    prev = F.lag(ts_us).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("session_seq", F.sum(is_new).over(w)).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq")),
    )
