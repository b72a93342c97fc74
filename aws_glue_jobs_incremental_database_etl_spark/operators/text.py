"""DataFrame-level text-analysis operators over a documents table.

Thin compositions of the expression library in ``functions.text`` —
each is a map-only pass (no shuffle) producing per-document features
for downstream filtering/sampling in a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    text_fingerprint,
    token_count,
)


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/quality/language/fingerprint feature columns."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        language_id(t).alias("lang_pred"),
        text_fingerprint(t).alias("fingerprint"),
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """Keep documents above a quality threshold (pipeline building block)."""
    return df.filter(quality_score(F.col(text_col)) >= min_quality)
