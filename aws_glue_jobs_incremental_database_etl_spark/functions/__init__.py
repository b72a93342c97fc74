"""Scalar / vector expression helpers (JVM-side, codegen-friendly)."""

from .vectors import cosine_similarity, dot_product, epoch_us, l2_norm
from .text import (
    language_id,
    normalized_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    text_fingerprint,
    token_count,
    tokens,
)

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "epoch_us",
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "normalized_text",
    "text_fingerprint",
]
