"""Operator library — the [EXT] extension surface (SURVEY.md §2.3-2.11).

Relational operators (joins/aggregates/windows/set-ops) are Spark
built-ins and are exercised directly through the DataFrame API in the
query registry; this package holds the operators Spark does NOT ship:

- ``joins``      — as-of join, range join (composition of built-ins)
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard
- ``similarity`` — cosine top-k (brute force + LSH-bucketed ANN)
- ``text``       — document-level text analysis
- ``multimodal`` — binary media columns: plumbing + stubbed decoders
"""

from . import dedup, joins, multimodal, similarity, text  # noqa: F401
