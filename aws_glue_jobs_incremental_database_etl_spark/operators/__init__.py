"""Operator library — the [EXT] extension surface (SURVEY.md §2.3-2.11).

Relational operators (joins/aggregates/windows/set-ops) are Spark
built-ins and are exercised directly through the DataFrame API in the
query registry; this package holds the operators Spark does NOT ship:

- ``joins``      — as-of join (tolerance-bounded), range join
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard
- ``incremental_dedup`` — persistent MinHash index for batch streams
- ``components`` — connected components / cluster-level dedup
- ``similarity`` — cosine top-k (brute force + LSH-bucketed ANN)
- ``text``       — text analysis, TF-IDF, context-window chunking
- ``sampling``   — deterministic md5 splits / stratified reservoirs
- ``profile``    — column profiler, histograms, checksums, outliers
- ``quality``    — Deequ-style constraint gates (single-pass checks)
- ``skew``       — heavy-hitter diagnostics + salt-bucket sizing
- ``udafs``      — grouped-aggregate pandas UDFs (import lazily — its
                   module-level ``pandas_udf`` needs an active session)
- ``multimodal`` — binary media columns: plumbing + stubbed decoders
"""

from . import (  # noqa: F401
    components,
    dedup,
    incremental_dedup,
    joins,
    multimodal,
    profile,
    quality,
    sampling,
    similarity,
    skew,
    text,
)
