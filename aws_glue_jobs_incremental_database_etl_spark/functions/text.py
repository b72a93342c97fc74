"""Text-analysis scalar expressions (language-ID, quality, tokens,
fingerprints) — all pure Catalyst expressions (SURVEY.md §2.11).

Every function here has an exact ANSI-SQL mirror (used by the DuckDB
oracles in ``__spark_entry__``), so the semantics are pinned by the
correctness gate, and everything runs JVM-side at scan speed — at
100 TB these run as map-only passes with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed English stopword set — part of the operator contract
# (mirrored verbatim in the SQL oracles).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
PUNCT_CLASS = "[.,!?;:]"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization: split(trim(text), '\\s+')."""
    return F.split(F.trim(_c(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    """Number of whitespace-delimited tokens (0 for empty/blank)."""
    t = F.trim(_c(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# Subword-ish tokenization contract: letter runs, single digits
# (GPT-style digit splitting), and single non-alphanumeric glyphs.
# Plain regex alternation (no lookarounds) so Spark (Java regex) and
# DuckDB (RE2) count identically.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate = count of ``BPE_ISH_PATTERN`` matches.

    A cheap stand-in for a real tokenizer's token count (the usual
    budget/sampling signal in training-data pipelines) that runs as a
    single JVM-side ``regexp_count`` — no UDF, no vocab lookup."""
    return F.regexp_count(_c(text), F.lit(BPE_ISH_PATTERN))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation ([.,!?;:])."""
    t = _c(text)
    n = F.length(t)
    stripped = F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n > 0, (n - stripped) / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    sw = [s.lower() for s in (stopwords or EN_STOPWORDS)]
    toks = tokens(F.lower(_c(text)))
    hits = F.size(F.filter(toks, lambda x: x.isin(sw)))
    n = F.size(toks)
    return F.when(n > 0, hits / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] document-quality heuristic.

    0.5·min(tokens/100, 1) + 0.3·(1 − punct_ratio) + 0.2·min(4·stopword_ratio, 1)
    — length, cleanliness, and natural-language-ness terms; the exact
    formula is the contract (mirrored in the SQL oracle).
    """
    length_term = F.least(token_count(text) / F.lit(100.0), F.lit(1.0))
    clean_term = F.lit(1.0) - punct_ratio(text)
    natural_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return 0.5 * length_term + 0.3 * clean_term + 0.2 * natural_term


def language_id(text: Column | str, threshold: float = 0.05) -> Column:
    """N-gram/stopword language heuristic: 'en' when the English
    stopword ratio clears ``threshold``, else 'unknown'."""
    return F.when(stopword_ratio(text) > threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, trim,
    collapse internal whitespace."""
    return F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))


def text_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint = md5(normalized text).

    md5 is identical across Spark/DuckDB/Python → oracle-checkable and
    stable across cluster topologies (unlike hash/xxhash64 seeds)."""
    return F.md5(normalized_text(text))


def redact_pii(text: Column | str) -> Column:
    """Mask common PII shapes before text enters a training corpus:
    emails → ``<EMAIL>``, 7+-digit runs (phone/account/card numbers,
    allowing space/dash/dot separators) → ``<NUMBER>``, IPv4-ish
    addresses → ``<IP>``.

    Deliberately backreference-free patterns (portable between Java
    regex and RE2) chained as three JVM-side ``regexp_replace`` calls
    — a map-only projection, no UDF.  This is shape-based masking, not
    NER: names/addresses need a model pass, which belongs behind the
    multimodal-style stub boundary, not here.
    """
    c = _c(text)
    c = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    c = F.regexp_replace(c, r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>")
    c = F.regexp_replace(c, r"\b(?:\d[ .-]?){7,}\d\b", "<NUMBER>")
    return c


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (nats) of the character distribution — the
    compression-style quality axis: natural prose sits ~2.9-3.2,
    repeated-character spam and base64/hex blobs fall far below/above
    their expected band, so both tails are filter candidates.

    Map-only HOFs, no explode: counts come from
    ``filter(chars, c == x)`` per DISTINCT character, O(n·alphabet)
    per row with alphabet ≤ a few dozen for real text — cheaper than a
    per-character explode's shuffle, and embarrassingly parallel.
    Empty text → 0.0.  Mirrored exactly by the DuckDB lambda oracle
    (sum order differs at the last bit only; gate outputs round).
    """
    t = F.col(text) if isinstance(text, str) else text
    return char_entropy_from_chars(F.split(t, ""))


def char_entropy_from_chars(chars: Column) -> Column:
    """``char_entropy`` over an ALREADY-MATERIALIZED char-array column.

    The entropy expression references its input many times (size,
    distinct, one filter per distinct character, the aggregate
    accumulator), and Catalyst inlines non-materialized children into
    every reference — handed the raw ``split()`` expression it would
    re-split the document O(alphabet) times per row (the same
    inlining trap ``shingles_from_tokens`` documents).  Hot paths
    must project ``split(text, '')`` into a column first and call
    this form; ``char_entropy`` is the convenience wrapper.
    """
    n = F.size(chars).cast("double")
    ent = F.aggregate(
        F.transform(
            F.array_distinct(chars),
            lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, cnt: acc - (cnt / n) * F.log(cnt / n),
    )
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def with_char_entropy(
    df, text_col: str = "text", out_col: str = "entropy"
):
    """Sorted run-length character entropy as a STAGED projection
    chain: sort once, boundary indices once, run counts once, fold
    once — O(n log n) per doc vs the per-distinct filter scans of
    :func:`char_entropy_from_chars` (O(alphabet·n); measured 2.4 s →
    ~1 s for the sf0.1 corpus).

    Each level lands in a real column because Catalyst INLINES a
    multi-referenced alias's expression into every reference when
    projections collapse — handed one expression tree, ``array_sort``
    re-sorts per element access and the boundary filter re-runs per
    count (measured: minutes, not seconds).  CollapseProject keeps
    non-cheap multi-referenced aliases staged, so DataFrame-level
    selects are the reliable fence; a Column-level helper cannot be.

    Appends ``out_col`` (double) and drops the intermediates.
    Summation runs in sorted-character order — the SQL twin must sort
    too (engine-identical fp accumulation)."""
    others = [c for c in df.columns]
    staged = df.select(*others, F.split(F.col(text_col), "").alias("_cs"))
    staged = staged.select(
        *others, F.array_sort("_cs").alias("_s"), F.size("_cs").alias("_n")
    )
    # try_element_at: i = 1 probes index 0 in the second disjunct
    # (NULL, matching DuckDB's s[0]); element_at would ANSI-error
    staged = staged.select(
        *others,
        "_n",
        F.filter(
            F.sequence(F.lit(1), F.col("_n")),
            lambda i: (i == 1)
            | (
                F.try_element_at("_s", i.cast("int"))
                != F.try_element_at("_s", (i - 1).cast("int"))
            ),
        ).alias("_b"),
    )
    staged = staged.select(
        *others,
        "_n",
        F.transform(
            F.sequence(F.lit(1), F.size("_b")),
            lambda j: (
                F.when(
                    j < F.size("_b"),
                    F.element_at("_b", (j + 1).cast("int")),
                ).otherwise(F.col("_n") + 1)
                - F.element_at("_b", j.cast("int"))
            ).cast("double"),
        ).alias("_c"),
    )
    nd = F.col("_n").cast("double")
    return staged.select(
        *others,
        F.when(
            F.col("_n") > 0,
            F.aggregate(
                "_c",
                F.lit(0.0),
                lambda acc, cnt: acc - (cnt / nd) * F.log(cnt / nd),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias(out_col),
    )
