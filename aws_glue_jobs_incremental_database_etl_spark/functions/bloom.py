"""Portable distributed Bloom filter, built and probed entirely with
DataFrame expressions — no driver-side bitset, no JVM-private sketch.

Spark ships a Scala-side ``DataFrame.stat.bloomFilter`` (absent from
PySpark) and an internal ``BloomFilterAggregate``; both hash with
engine-private Murmur3 layouts that no other engine can reproduce.
This module instead derives the ``k`` bit positions from **md5** —
reproducible bit-for-bit in any engine that can md5 a string (DuckDB:
``CAST('0x' || substr(md5(s || '#' || i), 1, 15) AS BIGINT) % m``) —
so membership answers *including false positives* are deterministic
and oracle-checkable.

Representation: the filter is a DataFrame of ``(word int, bits long)``
rows — bit ``p`` lives in word ``p div 32`` at ``1 << (p % 32)`` (32
bits per long word: shifting into bit 63 overflows a signed BIGINT in
ANSI engines, so the top half of each word stays empty by design).
For the default ``m = 4096`` that is ≤ 128 rows regardless of how
many keys were inserted, so the probe side always broadcasts it; nothing
is ever collected to the driver.

Scale: build = one explode (k rows per key) + one ≤ m/32-group
aggregate, probe = one broadcast join + one per-row aggregate. At
100 TB the filter rides the same plan with m raised to keep the
false-positive rate at target (p ≈ (1 - e^{-kn/m})^k); m = 2^27 bits
is still only a 4 M-row build-side aggregate and a 32 MB broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 4096  # bits; must be a multiple of 32
DEFAULT_K = 5     # hash functions


def bloom_position(key: Column, i: int, m: int = DEFAULT_M) -> Column:
    """Bit position of hash ``i`` for ``key``: 60-bit md5 prefix of
    ``key || '#' || i``, mod ``m``.  Engine-portable (md5 + base-16
    parse + mod — nothing Spark-private)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 15), 16, 10
    ).cast("long")
    return (h % m).cast("int")


def _positions(key: Column, m: int, k: int) -> Column:
    return F.array(*[bloom_position(key, i, m) for i in range(k)])


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate a key set into the ``(word, bits)`` filter frame.

    One explode to ``k`` positions per key, then a ``bit_or`` hash
    aggregate over at most ``m/32`` groups — map-side partial, so the
    shuffle carries at most ``m/32`` rows per input partition."""
    if m % 32 != 0:
        raise ValueError("m must be a multiple of 32")
    pos = keys.select(
        F.explode(_positions(F.col(key_col), m, k)).alias("p")
    )
    return pos.groupBy((F.col("p") / 32).cast("int").alias("word")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), p % 32))").alias("bits")
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    result_col: str = "bloom_hit",
) -> DataFrame:
    """Add ``result_col``: true iff every one of the key's ``k`` bits
    is set in the filter.  Members always hit (no false negatives);
    non-members hit with probability ≈ (1 - e^{-kn/m})^k, and *which*
    non-members hit is deterministic given the portable hash.

    The filter packs into ONE ``map<int,long>`` row (≤ m/32 entries),
    broadcast-cross-joined onto ``df``; the membership test is then a
    pure ``forall`` over the key's positions — map-only, no explode,
    no shuffle, no re-aggregation of ``df``'s rows."""
    packed = bloom.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("_bloom")
    )
    return (
        df.withColumn("_bp", _positions(F.col(key_col), m, k))
        .crossJoin(F.broadcast(packed))
        .withColumn(
            result_col,
            F.expr(
                "forall(_bp, p -> coalesce("
                "(element_at(_bloom, CAST(p DIV 32 AS INT)) & "
                "shiftleft(CAST(1 AS BIGINT), p % 32)) <> 0, false))"
            ),
        )
        .drop("_bp", "_bloom")
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union Bloom filters built with the same (m, k): cell-wise
    ``bit_or`` of the ``(word, bits)`` frames.  Mergeability is what
    makes the sketch distributed-native: per-partition (or per-batch,
    or per-day) filters combine into the corpus filter without
    touching the keys again — the incremental-decontamination path,
    where each pipeline run folds its new fingerprints into a
    persisted filter instead of rescanning the corpus."""
    if not blooms:
        raise ValueError("need at least one bloom frame")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
