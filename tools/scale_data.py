"""Scale the sf0.1 benchmark tables by an integer factor for the sf1
spot-bench — catches nonlinear behavior (pair-explosion, iteration
cost, bucket fan-out) the sf0.1 bench cannot see.

Replication preserves each query's *structure* so runtimes should
scale ~linearly with the factor:

* TPC-H fact/dim keys are shifted per replica with FK consistency
  (``custkey``/``suppkey``/``partkey``/``orderkey`` all move together)
  — joins and key-grouped aggregates grow ×factor, dim-grouped
  aggregates keep their cardinality.  ``region``/``nation`` stay
  single-copy (they are the broadcast dims; duplicating them would
  break FK semantics, not add load).
* ``documents``: every token gets a per-replica suffix, so NO shingle
  crosses replicas — the near-dup pair structure is exactly factor
  copies of the original, never a cross-replica pair explosion
  (quadratic in factor) that no real corpus growth would produce.
* ``embeddings``: vectors are circularly rotated per replica — a
  rotation is ~orthogonal to the original for these synthetic
  vectors, so cosine-threshold operators again see factor independent
  copies instead of factor² cross-replica duplicate pairs.
* ``events``: users and timestamps shift per replica (sessions,
  funnels, and windows replicate; nothing merges across replicas).

Writes ``{dst}/{table}.parquet`` once; a ``_SCALED_OK`` marker makes
re-runs a no-op.  Output lives under the repo (``.benchdata/``,
gitignored) — testdata itself is read-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# key shifts per replica — larger than any key at sf0.1 (~600k rows)
SHIFT = 10_000_000

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _replicate(
    spark: SparkSession, src: str, table: str, factor: int
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in ("region", "nation"):
        return df
    parts = []
    for r in range(factor):
        s = F.lit(r * SHIFT)
        d = df
        if table == "customer":
            d = d.withColumn("c_custkey", F.col("c_custkey") + s)
        elif table == "supplier":
            d = d.withColumn("s_suppkey", F.col("s_suppkey") + s)
        elif table == "part":
            d = d.withColumn("p_partkey", F.col("p_partkey") + s)
            if r > 0:
                # new replica = new brands: real corpus growth adds
                # NEW entities, so similarity-join blocking keys must
                # not merge replicas (else candidate pairs grow
                # factor², which no real growth produces — same
                # rationale as the documents token tagging)
                d = d.withColumn(
                    "p_brand", F.concat("p_brand", F.lit(f"-{r}"))
                )
        elif table == "orders":
            d = d.withColumn("o_orderkey", F.col("o_orderkey") + s)
            d = d.withColumn("o_custkey", F.col("o_custkey") + s)
        elif table == "lineitem":
            for c in ("l_orderkey", "l_partkey", "l_suppkey"):
                d = d.withColumn(c, F.col(c) + s)
        elif table == "events":
            d = d.withColumn("event_id", F.col("event_id") + s)
            d = d.withColumn("user_id", F.col("user_id") + s)
            d = d.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {r * 1000} DAYS")
            )
        elif table == "documents":
            d = d.withColumn("doc_id", F.col("doc_id") + s)
            if r > 0:
                # tag every token: no shingle ever matches across
                # replicas, so near-dup output is exactly factor
                # copies of the sf0.1 answer
                d = d.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1{r}")
                )
        elif table == "embeddings":
            d = d.withColumn("vec_id", F.col("vec_id") + s)
            if r > 0:
                dim_rot = r % 8 + 1
                d = d.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), dim_rot + 1, 4096),
                        F.slice(F.col("embedding"), 1, dim_rot),
                    ),
                )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ensure_scaled(
    spark: SparkSession, src: str, dst: str, factor: int = 10
) -> str:
    """Create (once) and return the scaled data directory."""
    marker = os.path.join(dst, "_SCALED_OK")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        _replicate(spark, src, t, factor).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    with open(marker, "w") as fh:
        fh.write(f"factor={factor} src={src}\n")
    return dst
