"""Canonical loaders for the driver testdata tables.

``/root/testdata/sf*/{name}.parquet`` — TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` (TESTDATA.md).  One quirk:
``events.ts`` has shipped in two physical forms across driver rounds —
parquet TIMESTAMP(NANOS) (round 1), which Spark's reader rejects
unless ``spark.sql.legacy.parquet.nanosAsLong`` (set in
``session.get_spark``) turns it into a long we convert losslessly
here, and plain ``timestamp[us]`` with no zone (round 2+), which
Spark 4 infers as TIMESTAMP_NTZ and passes through unchanged.  Any
µs arithmetic downstream must therefore be NTZ-tolerant — use
``functions.epoch_us`` (casts via the UTC session zone), never bare
``F.unix_micros``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with canonical column types."""
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, NOT `/`: float division rounds 19-digit nano
        # values (> 2^53) and corrupts the microsecond by ±1
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
