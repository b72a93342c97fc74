"""Canonical loaders for the driver testdata tables.

``/root/testdata/sf*/{name}.parquet`` — TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` (TESTDATA.md).  One quirk:
``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` (set in
``session.get_spark``) it arrives as a long that we convert to a real
microsecond timestamp here (the generator's values are µs-aligned, so
the conversion is lossless and matches DuckDB's read of the same file).
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
