import pytest
from pyspark.sql import types as T

from aws_glue_jobs_incremental_database_etl_spark.types import (
    hive_to_spark,
    schema_to_columns,
    spark_to_hive,
)


@pytest.mark.parametrize(
    "s,expected",
    [
        ("int", T.IntegerType()),
        ("bigint", T.LongType()),
        ("tinyint", T.ByteType()),
        ("smallint", T.ShortType()),
        ("double", T.DoubleType()),
        ("float", T.FloatType()),
        ("string", T.StringType()),
        ("boolean", T.BooleanType()),
        ("date", T.DateType()),
        ("timestamp", T.TimestampType()),
        ("binary", T.BinaryType()),
        ("decimal(12,2)", T.DecimalType(12, 2)),
        ("decimal", T.DecimalType(10, 0)),
        ("varchar(20)", T.StringType()),
        ("char(3)", T.StringType()),
        ("array<float>", T.ArrayType(T.FloatType())),
        ("map<string,int>", T.MapType(T.StringType(), T.IntegerType())),
        (
            "struct<a:int,b:array<string>>",
            T.StructType(
                [
                    T.StructField("a", T.IntegerType()),
                    T.StructField("b", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        ("INT", T.IntegerType()),
        ("Decimal( 5 , 3 )", T.DecimalType(5, 3)),
    ],
)
def test_hive_to_spark(s, expected):
    assert hive_to_spark(s) == expected


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        hive_to_spark("uuid")


@pytest.mark.parametrize(
    "dt,s",
    [
        (T.LongType(), "bigint"),
        (T.DecimalType(5, 2), "decimal(5,2)"),
        (T.ArrayType(T.FloatType()), "array<float>"),
        (T.MapType(T.StringType(), T.DoubleType()), "map<string,double>"),
    ],
)
def test_spark_to_hive(dt, s):
    assert spark_to_hive(dt) == s


def test_roundtrip_schema_to_columns():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.ArrayType(T.FloatType())),
        ]
    )
    cols = schema_to_columns(schema)
    assert cols == [
        {"Name": "a", "Type": "bigint"},
        {"Name": "b", "Type": "string"},
        {"Name": "c", "Type": "array<float>"},
    ]
    for c in cols:
        assert hive_to_spark(c["Type"]) is not None
