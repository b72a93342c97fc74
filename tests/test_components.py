"""Connected-components / cluster dedup tests (operators/components.py)."""

from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
    cluster_dedup,
    connected_components,
)


def test_transitive_closure_resolves_chains(spark):
    # path 1-2-3-4 (diameter 3), separate pair 10-11, separate triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cluster_dedup_keeps_one_per_component_and_isolated_rows(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long, t string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = sorted(r["doc_id"] for r in cluster_dedup(df, edges, "doc_id").collect())
    # one survivor (the min) per chain/pair; 99 untouched
    assert out == [1, 10, 99]


def test_one_pass_dedup_underdeletes_where_clusters_fix_it(spark):
    """The motivating case is a star whose center is the largest id:
    2~10 and 3~10 (no 2~3 edge).  Pair-level one-pass (drop id_b of
    each a<b pair) deletes only 10 and keeps both leaves; cluster
    dedup resolves {2,3,10} into one component and keeps only 2."""
    df = spark.createDataFrame(
        [(2, "a"), (3, "b"), (10, "c")], "doc_id long, t string"
    )
    edges = spark.createDataFrame([(2, 10), (3, 10)], "id_a long, id_b long")

    one_pass = df.join(
        edges.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    assert sorted(r["doc_id"] for r in one_pass.collect()) == [2, 3]  # under-delete

    clustered = cluster_dedup(df, edges, "doc_id")
    assert sorted(r["doc_id"] for r in clustered.collect()) == [2]
